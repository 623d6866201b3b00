"""Window-function / set-operation / reshape analytics breadth.

The reference's query surface is relational + time-series (SURVEY.md
§2); a user replacing it with this engine also gets the standard
analytic-SQL toolbox over the same tables. Everything here is
declarative DataFrame API — window specs, set operators, pivot — so
Catalyst plans it (single hash/range shuffle per window partition key,
no driver-side loops).

Scale notes:
- every window partitions by a bounded key (event_type: 5 values;
  user_id: ~uniform) — one hash shuffle, then per-partition sort.
  A monster-key skew would need salting (see relational.q_distinct_salted
  for the two-phase pattern).
- set operations lower to hash joins/aggregates with partial combine.
- pivot uses an EXPLICIT value list — without it Spark collects the
  distinct pivot values to the driver first (an extra job and a
  scale hazard).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load_table

EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def q_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[window: ROWS frame] 5-row moving average of value per
    event_type, totally ordered by (ts, event_id) so the frame is
    deterministic across engines."""
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(-4, 0)
    )
    return e.select(
        "event_id",
        "event_type",
        F.round(F.avg("value").over(w), 6).alias("mavg5"),
    )


def q_cumsum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[window: running total] cumulative value per user ordered by
    (ts, event_id) — the unbounded-preceding frame."""
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return e.select(
        "event_id",
        "user_id",
        F.round(F.sum("value").over(w), 4).alias("running_value"),
    )


def q_rank_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[window: rank/dense_rank/ntile] ranking trio per event_type by
    value (event_id tiebreak keeps every rank deterministic)."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(
        F.col("value").desc(), F.col("event_id")
    )
    return e.select(
        "event_id",
        "event_type",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
    ).filter(F.col("rnk") <= 50)


def q_lead_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[window: lead/lag] per-user inter-event gap in seconds plus the
    next event's type — the sessionization building block exposed as
    its own operator."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # exact integer microseconds — a seconds cast would truncate on one
    # engine and round on the other for sub-second components
    us = F.unix_micros(F.col("ts"))
    return e.select(
        "event_id",
        "user_id",
        (us - F.lag(us).over(w)).alias("gap_us"),
        F.lead("event_type").over(w).alias("next_type"),
    )


def q_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[set ops: INTERSECT + EXCEPT] users who purchased AND signed up,
    minus the heavy-error cohort (>10 errors). Lowers to hash
    semi/anti aggregation — no driver-side set building."""
    e = load_table(spark, sf_dir, "events")

    def users(t: str) -> DataFrame:
        return e.filter(F.col("event_type") == t).select("user_id")

    heavy_error = (
        users("error")
        .groupBy("user_id")
        .count()
        .filter(F.col("count") > 10)
        .select("user_id")
    )
    return (
        users("purchase")
        .intersect(users("signup"))
        .exceptAll(heavy_error)
        .orderBy("user_id")
    )


def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[reshape: pivot] per-user event-type count matrix. The pivot
    value list is explicit — implicit pivot first runs a distinct-
    collect on the driver, which is both an extra job and unbounded at
    scale."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy("user_id")
        .pivot("event_type", EVENT_TYPES)
        .agg(F.count(F.lit(1)))
        .na.fill(0, EVENT_TYPES)
        .orderBy("user_id")
    )


def q_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[binning] fixed-width value histogram (50-unit bins) per
    event_type — arithmetic binning expressed identically on both
    engines (no reliance on width_bucket availability)."""
    e = load_table(spark, sf_dir, "events")
    bin_col = F.floor(F.col("value") / 50).cast("long")
    return (
        e.groupBy("event_type", bin_col.alias("bin"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("bin_value"),
        )
        .orderBy("event_type", "bin")
    )


ORACLES: dict[str, str] = {
    "q_moving_avg": """
        SELECT event_id, event_type,
               round(avg(value) OVER (
                   PARTITION BY event_type ORDER BY ts, event_id
                   ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 6) AS mavg5
        FROM events
    """,
    "q_cumsum": """
        SELECT event_id, user_id,
               round(sum(value) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4)
                   AS running_value
        FROM events
    """,
    "q_rank_ntile": """
        SELECT * FROM (
            SELECT event_id, event_type,
                   rank() OVER w AS rnk,
                   dense_rank() OVER w AS drnk,
                   ntile(4) OVER w AS quartile
            FROM events
            WINDOW w AS (PARTITION BY event_type
                         ORDER BY value DESC, event_id)
        ) WHERE rnk <= 50
    """,
    "q_lead_lag": """
        SELECT event_id, user_id,
               epoch_us(ts) - lag(epoch_us(ts)) OVER w AS gap_us,
               lead(event_type) OVER w AS next_type
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    "q_setops": """
        SELECT user_id FROM events WHERE event_type = 'purchase'
        INTERSECT
        SELECT user_id FROM events WHERE event_type = 'signup'
        EXCEPT
        SELECT user_id FROM events WHERE event_type = 'error'
        GROUP BY user_id HAVING count(*) > 10
        ORDER BY user_id
    """,
    "q_pivot": """
        SELECT user_id,
               CAST(count(*) FILTER (event_type = 'click')    AS BIGINT) AS click,
               CAST(count(*) FILTER (event_type = 'error')    AS BIGINT) AS error,
               CAST(count(*) FILTER (event_type = 'purchase') AS BIGINT) AS purchase,
               CAST(count(*) FILTER (event_type = 'signup')   AS BIGINT) AS signup,
               CAST(count(*) FILTER (event_type = 'view')     AS BIGINT) AS view
        FROM events GROUP BY user_id ORDER BY user_id
    """,
    "q_histogram": """
        SELECT event_type, CAST(floor(value / 50) AS BIGINT) AS bin,
               count(*) AS n, round(sum(value), 4) AS bin_value
        FROM events GROUP BY event_type, bin ORDER BY event_type, bin
    """,
}

QUERIES = {
    name: fn
    for name, fn in list(globals().items())
    if callable(fn) and name.startswith("q_")
}
