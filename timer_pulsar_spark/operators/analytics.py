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

from ..functions.timeutil import epoch_micros, epoch_millis
from pyspark.sql.window import Window

from ..catalog import load_table
from ..streaming.state import replay_workdir

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
    us = epoch_micros(e, "ts")
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


def q_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[join: FULL OUTER] reconcile two event-derived per-user ledgers —
    click spend vs purchase spend — keeping users present on either
    side (the reconciliation shape: unmatched rows surface as NULL
    sides instead of disappearing). One shuffle per side on user_id;
    at scale AQE handles the skewed-null bucket since the join key is
    never null here (group keys)."""
    e = load_table(spark, sf_dir, "events")

    def ledger(t: str, alias: str) -> DataFrame:
        return (
            e.filter(F.col("event_type") == t)
            .groupBy("user_id")
            .agg(F.round(F.sum("value"), 4).alias(alias))
        )

    clicks = ledger("click", "click_value")
    purchases = ledger("purchase", "purchase_value")
    return (
        clicks.join(purchases, "user_id", "full_outer")
        .select("user_id", "click_value", "purchase_value")
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


def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[funnel] strictly-ordered view -> click -> purchase conversion
    per user: the first view, the first click AFTER that view, the
    first purchase AFTER that click. Expressed as three cascaded
    conditional min-aggregations (each a groupBy + join on user_id),
    so the sequencing constraint is exact — a user who purchased
    before ever clicking does not count as converted.

    Scale: the per-stage dims are |users| rows of 2 columns; each join
    reuses the same user_id hash partitioning, so AQE coalesces the
    cascade into one exchange of each side. Skewed mega-users only
    affect their own group's min()."""
    e = load_table(spark, sf_dir, "events")
    t_view = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    t_click = (
        e.filter(F.col("event_type") == "click")
        .join(t_view, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    t_purchase = (
        e.filter(F.col("event_type") == "purchase")
        .join(t_click, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    return (
        t_view.join(t_click, "user_id", "left")
        .join(t_purchase, "user_id", "left")
        .select("user_id", "t_view", "t_click", "t_purchase")
        .orderBy("user_id")
    )


def q_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[cohort retention] users bucketed by first-seen day; for each
    (cohort_day, day_offset) the distinct users active that many days
    later — the classic retention triangle. One agg builds the cohort
    dim (|users| rows — user-scaled, so no forced broadcast; AQE picks
    the strategy), one agg counts; the distinct is
    per (cohort, offset) group with map-side partial aggregation."""
    e = load_table(spark, sf_dir, "events")
    cohort = e.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("cohort_date")
    )
    return (
        e.join(cohort, "user_id")
        .groupBy(
            F.date_format("cohort_date", "yyyy-MM-dd").alias("cohort_day"),
            F.datediff(F.to_date("ts"), F.col("cohort_date")).alias("day_offset"),
        )
        .agg(F.count_distinct("user_id").alias("n_users"))
        .orderBy("cohort_day", "day_offset")
    )


def q_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[statistical aggregates] second-moment statistics per event_type:
    sample stddev/variance, correlation and covariance of value vs
    user_id, and the least-squares regression line (slope/intercept).
    All are single-pass mergeable aggregates (partial + final hash agg,
    map-side combine) — the 100 TB shape; rounded on both engines so
    partial-aggregation summation order cannot flip the hash."""
    e = load_table(spark, sf_dir, "events")
    uid = F.col("user_id").cast("double")
    return e.groupBy("event_type").agg(
        F.round(F.stddev_samp("value"), 6).alias("sd_value"),
        F.round(F.var_samp("value"), 6).alias("var_value"),
        F.round(F.corr("value", uid), 6).alias("corr_vu"),
        F.round(F.covar_samp("value", uid), 6).alias("covar_vu"),
        F.round(F.regr_slope(F.col("value"), uid), 6).alias("slope"),
        F.round(F.regr_intercept(F.col("value"), uid), 6).alias("intercept"),
    )


def q_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[resample: OHLC] per event_type x hour candle: open/close via
    min_by/max_by on the event timestamp (deterministic — (event_type,
    ts) is collision-free at microsecond resolution), high/low/volume
    as plain aggregates. Single shuffle with partial combine; min_by
    carries one (ts, value) pair per group through the combiner, not
    the group's rows."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(
            "event_type", F.date_trunc("hour", "ts").alias("hour")
        )
        .agg(
            F.round(F.min_by("value", "ts"), 6).alias("open"),
            F.round(F.max("value"), 6).alias("high"),
            F.round(F.min("value"), 6).alias("low"),
            F.round(F.max_by("value", "ts"), 6).alias("close"),
            F.count(F.lit(1)).alias("n_trades"),
            F.round(F.sum("value"), 4).alias("volume"),
        )
        .orderBy("event_type", "hour")
    )


def q_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[SCD2 change capture] compress each user's event-type stream
    into type-2 validity intervals: keep only CHANGE rows (type differs
    from the previous event), then close each interval with the next
    change's timestamp — valid_to NULL marks the current state. Two
    window passes over the SAME (user_id, ts) partitioning, so
    Catalyst plans one shuffle + one sort for both."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = e.withColumn("prev_type", F.lag("event_type").over(w)).filter(
        F.col("prev_type").isNull() | (F.col("prev_type") != F.col("event_type"))
    )
    w2 = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return changes.select(
        "user_id",
        F.col("event_type").alias("state"),
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w2).alias("valid_to"),
        F.lead("ts").over(w2).isNull().alias("is_current"),
    ).orderBy("user_id", "valid_from")


def q_scd2_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[point-in-time dimension lookup] the query that makes an SCD2
    dimension useful: for every probe event (clicks here), the state
    that was valid AT ITS TIMESTAMP — the temporal-correctness join a
    training pipeline needs so features never leak future state.

    Plan shape: NOT the BETWEEN inequality join (Catalyst can only run
    a theta join as broadcast nested loop — O(probes × intervals) and
    a broadcast of a corpus-scaled side at 100 TB). Instead the
    merge-fold: union the dimension's change points with the probe
    rows, ONE window per user ordered by event time, and
    last(state, ignorenulls) carries the open state onto each probe —
    one hash shuffle on user_id + one sort, linear at any scale. Tie
    semantics match the interval algebra exactly: a probe at a
    transition instant sees the NEW state (valid_from <= ts), and a
    zero-length interval (two changes at the same instant) matches
    nothing — the change rows at equal timestamps are ordered by
    valid_to so the surviving interval folds last."""
    e = load_table(spark, sf_dir, "events")
    dim = q_scd2(spark, sf_dir)
    changes = dim.select(
        "user_id",
        F.col("valid_from").alias("at_ts"),
        F.lit(0).alias("kind"),
        F.coalesce(
            F.col("valid_to"), F.lit("9999-01-01").cast("timestamp_ntz")
        ).alias("vt_order"),
        "state",
        F.lit(None).cast("long").alias("event_id"),
    )
    probes = e.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("ts").alias("at_ts"),
        F.lit(1).alias("kind"),
        F.lit(None).cast("timestamp_ntz").alias("vt_order"),
        F.lit(None).cast("string").alias("state"),
        "event_id",
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("at_ts", "kind", F.col("vt_order").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        changes.unionByName(probes)
        .withColumn("state_at", F.last("state", ignorenulls=True).over(w))
        .filter(F.col("kind") == 1)
        .select(
            "event_id",
            "user_id",
            F.col("at_ts").alias("ts"),
            F.col("state_at").alias("state"),
        )
        .filter(F.col("state").isNotNull())
        .orderBy("event_id")
    )


def q_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[robust outlier detection] per-event-type median, MAD (median
    absolute deviation), and modified-z-score outlier counts
    (|0.6745·(x−med)/MAD| > 3.5, the Iglewicz–Hoaglin rule) — the
    robust counterpart of q_stats's moment statistics, which a single
    corrupt feed value can drag arbitrarily far.

    Exact medians need a per-group sort, so this is the one stats query
    that can't be a single-pass mergeable aggregate: two median passes
    (value, then absolute deviation) with the tiny per-type results
    broadcast back between passes. The grouping key is bounded
    (event types), so each median is |types| sorted runs; at 100 TB
    you'd swap F.median for approx_percentile(0.5, ε) and keep the
    identical plan shape — the broadcast-back pattern is the point."""
    e = load_table(spark, sf_dir, "events").select("event_type", "value")
    med = e.groupBy("event_type").agg(F.median("value").alias("med"))
    dev = e.join(F.broadcast(med), "event_type").withColumn(
        "adev", F.abs(F.col("value") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(
        F.first("med").alias("med"),  # constant within the group
        F.median("adev").alias("mad"),
    )
    return (
        dev.drop("med")
        .join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.first("med"), 6).alias("med"),
            F.round(F.first("mad"), 6).alias("mad"),
            F.sum(
                (F.col("adev") > (3.5 / 0.6745) * F.col("mad")).cast("long")
            ).alias("n_outliers"),
        )
        .orderBy("event_type")
    )


ORACLES: dict[str, str] = {
    "q_outliers": """
        WITH med AS (
            SELECT event_type, median(value) AS med FROM events GROUP BY 1
        ), dev AS (
            SELECT e.event_type, abs(e.value - m.med) AS adev
            FROM events e JOIN med m USING (event_type)
        ), mad AS (
            SELECT event_type, any_value(med) AS med, median(adev) AS mad
            FROM (SELECT d.event_type, d.adev, m.med
                  FROM dev d JOIN med m USING (event_type)) GROUP BY 1
        )
        SELECT d.event_type, count(*) AS n,
               round(any_value(m.med), 6) AS med,
               round(any_value(m.mad), 6) AS mad,
               CAST(sum(CASE WHEN d.adev > (3.5 / 0.6745) * m.mad
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        FROM dev d JOIN mad m USING (event_type)
        GROUP BY 1 ORDER BY 1
    """,
    "q_stats": """
        SELECT event_type,
               round(stddev_samp(value), 6) AS sd_value,
               round(var_samp(value), 6) AS var_value,
               round(corr(value, user_id), 6) AS corr_vu,
               round(covar_samp(value, user_id), 6) AS covar_vu,
               round(regr_slope(value, user_id), 6) AS slope,
               round(regr_intercept(value, user_id), 6) AS intercept
        FROM events GROUP BY event_type
    """,
    "q_outer_join": """
        WITH clicks AS (
            SELECT user_id, round(sum(value), 4) AS click_value
            FROM events WHERE event_type = 'click' GROUP BY user_id
        ), purchases AS (
            SELECT user_id, round(sum(value), 4) AS purchase_value
            FROM events WHERE event_type = 'purchase' GROUP BY user_id
        )
        SELECT coalesce(c.user_id, p.user_id) AS user_id,
               c.click_value, p.purchase_value
        FROM clicks c FULL OUTER JOIN purchases p USING (user_id)
    """,
    "q_scd2": """
        WITH changes AS (
            SELECT user_id, event_type, ts, event_id,
                   lag(event_type) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) AS prev_type
            FROM events
        )
        SELECT user_id, event_type AS state, ts AS valid_from,
               lead(ts) OVER w AS valid_to,
               lead(ts) OVER w IS NULL AS is_current
        FROM changes
        WHERE prev_type IS NULL OR prev_type <> event_type
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ORDER BY user_id, valid_from
    """,
    "q_funnel": """
        WITH t_view AS (
            SELECT user_id, min(ts) AS t_view FROM events
            WHERE event_type = 'view' GROUP BY user_id
        ), t_click AS (
            SELECT e.user_id, min(e.ts) AS t_click
            FROM events e JOIN t_view v ON e.user_id = v.user_id
            WHERE e.event_type = 'click' AND e.ts > v.t_view
            GROUP BY e.user_id
        ), t_purchase AS (
            SELECT e.user_id, min(e.ts) AS t_purchase
            FROM events e JOIN t_click c ON e.user_id = c.user_id
            WHERE e.event_type = 'purchase' AND e.ts > c.t_click
            GROUP BY e.user_id
        )
        SELECT v.user_id, v.t_view, c.t_click, p.t_purchase
        FROM t_view v
        LEFT JOIN t_click c ON c.user_id = v.user_id
        LEFT JOIN t_purchase p ON p.user_id = v.user_id
        ORDER BY v.user_id
    """,
    "q_retention": """
        WITH cohort AS (
            SELECT user_id, min(CAST(ts AS DATE)) AS cohort_date
            FROM events GROUP BY user_id
        )
        SELECT strftime(c.cohort_date, '%Y-%m-%d') AS cohort_day,
               datediff('day', c.cohort_date, CAST(e.ts AS DATE)) AS day_offset,
               count(DISTINCT e.user_id) AS n_users
        FROM events e JOIN cohort c ON e.user_id = c.user_id
        GROUP BY 1, 2 ORDER BY 1, 2
    """,
    "q_ohlc": """
        SELECT event_type, date_trunc('hour', ts) AS hour,
               round(arg_min(value, ts), 6) AS open,
               round(max(value), 6) AS high,
               round(min(value), 6) AS low,
               round(arg_max(value, ts), 6) AS close,
               count(*) AS n_trades,
               round(sum(value), 4) AS volume
        FROM events GROUP BY 1, 2 ORDER BY 1, 2
    """,
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


SCD2_DIM_SCHEMA = (
    "user_id long, state string, valid_from timestamp_ntz,"
    " valid_to timestamp_ntz, is_current boolean"
)
_SCD2_MARKER = "_APPLIED_BATCH"  # leading "_": invisible to the parquet reader


def scd2_fold_batch(
    spark: SparkSession, dim: str, batch_df: DataFrame, batch_id: int
) -> None:
    """One incremental SCD2 fold step (see q_stream_scd2). Idempotent
    under foreachBatch's at-least-once retries: the applied-batch
    marker is written inside the tmp dir BEFORE the atomic directory
    swap, so dimension state and high-water batch id move together —
    a replayed batch_id is detected and skipped without touching the
    dimension."""
    import os
    import shutil
    import uuid

    marker = os.path.join(dim, _SCD2_MARKER)
    if os.path.exists(marker):
        with open(marker) as f:
            if int(f.read().strip()) >= batch_id:
                return  # redelivery of an already-applied batch: no-op
    existing = (
        spark.read.parquet(dim)
        if os.path.exists(dim)
        else spark.createDataFrame([], SCD2_DIM_SCHEMA)
    )
    cur = existing.filter("is_current")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        batch_df.join(
            cur.select("user_id", F.col("state").alias("cur_state")),
            "user_id",
            "left",
        )
        .withColumn(
            "prev", F.coalesce(F.lag("event_type").over(w), F.col("cur_state"))
        )
        .filter(F.col("prev").isNull() | (F.col("prev") != F.col("event_type")))
    )
    new_rows = changes.select(
        "user_id",
        F.col("event_type").alias("state"),
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to"),
        F.lead("ts").over(w).isNull().alias("is_current"),
    )
    first_change = changes.groupBy("user_id").agg(F.min("ts").alias("close_ts"))
    closed = cur.join(first_change, "user_id").select(
        "user_id",
        "state",
        "valid_from",
        F.col("close_ts").alias("valid_to"),
        F.lit(False).alias("is_current"),
    )
    untouched = cur.join(first_change, "user_id", "left_anti")
    merged = (
        existing.filter(~F.col("is_current"))
        .unionByName(closed)
        .unionByName(untouched)
        .unionByName(new_rows)
    )
    tmp = f"{dim}.fold-{uuid.uuid4().hex[:8]}"
    merged.write.mode("overwrite").parquet(tmp)
    with open(os.path.join(tmp, _SCD2_MARKER), "w") as f:
        f.write(str(batch_id))
    if os.path.exists(dim):
        shutil.rmtree(dim)
    os.replace(tmp, dim)


def q_stream_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental SCD2 dimension maintenance — the streaming twin of
    q_scd2, ORACLE-checked: replay the events table as a time-ordered
    multi-batch file stream (the CDC arrival shape) and fold each batch
    into a persistent type-2 dimension: per user, seed the previous
    type from the dimension's OPEN row, keep only change rows, close
    the open interval at the first in-batch change, and append the new
    intervals. Because arrivals are per-key time-ordered, the folded
    dimension is batch-split-independent and must equal the one-shot
    batch compression.

    At 100 TB this is how a warehouse dimension tracks a change stream:
    each batch costs O(batch + open rows), never a history re-scan;
    closed intervals are immutable. The per-batch MERGE maps onto
    Delta/Iceberg MERGE INTO on a real lake (same shape as
    store.merge_table). RETRY-IDEMPOTENT via an applied-batch marker
    that swaps atomically WITH the dimension directory: a foreachBatch
    retry after a crash between the swap and the checkpoint commit
    sees its own batch_id already applied and no-ops. (The fold alone
    would NOT be idempotent for a batch that contained changes — the
    open state then equals the batch's LAST event, so replaying the
    batch would re-detect its first event as a change and append
    duplicate intervals; the marker is what makes at-least-once
    delivery safe. Exercised by
    tests/test_round4_ops.py::test_scd2_fold_retry_is_noop.)"""
    import os

    from ..streaming import stage_range_split

    work = replay_workdir("stream_scd2")
    in_dir = os.path.join(work, "events")
    dim = os.path.join(work, "dim")
    ckpt = os.path.join(work, "ckpt")

    # time-range-split replay files with explicit monotonic mtimes: CDC
    # feeds arrive per-key ordered, which is exactly what
    # range-splitting the history reproduces — staged DISTRIBUTED
    # (range exchange, never a driver materialization)
    stage_range_split(
        load_table(spark, sf_dir, "events").select(
            "event_id", "ts", "user_id", "event_type"
        ),
        in_dir,
        8,
        ["ts", "event_id"],
    )

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        scd2_fold_batch(spark, dim, batch_df, batch_id)

    from ..streaming import await_or_raise, replay_state_partitions

    with replay_state_partitions(spark):
        q = (
            spark.readStream.schema(
                "event_id long, ts timestamp_ntz, user_id long, event_type string"
            )
            .option("maxFilesPerTrigger", "2")  # 8 files -> 4 real folds
            .parquet(in_dir)
            .writeStream.foreachBatch(fold)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        try:
            await_or_raise(q, 120)
        finally:
            if q.isActive:
                q.stop()
    return spark.read.parquet(dim)


# per-key time-ordered arrivals make the SCD2 fold split-independent:
# the incremental dimension must equal the one-shot batch compression
ORACLES["q_stream_scd2"] = ORACLES["q_scd2"]
# the lookup oracle IS the declarative BETWEEN join over the dim — the
# window fold must reproduce it row-for-row (interval tie semantics and
# zero-length intervals included)
ORACLES["q_scd2_lookup"] = f"""
    WITH dim AS ({ORACLES["q_scd2"]})
    SELECT e.event_id, e.user_id, e.ts, d.state
    FROM events e
    JOIN dim d
      ON d.user_id = e.user_id
     AND d.valid_from <= e.ts
     AND (d.valid_to IS NULL OR e.ts < d.valid_to)
    WHERE e.event_type = 'click'
    ORDER BY e.event_id
"""


def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[reshape: wide→long] per-returnflag totals of the four lineitem
    measures, unpivoted into (measure, total) rows with the native
    DataFrame.unpivot (Catalyst Expand — one pass, no per-measure
    rescan, the dual of q_pivot). Aggregate-then-unpivot keeps the
    reshape on |groups|x|measures| rows, never on the fact table."""
    li = load_table(spark, sf_dir, "lineitem")
    wide = li.groupBy("l_returnflag").agg(
        F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 4).alias("sum_price"),
        F.round(F.sum("l_discount"), 4).alias("sum_disc"),
        F.round(F.sum("l_tax"), 4).alias("sum_tax"),
    )
    return wide.unpivot(
        ids="l_returnflag",
        values=["sum_qty", "sum_price", "sum_disc", "sum_tax"],
        variableColumnName="measure",
        valueColumnName="total",
    )


ORACLES["q_unpivot"] = """
    WITH wide AS (
        SELECT l_returnflag,
               round(sum(l_quantity), 4) AS sum_qty,
               round(sum(l_extendedprice), 4) AS sum_price,
               round(sum(l_discount), 4) AS sum_disc,
               round(sum(l_tax), 4) AS sum_tax
        FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, measure, total
    FROM (
        SELECT l_returnflag, 'sum_qty' AS measure, sum_qty AS total FROM wide
        UNION ALL
        SELECT l_returnflag, 'sum_price', sum_price FROM wide
        UNION ALL
        SELECT l_returnflag, 'sum_disc', sum_disc FROM wide
        UNION ALL
        SELECT l_returnflag, 'sum_tax', sum_tax FROM wide
    )
"""


def q_range_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[window: time-RANGE frame] per-user trailing-1-hour event count
    and value sum at every event — the value-based (not row-based)
    frame that rate-limit and rolling-exposure queries need. The frame
    is expressed on exact integer microseconds (rangeBetween over
    epoch_micros), so both engines bound it identically with no
    sub-second truncation; partitioning by user keeps frame evaluation
    shuffle-local per user."""
    e = load_table(spark, sf_dir, "events")
    us = epoch_micros(e, "ts")
    hour_us = 3_600_000_000
    w = (
        Window.partitionBy("user_id")
        .orderBy(us)
        .rangeBetween(-hour_us, 0)
    )
    return e.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).alias("n_1h"),
        F.round(F.sum("value").over(w), 4).alias("value_1h"),
    )


ORACLES["q_range_window"] = """
    SELECT event_id, user_id,
           count(*) OVER w AS n_1h,
           round(sum(value) OVER w, 4) AS value_1h
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL '1 hour' PRECEDING AND CURRENT ROW)
"""

QUERIES = {
    name: fn
    for name, fn in list(globals().items())
    if callable(fn) and name.startswith("q_")
}


def q_dist_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[window: percent_rank / cume_dist] the distribution-position
    functions completing the ranking family (rank/dense_rank/ntile in
    q_rank_ntile): per event_type, each event's relative rank and
    cumulative share by value. Same single-shuffle window shape."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(
        F.col("value").desc(), F.col("event_id")
    )
    return e.select(
        "event_id",
        "event_type",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    ).filter(F.col("pct_rank") <= 0.01)


ORACLES["q_dist_rank"] = """
    SELECT event_id, event_type,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist() OVER w, 6) AS cume
    FROM events
    WINDOW w AS (PARTITION BY event_type ORDER BY value DESC, event_id)
    QUALIFY pct_rank <= 0.01
"""


def q_corpus_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[dataset card] the per-(lang, source) corpus composition table a
    dataset release publishes: document counts, character mass, share
    of total, and mean document length. One grouped aggregation plus a
    broadcast single-row total — the numbers behind every 'data
    mixture' decision, computable in one pass at any scale."""
    d = load_table(spark, sf_dir, "documents")
    total = d.agg(F.sum("n_chars").alias("total_chars"))
    return (
        d.groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("chars"),
            F.round(F.avg("n_chars"), 6).alias("mean_chars"),
        )
        .join(F.broadcast(total))
        .select(
            "lang",
            "source",
            "n_docs",
            "chars",
            F.round(F.col("chars") / F.col("total_chars"), 6).alias("share"),
            "mean_chars",
        )
    )


ORACLES["q_corpus_card"] = """
    SELECT lang, source, count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS chars,
           round(sum(n_chars) * 1.0
                 / (SELECT sum(n_chars) FROM documents), 6) AS share,
           round(avg(n_chars), 6) AS mean_chars
    FROM documents GROUP BY lang, source
"""

OVERLAP_K = 64  # bottom-k sketch size per source


def q_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[dataset diligence] pairwise CONTENT overlap between sources —
    the question every multi-source corpus assembly asks (how much of
    dump B is already in dump A?) — answered two ways in one row:

    - **exact** jaccard of the distinct content-hash sets, computed
      WITHOUT a pairwise set join: group hashes once, collect each
      hash's source set (≤ |sources| entries), and expand in-group
      pairs — one linear pass, shared hashes only;
    - a **bottom-k sketch estimate** (k smallest hash values per
      source, the classic KMV/bottom-k estimator): merge two sketches,
      re-take the k smallest, and count how many sit in both. The
      sketch is what survives 100 TB — per source it is k values,
      mergeable across partitions and across days, so the estimate
      needs no re-scan of either corpus — and publishing the exact
      value next to it makes the estimator's error measurable in the
      result itself.

    Everything is keyed on a 48-bit md5 prefix of the text (engine-
    portable, collision odds ~n²/2⁴⁹), so the whole row set is
    deterministic and fully oracle-checkable. The source-pair frame is
    |sources|² rows — driver-trivial at any corpus size."""
    d = load_table(spark, sf_dir, "documents")
    h = F.conv(F.substring(F.md5("text"), 1, 12), 16, 10).cast("long")
    hs = d.select("source", h.alias("h")).distinct()
    per_src = hs.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    # exact intersections: per-hash source sets -> in-group pairs
    pairs_expr = (
        "flatten(transform(ss, (x, i) -> "
        "transform(slice(ss, i + 2, size(ss)), "
        "y -> struct(x AS a, y AS b))))"
    )
    inter = (
        hs.groupBy("h")
        .agg(F.sort_array(F.collect_set("source")).alias("ss"))
        .filter(F.size("ss") >= 2)
        .select(F.explode(F.expr(pairs_expr)).alias("p"))
        .groupBy(
            F.col("p.a").alias("src_a"), F.col("p.b").alias("src_b")
        )
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    # bottom-k sketch: row_number <= k compiles to the map-side
    # WindowGroupLimit, so only k rows per source reach the reducer
    w = Window.partitionBy("source").orderBy("h")
    sk = (
        hs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= OVERLAP_K)
        .groupBy("source")
        .agg(F.sort_array(F.collect_list("h")).alias("sk"))
    )
    # |sources|² pair frame: the non-equi (src_a < src_b) join over two
    # handful-row relations is a bounded nested-loop by construction
    est = (
        sk.select(F.col("source").alias("src_a"), F.col("sk").alias("sk_a"))
        .join(
            sk.select(
                F.col("source").alias("src_b"), F.col("sk").alias("sk_b")
            ),
            F.col("src_a") < F.col("src_b"),
        )
        .select(
            "src_a",
            "src_b",
            F.expr(
                f"size(filter(slice(array_sort(array_union(sk_a, sk_b)),"
                f" 1, {OVERLAP_K}),"
                " x -> array_contains(sk_a, x) AND array_contains(sk_b, x)))"
                f" / size(slice(array_sort(array_union(sk_a, sk_b)),"
                f" 1, {OVERLAP_K}))"
            ).alias("jest"),
        )
    )
    na = per_src.select(F.col("source").alias("src_a"), F.col("n").alias("n_a"))
    nb = per_src.select(F.col("source").alias("src_b"), F.col("n").alias("n_b"))
    jexact = F.coalesce("inter", F.lit(0)) / (
        F.col("n_a") + F.col("n_b") - F.coalesce("inter", F.lit(0))
    )
    return (
        est.join(na, "src_a")
        .join(nb, "src_b")
        .join(inter, ["src_a", "src_b"], "left")
        .select(
            "src_a",
            "src_b",
            "n_a",
            "n_b",
            F.coalesce("inter", F.lit(0)).alias("inter"),
            F.round(jexact, 6).alias("jaccard_exact"),
            F.round("jest", 6).alias("jaccard_est"),
            F.round(F.abs(F.col("jest") - jexact), 6).alias("abs_err"),
        )
        .orderBy("src_a", "src_b")
    )


ORACLES["q_source_overlap"] = f"""
    WITH hs AS (
        SELECT DISTINCT source,
               ('0x' || substr(md5(text), 1, 12))::BIGINT AS h
        FROM documents
    ),
    per_src AS (SELECT source, count(*) AS n FROM hs GROUP BY 1),
    inter AS (
        SELECT a.source AS src_a, b.source AS src_b, count(*) AS inter
        FROM hs a JOIN hs b ON a.h = b.h AND a.source < b.source
        GROUP BY 1, 2
    ),
    sk AS (
        SELECT source, list_sort(list(h)) AS sk FROM (
            SELECT source, h,
                   row_number() OVER (PARTITION BY source ORDER BY h) AS rn
            FROM hs)
        WHERE rn <= {OVERLAP_K} GROUP BY source
    ),
    est AS (
        SELECT a.source AS src_a, b.source AS src_b,
               len(list_filter(
                       list_sort(list_distinct(a.sk || b.sk))[1:{OVERLAP_K}],
                       x -> list_contains(a.sk, x)
                            AND list_contains(b.sk, x))) * 1.0
               / len(list_sort(list_distinct(a.sk || b.sk))[1:{OVERLAP_K}])
                   AS jest
        FROM sk a JOIN sk b ON a.source < b.source
    )
    SELECT e.src_a, e.src_b, pa.n AS n_a, pb.n AS n_b,
           coalesce(i.inter, 0) AS inter,
           round(coalesce(i.inter, 0) * 1.0
                 / (pa.n + pb.n - coalesce(i.inter, 0)), 6) AS jaccard_exact,
           round(e.jest, 6) AS jaccard_est,
           round(abs(e.jest - coalesce(i.inter, 0) * 1.0
                 / (pa.n + pb.n - coalesce(i.inter, 0))), 6) AS abs_err
    FROM est e
    JOIN per_src pa ON pa.source = e.src_a
    JOIN per_src pb ON pb.source = e.src_b
    LEFT JOIN inter i ON i.src_a = e.src_a AND i.src_b = e.src_b
    ORDER BY e.src_a, e.src_b
"""

def kmv_latest_state(work: str, before: int | None = None) -> str | None:
    """Highest-numbered state_<id> dir under ``work``; with ``before``,
    only versions strictly below it — the predecessor a (re)delivered
    batch must fold onto (ADVICE r07; generalized to every manual fold
    as streaming.latest_state_version in r8)."""
    from ..streaming import latest_state_version

    return latest_state_version(work, before)


def kmv_fold_batch(
    spark: SparkSession, work: str, batch_df: DataFrame, batch_id: int
) -> None:
    """One mergeable-sketch fold step: sketch the batch, set-union with
    the PREDECESSOR state (the highest version strictly below this
    batch_id), re-take the k smallest, write state_<batch_id>.

    Retry safety (ADVICE r07): the previous form read latest_state()
    unfiltered — after a crash in the window between the state write
    and the checkpoint commit, the redelivered batch's latest state IS
    its own state_<batch_id> dir, so the fold lazily read the very
    path it was overwriting (Spark: "Cannot overwrite a path that is
    also being read from"), wedging the stream on that batch. Reading
    the strictly-older predecessor instead makes the retry recompute
    the identical fold from the same inputs and atomically supersede
    any partial dir the crashed attempt left — no read-under-write,
    and idempotent by construction rather than by luck. Module-level
    so the retry path is directly testable."""
    import os

    empty = F.array().cast("array<bigint>")
    h = F.conv(F.substring(F.md5("text"), 1, 12), 16, 10).cast("long")
    bs = batch_df.select("source", h.alias("h")).distinct()
    w = Window.partitionBy("source").orderBy("h")
    sk = (
        bs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= OVERLAP_K)
        .groupBy("source")
        .agg(F.sort_array(F.collect_list("h")).alias("sk"))
    )
    prev_dir = kmv_latest_state(work, before=batch_id)
    if prev_dir is not None:
        prev = spark.read.parquet(prev_dir).select(
            "source", F.col("sk").alias("sk_prev")
        )
        sk = (
            sk.join(prev, "source", "full_outer")
            .select(
                "source",
                F.slice(
                    F.array_sort(
                        F.array_union(
                            F.coalesce("sk", empty),
                            F.coalesce("sk_prev", empty),
                        )
                    ),
                    1,
                    OVERLAP_K,
                ).alias("sk"),
            )
        )
    # ADVICE r08: publish atomically (tmp sibling + os.rename) so a
    # crash mid-write can never leave a PARTIAL state_<id> dir that
    # latest_state_version would select as newest; then vacuum versions
    # below the strict predecessor (sketch state is O(k) per source,
    # but version count was unbounded)
    from ..streaming.state import vacuum_versioned, write_state_atomic

    write_state_atomic(sk.coalesce(1), work, batch_id)
    vacuum_versioned(work, batch_id)


def q_stream_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming MERGEABLE-SKETCH fold, oracle-checked: maintain the
    per-source bottom-k sketch ACROSS micro-batches (per batch: sketch
    the arrivals, set-union with the stored sketch, re-take the k
    smallest) and compute the pairwise overlap estimates from the final
    folded state. Bottom-k is a mergeable summary, so the fold result
    is arrival-order- and batch-split-INDEPENDENT and must equal the
    one-shot batch sketch — the property that lets a 100 TB pipeline
    keep per-source overlap live at O(k) state per source. The merge is
    also idempotent (set union), so a redelivered batch cannot corrupt
    the state — sketch folds are retry-safe for free, unlike counters.

    State versioning: each batch writes state_<batch_id> after folding
    onto the highest version STRICTLY OLDER than itself
    (kmv_fold_batch), so a retried batch recomputes its own version
    from the same predecessor with identical content instead of
    reading the dir it overwrites (ADVICE r07)."""
    import os

    work = replay_workdir("stream_kmv")
    in_dir = os.path.join(work, "docs")
    ckpt = os.path.join(work, "ckpt")

    d = load_table(spark, sf_dir, "documents")
    d.repartition(8).write.mode("overwrite").parquet(in_dir)

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        kmv_fold_batch(spark, work, batch_df, batch_id)

    from ..streaming import await_or_raise, replay_state_partitions

    with replay_state_partitions(spark):
        q = (
            spark.readStream.schema(d.schema)
            .option("maxFilesPerTrigger", "2")  # 8 files -> 4 real folds
            .parquet(in_dir)
            .writeStream.foreachBatch(fold)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        try:
            await_or_raise(q, 180)
        finally:
            if q.isActive:
                q.stop()

    sk = spark.read.parquet(kmv_latest_state(work))
    est = (
        sk.select(F.col("source").alias("src_a"), F.col("sk").alias("sk_a"))
        .join(
            sk.select(
                F.col("source").alias("src_b"), F.col("sk").alias("sk_b")
            ),
            F.col("src_a") < F.col("src_b"),
        )
        .select(
            "src_a",
            "src_b",
            F.size("sk_a").alias("n_sk_a"),
            F.size("sk_b").alias("n_sk_b"),
            F.round(
                F.expr(
                    f"size(filter(slice(array_sort(array_union(sk_a, sk_b)),"
                    f" 1, {OVERLAP_K}),"
                    " x -> array_contains(sk_a, x)"
                    " AND array_contains(sk_b, x)))"
                    f" / size(slice(array_sort(array_union(sk_a, sk_b)),"
                    f" 1, {OVERLAP_K}))"
                ),
                6,
            ).alias("jaccard_est"),
        )
        .orderBy("src_a", "src_b")
    )
    return est


# the folded sketch must equal the one-shot sketch (mergeability), so
# the oracle is the batch-side KMV estimate computed straight in SQL
ORACLES["q_stream_source_overlap"] = f"""
    WITH hs AS (
        SELECT DISTINCT source,
               ('0x' || substr(md5(text), 1, 12))::BIGINT AS h
        FROM documents
    ),
    sk AS (
        SELECT source, list_sort(list(h)) AS sk FROM (
            SELECT source, h,
                   row_number() OVER (PARTITION BY source ORDER BY h) AS rn
            FROM hs)
        WHERE rn <= {OVERLAP_K} GROUP BY source
    )
    SELECT a.source AS src_a, b.source AS src_b,
           CAST(len(a.sk) AS INT) AS n_sk_a,
           CAST(len(b.sk) AS INT) AS n_sk_b,
           round(len(list_filter(
                     list_sort(list_distinct(a.sk || b.sk))[1:{OVERLAP_K}],
                     x -> list_contains(a.sk, x)
                          AND list_contains(b.sk, x))) * 1.0
                 / len(list_sort(list_distinct(a.sk || b.sk))[1:{OVERLAP_K}]),
                 6) AS jaccard_est
    FROM sk a JOIN sk b ON a.source < b.source
    ORDER BY src_a, src_b
"""

QUERIES["q_dist_rank"] = q_dist_rank
QUERIES["q_corpus_card"] = q_corpus_card
QUERIES["q_source_overlap"] = q_source_overlap
QUERIES["q_stream_source_overlap"] = q_stream_source_overlap
