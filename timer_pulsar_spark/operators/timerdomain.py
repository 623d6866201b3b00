"""The timer domain — cron expansion, task fan-out, and idempotent
materialization: the defining write-side capabilities of the reference.

Reference parity (file:line into /root/reference):
- T1 cron expansion  -> gotimer_web/pkg/cron/parser.go:40-61 (NextsBetween),
  reproduced by functions/cron.py incl. the last-element-may-exceed-end
  quirk.
- T4 task fan-out    -> gotimer_web/common/model/po/timer.go:24-35
  (BatchTasksFromTimer): timer x expansion -> task rows with
  status=NotRunned; here `explode(cron_next_times(...))`.
- T9 materialization -> gotimer_web/service/migrator/worker.go:54-76:
  enabled timers -> expand next window -> batch-insert tolerating
  duplicates (T14, pkg/mysql/mysql.go:54-57 swallows error 1062 on the
  UNIQUE (timer_id, run_timer) key, task.sql:14). MERGE-WHEN-NOT-MATCHED
  semantics == left-anti join + union, which is parquet-safe (SURVEY
  §7.5 risk 4).

The driver's testdata has no timers table, so the oracle-checkable
queries derive deterministic timer definitions from the `nation` and
`region` dimensions (tiny, broadcast-sized). The fan-out itself is a
narrow explode — no shuffle; at 100 TB of tasks the expansion cost is
linear in output rows and embarrassingly parallel, and the dedup MERGE
shuffles once on the unique key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.cron import cron_is_valid, cron_next_times
from ..schemas import TASK_NOT_RUNNED

WINDOW_START = "2024-01-01 00:00:00"
WINDOW_END_1H = "2024-01-01 01:00:00"
WINDOW_END_3D = "2024-01-04 00:00:00"


def minute_timers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic every-k-minutes timer definitions derived from
    nation: timer_id = n_nationkey, cron = '*/k * * * *', k in 1..10."""
    n = load_table(spark, sf_dir, "nation")
    k = 1 + F.col("n_nationkey") % 10
    return n.select(
        F.col("n_nationkey").alias("timer_id"),
        F.concat(F.lit("*/"), k.cast("string"), F.lit(" * * * *")).alias("cron"),
    )


def daily_timers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily 'm h * * *' timers derived from nation."""
    n = load_table(spark, sf_dir, "nation")
    h = F.col("n_nationkey") % 24
    m = (F.col("n_nationkey") * 7) % 60
    return n.select(
        F.col("n_nationkey").alias("timer_id"),
        F.concat(
            m.cast("string"), F.lit(" "), h.cast("string"), F.lit(" * * *")
        ).alias("cron"),
    )


def fan_out(timers: DataFrame, start: str, end: str) -> DataFrame:
    """BatchTasksFromTimer (po/timer.go:24-35): one task row per trigger
    instant, status=NotRunned. explode() keeps this narrow — the only
    wide operation in the whole materialization is the later MERGE."""
    expanded = timers.withColumn(
        "nexts",
        cron_next_times(
            # NTZ wall-clock bounds: session-timezone-free, matching the
            # NTZ-typed cron UDFs and the DuckDB oracle's naive timestamps
            F.col("cron"),
            F.lit(start).cast("timestamp_ntz"),
            F.lit(end).cast("timestamp_ntz"),
        ),
    )
    return expanded.select(
        "timer_id",
        F.explode("nexts").alias("run_timer"),
        F.lit(TASK_NOT_RUNNED).alias("status"),
    )


def merge_upsert(existing: DataFrame, incoming: DataFrame, keys: list[str]) -> DataFrame:
    """MERGE ... WHEN NOT MATCHED THEN INSERT as a parquet-safe plan:
    existing rows win; incoming rows survive only if their key is new
    (the reference's duplicate-1062 tolerance, mysql.go:54-57). One
    shuffle on the merge key; the anti-join side carries only keys."""
    fresh = incoming.join(existing.select(*keys), keys, "left_anti")
    return existing.unionByName(fresh)


def q_fanout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[Q-fanout] T1+T4: every-k-minutes expansion over one hour. Output
    includes the boundary trigger at 01:00 (the NextsBetween quirk)."""
    return fan_out(minute_timers(spark, sf_dir), WINDOW_START, WINDOW_END_1H)


def q_fanout_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T1+T4 at daily granularity over a 3-day window (plus boundary)."""
    return fan_out(daily_timers(spark, sf_dir), WINDOW_START, WINDOW_END_3D).select(
        "timer_id", "run_timer"
    )


def q_cron_valid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[Q-cron-valid] T2: IsValidCronExpr (parser.go:16-19) over derived
    expressions — '*/0' (zero step) and bare region names are invalid."""
    r = load_table(spark, sf_dir, "region")
    exprs = r.select(
        F.concat(F.lit("*/"), F.col("r_regionkey").cast("string"), F.lit(" * * * *")).alias(
            "expr"
        )
    ).unionByName(r.select(F.col("r_name").alias("expr")))
    return exprs.select("expr", cron_is_valid(F.col("expr")).alias("valid"))


def q_materialize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T9+T14: idempotent materialization. A prior partial run created
    tasks for timers 0-9; the full migrator run re-expands everything —
    the MERGE keeps exactly one row per (timer_id, run_timer)."""
    timers = minute_timers(spark, sf_dir)
    prior = fan_out(timers.filter(F.col("timer_id") < 10), WINDOW_START, WINDOW_END_1H)
    full = fan_out(timers, WINDOW_START, WINDOW_END_1H)
    return merge_upsert(prior, full, ["timer_id", "run_timer"])


def q_cron_next(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T3 NextFromNow (parser.go:21-33) with a pinned 'now': the next
    trigger of each every-k-minutes timer strictly after
    2024-06-15 12:34:56 — the next minute > 34 divisible by k, or the
    top of the next hour."""
    from ..functions.cron import cron_next_after

    timers = minute_timers(spark, sf_dir)
    return timers.select(
        "timer_id",
        cron_next_after(
            F.col("cron"), F.lit("2024-06-15 12:34:56").cast("timestamp_ntz")
        ).alias("next_run"),
    )


def q_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4 raw SQL scan (dao/task/task.go:55-59 + dao/task/sql.go:3):
    the reference's one literal SQL statement — LEFT(run_timer,16)
    minute-count — submitted through spark.sql() over registered views
    instead of the DataFrame API."""
    from ..catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT substring(date_format(ts, 'yyyy-MM-dd HH:mm:ss'), 1, 16) AS minute,
               count(*) AS cnt
        FROM events
        WHERE ts >= TIMESTAMP_NTZ '2024-01-02 00:00:00'
          AND ts <  TIMESTAMP_NTZ '2024-01-05 00:00:00'
        GROUP BY substring(date_format(ts, 'yyyy-MM-dd HH:mm:ss'), 1, 16)
        """
    )


ORACLES: dict[str, str] = {
    "q_cron_next": """
        SELECT n_nationkey AS timer_id,
               CASE WHEN ((34 // (1 + n_nationkey % 10)) + 1) * (1 + n_nationkey % 10) <= 59
                    THEN TIMESTAMP '2024-06-15 12:00:00'
                         + (((34 // (1 + n_nationkey % 10)) + 1) * (1 + n_nationkey % 10))
                           * INTERVAL 1 MINUTE
                    ELSE TIMESTAMP '2024-06-15 13:00:00'
               END AS next_run
        FROM nation
    """,
    "q_sql": """
        SELECT substr(strftime(ts, '%Y-%m-%d %H:%M:%S'), 1, 16) AS minute, count(*) AS cnt
        FROM events
        WHERE ts >= TIMESTAMP '2024-01-02' AND ts < TIMESTAMP '2024-01-05'
        GROUP BY 1
    """,
    "q_fanout": f"""
        SELECT n_nationkey AS timer_id,
               TIMESTAMP '{WINDOW_START}' + m * INTERVAL 1 MINUTE AS run_timer,
               0 AS status
        FROM nation, generate_series(1, 59) s(m)
        WHERE m % (1 + n_nationkey % 10) = 0
        UNION ALL
        SELECT n_nationkey, TIMESTAMP '{WINDOW_END_1H}', 0 FROM nation
    """,
    "q_fanout_daily": f"""
        SELECT n_nationkey AS timer_id,
               TIMESTAMP '{WINDOW_START}' + d * INTERVAL 1 DAY
                 + (n_nationkey % 24) * INTERVAL 1 HOUR
                 + ((n_nationkey * 7) % 60) * INTERVAL 1 MINUTE AS run_timer
        FROM nation, generate_series(0, 3) s(d)
        WHERE run_timer > TIMESTAMP '{WINDOW_START}'
    """,
    "q_cron_valid": """
        SELECT expr, CASE WHEN expr LIKE '*/%' AND expr <> '*/0 * * * *'
                          THEN true ELSE false END AS valid
        FROM (
            SELECT '*/' || r_regionkey || ' * * * *' AS expr FROM region
            UNION ALL
            SELECT r_name FROM region
        )
    """,
    "q_materialize": f"""
        SELECT DISTINCT n_nationkey AS timer_id,
               TIMESTAMP '{WINDOW_START}' + m * INTERVAL 1 MINUTE AS run_timer,
               0 AS status
        FROM nation, generate_series(1, 59) s(m)
        WHERE m % (1 + n_nationkey % 10) = 0
        UNION
        SELECT n_nationkey, TIMESTAMP '{WINDOW_END_1H}', 0 FROM nation
    """,
}

QUERIES = {
    name: fn
    for name, fn in list(globals().items())
    if callable(fn) and name.startswith("q_")
}
