"""Registered query wrapping the full streaming pipeline (entry point
B) hermetically: fan out due tasks (with injected duplicates — the
at-least-once delivery contract), stream them through watermark + dedup
+ enabled-dim join + mock executor, MERGE status back, and return the
final status table.

With the deterministic mock transport the whole run is reproducible, so
it registers WITH an oracle (expected = enabled timers x trigger
instants, all Successed with the mock body); cost_time/delay_ms are
wall-clock and excluded from the returned columns so the result stays
deterministic. tests/test_streaming.py additionally asserts the
exactly-once-effective semantics in detail.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import TIMER_ENABLED, TIMER_UNABLED
from ..streaming.pipeline import run_pipeline_blocking
from .timerdomain import WINDOW_END_1H, WINDOW_START, fan_out, minute_timers
from ..streaming.state import replay_workdir


def demo_timers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timer definitions with notify params; odd nation keys are
    disabled to exercise the fire-time enabled check (T16)."""
    base = minute_timers(spark, sf_dir)
    return base.select(
        F.col("timer_id").cast("long").alias("id"),
        F.lit("demo").alias("app"),
        F.concat(F.lit("timer_"), F.col("timer_id")).alias("name"),
        F.when(F.col("timer_id") % 2 == 0, F.lit(TIMER_ENABLED))
        .otherwise(F.lit(TIMER_UNABLED))
        .alias("status"),
        "cron",
        F.struct(
            F.lit("POST").alias("method"),
            F.lit("http://localhost/api/mock/v1/mock").alias("url"),
            F.create_map(F.lit("content-type"), F.lit("application/json")).alias("header"),
            F.lit('{"ping":1}').alias("body"),
        ).alias("notify_http_param"),
    )


def q_stream_execute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end pipeline run in temp dirs. Input tasks are doubled
    (unionAll with itself) to inject duplicates; output must hold one
    Successed row per (enabled timer, trigger instant)."""
    work = replay_workdir("stream_exec")
    tasks_dir = os.path.join(work, "tasks")
    status_path = os.path.join(work, "status")
    ckpt = os.path.join(work, "ckpt")

    from ..functions.timeutil import as_utc_instant

    fanned = fan_out(minute_timers(spark, sf_dir), WINDOW_START, WINDOW_END_1H)
    # NTZ cron wall-clock -> LTZ UTC instant for the stream's event time
    tasks = fanned.select(
        F.col("timer_id").cast("long"),
        as_utc_instant(fanned, "run_timer").alias("run_timer"),
        "status",
    )
    tasks.unionAll(tasks).write.mode("overwrite").parquet(tasks_dir)

    from ..streaming import replay_state_partitions

    with replay_state_partitions(spark):
        run_pipeline_blocking(
            spark, tasks_dir, demo_timers(spark, sf_dir), status_path, ckpt
        )
    # run_timer -> NTZ at the boundary (session-TZ-free UTC wall-clock
    # rendering): the pipeline's internal event time is LTZ because
    # watermarks require it; the oracle compares naive timestamps
    from ..functions.timeutil import utc_wallclock_ntz

    return spark.read.parquet(status_path).select(
        "timer_id",
        utc_wallclock_ntz(F.col("run_timer")).alias("run_timer"),
        "status",
        "output",
    )


def q_stream_cdf_consume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CHANGE-DATA-FEED consumer proof: run the same hermetic
    pipeline (duplicates injected) with ``changes_out`` wired, then
    reconstruct the status table FROM THE FEED ALONE — fold the
    cv-ordered insert/update_postimage entries, last write per key
    wins — and return it. Registered with q_stream_execute's oracle:
    a downstream incremental consumer that only ever tails the feed
    must converge to exactly the table the merges built. This is the
    contract that lets a search indexer / cache / SCD2 fold sync at
    O(changes) per batch instead of re-diffing a 100 TB table."""
    from pyspark.sql.window import Window

    work = replay_workdir("stream_cdf")
    tasks_dir = os.path.join(work, "tasks")
    status_path = os.path.join(work, "status")
    ckpt = os.path.join(work, "ckpt")
    feed_dir = os.path.join(work, "feed")

    from ..functions.timeutil import as_utc_instant, utc_wallclock_ntz

    fanned = fan_out(minute_timers(spark, sf_dir), WINDOW_START, WINDOW_END_1H)
    tasks = fanned.select(
        F.col("timer_id").cast("long"),
        as_utc_instant(fanned, "run_timer").alias("run_timer"),
        "status",
    )
    tasks.unionAll(tasks).write.mode("overwrite").parquet(tasks_dir)

    from ..streaming import replay_state_partitions

    with replay_state_partitions(spark):
        run_pipeline_blocking(
            spark,
            tasks_dir,
            demo_timers(spark, sf_dir),
            status_path,
            ckpt,
            changes_out=feed_dir,
        )
    feed = spark.read.parquet(feed_dir)
    w = Window.partitionBy("timer_id", "run_timer").orderBy(F.col("cv").desc())
    state = (
        feed.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
    )
    return state.select(
        "timer_id",
        utc_wallclock_ntz(F.col("run_timer")).alias("run_timer"),
        "status",
        "output",
    )


QUERIES = {
    "q_stream_execute": q_stream_execute,
    "q_stream_cdf_consume": q_stream_cdf_consume,
}
# The mock pipeline is deterministic end-to-end: enabled (even-keyed)
# timers x their trigger instants, every callback Successed with the
# reference mock body (app/webserver/app.go:87-95), duplicates collapsed
# by watermark dedup + MERGE. That makes the full streaming run
# ORACLE-checkable — the strongest correctness gate a streaming pipeline
# can have short of a broker integration test.
ORACLES: dict[str, str] = {
    "q_stream_execute": f"""
        SELECT CAST(n_nationkey AS BIGINT) AS timer_id,
               TIMESTAMP '{WINDOW_START}' + m * INTERVAL 1 MINUTE AS run_timer,
               2 AS status,
               '{{"word": "hello world!"}}' AS output
        FROM nation, generate_series(1, 59) s(m)
        WHERE n_nationkey % 2 = 0 AND m % (1 + n_nationkey % 10) = 0
        UNION ALL
        SELECT CAST(n_nationkey AS BIGINT), TIMESTAMP '{WINDOW_END_1H}', 2,
               '{{"word": "hello world!"}}'
        FROM nation WHERE n_nationkey % 2 = 0
    """,
}
# the feed-reconstructed table must equal the merged table
ORACLES["q_stream_cdf_consume"] = ORACLES["q_stream_execute"]
