"""Registered query wrapping the full streaming pipeline (entry point
B) hermetically: fan out due tasks (with injected duplicates — the
at-least-once delivery contract), stream them through watermark + dedup
+ enabled-dim join + mock executor, MERGE status back, and return the
final status table.

Not SQL-expressible (stateful streaming + side-effecting executor) →
registered without an oracle; the driver records the rows-only check
and tests/test_streaming.py asserts the exactly-once-effective
semantics in detail. cost_time is wall-clock and excluded from the
returned columns so the result stays deterministic.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import TIMER_ENABLED, TIMER_UNABLED
from ..streaming.pipeline import run_pipeline_blocking
from .timerdomain import WINDOW_END_1H, WINDOW_START, fan_out, minute_timers


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
    work = tempfile.mkdtemp(prefix="stream_exec_")
    tasks_dir = os.path.join(work, "tasks")
    status_path = os.path.join(work, "status")
    ckpt = os.path.join(work, "ckpt")

    tasks = fan_out(minute_timers(spark, sf_dir), WINDOW_START, WINDOW_END_1H).select(
        F.col("timer_id").cast("long"), "run_timer", "status"
    )
    tasks.unionAll(tasks).write.mode("overwrite").parquet(tasks_dir)

    run_pipeline_blocking(
        spark, tasks_dir, demo_timers(spark, sf_dir), status_path, ckpt
    )
    return spark.read.parquet(status_path).select(
        "timer_id", "run_timer", "status", "output"
    )


QUERIES = {"q_stream_execute": q_stream_execute}
ORACLES: dict[str, str] = {}
