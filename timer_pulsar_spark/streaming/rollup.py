"""Continuous aggregate (hypertable-rollup shape): the reference's
minute count (gotimer_web/dao/task/sql.go:3) maintained INCREMENTALLY
by a watermarked streaming window aggregation instead of a rescan.

Append output mode emits each 1-minute window exactly once, when the
watermark passes its end — i.e. the rollup table only ever receives
finalized rows, so downstream readers never see a partial minute. At
scale this replaces the "re-aggregate the last N minutes every poll"
pattern with per-window state that is O(open windows x group keys):
the streaming state holds only the minutes still inside the watermark.

The batch twin is timeseries.q_groupby_minute; tests assert the
streamed rollup equals it row-for-row at the same scale factor (the
sentinel row pushes the closing watermark past every real window).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .sessionize import SENTINEL_TS


def rollup_stream(events_stream: DataFrame) -> DataFrame:
    """events (ts) stream -> finalized per-minute counts. Window bounds
    are instants (epoch-aligned minutes); the label renders the UTC
    wall-clock via NTZ so it is session-timezone-free."""
    from ..functions.timeutil import utc_wallclock_ntz

    return (
        events_stream.groupBy(F.window("ts", "1 minute").alias("w"))
        .agg(F.count("*").alias("cnt"))
        .select(
            F.date_format(
                utc_wallclock_ntz(F.col("w.start")), "yyyy-MM-dd HH:mm"
            ).alias("minute"),
            "cnt",
        )
    )


def q_stream_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered ORACLE-CHECKED query: replay the events table through
    the incremental rollup; same filter window and output shape as the
    batch q_groupby_minute, so the finalized windows must equal the
    plain GROUP BY the oracle runs."""
    from ..catalog import load_table

    work = tempfile.mkdtemp(prefix="stream_rollup_")
    in_dir = os.path.join(work, "events")
    out_dir = os.path.join(work, "rollup")
    ckpt = os.path.join(work, "ckpt")

    from ..functions.timeutil import as_utc_instant

    # NTZ wall-clock -> LTZ UTC instant at the staging boundary
    # (watermarks accept only LTZ); labels convert back via NTZ
    ev = load_table(spark, sf_dir, "events")
    ev.filter(
        (F.col("ts") >= "2024-01-01") & (F.col("ts") < "2024-01-08")
    ).select(as_utc_instant(ev, "ts").alias("ts")).write.mode(
        "overwrite"
    ).parquet(in_dir)
    sent = spark.range(1).select(
        F.lit(SENTINEL_TS).cast("timestamp_ntz").alias("ts")
    )
    sent.select(as_utc_instant(sent, "ts").alias("ts")).write.mode(
        "append"
    ).parquet(in_dir)

    from . import replay_state_partitions

    with replay_state_partitions(spark):
        stream = (
            spark.readStream.schema("ts timestamp")
            .parquet(in_dir)
            .withWatermark("ts", "1 minute")
        )
        q = (
            rollup_stream(stream)
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.awaitTermination(120)
        finally:
            if q.isActive:
                q.stop()
    # drop the sentinel's own window
    return spark.read.parquet(out_dir).filter(F.col("minute") < "2024-01-08")


QUERIES = {"q_stream_rollup": q_stream_rollup}
ORACLES: dict[str, str] = {
    # the batch twin of the incremental rollup (q_groupby_minute's
    # window, finalized-rows-only semantics)
    "q_stream_rollup": """
        SELECT strftime(ts, '%Y-%m-%d %H:%M') AS minute, count(*) AS cnt
        FROM events
        WHERE ts >= '2024-01-01' AND ts < '2024-01-08'
        GROUP BY 1
    """,
}
