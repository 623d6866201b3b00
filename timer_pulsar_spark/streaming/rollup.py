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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .sessionize import SENTINEL_TS
from .state import replay_workdir


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

    work = replay_workdir("stream_rollup")
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

    from . import await_or_raise, replay_state_partitions

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
            await_or_raise(q, 120)
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


def q_stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental sessionization with the NATIVE streaming
    session_window — the streaming twin of timeseries.q_session_window,
    ORACLE-checked: replay the events table as a time-ordered
    multi-batch file stream; open sessions live in the state store and
    MERGE as later batches extend them, and append mode emits each
    session exactly once when the watermark passes its end (the
    sentinel row closes the last ones). This is the managed-state
    alternative to the applyInPandasWithState sessionizer
    (sessionize.py): no user code holds state, and state size is
    O(open sessions), not history.

    Arrival is range-split by ts with explicit monotonic file mtimes,
    so a session extended across batches genuinely exercises the state
    MERGE instead of finalizing in one batch."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ..catalog import load_table
    from ..functions.timeutil import as_utc_instant, utc_wallclock_ntz

    work = replay_workdir("stream_sw")
    in_dir = os.path.join(work, "events")
    os.makedirs(in_dir)
    out_dir = os.path.join(work, "sessions")
    ckpt = os.path.join(work, "ckpt")

    from . import stage_range_split

    ev = load_table(spark, sf_dir, "events")
    # distributed arrival staging (range exchange, no driver
    # materialization) with explicit monotonic mtimes
    stage_range_split(
        ev.select(
            "user_id", as_utc_instant(ev, "ts").alias("ts"), "value", "event_id"
        ),
        in_dir,
        6,
        ["ts", "event_id"],
    )
    # sentinel: one far-future row pushes the closing watermark past
    # every real session (dropped from the result by user_id)
    sent = pa.table(
        {
            "user_id": pa.array([-1], pa.int64()),
            "ts": pa.array(
                [pd.Timestamp(SENTINEL_TS, tz="UTC")], pa.timestamp("us", tz="UTC")
            ),
            "value": pa.array([0.0], pa.float64()),
            "event_id": pa.array([-1], pa.int64()),
        }
    )
    fp = os.path.join(in_dir, "part-zz-sentinel.parquet")
    pq.write_table(sent, fp)
    os.utime(fp, (1_700_000_100, 1_700_000_100))

    from . import await_or_raise, replay_state_partitions

    with replay_state_partitions(spark):
        stream = (
            spark.readStream.schema(
                "user_id long, ts timestamp, value double, event_id long"
            )
            .option("maxFilesPerTrigger", "2")  # 7 files -> 4 real batches
            .parquet(in_dir)
            .withWatermark("ts", "1 minute")
        )
        sessions = (
            stream.groupBy("user_id", F.session_window("ts", "30 minutes"))
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.round(F.sum("value"), 4).alias("session_value"),
            )
            .select(
                "user_id",
                utc_wallclock_ntz(F.col("session_window.start")).alias(
                    "session_start"
                ),
                utc_wallclock_ntz(F.col("session_window.end")).alias(
                    "session_end"
                ),
                "n_events",
                "session_value",
            )
        )
        q = (
            sessions.writeStream.outputMode("append")
            .format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        try:
            await_or_raise(q, 180)
        finally:
            if q.isActive:
                q.stop()
    return spark.read.parquet(out_dir).filter(F.col("user_id") >= 0)


import pandas as pd  # noqa: E402  (used by the replay writer above)

QUERIES["q_stream_session_window"] = q_stream_session_window
# the streamed sessions must equal the one-shot native session_window
# aggregation (same semantics, same oracle)
from ..operators.timeseries import ORACLES as _TS_ORACLES  # noqa: E402

ORACLES["q_stream_session_window"] = _TS_ORACLES["q_session_window"]


def q_stream_hopping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental hopping-window aggregation — the streaming twin of
    timeseries.q_hopping_window, ORACLE-checked: the same native
    window-with-slide expression under a watermark; every event feeds
    TWO overlapping open windows in the state store, append mode emits
    each window exactly once when the watermark passes its end, and
    the sentinel row closes the last ones. Completes the streaming
    window family next to the tumbling rollup and the merging session
    windows."""
    from ..catalog import load_table
    from ..functions.timeutil import as_utc_instant, utc_wallclock_ntz

    work = replay_workdir("stream_hop")
    in_dir = os.path.join(work, "events")
    out_dir = os.path.join(work, "hopping")
    ckpt = os.path.join(work, "ckpt")

    ev = load_table(spark, sf_dir, "events")
    ev.select(
        as_utc_instant(ev, "ts").alias("ts"), "value"
    ).write.mode("overwrite").parquet(in_dir)
    sent = spark.range(1).select(
        F.lit(SENTINEL_TS).cast("timestamp_ntz").alias("ts"),
        F.lit(0.0).alias("value"),
    )
    sent.select(as_utc_instant(sent, "ts").alias("ts"), "value").write.mode(
        "append"
    ).parquet(in_dir)

    from . import await_or_raise, replay_state_partitions

    with replay_state_partitions(spark):
        stream = (
            spark.readStream.schema("ts timestamp, value double")
            .parquet(in_dir)
            .withWatermark("ts", "1 minute")
        )
        agg = (
            stream.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"))
            .agg(
                F.count(F.lit(1)).alias("cnt"),
                F.round(F.sum("value"), 4).alias("sum_value"),
            )
            .select(
                utc_wallclock_ntz(F.col("w.start")).alias("w_start"),
                "cnt",
                "sum_value",
            )
        )
        q = (
            agg.writeStream.outputMode("append")
            .format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        try:
            await_or_raise(q, 120)
        finally:
            if q.isActive:
                q.stop()
    # drop the sentinel's own two windows
    return spark.read.parquet(out_dir).filter(F.col("w_start") < "2029-01-01")


QUERIES["q_stream_hopping"] = q_stream_hopping
from ..operators.timeseries import ORACLES as _TS_ORACLES2  # noqa: E402

ORACLES["q_stream_hopping"] = _TS_ORACLES2["q_hopping_window"]
