"""Stream-stream interval join: click -> purchase attribution within a
6-hour window, both sides watermarked so join state is bounded.

This is the streaming operator class the reference's trigger/scheduler
pair approximates with its 1-minute slice replay (gotimer_trigger/
service/trigger/worker.go polling a time range per partition): two
unbounded inputs correlated on key + event-time range. Structured
Streaming holds each side's rows in state only until the other side's
watermark passes the end of the range condition — state is
O(events per attribution horizon), independent of stream length.

Unlike most streaming operators, the inner interval join's result is
deterministic and SQL-expressible, so the registered query is fully
ORACLE-checked (not rows-only): the replay through real micro-batch
execution must byte-match the ANSI self-join.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from .state import replay_workdir

# 6 h attribution horizon: wide enough that the synthetic event stream
# (sparse per-user activity) produces non-trivial matches at every SF
ATTRIB_WINDOW_MIN = 360


def attribution_join(clicks: DataFrame, purchases: DataFrame) -> DataFrame:
    """clicks(click_user, click_id, click_ts) x purchases(purchase_user,
    purchase_id, purchase_ts) -> matches within [0, 10 min]. Works on
    both batch and streaming DataFrames (the streaming case needs
    watermarks set by the caller)."""
    from ..functions.timeutil import epoch_micros

    joined = clicks.join(
        purchases,
        F.expr(
            f"""click_user = purchase_user
            AND purchase_ts >= click_ts
            AND purchase_ts <= click_ts + INTERVAL {ATTRIB_WINDOW_MIN} MINUTES"""
        ),
    )
    return joined.select(
        F.col("click_user").alias("user_id"),
        F.col("click_id").alias("click_event_id"),
        F.col("purchase_id").alias("purchase_event_id"),
        (epoch_micros(joined, "purchase_ts") - epoch_micros(joined, "click_ts")).alias("gap_us"),
    )


def _side(spark: SparkSession, sf_dir: str, event_type: str, prefix: str,
          work: str, sentinel: bool = False) -> DataFrame:
    from ..catalog import load_table
    from ..functions.timeutil import as_utc_instant

    path = os.path.join(work, prefix)
    ev = load_table(spark, sf_dir, "events")
    # NTZ wall-clock -> LTZ UTC instant at the staging boundary
    # (watermarks accept only LTZ; a bare cast would bind to session TZ)
    staged = ev.filter(
        (F.col("event_type") == event_type)
        & (F.col("ts") >= "2024-01-01")
        & (F.col("ts") < "2024-01-08")
    ).select(
        F.col("user_id").alias(f"{prefix}_user"),
        F.col("event_id").alias(f"{prefix}_id"),
        as_utc_instant(ev, "ts").alias(f"{prefix}_ts"),
    )
    if sentinel:
        # ONE real file: with maxFilesPerTrigger=1 each file is its own
        # batch, and real rows split across batches would be dropped by
        # the watermark the earlier real batch advanced
        staged = staged.coalesce(1)
    staged.write.mode("overwrite").parquet(path)
    if sentinel:
        # TWO far-future rows (user -1) in their own successive batches
        # (explicit mtimes + maxFilesPerTrigger=1 below): outer interval
        # joins emit a null row only when the watermark proves no match
        # can still arrive, and the watermark advanced by batch K's data
        # is APPLIED in batch K+1 — so the first sentinel pushes the
        # watermark past every real window and the second provides the
        # data batch in which the eviction actually runs (stream-stream
        # joins get no final no-data cleanup batch, unlike windowed
        # aggregations). Sentinels drop from the result by user filter.
        import glob

        import pyarrow as pa
        import pyarrow.parquet as pq

        for fp in glob.glob(os.path.join(path, "part-*.parquet")):
            os.utime(fp, (1_700_000_000, 1_700_000_000))
        for j, year in enumerate((2098, 2099)):
            tbl = pa.table(
                {
                    f"{prefix}_user": pa.array([-1], pa.int64()),
                    f"{prefix}_id": pa.array([-1], pa.int64()),
                    f"{prefix}_ts": pa.array(
                        [pd_timestamp_utc(year)], pa.timestamp("us", tz="UTC")
                    ),
                }
            )
            fp = os.path.join(path, f"zz-sentinel-{j}.parquet")
            pq.write_table(tbl, fp)
            os.utime(fp, (1_700_000_100 + j, 1_700_000_100 + j))
    reader = spark.readStream.schema(
        f"{prefix}_user long, {prefix}_id long, {prefix}_ts timestamp"
    )
    if sentinel:
        # real files share one mtime (one batch); each sentinel is a
        # later batch of its own
        reader = reader.option("maxFilesPerTrigger", "1")
    return reader.parquet(path).withWatermark(f"{prefix}_ts", "1 minute")


def pd_timestamp_utc(year: int):
    import pandas as pd

    return pd.Timestamp(f"{year}-01-01", tz="UTC")


def q_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered query: replay the first week of clicks and purchases
    as two file streams through the watermarked interval join; the
    parquet sink then holds exactly the batch self-join's rows."""
    from . import await_or_raise, replay_state_partitions

    work = replay_workdir("stream_join")
    out_dir = os.path.join(work, "out")
    ckpt = os.path.join(work, "ckpt")

    with replay_state_partitions(spark):
        joined = attribution_join(
            _side(spark, sf_dir, "click", "click", work),
            _side(spark, sf_dir, "purchase", "purchase", work),
        )
        q = (
            joined.writeStream.outputMode("append")
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
    return spark.read.parquet(out_dir)


def q_stream_join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER watermarked interval join — the unattributed-clicks
    shape, and the state-eviction semantics inner joins never exercise:
    a click is held in state until the purchase-side watermark proves
    no match can still arrive inside its attribution window, and ONLY
    THEN emits its null row (emitting earlier would be wrong, never
    emitting would leak state). Far-future sentinel rows on both sides
    close the final windows so the replay is complete and
    deterministic — which makes even the OUTER join fully
    ORACLE-checked against the ANSI LEFT JOIN."""
    from ..functions.timeutil import epoch_micros
    from . import await_or_raise, replay_state_partitions

    work = replay_workdir("stream_joino")
    out_dir = os.path.join(work, "out")
    ckpt = os.path.join(work, "ckpt")

    with replay_state_partitions(spark):
        clicks = _side(spark, sf_dir, "click", "click", work, sentinel=True)
        purchases = _side(
            spark, sf_dir, "purchase", "purchase", work, sentinel=True
        )
        joined = clicks.join(
            purchases,
            F.expr(
                f"""click_user = purchase_user
                AND purchase_ts >= click_ts
                AND purchase_ts <= click_ts + INTERVAL {ATTRIB_WINDOW_MIN} MINUTES"""
            ),
            "left_outer",
        )
        # NOTE: the sentinel filter must NOT appear in the streaming
        # plan — Catalyst pushes `click_user >= 0` below the
        # EventTimeWatermark node, the sentinel rows then never reach
        # the watermark accumulator, and the click-side watermark stays
        # at the real data's max: trailing unmatched clicks would never
        # emit. Sentinels are dropped on the batch read instead.
        result = joined.select(
            F.col("click_user").alias("user_id"),
            F.col("click_id").alias("click_event_id"),
            F.col("purchase_id").alias("purchase_event_id"),
            (
                epoch_micros(joined, "purchase_ts")
                - epoch_micros(joined, "click_ts")
            ).alias("gap_us"),
        )
        q = (
            result.writeStream.outputMode("append")
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


QUERIES = {"q_stream_join": q_stream_join, "q_stream_join_outer": q_stream_join_outer}
ORACLES: dict[str, str] = {
    "q_stream_join": f"""
        SELECT c.user_id,
               c.event_id AS click_event_id,
               p.event_id AS purchase_event_id,
               epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
        FROM events c
        JOIN events p
          ON p.user_id = c.user_id
         AND p.ts >= c.ts
         AND p.ts <= c.ts + INTERVAL {ATTRIB_WINDOW_MIN} MINUTE
        WHERE c.event_type = 'click' AND p.event_type = 'purchase'
          AND c.ts >= '2024-01-01' AND c.ts < '2024-01-08'
          AND p.ts >= '2024-01-01' AND p.ts < '2024-01-08'
    """,
    # LEFT JOIN twin: purchase-side predicates live in the ON clause so
    # unmatched clicks survive with nulls — exactly the streaming outer
    # join's emit-on-watermark rows
    "q_stream_join_outer": f"""
        SELECT c.user_id,
               c.event_id AS click_event_id,
               p.event_id AS purchase_event_id,
               epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
        FROM events c
        LEFT JOIN events p
          ON p.user_id = c.user_id
         AND p.ts >= c.ts
         AND p.ts <= c.ts + INTERVAL {ATTRIB_WINDOW_MIN} MINUTE
         AND p.event_type = 'purchase'
         AND p.ts >= '2024-01-01' AND p.ts < '2024-01-08'
        WHERE c.event_type = 'click'
          AND c.ts >= '2024-01-01' AND c.ts < '2024-01-08'
    """,
}
