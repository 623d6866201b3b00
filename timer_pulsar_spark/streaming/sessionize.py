"""Custom stateful streaming operator: session windows with an
inactivity gap, held as explicit per-key state via
``applyInPandasWithState`` (the arbitrary-state surface — the same hook
a CEP rule, per-entity accumulator, or custom windowing scheme would
use when ``session_window``/watermark aggregation can't express it).

Semantics match the batch ``timeseries.q_sessionize`` (gap > 30 min
starts a new session per user): sessions that close *inside* the data
(a later event arrives past the gap) emit immediately; the trailing
open session per user sits in state with an event-time timeout at
``last_seen + gap`` and flushes when the watermark passes it. State per
key is three scalars (start, last, count) — microscopic at any scale —
and the operator shuffles once on the grouping key, exactly like the
batch window version.

Cross-check: tests/test_streaming.py asserts the streamed session
multiset {(user_id, n_events)} equals the batch q_sessionize output at
the same scale factor.
"""

from __future__ import annotations

import os
from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from .state import replay_workdir

SESSION_GAP_MINUTES = 30
_GAP_US = SESSION_GAP_MINUTES * 60 * 1_000_000

OUT_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, n_events int"
)
STATE_SCHEMA = "start long, last long, n int"  # epoch micros + count

# far past every testdata event: pushes the final watermark beyond all
# open-session timeouts so availableNow drains every session
SENTINEL_TS = "2030-01-01 00:00:00"


def _sessionize_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: Any
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    closed: list[tuple[int, int, int, int]] = []  # (user, start, last, n)

    if state.hasTimedOut:
        start, last, n = state.get
        closed.append((user_id, start, last, n))
        state.remove()
    else:
        start = last = n = None
        if state.exists:
            start, last, n = state.get
        ts_us = sorted(
            int(t) for pdf in pdfs for t in pdf["ts"].astype("int64") // 1000
        )
        for t in ts_us:
            if start is None:
                start, last, n = t, t, 1
            elif t - last <= _GAP_US:
                last, n = t, n + 1
            else:
                closed.append((user_id, start, last, n))
                start, last, n = t, t, 1
        if start is not None:
            state.update((start, last, n))
            # event-time timeout (ms): fire once the watermark passes
            # the gap after the last event
            state.setTimeoutTimestamp((last + _GAP_US) // 1000)

    yield pd.DataFrame(
        {
            "user_id": pd.Series([c[0] for c in closed], dtype="int64"),
            "session_start": pd.to_datetime([c[1] for c in closed], unit="us"),
            "session_end": pd.to_datetime([c[2] for c in closed], unit="us"),
            "n_events": pd.Series([c[3] for c in closed], dtype="int32"),
        }
    )


def sessionize_stream(events_stream: DataFrame) -> DataFrame:
    """events (user_id, ts) stream -> closed-session stream."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    return events_stream.groupBy("user_id").applyInPandasWithState(
        _sessionize_fn,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def q_stream_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered ORACLE-CHECKED query: replay the events table through
    the stateful sessionizer. The input is staged to a temp dir with
    clean microsecond timestamps plus one far-future sentinel row that
    drives the closing watermark past every open session. The closed
    sessions are deterministic (gap rule over a bounded replay), so the
    real micro-batch execution must byte-match the ANSI window-function
    sessionization the oracle runs."""
    from ..catalog import load_table

    work = replay_workdir("stream_sess")
    in_dir = os.path.join(work, "events")
    out_dir = os.path.join(work, "sessions")
    ckpt = os.path.join(work, "ckpt")

    from ..functions.timeutil import as_utc_instant, utc_wallclock_ntz

    # NTZ wall-clock -> LTZ UTC instant at the staging boundary: Spark
    # event time/watermarks accept only LTZ. The sentinel takes the same
    # session-TZ-free route; outputs convert back to NTZ at the end.
    ev = load_table(spark, sf_dir, "events")
    ev.select("user_id", as_utc_instant(ev, "ts").alias("ts")).write.mode(
        "overwrite"
    ).parquet(in_dir)
    sent = spark.createDataFrame([(-1,)], "user_id long").withColumn(
        "ts", F.lit(SENTINEL_TS).cast("timestamp_ntz")
    )
    sent.select("user_id", as_utc_instant(sent, "ts").alias("ts")).write.mode(
        "append"
    ).parquet(in_dir)

    from . import await_or_raise, replay_state_partitions

    with replay_state_partitions(spark):
        stream = (
            spark.readStream.schema("user_id long, ts timestamp")
            .parquet(in_dir)
            .withWatermark("ts", "1 minute")
        )
        q = (
            sessionize_stream(stream)
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
    return (
        spark.read.parquet(out_dir)
        .filter(F.col("user_id") >= 0)
        .select(
            "user_id",
            utc_wallclock_ntz(F.col("session_start")).alias("session_start"),
            utc_wallclock_ntz(F.col("session_end")).alias("session_end"),
            "n_events",
        )
    )


QUERIES = {"q_stream_sessionize": q_stream_sessionize}
ORACLES: dict[str, str] = {
    # batch sessionization (same 30-min gap rule) as ANSI window SQL:
    # ties in ts can order either way, but equal timestamps are always
    # gap 0 (same session), so start/end/count are order-independent
    "q_stream_sessionize": """
        WITH ordered AS (
            SELECT user_id, ts,
                   lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
            FROM events
        ), flagged AS (
            SELECT user_id, ts,
                   CASE WHEN prev_ts IS NULL
                             OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000
                        THEN 1 ELSE 0 END AS new_s
            FROM ordered
        ), numbered AS (
            SELECT user_id, ts,
                   sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS s
            FROM flagged
        )
        SELECT user_id,
               min(ts) AS session_start,
               max(ts) AS session_end,
               CAST(count(*) AS INTEGER) AS n_events
        FROM numbered
        GROUP BY user_id, s
    """,
}
