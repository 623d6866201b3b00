"""Arbitrary stateful processing: per-key typed state maintained across
micro-batches, plus event-time TIMER eviction.

Two operators, both oracle-checked against batch twins:

* ``q_stream_running_agg`` — incremental per-user running totals
  (event count + value sum), the standing-aggregate shape a feature
  store keeps per entity. Because the fold (count/sum) is
  split-independent, the FINAL emission per user must equal the
  one-shot batch GROUP BY.
* ``q_stream_ttl_evict`` — per-user standing totals with a TTL: a key
  idle longer than ``TTL_MINUTES`` is EVICTED by an event-time timer
  (its segment totals emit, state clears, the next event starts a
  fresh fold). This is the state-expiry shape of the reference
  executor's per-key worker state (gotimer_executor/service/executor/
  worker.go:58-146: per-key accumulators dropped when a key goes
  quiet) and exercises the timer/timeout surface of the stateful API:
  segments closed *inside* the data emit inline; trailing open
  segments emit when the watermark passes ``last_seen + TTL``.

Engine choice — documented environment constraint: Spark 4's
``transformWithStateInPandas`` (the successor API) runs a protobuf
state-server protocol between the JVM and a dedicated Python driver
worker; this container has NO ``google.protobuf`` and installs are
prohibited, so every TWS query dies at plan time with
"TransformWithStateInPySpark driver worker exited unexpectedly"
(StateMessage_pb2 -> ImportError). ``transform_with_state_available()``
detects the capability; the TWS ``RunningTotals`` StatefulProcessor is
kept (it is the intended scale path on a real cluster and is
API-complete), but the registered queries execute through
``applyInPandasWithState``, which speaks Arrow only and is fully
testable here. The two APIs hold identical state (a per-key struct)
and shuffle identically (one exchange on the grouping key), so the
plan shape — and the oracle contract — are the same either way.

Scale notes: state is O(distinct keys) scalars, not history; eviction
timers keep the store from accumulating dead keys (exactly why the TTL
variant exists); Arrow batches carry rows into the Python fold (pandas
per key-batch, never per row).
"""

from __future__ import annotations

import os
from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from .state import replay_workdir


def transform_with_state_available() -> bool:
    """True when the transformWithStateInPandas protocol can run: the
    state server requires the protobuf runtime in the PYTHON workers
    (pyspark/sql/streaming/proto/StateMessage_pb2.py). This container
    ships no google.protobuf (verified; installs prohibited), so TWS
    queries crash at plan time — callers must route stateful folds
    through applyInPandasWithState instead."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


# --------------------------------------------------------------------------
# transformWithState scale path (API-complete; ENV-BLOCKED in this
# container — see transform_with_state_available). On a cluster with
# protobuf + RocksDB state store this is the preferred engine: typed
# column-family state, native TTL, and timer callbacks.
# --------------------------------------------------------------------------
try:  # import is protobuf-free; only worker execution needs protobuf
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningTotals(StatefulProcessor):
        """Per-user ValueState fold: (n_events, value_total)."""

        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "totals", "n BIGINT, total DOUBLE"
            )

        def handleInputRows(self, key, rows, timerValues):
            if self._state.exists():
                n, total = self._state.get()
            else:
                n, total = 0, 0.0
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
            self._state.update((n, total))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n": [n], "total": [total]}
            )

        def close(self) -> None:
            pass

except ImportError:  # pragma: no cover - stateful_processor always ships
    RunningTotals = None  # type: ignore[assignment]


def running_totals_tws(stream: DataFrame) -> DataFrame:
    """transformWithStateInPandas wiring for RunningTotals. Raises a
    documented error where the protocol cannot run (no protobuf);
    kept as the scale path + capability probe, NOT registered."""
    if not transform_with_state_available():
        raise EnvironmentError(
            "transformWithStateInPandas needs google.protobuf in the "
            "Python workers (state-server protocol); not installed in "
            "this environment. Use running_totals_stream() instead."
        )
    return stream.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=RunningTotals(),
        outputStructType="user_id long, n long, total double",
        outputMode="Append",
        timeMode="None",
    )


# --------------------------------------------------------------------------
# applyInPandasWithState execution path (registered; Arrow-only).
# --------------------------------------------------------------------------

_TOTALS_STATE = "n long, total double"
_TOTALS_OUT = "user_id long, n long, total double"


def _running_totals_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: Any
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame({"user_id": [user_id], "n": [n], "total": [total]})


def running_totals_stream(events_stream: DataFrame) -> DataFrame:
    """(user_id, value) stream -> per-batch running (n, total) per key."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    return events_stream.groupBy("user_id").applyInPandasWithState(
        _running_totals_fn,
        outputStructType=_TOTALS_OUT,
        stateStructType=_TOTALS_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---- TTL eviction (event-time timers) ------------------------------------

TTL_MINUTES = 60
_TTL_US = TTL_MINUTES * 60 * 1_000_000

# Default watermark delay the registered wiring uses. The FOLD itself
# never depends on this value (ADVICE r07): every unreachability rule
# inside _ttl_evict_fn bounds the watermark with delay <= TTL only, so
# any wiring whose withWatermark() delay is at most TTL_MINUTES gets
# the exact-under-disorder guarantee — a caller choosing e.g. 10
# minutes is NOT flushed prematurely against this 1-minute default.
WATERMARK_DELAY_MINUTES = 1
_WM_DELAY_US = WATERMARK_DELAY_MINUTES * 60 * 1_000_000

# Up to TWO gap-segment summaries per key (ADVICE r06): an inline
# eviction on a data gap in (TTL, TTL+delay] is premature — a
# watermark-admissible straggler can still land within TTL of the old
# segment (even BRIDGE the two segments into one), so the older
# segment stays in state until the watermark timer or arriving data
# proves it unreachable. With delay <= TTL a third segment can only
# form once the oldest is already unreachable (gap arithmetic in
# _ttl_evict_fn), so two fixed-size slots suffice at any scale.
# s1_n == 0 encodes "no pending older segment".
_TTL_STATE = (
    "s1_start long, s1_last long, s1_n int, s1_total double, "
    "s2_start long, s2_last long, s2_n int, s2_total double"
)
_TTL_OUT = "user_id long, seg_start timestamp, n_events int, total double"

# far past every testdata event: drives the closing watermark past all
# pending eviction timers so availableNow drains every open segment
SENTINEL_TS = "2030-01-01 00:00:00"


def _ttl_evict_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: Any
) -> Iterator[pd.DataFrame]:
    """Per-key gap-segmentation fold, exact under any watermark-
    bounded disorder (ADVICE r05/r06): for every delivery order the
    watermark admits (each event at most WATERMARK_DELAY late, delay
    <= TTL), the emitted segments equal a full-event-time-order
    replay's. The single-segment version could not promise that — an
    inline eviction on a gap in (TTL, TTL+delay] was a point of no
    return, yet an admissible straggler could still merge with (or
    bridge) the evicted segment. Now a segment is only emitted once
    it is provably unreachable: (a) the event-time timer fired, so
    watermark > newest.last + TTL >= every stored deadline; (b) a
    third segment formed — its first event t has t - oldest.last >
    2*TTL, so watermark >= t - delay >= t - TTL > oldest.last + TTL
    already; (c) this key saw data at t with t - TTL > seg.last + TTL
    (watermark >= t - delay >= t - TTL, data-confirmed — the bound
    uses TTL, not the wiring's actual delay, so it holds for EVERY
    admissible delay <= TTL, ADVICE r07). Merge tests are against
    the segment's whole interval [start - TTL, last + TTL], not just
    `last`, and an event reachable from both stored segments
    coalesces them — the bridge a full-order replay would produce."""
    (user_id,) = key
    evicted: list[list] = []

    def _load() -> list[list]:
        if not state.exists:
            return []
        r = state.get
        segs = []
        if r[2] > 0:  # pending older segment present
            segs.append([r[0], r[1], r[2], r[3]])
        segs.append([r[4], r[5], r[6], r[7]])
        return segs

    if state.hasTimedOut:
        # watermark > newest.last + TTL >= older.last + TTL: every
        # stored segment is past straggler reach — flush all
        evicted.extend(_load())
        state.remove()
    else:
        segs = _load()
        rows = sorted(
            (int(t), float(v))
            for pdf in pdfs
            for t, v in zip(pdf["ts"].astype("int64") // 1000, pdf["value"])
        )
        for t, v in rows:
            hits = [
                s for s in segs if s[0] - _TTL_US <= t <= s[1] + _TTL_US
            ]
            if hits:
                tgt = hits[0]
                for extra in hits[1:]:  # bridge: t joins both segments
                    tgt[1] = max(tgt[1], extra[1])
                    tgt[2] += extra[2]
                    tgt[3] += extra[3]
                    segs.remove(extra)
                tgt[0], tgt[1] = min(tgt[0], t), max(tgt[1], t)
                tgt[2], tgt[3] = tgt[2] + 1, tgt[3] + v
            else:
                segs.append([t, t, 1, v])
                segs.sort(key=lambda s: s[0])
                # a third segment proves the oldest unreachable (its
                # merge window ends > TTL before the watermark floor)
                while len(segs) > 2:
                    evicted.append(segs.pop(0))
        # data-confirmed early flush: watermark >= newest.last - delay
        # >= newest.last - TTL for every contract-admissible delay, so
        # comparing against TTL (not the wiring's delay, which the fold
        # cannot see) is the tightest bound that is safe for ALL of
        # them (ADVICE r07 — _WM_DELAY_US here would evict prematurely
        # under a wiring with delay > 1 minute)
        while len(segs) > 1 and (
            segs[-1][1] - _TTL_US > segs[0][1] + _TTL_US
        ):
            evicted.append(segs.pop(0))
        if segs:
            s1 = segs[0] if len(segs) > 1 else [0, 0, 0, 0.0]
            s2 = segs[-1]
            state.update(
                (
                    int(s1[0]), int(s1[1]), int(s1[2]), float(s1[3]),
                    int(s2[0]), int(s2[1]), int(s2[2]), float(s2[3]),
                )
            )
            # event-time timer (ms): once the watermark passes TTL
            # after the newest segment, everything stored is flushable
            state.setTimeoutTimestamp((s2[1] + _TTL_US) // 1000)

    yield pd.DataFrame(
        {
            "user_id": pd.Series([user_id] * len(evicted), dtype="int64"),
            "seg_start": pd.to_datetime([e[0] for e in evicted], unit="us"),
            "n_events": pd.Series([e[2] for e in evicted], dtype="int32"),
            "total": pd.Series([e[3] for e in evicted], dtype="float64"),
        }
    )


def ttl_evict_stream(events_stream: DataFrame) -> DataFrame:
    """(user_id, ts, value) stream -> evicted-segment stream.

    Correctness invariant (ADVICE r06): the input's watermark delay
    must be <= TTL_MINUTES. Then every event the stream accepts
    satisfies t >= watermark >= last_seen - delay >= last_seen - TTL,
    so the fold's merge window (|t - last| <= TTL) covers every
    deliverable straggler and the emitted segmentation equals a
    full-order replay's. Callers wiring withWatermark() assert this
    against TTL_MINUTES (see q_stream_ttl_evict)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    return events_stream.groupBy("user_id").applyInPandasWithState(
        _ttl_evict_fn,
        outputStructType=_TTL_OUT,
        stateStructType=_TTL_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


# --------------------------------------------------------------------------
# Registered replays
# --------------------------------------------------------------------------


def q_stream_running_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replay the events table as a time-ordered multi-batch stream
    through the running-totals stateful fold; per user keep the LAST
    emission (n is strictly increasing per key, so max-n selects it
    deterministically) — which must equal the one-shot batch GROUP BY."""
    from pyspark.sql.window import Window

    from ..catalog import load_table
    from ..functions.timeutil import as_utc_instant
    from . import await_or_raise, replay_state_partitions, stage_range_split

    work = replay_workdir("stream_tot")
    in_dir = os.path.join(work, "events")
    out_dir = os.path.join(work, "out")
    ckpt = os.path.join(work, "ckpt")

    ev = load_table(spark, sf_dir, "events")
    stage_range_split(
        ev.select(
            "user_id", as_utc_instant(ev, "ts").alias("ts"), "value", "event_id"
        ),
        in_dir,
        6,
        ["ts", "event_id"],
    )

    with replay_state_partitions(spark):
        stream = (
            spark.readStream.schema(
                "user_id long, ts timestamp, value double, event_id long"
            )
            .option("maxFilesPerTrigger", "2")  # 6 files -> 3 real batches
            .parquet(in_dir)
        )
        q = (
            running_totals_stream(stream.select("user_id", "value"))
            .writeStream.outputMode("append")
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

    emits = spark.read.parquet(out_dir)
    w = Window.partitionBy("user_id").orderBy(F.col("n").desc())
    return (
        emits.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") == 1)
        .select("user_id", "n", F.round("total", 4).alias("total"))
        .orderBy("user_id")
    )


def q_stream_ttl_evict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replay the events table through the timer-evicting fold. Every
    segment a key ever held must emit exactly once (inline when the
    data shows the idle gap, by timer for the trailing open segment
    once the sentinel-driven watermark passes last+TTL), so the output
    equals the batch gap-segmentation the oracle runs. Equal
    timestamps are always gap 0 (same segment), so the fold is
    order-independent under ts ties."""
    from ..catalog import load_table
    from ..functions.timeutil import as_utc_instant, utc_wallclock_ntz
    from . import await_or_raise, replay_state_partitions, stage_range_split

    work = replay_workdir("stream_ttl")
    in_dir = os.path.join(work, "events")
    out_dir = os.path.join(work, "out")
    ckpt = os.path.join(work, "ckpt")

    ev = load_table(spark, sf_dir, "events")
    stage_range_split(
        ev.select(
            "user_id", as_utc_instant(ev, "ts").alias("ts"), "value", "event_id"
        ),
        in_dir,
        5,
        ["ts", "event_id"],
    )
    # sentinel arrives last (its own max-mtime file) and pushes the
    # closing watermark past every pending eviction timer
    sent = spark.createDataFrame([(-1,)], "user_id long").withColumn(
        "ts", F.lit(SENTINEL_TS).cast("timestamp_ntz")
    )
    stage_sent = sent.select(
        "user_id",
        as_utc_instant(sent, "ts").alias("ts"),
        F.lit(0.0).alias("value"),
        F.lit(0).cast("long").alias("event_id"),
    )
    stage_sent.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(work, "sent")
    )
    import glob
    import shutil

    (sent_file,) = glob.glob(os.path.join(work, "sent", "part-*.parquet"))
    dest = os.path.join(in_dir, "part-999.parquet")
    shutil.move(sent_file, dest)
    os.utime(dest, (1_700_000_999, 1_700_000_999))

    # ttl_evict_stream's invariant: stragglers the watermark still
    # admits must fit the fold's merge window (ADVICE r06)
    _WM_DELAY_MINUTES = 1
    assert _WM_DELAY_MINUTES <= TTL_MINUTES, "watermark delay must be <= TTL"
    with replay_state_partitions(spark):
        stream = (
            spark.readStream.schema(
                "user_id long, ts timestamp, value double, event_id long"
            )
            .option("maxFilesPerTrigger", "2")
            .parquet(in_dir)
            .withWatermark("ts", f"{_WM_DELAY_MINUTES} minute")
        )
        q = (
            ttl_evict_stream(stream.select("user_id", "ts", "value"))
            .writeStream.outputMode("append")
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

    return (
        spark.read.parquet(out_dir)
        .filter(F.col("user_id") >= 0)
        .select(
            "user_id",
            utc_wallclock_ntz(F.col("seg_start")).alias("seg_start"),
            "n_events",
            F.round("total", 4).alias("total"),
        )
    )


QUERIES = {
    "q_stream_running_agg": q_stream_running_agg,
    "q_stream_ttl_evict": q_stream_ttl_evict,
}
ORACLES: dict[str, str] = {
    # split-independent fold: final per-user state equals the batch agg
    "q_stream_running_agg": """
        SELECT user_id, count(*) AS n, round(sum(value), 4) AS total
        FROM events GROUP BY user_id ORDER BY user_id
    """,
    # TTL eviction == gap segmentation: every segment emits exactly once
    "q_stream_ttl_evict": """
        WITH ordered AS (
            SELECT user_id, ts, value,
                   lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       AS prev_ts
            FROM events
        ), flagged AS (
            SELECT user_id, ts, value,
                   CASE WHEN prev_ts IS NULL
                             OR epoch_us(ts) - epoch_us(prev_ts) > 3600000000
                        THEN 1 ELSE 0 END AS new_s
            FROM ordered
        ), numbered AS (
            SELECT user_id, ts, value,
                   sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS s
            FROM flagged
        )
        SELECT user_id,
               min(ts) AS seg_start,
               CAST(count(*) AS INTEGER) AS n_events,
               round(sum(value), 4) AS total
        FROM numbered
        GROUP BY user_id, s
    """,
}
