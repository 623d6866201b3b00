"""Arbitrary stateful processing via Spark 4's transformWithStateInPandas
(the successor to applyInPandasWithState): a StatefulProcessor with typed
ValueState maintained per key across micro-batches.

Operator: incremental per-user running totals (event count + value sum)
— the standing-aggregate shape a feature store keeps per entity. Each
batch updates the key's ValueState and emits the running totals; because
the state fold (count/sum) is split-independent, the FINAL emission per
user must equal the one-shot batch aggregate, which makes the whole
replay ORACLE-checkable (same contract pattern as the other streaming
twins: the incremental path is verified against its batch twin).

Scale notes: state is (n, total) per user — O(distinct keys), not
history; the shuffle is the one groupBy-key exchange per batch; Arrow
batches carry rows into the Python processor (pandas per key-batch,
never per row). TTL/timers are supported by the API (event-time and
processing-time) but deliberately unused here so the replay stays
deterministic.
"""

from __future__ import annotations

import os
import tempfile

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)


class RunningTotals(StatefulProcessor):
    """Per-user ValueState fold: (n_events, value_total)."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState("totals", "n BIGINT, total DOUBLE")

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


def q_stream_running_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replay the events table as a time-ordered multi-batch stream
    through the transformWithStateInPandas running-totals processor;
    per user keep the LAST emission (n is strictly increasing per key,
    so max-n selects it deterministically) — which must equal the
    one-shot batch GROUP BY."""
    from pyspark.sql.window import Window

    from ..catalog import load_table
    from ..functions.timeutil import as_utc_instant
    from . import replay_state_partitions, stage_range_split

    work = tempfile.mkdtemp(prefix="stream_tws_")
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
        updates = stream.groupBy("user_id").transformWithStateInPandas(
            statefulProcessor=RunningTotals(),
            outputStructType="user_id long, n long, total double",
            outputMode="Append",
            timeMode="None",
        )
        q = (
            updates.writeStream.outputMode("append")
            .format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.awaitTermination(180)
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


QUERIES = {"q_stream_running_agg": q_stream_running_agg}
# split-independent fold: the final per-user state equals the batch agg
ORACLES: dict[str, str] = {
    "q_stream_running_agg": """
        SELECT user_id, count(*) AS n, round(sum(value), 4) AS total
        FROM events GROUP BY user_id ORDER BY user_id
    """,
}
