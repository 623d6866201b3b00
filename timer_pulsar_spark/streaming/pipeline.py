"""The standing execution pipeline as ONE Structured Streaming query
(SURVEY.md §3.2): due tasks stream in, get deduped within the watermark,
joined to the still-enabled timer dimension, executed (HTTP callback),
and their status MERGEd back — replacing the reference's four
microservices (scheduler -> Pulsar -> trigger -> Pulsar -> executor).

Reference parity (file:line into /root/reference):
- T7 micro-batch loop: gotimer_trigger/service/trigger/worker.go:59-131
  runs 1-second sub-batches inside a minute slice; here that is the
  engine's own trigger — `processingTime='1 second'` in production,
  `availableNow` in tests (drains all pending input then stops).
- T8 late/missed replay: gotimer_web/service/scheduler/worker.go:110-123
  re-attempts now-1min; here `withWatermark('run_timer', '1 minute')` —
  rows older than the watermark fall out of dedup state and are instead
  caught by the idempotent MERGE (layered exactly like the reference's
  bloom-then-DB check).
- T12 idempotent dedup: woker.go:53-68 bloom + unique-key probe; here
  `dropDuplicatesWithinWatermark(['timer_id','run_timer'])` (state-store
  dedup) + MERGE on the same unique key (task.sql:14) as the durable
  second layer.
- T16 delayed visibility: trigger/task.go:31-51 — a task fires only if
  its timer is still Enabled at fire time: the per-batch broadcast join
  against the *current* enabled dimension snapshot.
- T13 execute + write-back: executor woker.go:71-136 == notify.execute_batch
  -> store.merge_table(update_matched=True).
- S10/S11 Pulsar topics: the two hops disappear — Spark's checkpoint is
  the ack (consume-after-complete, gotimer_trigger/main.go:117-123); a
  real broker plugs in by swapping the file source for a kafka/pulsar
  `readStream` with the same schema (SURVEY §7.5 risk 5).

Scale notes: dedup state is hash-partitioned on the dedup key across
executors; the timer dimension is broadcast (bounded: distinct enabled
timers); the only other shuffle is the MERGE key shuffle. Watermark
bounds state size: 1 minute of task keys, ~700 keys at the reference's
1e6/day design point — trivially small per executor even at 1000x.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..config import CONFIG
from ..schemas import TIMER_ENABLED
from ..sources.task_stream import TASK_RECORD_SCHEMA, task_stream
from ..store import feed_run_token, merge_table, task_slice_columns
from .notify import Transport, execute_batch, mock_transport

# schema of the due-task stream (fan-out output + app tag)
TASK_STREAM_SCHEMA = TASK_RECORD_SCHEMA


def timer_dim(spark: SparkSession, timers: DataFrame) -> DataFrame:
    """Enabled-timer dimension with flattened notify params (the
    executor's 2-min-ahead cache, service/executor/timer.go:87-114 —
    subsumed by a broadcast join against the current snapshot)."""
    return timers.filter(F.col("status") == TIMER_ENABLED).select(
        F.col("id").alias("timer_id"),
        F.col("notify_http_param.method").alias("method"),
        F.col("notify_http_param.url").alias("url"),
        F.col("notify_http_param.header").alias("header"),
        F.col("notify_http_param.body").alias("body"),
    )


def run_pipeline(
    spark: SparkSession,
    tasks_stream_dir: str,
    timers: DataFrame,
    status_path: str,
    checkpoint_dir: str,
    *,
    transport: Transport = mock_transport,
    available_now: bool = True,
    processing_time: str | None = None,
    status_mode: str = "merge",
    source_kind: str = "files",
    metrics_registry=None,
    assume_nonempty_batches: bool = False,
    changes_out: str | None = None,
):
    """Start the pipeline; with available_now=True it drains pending
    input and stops (the test/driver mode). Returns the StreamingQuery.

    status_mode:
    - ``merge`` (default): per-batch MERGE into the status table —
      file-level exactly-once, but each batch rewrites O(history).
    - ``append_log``: append-only status log, latest-wins compaction at
      read time (store.read_latest). O(batch) per batch — the low-
      latency/at-scale mode: the per-batch cost stays constant as the
      status table grows, and the watermarked dedup upstream already
      bounds duplicates to beyond-watermark replays, which the
      compacting read resolves deterministically.

    changes_out (merge mode only): per-batch CHANGE DATA FEED — every
    status MERGE also records the per-key changes it applies under
    ``changes_out/cv=<batch_id>`` (store.merge_table's CDF; atomic,
    first-write-wins per batch id, so foreachBatch redeliveries
    neither duplicate nor falsify the feed). Downstream incremental
    consumers tail the feed instead of diffing the status table.
    The feed dir is BOUND to this pipeline's checkpoint lifetime
    (store.feed_run_token → merge_table change_run): a restart that
    resumes the checkpoint keeps feeding; a fresh checkpoint pointed
    at the same changes_out raises instead of silently dropping its
    batches (its batch ids restart at 0 and would lose every
    first-write-wins race against the old run's entries).

    assume_nonempty_batches (append_log only): skip the per-batch
    emptiness probe — one Spark job per micro-batch instead of two
    (probe + write), worth ~200 ms of scheduling delay at a 1-second
    trigger. ONLY valid when the session disables
    ``spark.sql.streaming.noDataMicroBatches.enabled`` so Spark never
    fires a data-less batch (otherwise an empty batch would append an
    empty file and — if a metrics registry is wired — block on an
    unresolved Observation). Watermark/state eviction then happens on
    the next data batch, which for a 1-minute dedup window is
    indistinguishable.
    """
    dim = timer_dim(spark, timers)
    feed_run = feed_run_token(checkpoint_dir) if changes_out else None

    # S11: swap "files" for "kafka"/"pulsar" (sources/task_stream.py) to
    # consume from a real broker — same schema, same plan downstream
    # ("records" is the broker wire-shape loopback used by the seam test)
    stream = (
        task_stream(spark, source_kind, path=tasks_stream_dir)
        .withWatermark("run_timer", CONFIG.watermark_lateness)
        .dropDuplicatesWithinWatermark(["timer_id", "run_timer"])
    )

    def handle_batch(batch_df: DataFrame, batch_id: int) -> None:
        if assume_nonempty_batches and status_mode == "append_log":
            # single-pass fast path: the append plan references the
            # stream subtree exactly once, so no persist and no probe —
            # valid because noDataMicroBatches=false guarantees data
            _run_batch(batch_df, batch_id)
            return
        # availableNow ends with a no-data batch that only advances the
        # dedup watermark state. Short-circuit it: merging zero rows is
        # a no-op, and the empty plan folds away the CollectMetrics node
        # so Observation.get would block forever (hanging the trigger in
        # "cleaning up state" until the awaitTermination timeout).
        # Persist before probing: every action on batch_df re-executes
        # the source scan + dedup subtree, so an unpersisted
        # emptiness probe followed by the real write would scan twice —
        # measurable p99 delay at a 1-second trigger.
        batch_df = batch_df.persist()
        if len(batch_df.take(1)) == 0:
            batch_df.unpersist()
            return
        try:
            _run_batch(batch_df, batch_id)
        finally:
            batch_df.unpersist()

    def _run_batch(batch_df: DataFrame, batch_id: int) -> None:
        from ..metrics import observe_exec_metrics

        # T16: only fire tasks whose timer is still enabled *now*
        due = batch_df.join(F.broadcast(dim), "timer_id", "inner")
        # Observation names are session-global across ALL queries ever
        # run on the session — a reused name (even from a previous,
        # stopped query) can leave the new observation's future
        # unresolved. uuid, not batch_id: batch ids restart at 0 for
        # every query.
        import uuid as _uuid

        executed, obs = observe_exec_metrics(
            execute_batch(due, transport),
            name=f"exec_{_uuid.uuid4().hex[:12]}",
            with_delay_summary=metrics_registry is not None,
        )
        if status_mode == "append_log":
            # one action, one kernel execution, O(batch) written
            executed.write.mode("append").parquet(status_path)
        else:
            # Materialize the executor output ONCE before merging. The
            # merge plan references `executed` twice (anti-join probe +
            # union): unpersisted, that re-runs the transport kernel per
            # subtree (duplicate HTTP calls) and leaves the
            # CollectMetrics future unresolved, blocking obs.get and
            # stalling the trigger loop forever after the first
            # merge-into-existing batch.
            executed = executed.persist()
            try:
                executed.count()  # side effects + observation resolve
                # T12 second layer + S9: effectively-once, incoming wins.
                # Slice columns (minute = fmt(run_timer), bucket =
                # timer_id % N — both functions of the merge key) put the
                # status table in the minute×bucket hive layout, so the
                # MERGE is partition-scoped: each micro-batch rewrites
                # only the leaves its tasks fall in, O(batch) I/O instead
                # of O(history) (the r03 scale fix for the default path).
                merge_table(
                    spark,
                    status_path,
                    task_slice_columns(executed),
                    ["timer_id", "run_timer"],
                    update_matched=True,
                    partition_by=["minute", "bucket"],
                    changes_out=changes_out,
                    change_version=batch_id if changes_out else None,
                    change_run=feed_run,
                )
            finally:
                executed.unpersist()
        # S13/A5: per-batch counters ride the same job (observe() adds
        # no extra scan); surfaces via logs and — when a registry is
        # wired — the Prometheus /metrics exposition (metrics.py).
        # In the probe-less fast path only read the observation when a
        # registry asked for it: obs.get on a (contract-violating)
        # empty batch would block, not raise.
        if assume_nonempty_batches and metrics_registry is None:
            return
        try:
            row = obs.get
            print(f"# batch {batch_id} metrics: {row}")
            if metrics_registry is not None:
                metrics_registry.record_exec_batch(row)
        except Exception:
            pass  # empty batch -> no observed rows

    writer = (
        stream.writeStream.foreachBatch(handle_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        # T7: the reference's 1-second sub-batch resolution
        # (trigger.zrangeGapSeconds, conf/init.go:64-67)
        writer = writer.trigger(
            processingTime=processing_time or f"{CONFIG.trigger_gap_seconds} second"
        )
    return writer.start()


def run_pipeline_blocking(*args, timeout_sec: int = 120, **kwargs) -> None:
    q = run_pipeline(*args, available_now=True, **kwargs)
    try:
        q.awaitTermination(timeout_sec)
    finally:
        if q.isActive:
            q.stop()
