"""Streaming pipeline tests: exactly-once-effective status after
injected duplicate and late input, fire-time enabled check, and replay
across restarts from the same checkpoint."""

from __future__ import annotations

import os
from datetime import datetime, timedelta

import pytest

from pyspark.sql import functions as F


BASE = datetime(2024, 1, 1, 0, 0, 0)


@pytest.fixture()
def timers(spark):
    from timer_pulsar_spark.schemas import TIMER_ENABLED, TIMER_UNABLED

    rows = [
        (i, "app", f"t{i}", TIMER_ENABLED if i != 5 else TIMER_UNABLED, "* * * * *",
         {"method": "POST", "url": "http://mock", "header": {}, "body": ""})
        for i in range(1, 6)
    ]
    return spark.createDataFrame(
        rows,
        "id long, app string, name string, status int, cron string, "
        "notify_http_param struct<method:string,url:string,header:map<string,string>,body:string>",
    )


def _write_tasks(spark, path, entries, mode="append"):
    df = spark.createDataFrame(entries, "timer_id long, run_timer timestamp, status int")
    df.write.mode(mode).parquet(path)


def test_pipeline_exactly_once_effective(spark, timers, tmp_path):
    from timer_pulsar_spark.schemas import TASK_SUCCESSED
    from timer_pulsar_spark.streaming.pipeline import run_pipeline_blocking

    tasks_dir = str(tmp_path / "tasks")
    status_path = str(tmp_path / "status")
    ckpt = str(tmp_path / "ckpt")

    # batch 1: timers 1-5, two instants each, with in-batch duplicates
    batch1 = []
    for tid in range(1, 6):
        for k in range(2):
            row = (tid, BASE + timedelta(minutes=k), 0)
            batch1 += [row, row]  # duplicate every delivery
    _write_tasks(spark, tasks_dir, batch1)

    run_pipeline_blocking(spark, tasks_dir, timers, status_path, ckpt)

    out = spark.read.parquet(status_path)
    # timer 5 is disabled -> never fired (T16)
    assert out.filter("timer_id = 5").count() == 0
    # one row per (enabled timer, instant), all Successed, mock output
    assert out.count() == 4 * 2
    assert out.groupBy("timer_id", "run_timer").count().filter("count > 1").count() == 0
    assert out.filter(F.col("status") != TASK_SUCCESSED).count() == 0
    assert out.filter(~F.col("output").contains("hello world")).count() == 0

    # batch 2: replay of old keys (late duplicates) + genuinely new rows
    batch2 = [(1, BASE, 0), (2, BASE + timedelta(minutes=1), 0)]  # replays
    batch2 += [(tid, BASE + timedelta(minutes=5), 0) for tid in (1, 2)]  # new
    _write_tasks(spark, tasks_dir, batch2)

    run_pipeline_blocking(spark, tasks_dir, timers, status_path, ckpt)
    out2 = spark.read.parquet(status_path)
    assert out2.count() == 8 + 2  # only the 2 new keys were added
    assert out2.groupBy("timer_id", "run_timer").count().filter("count > 1").count() == 0


def test_append_log_mode_latest_wins(spark, timers, tmp_path):
    """status_mode=append_log: appends are O(batch) (no table rewrite),
    and the compaction view (store.read_latest) restores effectively-
    once MERGE semantics — a beyond-watermark duplicate replay lands in
    the log twice but the reader sees one row per (timer_id, run_timer)."""
    from timer_pulsar_spark.store import read_latest
    from timer_pulsar_spark.streaming.pipeline import run_pipeline

    tasks_dir = str(tmp_path / "tasks")
    status_path = str(tmp_path / "status")

    _write_tasks(spark, tasks_dir, [(tid, BASE, 0) for tid in (1, 2, 3)])
    q = run_pipeline(
        spark, tasks_dir, timers, status_path, str(tmp_path / "ckpt"),
        status_mode="append_log",
    )
    q.awaitTermination(120)
    # replay timer 1 from a FRESH checkpoint (beyond-watermark dup: the
    # state-store dedup can't see it) + one genuinely new key
    _write_tasks(spark, tasks_dir, [(1, BASE, 0), (4, BASE + timedelta(minutes=2), 0)])
    q = run_pipeline(
        spark, tasks_dir, timers, status_path, str(tmp_path / "ckpt2"),
        status_mode="append_log",
    )
    q.awaitTermination(120)

    log = spark.read.parquet(status_path)
    # fresh checkpoint reprocessed everything: log holds the dup rows
    assert log.count() > 4
    latest = read_latest(spark, status_path, ["timer_id", "run_timer"])
    assert latest.count() == 4  # timers 1,2,3 @BASE + timer 4 @BASE+2m
    assert latest.groupBy("timer_id", "run_timer").count().filter("count > 1").count() == 0


def test_transport_failure_marks_failed(spark, timers, tmp_path):
    """A failing callback must produce a Failed status row with the
    error payload — not a crashed query (woker.go:124-131: failures are
    data, not exceptions)."""
    from timer_pulsar_spark.schemas import TASK_FAILED
    from timer_pulsar_spark.streaming.pipeline import run_pipeline_blocking

    tasks_dir = str(tmp_path / "tasks")
    status_path = str(tmp_path / "status")
    _write_tasks(spark, tasks_dir, [(1, BASE, 0), (2, BASE, 0)])

    def broken_transport(method, url, headers, body):
        return False, '{"error":"connection refused"}'

    run_pipeline_blocking(
        spark, tasks_dir, timers, status_path, str(tmp_path / "ckpt"),
        transport=broken_transport,
    )
    out = spark.read.parquet(status_path)
    assert out.count() == 2
    assert out.filter(F.col("status") != TASK_FAILED).count() == 0
    assert out.filter(~F.col("output").contains("connection refused")).count() == 0


def test_live_trigger_delay_slo(spark, timers, tmp_path):
    """T7 with the production 1-second trigger: waves of tasks scheduled
    at 'now' must all execute, each carrying a sane (actual - scheduled)
    delay_ms. The bound is deliberately loose for CI noise — the bench
    reports the real quantiles against the BASELINE SLO."""
    import datetime as dt
    import time as _time

    from timer_pulsar_spark.streaming.pipeline import run_pipeline

    tasks_dir = str(tmp_path / "tasks")
    status_path = str(tmp_path / "status")
    spark.createDataFrame(
        [], "timer_id long, run_timer timestamp, status int"
    ).write.mode("overwrite").parquet(tasks_dir)

    q = run_pipeline(
        spark, tasks_dir, timers, status_path, str(tmp_path / "ckpt"),
        available_now=False, processing_time="1 second",
    )
    waves = 3
    expected = 4 * waves  # 4 enabled timers (5 is disabled) per wave
    try:
        for _ in range(waves):
            now = dt.datetime.now(dt.timezone.utc).replace(tzinfo=None)
            _write_tasks(
                spark, tasks_dir, [(tid, now, 0) for tid in (1, 2, 3, 4)]
            )
            _time.sleep(1)
        # drain on the OUTPUT, not progress heuristics: micro-batches
        # can take tens of seconds when the suite runs under load
        deadline = _time.time() + 300
        while _time.time() < deadline:
            assert q.exception() is None, f"stream died: {q.exception()}"
            try:
                if spark.read.parquet(status_path).count() >= expected:
                    break
            except Exception:
                pass  # status dir not created yet / mid-merge swap
            _time.sleep(2)
    finally:
        q.stop()

    out = spark.read.parquet(status_path)
    # each wave a distinct run_timer -> nothing deduped, exactly once
    assert out.count() == expected
    delays = [r.delay_ms for r in out.select("delay_ms").collect()]
    assert all(d >= 0 for d in delays)
    assert max(delays) < 150_000, f"delay out of bounds: {max(delays)}ms"


def test_task_record_codec_roundtrip(spark):
    """The broker record codec (S10/S11) must round-trip task rows:
    encode -> (key,value binary) -> decode == original. Second-resolution
    run times (all cron output is) survive the JSON hop exactly."""
    from timer_pulsar_spark.sources import decode_task_records, encode_task_records

    tasks = spark.createDataFrame(
        [(7, BASE, 0), (8, BASE + timedelta(minutes=1), 1)],
        "timer_id long, run_timer timestamp, status int",
    )
    rec = encode_task_records(tasks)
    assert rec.schema.simpleString() == "struct<key:binary,value:binary>"
    back = decode_task_records(rec).toPandas().sort_values("timer_id")
    orig = tasks.toPandas().sort_values("timer_id")
    assert back.reset_index(drop=True).equals(orig.reset_index(drop=True))
    # key carries the timer id for per-timer topic-partition ordering
    keys = [bytes(k).decode() for k in rec.toPandas()["key"]]
    assert sorted(keys) == ["7", "8"]


def test_stream_sessionize_matches_batch(spark):
    """The applyInPandasWithState sessionizer must produce exactly the
    batch window-function sessionization: same {(user, n_events)}
    multiset once the sentinel-driven watermark flushes all state."""
    import __spark_entry__ as entrymod

    from .conftest import SF_DIR

    qs = entrymod.queries()
    stream = qs["q_stream_sessionize"](spark, SF_DIR).toPandas()
    batch = qs["q_sessionize"](spark, SF_DIR).toPandas()
    sm = sorted(map(tuple, stream[["user_id", "n_events"]].values.tolist()))
    bm = sorted(map(tuple, batch[["user_id", "n_events"]].values.tolist()))
    assert sm == bm
    assert (stream["session_end"] >= stream["session_start"]).all()


def test_stream_rollup_matches_batch(spark):
    """The incremental watermarked rollup must equal the batch
    group-by-minute rescan row-for-row (append mode = only finalized
    windows ever reach the rollup table)."""
    import __spark_entry__ as entrymod

    from .conftest import SF_DIR

    qs = entrymod.queries()
    stream = qs["q_stream_rollup"](spark, SF_DIR).toPandas()
    batch = qs["q_groupby_minute"](spark, SF_DIR).toPandas()
    s = stream.sort_values("minute").reset_index(drop=True)
    b = batch.sort_values("minute").reset_index(drop=True)
    assert s[["minute", "cnt"]].equals(b[["minute", "cnt"]])


def test_registered_stream_query(spark):
    """The registry's hermetic pipeline query: one Successed row per
    (enabled timer, trigger), duplicates collapsed."""
    import __spark_entry__ as entrymod
    from timer_pulsar_spark.schemas import TASK_SUCCESSED

    from .conftest import SF_DIR

    out = entrymod.queries()["q_stream_execute"](spark, SF_DIR)
    pdf = out.toPandas()
    assert (pdf["status"] == TASK_SUCCESSED).all()
    assert (pdf["timer_id"] % 2 == 0).all()  # odd timers disabled
    assert not pdf.duplicated(["timer_id", "run_timer"]).any()
    assert len(pdf) > 0


def test_stream_join_matches_batch_twin(spark):
    """The watermarked stream-stream interval join must produce exactly
    the batch join's pairs (inner interval join is deterministic; the
    watermark bounds state, never drops on-time rows in a replay)."""
    import __spark_entry__ as entrymod

    from timer_pulsar_spark.catalog import load_table
    from timer_pulsar_spark.streaming.joins import attribution_join

    from .conftest import SF_DIR

    streamed = entrymod.queries()["q_stream_join"](spark, SF_DIR).toPandas()

    def side(event_type, prefix):
        return (
            load_table(spark, SF_DIR, "events")
            .filter(
                (F.col("event_type") == event_type)
                & (F.col("ts") >= "2024-01-01")
                & (F.col("ts") < "2024-01-08")
            )
            .select(
                F.col("user_id").alias(f"{prefix}_user"),
                F.col("event_id").alias(f"{prefix}_id"),
                F.col("ts").alias(f"{prefix}_ts"),
            )
        )

    batch = attribution_join(side("click", "click"), side("purchase", "purchase")).toPandas()
    cols = ["user_id", "click_event_id", "purchase_event_id", "gap_us"]
    key = lambda df: sorted(map(tuple, df[cols].values.tolist()))
    assert key(streamed) == key(batch)
    assert len(batch) > 0
    assert (streamed["gap_us"] >= 0).all()


def test_broker_seam_pipeline_loopback(spark, timers, tmp_path):
    """S10/S11 seam test: the FULL pipeline driven through the broker
    record codec. Due tasks are produced with encode_task_records into
    the kafka/pulsar wire shape (key,value binary), staged as a topic
    stand-in, and consumed via task_stream(kind="records") — the same
    decode path the real connectors use — then watermark + dedup +
    enabled-dim join + mock executor + MERGE. The status table must be
    identical to the plain files-mode run: the codec hop is transparent."""
    from timer_pulsar_spark.sources import encode_task_records
    from timer_pulsar_spark.schemas import TASK_SUCCESSED
    from timer_pulsar_spark.streaming.pipeline import run_pipeline_blocking

    topic_dir = str(tmp_path / "topic")
    status_path = str(tmp_path / "status")
    ckpt = str(tmp_path / "ckpt")

    rows = []
    for tid in range(1, 6):
        for k in range(2):
            row = (tid, BASE + timedelta(minutes=k), 0)
            rows += [row, row]  # at-least-once delivery: every record twice
    tasks = spark.createDataFrame(
        rows, "timer_id long, run_timer timestamp, status int"
    )
    encode_task_records(tasks).write.mode("overwrite").parquet(topic_dir)

    run_pipeline_blocking(
        spark, topic_dir, timers, status_path, ckpt, source_kind="records"
    )

    out = spark.read.parquet(status_path)
    assert out.filter("timer_id = 5").count() == 0  # disabled at fire time
    assert out.count() == 4 * 2  # one row per (enabled timer, instant)
    assert out.groupBy("timer_id", "run_timer").count().filter("count > 1").count() == 0
    assert out.filter(F.col("status") != TASK_SUCCESSED).count() == 0
    # the decoded run_timer survived the JSON hop at full precision
    got = sorted(
        (r.timer_id, r.run_timer) for r in out.select("timer_id", "run_timer").collect()
    )
    expected = sorted(
        (tid, BASE + timedelta(minutes=k)) for tid in range(1, 5) for k in range(2)
    )
    assert got == expected


def test_fake_broker_pipeline_consume_ack_exactly_once(spark, timers, tmp_path):
    """S10/S11 through a PROTOCOL-level broker fake (not just the codec
    loopback): tasks are produced into a partitioned offset-keyed log
    (key-hash partition assignment), the pipeline consumes them via the
    fake_kafka Python DataSource — offset ranges, partitions, group
    commit — and the consumer-group offsets must advance to the log end
    only after the effects are durable (consume-after-complete, the
    reference's ack). A second produce + run from the SAME checkpoint
    must process only the new offsets, and duplicate production must
    leave the status table exactly-once-effective."""
    from timer_pulsar_spark.schemas import TASK_SUCCESSED
    from timer_pulsar_spark.sources import encode_task_records
    from timer_pulsar_spark.sources.fake_broker import FakeBroker
    from timer_pulsar_spark.streaming.pipeline import run_pipeline_blocking

    broker_dir = str(tmp_path / "broker")
    status_path = str(tmp_path / "status")
    ckpt = str(tmp_path / "ckpt")
    broker = FakeBroker(broker_dir)

    def produce(rows):
        df = spark.createDataFrame(
            rows, "timer_id long, run_timer timestamp, status int"
        )
        recs = [
            (bytes(r["key"]), bytes(r["value"]))
            for r in encode_task_records(df).collect()
        ]
        broker.produce(recs)

    import time as _time

    from timer_pulsar_spark.streaming.pipeline import run_pipeline

    rows1 = []
    for tid in range(1, 6):
        row = (tid, BASE, 0)
        rows1 += [row, row]  # at-least-once delivery: every record twice
    produce(rows1)

    # live 1-second trigger: the source's commit(ack) fires as later
    # micro-batches confirm earlier ones — availableNow falls back to
    # single-batch for Python data sources and would never ack
    q = run_pipeline(
        spark, broker_dir, timers, status_path, ckpt,
        source_kind="fake_kafka", available_now=False,
        processing_time="1 second",
    )

    def drain(expected_rows):
        deadline = _time.time() + 240
        while _time.time() < deadline:
            assert q.exception() is None, f"stream died: {q.exception()}"
            try:
                if (
                    spark.read.parquet(status_path).count() >= expected_rows
                    and broker.committed() == broker.end_offsets()
                ):
                    return
            except Exception:
                pass  # status dir not created yet / mid-merge swap
            _time.sleep(1)
        raise AssertionError(
            f"drain timeout: committed={broker.committed()} "
            f"end={broker.end_offsets()}"
        )

    try:
        drain(4)
        out = spark.read.parquet(status_path)
        assert out.filter("timer_id = 5").count() == 0  # disabled at fire time
        assert out.count() == 4  # one row per enabled timer, dups collapsed
        assert out.filter(F.col("status") != TASK_SUCCESSED).count() == 0
        # the ACK: group offsets advanced to the log end only after the
        # effects are durable (consume-after-complete)
        assert broker.committed() == broker.end_offsets()
        first_end = broker.end_offsets()

        # phase 2: more records on the live stream — only new offsets
        # are consumed, previous effects are not duplicated
        produce([(tid, BASE + timedelta(minutes=1), 0) for tid in range(1, 6)])
        drain(8)
    finally:
        q.stop()

    out2 = spark.read.parquet(status_path)
    assert out2.count() == 8  # 4 old + 4 new, nothing reprocessed twice
    assert (
        out2.groupBy("timer_id", "run_timer").count().filter("count > 1").count()
        == 0
    )
    ends = broker.end_offsets()
    assert broker.committed() == ends
    assert sum(ends.values()) > sum(first_end.values())
    assert len([v for v in ends.values() if v > 0]) >= 2  # keys spread partitions


def test_fake_broker_two_hop_topology(spark, timers, tmp_path):
    """The reference's ACTUAL topology — producer service → topic →
    consumer pipeline (gotimer_web scheduler → Pulsar →
    trigger/executor, main.go:110-124) — end-to-end through the
    protocol fake: one live streaming query produces fanned-out due
    tasks into the broker (task_sink kind=fake_kafka, per-batch
    producer idempotency marker), a second consumes them
    (source_kind=fake_kafka) and MERGEs status. Duplicate production
    upstream must still yield exactly-once effects downstream."""
    import time as _time

    from timer_pulsar_spark.schemas import TASK_SUCCESSED
    from timer_pulsar_spark.sources.fake_broker import FakeBroker
    from timer_pulsar_spark.sources.task_stream import task_sink, task_stream
    from timer_pulsar_spark.streaming.pipeline import run_pipeline

    src_dir = str(tmp_path / "scheduler_out")
    broker_dir = str(tmp_path / "broker")
    status_path = str(tmp_path / "status")
    broker = FakeBroker(broker_dir)

    rows = []
    for tid in range(1, 6):
        for k in range(2):
            row = (tid, BASE + timedelta(minutes=k), 0)
            rows += [row, row]  # at-least-once delivery: every record twice
    _write_tasks(spark, src_dir, rows)

    producer = task_sink(
        task_stream(spark, "files", path=src_dir),
        "fake_kafka",
        path=broker_dir,
        checkpoint=str(tmp_path / "ckpt_prod"),
    )
    consumer = run_pipeline(
        spark, broker_dir, timers, status_path, str(tmp_path / "ckpt_cons"),
        source_kind="fake_kafka", available_now=False,
        processing_time="1 second",
    )
    try:
        deadline = _time.time() + 240
        while _time.time() < deadline:
            assert producer.exception() is None, producer.exception()
            assert consumer.exception() is None, consumer.exception()
            try:
                if (
                    spark.read.parquet(status_path).count() >= 8
                    and broker.committed() == broker.end_offsets()
                ):
                    break
            except Exception:
                pass
            _time.sleep(1)
    finally:
        producer.stop()
        consumer.stop()

    out = spark.read.parquet(status_path)
    assert out.filter("timer_id = 5").count() == 0  # disabled at fire time
    assert out.count() == 4 * 2  # one row per (enabled timer, instant)
    assert (
        out.groupBy("timer_id", "run_timer").count().filter("count > 1").count()
        == 0
    )
    assert out.filter(F.col("status") != TASK_SUCCESSED).count() == 0
    # both seams acked: producer wrote all 20 records once; consumer
    # committed to the log end
    assert sum(broker.end_offsets().values()) == len(rows)
    assert broker.committed() == broker.end_offsets()


def test_pipeline_fast_path_assume_nonempty(spark, timers, tmp_path):
    """The probe-less single-job fast path (append_log +
    assume_nonempty_batches, noDataMicroBatches off) must preserve the
    exactly-once-effective status semantics — same rows as the default
    probing path, just one Spark job per batch."""
    from timer_pulsar_spark.schemas import TASK_SUCCESSED
    from timer_pulsar_spark.store import read_latest
    from timer_pulsar_spark.streaming.pipeline import run_pipeline_blocking

    tasks_dir = str(tmp_path / "tasks")
    status_path = str(tmp_path / "status")
    rows = []
    for tid in range(1, 6):
        for k in range(2):
            row = (tid, BASE + timedelta(minutes=k), 0)
            rows += [row, row]
    _write_tasks(spark, tasks_dir, rows)

    prev = spark.conf.get("spark.sql.streaming.noDataMicroBatches.enabled", "true")
    spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    try:
        run_pipeline_blocking(
            spark, tasks_dir, timers, status_path, str(tmp_path / "ckpt"),
            status_mode="append_log", assume_nonempty_batches=True,
        )
    finally:
        spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", prev)

    out = read_latest(spark, status_path, ["timer_id", "run_timer"])
    assert out.filter("timer_id = 5").count() == 0
    assert out.count() == 4 * 2
    assert out.filter(F.col("status") != TASK_SUCCESSED).count() == 0


def test_stream_quality_recovers_from_checkpoint_restart(spark):
    """Crash-restart recovery with exactly-once output: run the
    incremental quality gate, stop after the first committed batch
    (simulated crash), restart with the SAME checkpoint, and the final
    output must equal the one-shot batch scoring with no duplicate or
    missing documents — the foreachBatch idempotent-sink contract."""
    import tempfile

    from timer_pulsar_spark.operators.textops import (
        q_quality,
        stream_quality_run,
    )
    from .conftest import SF_DIR

    work = tempfile.mkdtemp(prefix="stream_quality_restart_")
    partial = stream_quality_run(spark, SF_DIR, work, stop_after_batches=1)
    n_partial = partial.count()
    batch = q_quality(spark, SF_DIR).toPandas().sort_values("doc_id")
    assert 0 < n_partial < len(batch), "crash must land mid-stream"

    resumed = (
        stream_quality_run(spark, SF_DIR, work).toPandas().sort_values("doc_id")
    )
    assert len(resumed) == len(batch)  # no duplicates, no losses
    assert list(resumed["doc_id"]) == list(batch["doc_id"])
    assert (
        resumed.reset_index(drop=True)["keep"] == batch.reset_index(drop=True)["keep"]
    ).all()


def test_transform_with_state_env_gate(spark):
    """transformWithStateInPandas needs google.protobuf in the Python
    workers (its state-server protocol); this container has none, so
    the gate must report unavailable and the TWS wiring must refuse
    with a clear error instead of crashing mid-query. If protobuf ever
    appears, the gate flips and the scale path opens — this test then
    asserts the wiring builds a streaming plan."""
    from timer_pulsar_spark.streaming import stateful

    stream = (
        spark.readStream.format("rate").option("rowsPerSecond", "1").load()
        .selectExpr("value as user_id", "cast(value as double) as value")
    )
    if stateful.transform_with_state_available():
        df = stateful.running_totals_tws(stream)
        assert df.isStreaming
    else:
        import pytest as _pytest

        with _pytest.raises(EnvironmentError, match="protobuf"):
            stateful.running_totals_tws(stream)


def test_stream_running_agg_matches_batch(spark):
    """Final per-user emission of the running-totals stateful fold ==
    one-shot batch GROUP BY (split-independence contract)."""
    import __spark_entry__ as entrymod

    from .conftest import SF_DIR

    qs = entrymod.queries()
    stream = qs["q_stream_running_agg"](spark, SF_DIR).toPandas()
    from timer_pulsar_spark.catalog import load_table
    from pyspark.sql import functions as F

    b = (
        load_table(spark, SF_DIR, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("total"))
        .orderBy("user_id")
        .toPandas()
    )
    s = stream.reset_index(drop=True)
    b = b.reset_index(drop=True)
    assert s["user_id"].tolist() == b["user_id"].tolist()
    assert s["n"].tolist() == b["n"].tolist()
    assert (abs(s["total"] - b["total"]) < 1e-6).all()


def test_stream_ttl_evict_matches_batch_segments(spark):
    """Every idle-gap segment a key ever held emits exactly once —
    inline for gaps inside the data, by event-time TIMER for trailing
    open segments (the sentinel drives the closing watermark past
    last+TTL). Must equal batch gap-segmentation."""
    import __spark_entry__ as entrymod
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from timer_pulsar_spark.catalog import load_table
    from timer_pulsar_spark.streaming.stateful import TTL_MINUTES

    from .conftest import SF_DIR

    qs = entrymod.queries()
    stream = qs["q_stream_ttl_evict"](spark, SF_DIR).toPandas()

    ev = load_table(spark, SF_DIR, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = TTL_MINUTES * 60 * 1_000_000
    seg = (
        ev.withColumn("prev", F.lag("ts").over(w))
        .withColumn(
            "new_s",
            (
                F.col("prev").isNull()
                | (
                    F.unix_micros(F.col("ts").cast("timestamp_ltz"))
                    - F.unix_micros(F.col("prev").cast("timestamp_ltz"))
                    > gap_us
                )
            ).cast("int"),
        )
        .withColumn("s", F.sum("new_s").over(
            w.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy("user_id", "s")
        .agg(
            F.min("ts").alias("seg_start"),
            F.count("*").cast("int").alias("n_events"),
            F.round(F.sum("value"), 4).alias("total"),
        )
        .drop("s")
        .toPandas()
    )
    key = ["user_id", "seg_start", "n_events"]
    s = stream.sort_values(key).reset_index(drop=True)
    b = seg.sort_values(key).reset_index(drop=True)
    assert len(s) == len(b)
    assert s[key].equals(b[key])
    assert (abs(s["total"] - b["total"]) < 1e-6).all()
    # the timer path genuinely fired: every user's trailing segment can
    # only emit via eviction timeout (no later event closes it)
    assert s.groupby("user_id").size().ge(1).all()


def test_fake_broker_producer_ids_do_not_fence_each_other(tmp_path):
    """Two writers to the SAME topic root, each with its own producerId
    and its own batchId sequence starting at 0 (fresh checkpoints):
    writer B's batches must be produced, not silently dropped by
    writer A's high-water marker (ADVICE r04: the marker is now keyed
    per producer, the transactional.id analog). Retries within one
    producer stay idempotent."""
    import base64 as b64

    from timer_pulsar_spark.sources.fake_broker import (
        FakeBroker,
        FakeKafkaStreamWriter,
        _StagedRecords,
    )

    root = str(tmp_path / "broker")
    FakeBroker(root)  # create layout

    def staged(tag: str, n: int):
        return [
            _StagedRecords(
                records=[
                    (
                        b64.b64encode(f"{tag}-{i}".encode()).decode(),
                        b64.b64encode(f"v{tag}-{i}".encode()).decode(),
                    )
                    for i in range(n)
                ]
            )
        ]

    wa = FakeKafkaStreamWriter(root, 4, "writer-a")
    wa.commit(staged("a0", 3), 0)
    wa.commit(staged("a1", 2), 1)

    wb = FakeKafkaStreamWriter(root, 4, "writer-b")
    wb.commit(staged("b0", 4), 0)  # global marker would drop this (0 <= 1)
    wb.commit(staged("b0", 4), 0)  # same-producer retry: idempotent

    broker = FakeBroker(root)
    total = sum(broker.end_offsets().values())
    assert total == 3 + 2 + 4  # B produced once, A intact, no dup from retry

    wa.commit(staged("a1", 2), 1)  # A's retry after B's writes: still fenced
    assert sum(FakeBroker(root).end_offsets().values()) == 9


def test_fake_broker_two_consumers_one_group(spark, tmp_path):
    """The reference's shared subscription (two trigger workers, one
    subscription — gotimer_trigger/main.go:110-124): two concurrent
    streaming queries in ONE consumer group with static membership
    must consume DISJOINT partition sets whose union is the whole
    topic, exactly once, and their merged group commit must cover
    every partition. The engine acks batch N only when batch N+1
    starts (and a stateless query runs no no-data batches), so a
    second 'flush' wave drives the first wave's commits."""
    import hashlib
    import time as _time

    from timer_pulsar_spark.sources.fake_broker import FakeBroker, register

    register(spark)
    root = str(tmp_path / "broker")
    broker = FakeBroker(root)  # 4 partitions
    msgs = [(f"k{i}".encode(), f"v{i}".encode()) for i in range(40)]
    broker.produce(msgs)
    end_wave1 = broker.end_offsets()

    def pid_of(key: bytes) -> int:
        return int.from_bytes(hashlib.md5(key).digest()[:4], "big") % 4

    all_keys = [f"k{i}" for i in range(48)]
    outs, qs = [], []
    try:
        for member in (0, 1):
            out = str(tmp_path / f"out{member}")
            ckpt = str(tmp_path / f"ckpt{member}")
            stream = (
                spark.readStream.format("fake_kafka")
                .option("path", root)
                .option("group", "g1")
                .option("memberId", str(member))
                .option("groupSize", "2")
                .load()
                .selectExpr("cast(key as string) k", "cast(value as string) v")
            )
            qs.append(
                stream.writeStream.format("parquet")
                .option("path", out)
                .option("checkpointLocation", ckpt)
                .trigger(processingTime="1 second")
                .start()
            )
            outs.append(out)

        def drain(min_rows: int, committed_to: dict) -> None:
            deadline = _time.time() + 180
            while _time.time() < deadline:
                for q in qs:
                    assert q.exception() is None, q.exception()
                try:
                    got = sum(spark.read.parquet(o).count() for o in outs)
                    cm = broker.committed("g1")
                    if got >= min_rows and all(
                        int(cm.get(p, 0)) >= int(v)
                        for p, v in committed_to.items()
                    ):
                        return
                except Exception:
                    pass
                _time.sleep(1)
            raise AssertionError(
                f"drain timeout: committed={broker.committed('g1')}"
            )

        # wave 1 consumed by both members (acks may lag one batch)
        drain(len(msgs), {})
        # flush wave: new offsets start batch N+1 in each member, which
        # is when the engine acks batch N — wave 1 must then be fully
        # committed across BOTH members' partitions (merge, not clobber)
        broker.produce([(k.encode(), b"v") for k in all_keys[40:]])
        drain(len(all_keys), end_wave1)
    finally:
        for q in qs:
            q.stop()

    seen = []
    for member, out in enumerate(outs):
        pdf = spark.read.parquet(out).toPandas()
        pids = {pid_of(k.encode()) for k in pdf["k"]}
        # exclusive assignment: only this member's partitions
        assert pids <= {p for p in range(4) if p % 2 == member}, (member, pids)
        seen += pdf["k"].tolist()
    # union exactly-once over the whole topic
    assert sorted(seen) == sorted(all_keys)
    # merged ack covers every partition's first wave at least
    cm = broker.committed("g1")
    assert all(int(cm.get(p, 0)) >= int(v) for p, v in end_wave1.items()), cm


def test_fake_broker_group_membership_change_resumes_from_commits(spark, tmp_path):
    """Rebalance: a 1-member group consumes and acks a first wave;
    after a stop, the group RESTARTS AS TWO MEMBERS with fresh
    checkpoints — each must resume its partitions from the group's
    committed offsets (no re-read below the ack; at-least-once only
    for the uncommitted tail), split the partitions exclusively, and
    the union of both phases must cover every record."""
    import hashlib
    import time as _time

    from timer_pulsar_spark.sources.fake_broker import FakeBroker, register

    register(spark)
    root = str(tmp_path / "broker")
    broker = FakeBroker(root)
    wave1 = [(f"a{i}".encode(), b"v") for i in range(30)]
    broker.produce(wave1)

    def pid_of(key: bytes) -> int:
        return int.from_bytes(hashlib.md5(key).digest()[:4], "big") % 4

    def start(member, size, out, ckpt):
        stream = (
            spark.readStream.format("fake_kafka")
            .option("path", root).option("group", "g")
            .option("memberId", str(member)).option("groupSize", str(size))
            .load().selectExpr("cast(key as string) k")
        )
        return (
            stream.writeStream.format("parquet")
            .option("path", out).option("checkpointLocation", ckpt)
            .trigger(processingTime="1 second").start()
        )

    out1 = str(tmp_path / "out1")
    q = start(0, 1, out1, str(tmp_path / "ckpt1"))
    try:
        # flush wave drives wave 1's ack (batch N commits at batch N+1)
        deadline = _time.time() + 120
        flushed = False
        while _time.time() < deadline:
            assert q.exception() is None, q.exception()
            try:
                if spark.read.parquet(out1).count() >= 30 and not flushed:
                    broker.produce([(b"flush1", b"v"), (b"flush2", b"v")])
                    flushed = True
                cm = broker.committed("g")
                if flushed and sum(int(v) for v in cm.values()) >= 30:
                    break
            except Exception:
                pass
            _time.sleep(1)
        else:
            raise AssertionError(f"phase-1 drain: {broker.committed('g')}")
    finally:
        q.stop()
    c1 = {p: int(v) for p, v in broker.committed("g").items()}

    # membership change: two members, FRESH checkpoints, same group
    broker.produce([(f"b{i}".encode(), b"v") for i in range(20)])
    outs = [str(tmp_path / "out2a"), str(tmp_path / "out2b")]
    qs = [
        start(0, 2, outs[0], str(tmp_path / "ckpt2a")),
        start(1, 2, outs[1], str(tmp_path / "ckpt2b")),
    ]
    try:
        expected_tail = sum(broker.end_offsets().values()) - sum(c1.values())
        deadline = _time.time() + 120
        while _time.time() < deadline:
            for q2 in qs:
                assert q2.exception() is None, q2.exception()
            try:
                got = sum(spark.read.parquet(o).count() for o in outs)
                if got >= expected_tail:
                    break
            except Exception:
                pass
            _time.sleep(1)
        else:
            raise AssertionError("phase-2 drain")
    finally:
        for q2 in qs:
            q2.stop()

    phase1 = set(spark.read.parquet(out1).toPandas()["k"])
    p2 = [spark.read.parquet(o).toPandas()["k"].tolist() for o in outs]
    # exclusive assignment in the new generation
    for member, ks in enumerate(p2):
        pids = {pid_of(k.encode()) for k in ks}
        assert pids <= {p for p in range(4) if p % 2 == member}, (member, pids)
    phase2 = [k for ks in p2 for k in ks]
    # resume-from-commit: nothing below the phase-1 ack is re-read —
    # every phase-2 record sits at-or-above its partition's committed
    # offset (checked by value: acked wave-1 'a*' keys can only appear
    # in phase 2 if their offset was in the uncommitted tail)
    all_keys = {f"a{i}" for i in range(30)} | {"flush1", "flush2"} | {
        f"b{i}" for i in range(20)
    }
    assert phase1 | set(phase2) == all_keys
    # no phase-2 duplicates within itself (each offset read once)
    assert len(phase2) == len(set(phase2))
    # the committed portion of wave 1 is NOT re-read: per partition,
    # phase-2 count == end - committed
    ends = {p: int(v) for p, v in broker.end_offsets().items()}
    assert len(phase2) == sum(ends[p] - c1.get(p, 0) for p in ends)
