"""Tests for the timer API lifecycle (P7 guards, enable fan-out),
metrics observation, and reference hash parity."""

from __future__ import annotations

from datetime import datetime

import pytest

from pyspark.sql import functions as F


# --- hashing parity --------------------------------------------------------


def test_murmur3_32_test_vectors():
    """Public MurmurHash3 x86_32 vectors (seed 0)."""
    from timer_pulsar_spark.functions.hashing import murmur3_32

    assert murmur3_32(b"") == 0
    assert murmur3_32(b"hello") == 0x248BFA47
    assert murmur3_32(b"hello, world") == 0x149BBB7F
    assert murmur3_32(b"The quick brown fox jumps over the lazy dog") == 0x2E4FF723


def test_sha1_uint64_matches_go_construction():
    """Replicates sha1.go:17-24 by hand: base32-hex digest parsed base 32."""
    import base64
    import hashlib

    from timer_pulsar_spark.functions.hashing import sha1_uint64

    for s in ("", "abc", "42_1704067200000"):
        digest = hashlib.sha1(s.encode()).digest()
        expect = int(base64.b32hexencode(digest).decode().lower(), 32) & ((1 << 64) - 1)
        assert sha1_uint64(s) == expect


def test_bloom_positions_stable():
    from timer_pulsar_spark.functions.hashing import bloom_positions

    p1 = bloom_positions("7_1704067200000")
    assert p1 == bloom_positions("7_1704067200000")
    assert all(0 <= p < (1 << 32) for p in p1)


def test_q_hash_bloom_udfs_match_python(spark):
    from .conftest import SF_DIR
    import __spark_entry__ as entrymod
    from timer_pulsar_spark.functions.hashing import murmur3_32, sha1_uint64

    pdf = entrymod.queries()["q_hash_bloom"](spark, SF_DIR).limit(20).toPandas()
    for _, row in pdf.iterrows():
        assert row["h_murmur3"] == murmur3_32(row["task_key"].encode())
        expect_sha = sha1_uint64(row["task_key"])
        got = row["h_sha1_64"] % (1 << 64)  # signed view -> uint64
        assert got == expect_sha
        assert row["bloom_bit1"] == row["h_murmur3"] % (1 << 32)
        assert row["bloom_bit2"] == expect_sha % (1 << 32)


# --- metrics ---------------------------------------------------------------


def test_observe_exec_metrics(spark):
    from timer_pulsar_spark.metrics import observe_exec_metrics

    df = spark.createDataFrame(
        [(1, 2, 10), (2, 2, 30), (3, 3, 20)], "timer_id long, status int, cost_time int"
    )
    observed, obs = observe_exec_metrics(df)
    observed.write.format("noop").mode("overwrite").save()
    got = obs.get
    assert got["exec_total"] == 3
    assert got["exec_success"] == 2
    assert got["exec_failed"] == 1
    assert got["cost_ms_max"] == 30


def test_delay_quantiles_shape(spark):
    from timer_pulsar_spark.metrics import DELAY_QUANTILES, delay_quantiles

    df = spark.range(1000).select((F.col("id") % 997).alias("delay_ms"))
    row = delay_quantiles(df).collect()[0]
    assert len(row["delay_quantiles"]) == len(DELAY_QUANTILES)
    assert row["n"] == 1000
    qs = row["delay_quantiles"]
    assert qs == sorted(qs)  # monotone quantiles


# --- timer API -------------------------------------------------------------

NOW = datetime(2024, 1, 1, 0, 30, 0)
NOTIFY = {"method": "POST", "url": "http://mock", "header": {}, "body": ""}


@pytest.fixture()
def svc(spark, tmp_path):
    from timer_pulsar_spark.api import TimerService

    return TimerService(spark, str(tmp_path))


def test_create_validates(svc):
    with pytest.raises(ValueError, match="invalid cron"):
        svc.create_timer(1, "app", "bad", "*/0 * * * *", NOTIFY, NOW)
    with pytest.raises(ValueError, match="url"):
        svc.create_timer(1, "app", "bad", "*/5 * * * *", {"method": "POST"}, NOW)


def test_create_is_idempotent_on_app_name(svc):
    svc.create_timer(1, "app", "t1", "*/5 * * * *", NOTIFY, NOW)
    svc.create_timer(99, "app", "t1", "*/1 * * * *", NOTIFY, NOW)  # same (app,name)
    assert svc.timers().count() == 1
    assert svc.get_timer(1) is not None  # original row won


def test_enable_guard_and_fanout(svc):
    from timer_pulsar_spark.schemas import TIMER_ENABLED

    svc.create_timer(1, "app", "t1", "*/15 * * * *", NOTIFY, NOW)
    n = svc.enable_timer(1, NOW)
    # window [00:30, 02:00): triggers 00:45, 01:00, 01:15, 01:30, 01:45
    # + the boundary trigger 02:00 (NextsBetween quirk) = 6
    assert n == 6
    assert svc.get_timer(1)["status"] == TIMER_ENABLED
    assert svc.tasks().count() == 6
    # P7: enabling an already-enabled timer is rejected
    with pytest.raises(ValueError, match="not in Unabled"):
        svc.enable_timer(1, NOW)
    # re-running the fan-out via unable+enable stays idempotent
    svc.unable_timer(1, NOW)
    svc.enable_timer(1, NOW)
    assert svc.tasks().count() == 6


def test_migration_job(svc):
    """T9: migrator expands all enabled timers into the NEXT hour
    window; idempotent on re-run; disabled timers excluded."""
    svc.create_timer(1, "app", "t1", "*/20 * * * *", NOTIFY, NOW)
    svc.create_timer(2, "app", "t2", "*/30 * * * *", NOTIFY, NOW)
    svc.enable_timer(1, NOW)  # NOW = 00:30 -> enable covers [00:30, 02:00)
    n_after_enable = svc.tasks().count()

    # migrator at NOW: window [01:00, 02:00) -> overlaps enable's range,
    # so MERGE adds nothing new for timer 1; timer 2 stays disabled
    assert svc.run_migration(NOW) > 0
    assert svc.tasks().count() == n_after_enable
    assert svc.tasks().filter("timer_id = 2").count() == 0

    # migrator an hour later extends the horizon to [02:00, 03:00)
    later = NOW.replace(hour=1)
    added = svc.run_migration(later)
    assert added > 0
    assert svc.tasks().filter("run_timer >= '2024-01-01 02:00:01'").count() > 0
    n_total = svc.tasks().count()
    assert svc.run_migration(later) == added  # idempotent re-run
    assert svc.tasks().count() == n_total


def test_unable_guard(svc):
    svc.create_timer(1, "app", "t1", "*/15 * * * *", NOTIFY, NOW)
    with pytest.raises(ValueError, match="illegal status transition"):
        svc.unable_timer(1, NOW)  # not enabled yet


def test_list_pagination_and_task_visibility(svc, spark):
    from timer_pulsar_spark.schemas import TASK_NOT_RUNNED, TASK_SUCCESSED
    from timer_pulsar_spark.store import merge_table

    for i in range(1, 26):
        svc.create_timer(i, "app", f"t{i}", "*/5 * * * *", NOTIFY, NOW)
    page1 = svc.list_timers("app", page=1, size=10).collect()
    assert [r["id"] for r in page1] == list(range(25, 15, -1))  # id desc
    page3 = svc.list_timers("app", page=3, size=10).collect()
    assert [r["id"] for r in page3] == [5, 4, 3, 2, 1]

    # LIKE search shares the order/paging contract
    found = svc.find_timers("app", "t2", page=1, size=10).collect()
    assert [r["id"] for r in found] == [25, 24, 23, 22, 21, 20, 2]  # names containing "t2"

    # task read path hides NotRunned rows (task.go:31-35)
    rows = [(1, datetime(2024, 1, 1, 0, m), TASK_SUCCESSED if m % 2 else TASK_NOT_RUNNED)
            for m in range(10)]
    df = spark.createDataFrame(rows, "timer_id long, run_timer timestamp, status int")
    merge_table(spark, svc.tasks_path, df, ["timer_id", "run_timer"])
    visible = svc.list_tasks(1, page=1, size=20).collect()
    assert len(visible) == 5
    assert all(r["status"] == TASK_SUCCESSED for r in visible)
    times = [r["run_timer"] for r in visible]
    assert times == sorted(times, reverse=True)


# --- S13 exposition surface (/metrics) -------------------------------------


def test_metrics_registry_prometheus_exposition():
    """Counter/gauge/summary render in the Prometheus text format with
    the reference's metric names (reporter.go:19-41)."""
    from timer_pulsar_spark.metrics import MetricsRegistry

    reg = MetricsRegistry()
    reg.inc("timer_exec_total_cnt", 3, xtimerApp="demo")
    reg.inc("timer_exec_total_cnt", 2, xtimerApp="demo")
    reg.set_gauge("timer_enabled_cnt", 7, label="timer")
    reg.set_summary(
        "timer_delay_cnt", {0.5: 12.0, 0.99: 40.0}, count=5, total=80.0,
        xtimerApp="demo",
    )
    text = reg.render()
    assert "# TYPE timer_exec_total_cnt counter" in text
    assert 'timer_exec_total_cnt{xtimerApp="demo"} 5' in text
    assert "# TYPE timer_enabled_cnt gauge" in text
    assert 'timer_enabled_cnt{label="timer"} 7' in text
    assert "# TYPE timer_delay_cnt summary" in text
    assert 'timer_delay_cnt{quantile="0.5",xtimerApp="demo"} 12' in text
    assert 'timer_delay_cnt_sum{xtimerApp="demo"} 80' in text
    assert 'timer_delay_cnt_count{xtimerApp="demo"} 5' in text


def test_serve_metrics_http_endpoint():
    """GET /metrics returns the exposition; other paths 404
    (app/webserver/app.go:97-101 analog)."""
    import urllib.error
    import urllib.request

    from timer_pulsar_spark.metrics import MetricsRegistry, serve_metrics

    reg = MetricsRegistry()
    reg.inc("timer_exec_total_cnt", 9, xtimerApp="demo")
    server = serve_metrics(reg, port=0)
    try:
        port = server.server_address[1]
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/metrics") as resp:
            assert resp.status == 200
            assert resp.headers["Content-Type"].startswith("text/plain")
            body = resp.read().decode()
        assert 'timer_exec_total_cnt{xtimerApp="demo"} 9' in body
        try:
            urllib.request.urlopen(f"http://127.0.0.1:{port}/nope")
            raise AssertionError("expected 404")
        except urllib.error.HTTPError as e:
            assert e.code == 404
    finally:
        server.shutdown()


def test_pipeline_feeds_metrics_registry(spark, tmp_path):
    """The streaming pipeline's per-batch Observation rows fold into the
    registry: exec counter equals executed rows; the delay summary is
    sketch-derived from the same job (no extra scan)."""
    from timer_pulsar_spark.metrics import MetricsRegistry
    from timer_pulsar_spark.schemas import TIMER_ENABLED
    from timer_pulsar_spark.streaming.pipeline import run_pipeline_blocking

    timers = spark.createDataFrame(
        [(i, "app", f"t{i}", TIMER_ENABLED, "* * * * *",
          {"method": "POST", "url": "http://mock", "header": {}, "body": ""})
         for i in range(1, 4)],
        "id long, app string, name string, status int, cron string, "
        "notify_http_param struct<method:string,url:string,header:map<string,string>,body:string>",
    )
    tasks_dir = str(tmp_path / "tasks")
    rows = [(tid, datetime(2024, 1, 1, 0, k), 0) for tid in (1, 2, 3) for k in range(2)]
    spark.createDataFrame(
        rows, "timer_id long, run_timer timestamp, status int"
    ).write.parquet(tasks_dir)

    reg = MetricsRegistry()
    run_pipeline_blocking(
        spark, tasks_dir, timers, str(tmp_path / "status"), str(tmp_path / "ckpt"),
        metrics_registry=reg,
    )
    text = reg.render()
    assert 'timer_exec_total_cnt{xtimerApp="timer_pulsar_spark"} 6' in text
    assert 'timer_exec_success_cnt{xtimerApp="timer_pulsar_spark"} 6' in text
    assert "# TYPE timer_delay_cnt summary" in text
    assert 'timer_delay_cnt_count{xtimerApp="timer_pulsar_spark"} 6' in text
