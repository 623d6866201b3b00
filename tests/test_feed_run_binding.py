"""Change-feed run binding (ADVICE r05 medium, hardened ADVICE r06).

The feed dir's ``_RUN`` marker ties its cv= version sequence to ONE
checkpoint lifetime: batch-id versions restart at 0 on a fresh
checkpoint, and under the feed's first-write-wins discipline a
colliding writer's entries would silently vanish. These tests cover
the token lifecycle (mint / persist / resume), the same-run retry
no-op, every refusal path (foreign token, unmarked dir with existing
versions), the atomic check-and-set under concurrent first writers,
and the end-to-end promise that a refused merge mutates nothing.
"""

from __future__ import annotations

import os
import threading

import pytest
from pyspark.sql import functions as F

from timer_pulsar_spark.store import _bind_feed_run, feed_run_token


def test_feed_run_token_mints_once_and_persists(tmp_path):
    ckpt = str(tmp_path / "ckpt")
    tok = feed_run_token(ckpt)
    assert tok and len(tok) == 32
    # every resume of the same checkpoint reuses the persisted token
    assert feed_run_token(ckpt) == tok
    with open(os.path.join(ckpt, "feed-run-token")) as fh:
        assert fh.read().strip() == tok
    # a FRESH checkpoint is a different lifetime -> different token
    assert feed_run_token(str(tmp_path / "ckpt2")) != tok


def test_bind_feed_run_same_token_retry_is_noop(tmp_path):
    feed = str(tmp_path / "feed")
    _bind_feed_run(feed, "tok-a")
    _bind_feed_run(feed, "tok-a")  # retry within the run: fine
    with open(os.path.join(feed, "_RUN")) as fh:
        assert fh.read().strip() == "tok-a"


def test_bind_feed_run_foreign_token_raises_and_keeps_binding(tmp_path):
    feed = str(tmp_path / "feed")
    _bind_feed_run(feed, "tok-a")
    with pytest.raises(ValueError, match="bound to run 'tok-a'"):
        _bind_feed_run(feed, "tok-b")
    # the refusal must not clobber the original binding
    with open(os.path.join(feed, "_RUN")) as fh:
        assert fh.read().strip() == "tok-a"
    _bind_feed_run(feed, "tok-a")  # original run still welcome


def test_bind_feed_run_refuses_unmarked_dir_with_versions(tmp_path):
    """A dir holding cv= entries but no _RUN marker (written before
    binding existed, or by a caller passing change_run=None) must NOT
    be adopted: ownership of the existing version sequence cannot be
    proven, and stamping it would re-create the silent
    first-write-wins divergence for exactly the dirs most at risk."""
    feed = tmp_path / "feed"
    (feed / "cv=0").mkdir(parents=True)
    with pytest.raises(ValueError, match="no _RUN binding"):
        _bind_feed_run(str(feed), "tok-a")
    assert not (feed / "_RUN").exists()
    # an EMPTY unmarked dir is a legitimate first write: stamp it
    feed2 = tmp_path / "feed2"
    feed2.mkdir()
    _bind_feed_run(str(feed2), "tok-a")
    assert (feed2 / "_RUN").read_text() == "tok-a"


def test_bind_feed_run_concurrent_first_writers_single_winner(tmp_path):
    """The stamp is an atomic check-and-set: N first writers racing
    with distinct tokens must settle on exactly one binding, with
    every loser raising rather than proceeding to write (ADVICE r06:
    the old exists-then-replace stamp let both racers through)."""
    feed = str(tmp_path / "feed")
    os.makedirs(feed)
    tokens = [f"tok-{i}" for i in range(8)]
    results: dict[str, str] = {}
    barrier = threading.Barrier(len(tokens))

    def writer(tok: str) -> None:
        barrier.wait()
        try:
            _bind_feed_run(feed, tok)
            results[tok] = "bound"
        except ValueError:
            results[tok] = "refused"

    threads = [threading.Thread(target=writer, args=(t,)) for t in tokens]
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    with open(os.path.join(feed, "_RUN")) as fh:
        winner = fh.read().strip()
    assert winner in tokens
    assert results[winner] == "bound"
    assert all(
        outcome == "refused" for tok, outcome in results.items() if tok != winner
    )
    # no temp debris left behind by the losers
    assert sorted(os.listdir(feed)) == ["_RUN"]


def test_merge_with_second_run_token_raises_before_any_mutation(
    spark, tmp_path
):
    """merge_table end-to-end: a second checkpoint lifetime pointed at
    a bound feed dir must be refused BEFORE the feed or the table is
    touched — the r06 docstring promise of run_pipeline."""
    from timer_pulsar_spark.store import merge_table

    path = str(tmp_path / "t")
    feed = str(tmp_path / "feed")
    mk = lambda rows: spark.createDataFrame(rows, "k long, v string")

    merge_table(spark, path, mk([(1, "a"), (2, "b")]), ["k"],
                changes_out=feed, change_version=0, change_run="run-1")
    before_feed = sorted(
        e for e in os.listdir(feed) if e.startswith("cv=")
    )
    before_tbl = sorted(
        map(tuple, spark.read.parquet(path).toPandas().values.tolist())
    )

    with pytest.raises(ValueError, match="bound to run 'run-1'"):
        merge_table(spark, path, mk([(3, "c")]), ["k"],
                    changes_out=feed, change_version=0, change_run="run-2")

    assert sorted(
        e for e in os.listdir(feed) if e.startswith("cv=")
    ) == before_feed
    assert sorted(
        map(tuple, spark.read.parquet(path).toPandas().values.tolist())
    ) == before_tbl

    # the bound run itself continues normally
    merge_table(spark, path, mk([(3, "c")]), ["k"],
                changes_out=feed, change_version=1, change_run="run-1")
    assert spark.read.parquet(path).count() == 3


def test_pipeline_crash_restart_feed_consumer_converges(spark, tmp_path):
    """VERDICT r06 item 7, end to end: a pipeline that RESUMES its own
    checkpoint mid-feed (crash-restart) keeps appending cv= versions to
    the bound feed, and a downstream consumer that reconstructs the
    table FROM THE FEED ALONE (cv-ordered last-write-wins fold, the
    q_stream_cdf_consume contract) still converges to exactly the
    merged status table. The fresh-checkpoint test below proves the
    refusal path; this proves the resume path actually works."""
    from datetime import datetime

    from pyspark.sql.window import Window

    from timer_pulsar_spark.schemas import TIMER_ENABLED
    from timer_pulsar_spark.streaming import replay_state_partitions
    from timer_pulsar_spark.streaming.pipeline import run_pipeline_blocking

    timers = spark.createDataFrame(
        [
            (i, "app", f"t{i}", TIMER_ENABLED, "* * * * *",
             {"method": "POST", "url": "http://mock", "header": {},
              "body": ""})
            for i in (1, 2, 3)
        ],
        "id long, app string, name string, status int, cron string, "
        "notify_http_param struct<method:string,url:string,"
        "header:map<string,string>,body:string>",
    )
    tasks_dir = str(tmp_path / "tasks")
    status = str(tmp_path / "status")
    feed = str(tmp_path / "feed")
    ckpt = str(tmp_path / "ckpt")
    task_schema = "timer_id long, run_timer timestamp, status int"

    def append_tasks(rows):
        spark.createDataFrame(rows, task_schema).write.mode(
            "append"
        ).parquet(tasks_dir)

    t0 = datetime(2024, 1, 1, 0, 0)
    append_tasks([(1, t0, 0), (2, t0, 0)])
    with replay_state_partitions(spark):
        run_pipeline_blocking(spark, tasks_dir, timers, status, ckpt,
                              changes_out=feed)
    cvs_first = sorted(e for e in os.listdir(feed) if e.startswith("cv="))
    assert cvs_first, "first run must have fed at least one cv= version"

    # "crash": the query object is gone; new input lands (a later
    # minute — inside no watermark, and timer 2 re-fires: an UPDATE
    # through the feed, not just inserts); restart resumes ckpt
    t1 = datetime(2024, 1, 1, 0, 5)
    append_tasks([(2, t1, 0), (3, t1, 0)])
    with replay_state_partitions(spark):
        run_pipeline_blocking(spark, tasks_dir, timers, status, ckpt,
                              changes_out=feed)
    cvs_second = sorted(e for e in os.listdir(feed) if e.startswith("cv="))
    assert len(cvs_second) > len(cvs_first), (
        "resumed run must keep appending versions to the bound feed"
    )

    # downstream consumer: fold the feed, last write per key by cv
    w = Window.partitionBy("timer_id", "run_timer").orderBy(
        F.col("cv").desc()
    )
    cols = ["timer_id", "run_timer", "status", "output"]
    folded = (
        spark.read.parquet(feed)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(*cols)
    )
    table = spark.read.parquet(status).select(*cols)
    fold_rows = sorted(map(tuple, folded.toPandas().values.tolist()))
    tbl_rows = sorted(map(tuple, table.toPandas().values.tolist()))
    assert fold_rows == tbl_rows and len(tbl_rows) == 4


def test_pipeline_fresh_checkpoint_against_bound_feed_fails(
    spark, tmp_path
):
    """run_pipeline's docstring promise, end to end: a pipeline
    resuming ITS OWN checkpoint keeps feeding the bound changes_out,
    but a FRESH checkpoint pointed at the same feed dir fails instead
    of silently losing its restarted batch ids to first-write-wins."""
    from datetime import datetime

    from timer_pulsar_spark.schemas import TIMER_ENABLED
    from timer_pulsar_spark.streaming.pipeline import run_pipeline_blocking

    BASE = datetime(2024, 1, 1, 0, 0, 0)
    timers = spark.createDataFrame(
        [
            (1, "app", "t1", TIMER_ENABLED, "* * * * *",
             {"method": "POST", "url": "http://mock", "header": {},
              "body": ""})
        ],
        "id long, app string, name string, status int, cron string, "
        "notify_http_param struct<method:string,url:string,"
        "header:map<string,string>,body:string>",
    )
    tasks_dir = str(tmp_path / "tasks")
    status = str(tmp_path / "status")
    feed = str(tmp_path / "feed")
    spark.createDataFrame(
        [(1, BASE, 0)], "timer_id long, run_timer timestamp, status int"
    ).write.mode("append").parquet(tasks_dir)

    run_pipeline_blocking(
        spark, tasks_dir, timers, status, str(tmp_path / "ckpt1"),
        changes_out=feed,
    )
    assert any(e.startswith("cv=") for e in os.listdir(feed))

    spark.createDataFrame(
        [(1, datetime(2024, 1, 1, 0, 5), 0)],
        "timer_id long, run_timer timestamp, status int",
    ).write.mode("append").parquet(tasks_dir)
    with pytest.raises(Exception, match="bound to run"):
        run_pipeline_blocking(
            spark, tasks_dir, timers, status, str(tmp_path / "ckpt2"),
            changes_out=feed,
        )
