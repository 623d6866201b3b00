"""Round-5 operator tests: the SemDeDup codebook cap, merge_table's
partitioned full-table fallback, per-query producer idempotency on the
broker fake, multi-consumer group assignment, and read-side
idempotency of the incremental near-dup index."""

from __future__ import annotations

import math

import pytest

from pyspark.sql import functions as F

from .conftest import SF_DIR


def test_semdedup_k_cap_bounds_driver_codebook(spark, monkeypatch):
    """With the cap forced below ceil(n/target), k must clamp to the
    cap (bounded driver codebook — the only thing collect()ed), the
    effective cell target must grow to ceil(n/k), and the contract
    booleans must hold under the grown cells: this is the paper's
    fixed-cluster regime where cell size, not driver state, absorbs
    corpus growth."""
    from timer_pulsar_spark.operators import similarity

    n = 500  # sf0.001 embeddings; ceil(500/32) = 16 > cap of 8
    monkeypatch.setattr(similarity, "SEMDEDUP_K_CAP", 8)
    pairs, assigned, k, n_got = similarity.semdedup_scaled(spark, SF_DIR)
    assert n_got == n
    assert k == 8  # capped, NOT ceil(n/32)=16
    eff_target = max(
        similarity.SEMDEDUP_TARGET_CELL, math.ceil(n / k)
    )
    max_cell = (
        assigned.groupBy("cell_id").count().agg(F.max("count")).collect()[0][0]
    )
    assert max_cell <= 8 * eff_target
    # pairs stay sound under the capped clustering
    bad = pairs.filter(
        F.col("cosine") < similarity.SEMDEDUP_THRESHOLD
    ).count()
    assert bad == 0


def test_semdedup_check_green_with_cap_slack_and_binding(spark, monkeypatch):
    """q_semdedup_scaled_check must stay all-green both when the cap is
    slack (default: k = ceil(n/target), the pre-cap behavior — VERDICT
    done-criterion 'booleans unchanged') and when it binds."""
    from timer_pulsar_spark.operators import similarity

    row = similarity.q_semdedup_scaled_check(spark, SF_DIR).collect()[0]
    assert row.k == math.ceil(row.n / similarity.SEMDEDUP_TARGET_CELL)
    assert row.k_scales and row.cells_bounded and row.pairs_sound

    monkeypatch.setattr(similarity, "SEMDEDUP_K_CAP", 8)
    row2 = similarity.q_semdedup_scaled_check(spark, SF_DIR).collect()[0]
    assert row2.k == 8
    assert row2.k_scales and row2.cells_bounded and row2.pairs_sound


def test_near_dup_fold_retry_is_idempotent(spark, tmp_path):
    """Redelivering a fold after a crash BETWEEN the postings write and
    the checkpoint commit must change nothing: the recomputed batch
    must not join its own crashed-attempt postings (self-pairs /
    double-counted shared shingles — ADVICE r04 read-side fix)."""
    from timer_pulsar_spark.catalog import load_table
    from timer_pulsar_spark.operators.dedup import near_dup_fold_batch

    index = str(tmp_path / "index")
    out = str(tmp_path / "pairs")
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    b0 = docs.filter(F.col("doc_id") % 2 == 0)
    b1 = docs.filter(F.col("doc_id") % 2 == 1)

    near_dup_fold_batch(spark, index, out, b0, 0)
    near_dup_fold_batch(spark, index, out, b1, 1)
    clean = (
        spark.read.parquet(out).drop("batch")
        .orderBy("doc_a", "doc_b").toPandas()
    )
    # simulate the crash-redelivery: batch 1's postings are already in
    # the index (written before the "crash"), then batch 1 re-runs
    near_dup_fold_batch(spark, index, out, b1, 1)
    retried = (
        spark.read.parquet(out).drop("batch")
        .orderBy("doc_a", "doc_b").toPandas()
    )
    assert retried.equals(clean)
    assert (retried["doc_a"] < retried["doc_b"]).all()  # no self-pairs
    assert (retried["jaccard"] <= 1.0).all()


def _tasks(spark):
    from timer_pulsar_spark.operators.timerdomain import fan_out, minute_timers

    return fan_out(
        minute_timers(spark, SF_DIR), "2024-01-01 00:00:00", "2024-01-01 01:00:00"
    )


def test_merge_partitioned_requires_partition_columns(spark, tmp_path):
    """Merging into a hive-partitioned table with incoming that lacks
    the partition columns must raise a clear error, NOT crash on an
    unresolved column or silently flatten the layout (ADVICE r04: the
    old 'drop the partition columns to force the full path' hatch was
    both broken and unsafe)."""
    from timer_pulsar_spark.store import (
        merge_table,
        task_slice_columns,
        write_tasks_partitioned,
    )

    path = str(tmp_path / "scoped")
    tasks = _tasks(spark)
    write_tasks_partitioned(tasks, path)

    bare = tasks.limit(5).withColumn("status", F.lit(2))  # no minute/bucket
    with pytest.raises(ValueError, match="partition column"):
        merge_table(spark, path, bare, ["timer_id", "run_timer"],
                    update_matched=True)
    # table untouched by the refused merge
    assert spark.read.parquet(path).filter("status <> 0").count() == 0


def test_merge_full_table_preserves_hive_layout(spark, tmp_path):
    """full_table=True on a partitioned target: whole-table merge
    semantics, hive layout preserved (partition dirs survive, slice
    pruning still works)."""
    from timer_pulsar_spark.store import (
        merge_table,
        read_tasks_slice,
        table_partition_cols,
        task_slice_columns,
        write_tasks_partitioned,
    )

    path = str(tmp_path / "full")
    tasks = _tasks(spark)
    write_tasks_partitioned(tasks, path)
    total = spark.read.parquet(path).count()

    batch = task_slice_columns(
        tasks.filter(
            F.date_format("run_timer", "yyyy-MM-dd HH:mm") == "2024-01-01 00:05"
        )
    ).withColumn("status", F.lit(2))
    merge_table(
        spark, path, batch, ["timer_id", "run_timer"],
        update_matched=True, full_table=True,
    )

    assert table_partition_cols(path) == ["minute", "bucket"]
    merged = spark.read.parquet(path)
    assert merged.count() == total
    assert merged.filter("minute = '2024-01-01 00:05'").filter(
        "status <> 2").count() == 0
    assert merged.filter("minute <> '2024-01-01 00:05'").filter(
        "status <> 0").count() == 0
    # pruning still functional on the rewritten layout
    sl = read_tasks_slice(spark, path, "2024-01-01 00:05", "2024-01-01 00:06")
    assert sl.count() == batch.count()


def test_dedup_near_auto_check_holds_above_switch(spark, monkeypatch):
    """The subset+recall contract must hold on the MinHash arm too —
    the regime where exact parity is NOT guaranteed and the old
    parity oracle could fail spuriously (ADVICE r04)."""
    import timer_pulsar_spark.operators.dedup as dedup

    monkeypatch.setattr(dedup, "NEAR_DUP_AUTO_THRESHOLD", 1)
    row = dedup.q_dedup_near_auto_check(spark, SF_DIR).collect()[0]
    assert row.switched  # the banded arm actually ran
    assert row.pairs_sound and row.recall_ok


def test_partitioned_write_bloom_is_adaptively_sized(spark, tmp_path):
    """The timer_id parquet bloom must not dominate small leaves:
    without adaptive sizing parquet-mr allocates its 1 MiB maximum
    bitset per file (measured 1,050,056 bytes for a 100-row leaf —
    1000x write amplification across every minute×bucket leaf at
    100 TB). Adaptive sizing keeps the leaf within tens of KB; an
    exact NDV hint shrinks it further."""
    import glob
    import os

    from timer_pulsar_spark.store import write_tasks_partitioned

    tasks = _tasks(spark)
    p1 = str(tmp_path / "adaptive")
    write_tasks_partitioned(tasks, p1)
    files = glob.glob(os.path.join(p1, "minute=*", "bucket=*", "*.parquet"))
    assert files
    biggest = max(os.path.getsize(f) for f in files)
    assert biggest < 200_000, f"bloom bloat back: {biggest} bytes/leaf"

    p2 = str(tmp_path / "hinted")
    write_tasks_partitioned(tasks, p2, bloom_ndv=1000)
    files2 = glob.glob(os.path.join(p2, "minute=*", "bucket=*", "*.parquet"))
    biggest2 = max(os.path.getsize(f) for f in files2)
    assert biggest2 < biggest
    # content identical either way
    assert (
        spark.read.parquet(p2).count() == spark.read.parquet(p1).count()
        == tasks.count()
    )


def test_pq_topk_contract(spark, duck):
    """PQ-ADC + exact re-rank: the check twin's booleans must both
    hold (recall floor vs brute force, exact cosine on shared pairs),
    and the shortlist path must emit exactly TOP_K rows per query."""
    from timer_pulsar_spark.operators import similarity

    row = similarity.q_pq_check(spark, SF_DIR).collect()[0]
    assert row.recall_ok and row.exact_rerank_ok

    out = similarity.q_pq_topk(spark, SF_DIR).toPandas()
    per_q = out.groupby("query_id").size()
    assert (per_q == similarity.TOP_K).all()
    assert (out["rnk"].groupby(out["query_id"]).max() == similarity.TOP_K).all()


def test_pq_train_bounded_and_monotone(spark):
    """The PQ trainer's contract: only the (m·ksub·subdim)-float
    codebook crosses to the driver, inertia never increases across
    Lloyd iterations, and every corpus vector gets exactly m codes in
    [0, ksub)."""
    from timer_pulsar_spark.operators import similarity
    from timer_pulsar_spark.catalog import load_table

    assign, cb, inertias, subdim = similarity.pq_train_encode(spark, SF_DIR)
    assert len(cb) == similarity.PQ_M * similarity.PQ_KSUB
    assert all(len(cent) == subdim for _b, _c, cent in cb)
    assert all(
        inertias[i + 1] <= inertias[i] + 1e-9 for i in range(len(inertias) - 1)
    )
    n = load_table(spark, SF_DIR, "embeddings").count()
    stats = assign.agg(
        F.count("*").alias("rows"),
        F.min("code").alias("cmin"),
        F.max("code").alias("cmax"),
    ).collect()[0]
    assert stats.rows == n * similarity.PQ_M
    assert 0 <= stats.cmin and stats.cmax < similarity.PQ_KSUB


def test_interval_join_bucketed_plan_has_no_nested_loop(spark):
    """The whole point of the bucketed interval join: the physical plan
    must be an equi-join (shuffle/broadcast HASH or sort-merge on
    (day, bucket)), never BroadcastNestedLoopJoin or CartesianProduct —
    the shapes the raw inequality predicate would force on big-big
    sides."""
    from timer_pulsar_spark.operators.timeseries import (
        q_interval_join_bucketed,
    )

    plan = (
        q_interval_join_bucketed(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_pretrain_mix_is_one_plan_composition(spark, duck):
    """The composed prep must equal its stage-by-stage execution AND
    stay a single plan: the gate reaches the scan (filter below the
    first exchange) and the domain cap compiles to the map-side
    WindowGroupLimit."""
    from timer_pulsar_spark.operators.sampling import q_pretrain_mix

    df = q_pretrain_mix(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan, plan

    out = df.toPandas()
    assert len(out) > 0
    # mixture respected: zh kept at 25% of its hash space -> no zh doc
    # with bucket >= 25 survives
    import hashlib

    for _i, r in out.iterrows():
        b = int(hashlib.md5(str(r.doc_id).encode()).hexdigest()[:6], 16) % 100
        from timer_pulsar_spark.operators.sampling import MIX_RATES

        assert b < MIX_RATES[r.lang], (r.doc_id, r.lang, b)
    # domain cap respected
    per_source = out.groupby("source").size()
    from timer_pulsar_spark.operators.sampling import DOMAIN_CAP

    assert (per_source <= DOMAIN_CAP).all()
    # gate respected
    assert (out["n_tokens"] >= 50).all()


def test_pq_model_roundtrip_and_fixed_encode(spark, tmp_path):
    """Model persistence: a saved codebook reloads bit-identical, and
    the fixed-codebook online encoder reproduces the trainer's final
    assignment exactly (the offline-train / online-encode split)."""
    from timer_pulsar_spark.catalog import load_table
    from timer_pulsar_spark.operators import similarity

    assign, cb, _inertias, subdim = similarity.pq_train_encode(spark, SF_DIR)
    path = str(tmp_path / "pq_model")
    similarity.save_pq_model(spark, path, cb, subdim)
    cb2, meta = similarity.load_pq_model(spark, path)
    assert cb2 == sorted(cb, key=lambda r: (r[0], r[1]))
    assert meta == {
        "kind": "pq",
        "m": similarity.PQ_M,
        "ksub": similarity.PQ_KSUB,
        "subdim": subdim,
    }

    e = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    enc = similarity.pq_encode_with_model(spark, e, cb2, meta["subdim"])
    a = assign.orderBy("vec_id", "block").toPandas()
    b = enc.orderBy("vec_id", "block").toPandas()
    assert a[["vec_id", "block", "code"]].equals(b[["vec_id", "block", "code"]])


def test_merge_change_data_feed(spark, tmp_path):
    """The CDF sidecar: each merge writes exactly the per-key changes
    it applies — inserts for new keys, update_postimage for matched
    keys under update mode, nothing for matched keys under insert
    mode — version-keyed so a retried merge replaces its own entry."""
    from timer_pulsar_spark.store import merge_table

    path = str(tmp_path / "t")
    feed = str(tmp_path / "feed")
    mk = lambda rows: spark.createDataFrame(rows, "k long, v string")

    # v0: table creation -> all inserts
    merge_table(spark, path, mk([(1, "a"), (2, "b")]), ["k"],
                changes_out=feed, change_version=0)
    # v1: insert mode, one duplicate + one new -> only the new key
    merge_table(spark, path, mk([(2, "bb"), (3, "c")]), ["k"],
                changes_out=feed, change_version=1)
    # v2: update mode -> postimage for matched, insert for new
    merge_table(spark, path, mk([(1, "a2"), (4, "d")]), ["k"],
                update_matched=True, changes_out=feed, change_version=2)
    # retry of v2 AFTER the table advanced: first write wins — the
    # entry must NOT be recomputed (that would relabel key 4, which
    # the retry now finds matched, as update_postimage)
    merge_table(spark, path, mk([(1, "a2"), (4, "d")]), ["k"],
                update_matched=True, changes_out=feed, change_version=2)

    f = spark.read.parquet(feed).toPandas()
    got = sorted(map(tuple, f[["cv", "k", "_op"]].astype(str).values.tolist()))
    assert got == sorted(
        [
            ("0", "1", "insert"), ("0", "2", "insert"),
            ("1", "3", "insert"),
            ("2", "1", "update_postimage"), ("2", "4", "insert"),
        ]
    ), got
    # table state matches the feed's story
    t = spark.read.parquet(path).toPandas().sort_values("k")
    assert t["v"].tolist() == ["a2", "b", "c", "d"]

    # auto-versioning continues after the explicit ones
    merge_table(spark, path, mk([(5, "e")]), ["k"], changes_out=feed)
    f2 = spark.read.parquet(feed).toPandas()
    assert str(f2["cv"].astype(int).max()) == "3"


def test_merge_change_feed_partition_scoped(spark, tmp_path):
    """CDF on a hive-partitioned target: the feed is computed against
    the same pruned leaf view the scoped merge reads, and reports only
    the genuinely-new keys of the touched minute."""
    from timer_pulsar_spark.store import (
        merge_table,
        task_slice_columns,
        write_tasks_partitioned,
    )

    path = str(tmp_path / "tasks")
    feed = str(tmp_path / "feed")
    tasks = _tasks(spark)
    write_tasks_partitioned(tasks, path)

    batch = task_slice_columns(
        tasks.filter(
            F.date_format("run_timer", "yyyy-MM-dd HH:mm") == "2024-01-01 00:05"
        )
    ).withColumn("status", F.lit(2))
    n = batch.count()
    merge_table(spark, path, batch, ["timer_id", "run_timer"],
                update_matched=True, changes_out=feed, change_version=7)
    f = spark.read.parquet(feed).toPandas()
    assert len(f) == n
    assert (f["_op"] == "update_postimage").all()  # every key pre-existed
    assert (f["cv"] == 7).all()


def test_pipeline_merge_emits_change_feed(spark, tmp_path):
    """End-to-end CDF through the streaming pipeline: each status
    MERGE batch records its applied changes under cv=<batch_id>;
    re-running from the same checkpoint with replayed + new input
    feeds ONLY the genuinely new keys (replays are either deduped
    upstream or matched no-ops)."""
    from datetime import datetime, timedelta

    from timer_pulsar_spark.schemas import TIMER_ENABLED
    from timer_pulsar_spark.streaming.pipeline import run_pipeline_blocking

    BASE = datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (i, "app", f"t{i}", TIMER_ENABLED, "* * * * *",
         {"method": "POST", "url": "http://mock", "header": {}, "body": ""})
        for i in range(1, 4)
    ]
    timers = spark.createDataFrame(
        rows,
        "id long, app string, name string, status int, cron string, "
        "notify_http_param struct<method:string,url:string,"
        "header:map<string,string>,body:string>",
    )
    tasks_dir = str(tmp_path / "tasks")
    status = str(tmp_path / "status")
    ckpt = str(tmp_path / "ckpt")
    feed = str(tmp_path / "feed")

    def write_tasks(entries):
        spark.createDataFrame(
            entries, "timer_id long, run_timer timestamp, status int"
        ).write.mode("append").parquet(tasks_dir)

    batch1 = [(tid, BASE, 0) for tid in (1, 2, 3)]
    write_tasks(batch1 + batch1)  # in-batch duplicates
    run_pipeline_blocking(
        spark, tasks_dir, timers, status, ckpt, changes_out=feed
    )
    f1 = spark.read.parquet(feed).toPandas()
    assert sorted(f1["timer_id"]) == [1, 2, 3]
    assert (f1["_op"] == "insert").all()

    # replay timer 1 (beyond-watermark dup) + one genuinely new task
    write_tasks([(1, BASE, 0), (2, BASE + timedelta(minutes=5), 0)])
    run_pipeline_blocking(
        spark, tasks_dir, timers, status, ckpt, changes_out=feed
    )
    f2 = spark.read.parquet(feed).toPandas()
    new = f2[~f2["cv"].isin(f1["cv"])]
    # the replayed key is a matched no-op (status unchanged -> update
    # emitted only for it if it reached the merge; the genuinely new
    # key must appear exactly once as an insert)
    inserts = new[new["_op"] == "insert"]
    assert sorted(inserts["timer_id"]) == [2]
    assert spark.read.parquet(status).count() == 4


def test_snapshot_diff(spark, tmp_path):
    """Row-level diff between two commits: added / removed / changed
    keys with the target-side values; the complement of the change
    feed for commits made before a feed was wired."""
    from timer_pulsar_spark.store import snapshot_diff, write_snapshot

    path = str(tmp_path / "snap")
    mk = lambda rows: spark.createDataFrame(rows, "k long, v string")
    v0 = write_snapshot(mk([(1, "a"), (2, "b"), (3, "c")]), path)
    v1 = write_snapshot(mk([(2, "b"), (3, "c2"), (4, "d")]), path)

    d = snapshot_diff(spark, path, ["k"], v0, v1).toPandas()
    got = sorted(map(tuple, d[["k", "_change"]].values.tolist()))
    assert got == [(1, "removed"), (3, "changed"), (4, "added")]
    vals = {int(r.k): r.v for _i, r in d.iterrows()}
    assert vals[3] == "c2" and vals[4] == "d" and vals[1] is None
    # identity diff is empty
    assert snapshot_diff(spark, path, ["k"], v1, v1).count() == 0


def test_vacuum_change_feed(spark, tmp_path):
    """Feed retention below a consumer watermark: vacuumed versions
    disappear, newer ones keep their exactly-once entries."""
    from timer_pulsar_spark.store import merge_table, vacuum_change_feed

    path = str(tmp_path / "t")
    feed = str(tmp_path / "feed")
    mk = lambda rows: spark.createDataFrame(rows, "k long, v string")
    for i, rows in enumerate([[(1, "a")], [(2, "b")], [(3, "c")]]):
        merge_table(spark, path, mk(rows), ["k"],
                    changes_out=feed, change_version=i)

    removed = vacuum_change_feed(feed, 1)
    assert removed == [0, 1]
    f = spark.read.parquet(feed).toPandas()
    assert sorted(f["k"]) == [3] and (f["cv"] == 2).all()
    # idempotent
    assert vacuum_change_feed(feed, 1) == []
