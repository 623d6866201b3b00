"""Write-path round-trip tests (S7-S9): append, slice-partitioned
layout with partition pruning, MERGE insert/update semantics."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from .conftest import SF_DIR


def _tasks(spark):
    from timer_pulsar_spark.operators.timerdomain import fan_out, minute_timers

    return fan_out(
        minute_timers(spark, SF_DIR), "2024-01-01 00:00:00", "2024-01-01 01:00:00"
    )


def test_append_round_trip(spark, tmp_path):
    from timer_pulsar_spark.store import append_table

    path = str(tmp_path / "tasks")
    tasks = _tasks(spark)
    append_table(tasks, path)
    append_table(tasks, path)  # append twice -> twice the rows
    assert spark.read.parquet(path).count() == 2 * tasks.count()


def test_partitioned_write_layout_and_pruning(spark, tmp_path):
    from timer_pulsar_spark.store import read_tasks_slice, write_tasks_partitioned

    path = str(tmp_path / "sliced")
    write_tasks_partitioned(_tasks(spark), path)
    # physical layout: minute=... / bucket=... directories (the ZSET slice analog)
    minutes = [d for d in os.listdir(path) if d.startswith("minute=")]
    assert len(minutes) > 50
    buckets = os.listdir(os.path.join(path, minutes[0]))
    assert any(b.startswith("bucket=") for b in buckets)

    sliced = read_tasks_slice(spark, path, "2024-01-01 00:10", "2024-01-01 00:20")
    rows = sliced.select("minute").distinct().collect()
    assert all("00:10" <= r["minute"][-5:] <= "00:19" for r in rows)
    # the minute filter must reach the scan as a partition filter
    plan = sliced._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "minute" in plan.split("PartitionFilters")[1][:200]


def test_dynamic_partition_pruning(spark, tmp_path):
    """Joining the slice store against a small minute dimension must
    prune partitions at runtime (DPP) — the scan carries a dynamic
    pruning expression instead of reading every minute directory."""
    from pyspark.sql import functions as F

    from timer_pulsar_spark.store import write_tasks_partitioned

    path = str(tmp_path / "dpp")
    write_tasks_partitioned(_tasks(spark), path)
    store = spark.read.parquet(path)
    wanted = (
        spark.range(3)
        .select(
            F.concat(F.lit("2024-01-01 00:1"), F.col("id")).alias("minute"),
            F.lit(1).alias("flag"),
        )
    )
    joined = store.join(wanted, "minute").groupBy("minute").count()
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower() or "PartitionFilters: [" in plan
    assert joined.count() == 3  # only 00:10, 00:11, 00:12 slices read


def test_merge_insert_is_idempotent(spark, tmp_path):
    from timer_pulsar_spark.store import merge_table

    path = str(tmp_path / "merged")
    tasks = _tasks(spark)
    merge_table(spark, path, tasks, ["timer_id", "run_timer"])
    n1 = spark.read.parquet(path).count()
    merge_table(spark, path, tasks, ["timer_id", "run_timer"])  # duplicate run
    assert spark.read.parquet(path).count() == n1 == tasks.count()


def test_merge_update_status_writeback(spark, tmp_path):
    """S9: executor status write-back — incoming rows replace matched
    keys, unmatched keys are inserted (woker.go:110-131 analog)."""
    from timer_pulsar_spark.store import merge_table

    path = str(tmp_path / "status")
    tasks = _tasks(spark)
    merge_table(spark, path, tasks, ["timer_id", "run_timer"])

    done = tasks.filter(F.col("timer_id") < 5).withColumn("status", F.lit(2))
    merge_table(spark, path, done, ["timer_id", "run_timer"], update_matched=True)

    after = spark.read.parquet(path)
    assert after.count() == tasks.count()  # no duplicates created
    assert after.filter("timer_id < 5").filter("status <> 2").count() == 0
    assert after.filter("timer_id >= 5").filter("status <> 0").count() == 0


def _leaf_inventory(path):
    """{leaf_dir: sorted [(file, mtime_ns, size)]} for every parquet leaf."""
    inv = {}
    for dirpath, _dirs, files in os.walk(path):
        pq = [f for f in files if f.endswith(".parquet")]
        if pq:
            inv[os.path.relpath(dirpath, path)] = sorted(
                (f, os.stat(os.path.join(dirpath, f)).st_mtime_ns,
                 os.path.getsize(os.path.join(dirpath, f)))
                for f in pq
            )
    return inv


def test_merge_partitioned_touches_only_batch_leaves(spark, tmp_path):
    """The 100 TB contract of the partition-scoped MERGE: a status
    write-back batch for one minute must rewrite exactly that minute's
    (minute, bucket) leaves — every other leaf keeps its very files
    (same names, mtimes, sizes) — while the merge semantics stay those
    of the full-table MERGE."""
    from timer_pulsar_spark.store import merge_table, task_slice_columns, write_tasks_partitioned

    path = str(tmp_path / "scoped")
    tasks = _tasks(spark)
    write_tasks_partitioned(tasks, path)
    before = _leaf_inventory(path)
    total = spark.read.parquet(path).count()

    # one minute's status batch, slice columns derived like the writer's
    batch = task_slice_columns(
        tasks.filter(F.date_format("run_timer", "yyyy-MM-dd HH:mm") == "2024-01-01 00:05")
    ).withColumn("status", F.lit(2))
    assert batch.count() > 0
    merge_table(spark, path, batch, ["timer_id", "run_timer"], update_matched=True)

    after = _leaf_inventory(path)
    touched = {leaf for leaf in after if before.get(leaf) != after[leaf]}
    assert touched, "the batch minute's leaves must be rewritten"
    assert all(leaf.startswith("minute=2024-01-01 00%3A05") for leaf in touched), touched
    untouched = set(before) - touched
    assert untouched and all(before[leaf] == after[leaf] for leaf in untouched)

    merged = spark.read.parquet(path)
    assert merged.count() == total  # no duplicates, no losses
    assert merged.filter("minute = '2024-01-01 00:05'").filter("status <> 2").count() == 0
    assert merged.filter("minute <> '2024-01-01 00:05'").filter("status <> 0").count() == 0

    # insert mode: re-merging the same batch is a no-op on row count
    merge_table(spark, path, batch.withColumn("status", F.lit(0)),
                ["timer_id", "run_timer"])
    assert spark.read.parquet(path).count() == total


def test_bucketed_tables_join_without_shuffle(spark):
    """Two tables bucketed on the same key and count must join with
    ZERO exchange — the co-located layout the 100 TB status-MERGE path
    relies on. Broadcast is disabled for the check so the planner can't
    sidestep the bucketing; the bucket metadata must carry the
    co-partitioning."""
    from timer_pulsar_spark.store import write_bucketed

    left = spark.range(0, 1000).select(
        F.col("id").alias("timer_id"), (F.col("id") * 2).alias("payload")
    )
    right = spark.range(0, 1000).select(
        F.col("id").alias("timer_id"), (F.col("id") % 7).alias("status")
    )
    write_bucketed(left, "bkt_left_test", ["timer_id"], n_buckets=8,
                   sort_cols=["timer_id"])
    write_bucketed(right, "bkt_right_test", ["timer_id"], n_buckets=8,
                   sort_cols=["timer_id"])
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("bkt_left_test").join(
            spark.table("bkt_right_test"), "timer_id"
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert joined.count() == 1000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS bkt_left_test")
        spark.sql("DROP TABLE IF EXISTS bkt_right_test")


def test_compact_table_preserves_content_and_reduces_files(spark, tmp_path):
    """Compaction is a layout-only rewrite: the order-independent
    checksum must not move, the file count must drop to the bin-packed
    target, and a sort_col rewrite must leave files range-disjoint."""
    from timer_pulsar_spark.store import compact_table

    path = str(tmp_path / "frag")
    # 64 tiny files — the post-streaming-sink shape
    spark.range(0, 20_000).select(
        F.col("id"), (F.col("id") % 13).alias("k")
    ).repartition(64).write.parquet(path)

    def checksum():
        return (
            spark.read.parquet(path)
            .agg(
                F.sum(
                    F.conv(
                        F.substring(
                            F.md5(F.concat_ws("|", "id", "k")), 1, 12
                        ),
                        16,
                        10,
                    ).cast("long")
                )
            )
            .collect()[0][0]
        )

    before = checksum()
    stats = compact_table(spark, path, target_file_bytes=1 << 30)
    assert stats["files_before"] == 64
    assert stats["files_after"] == 1
    assert checksum() == before

    # clustered re-compaction: files must be range-disjoint on sort_col
    spark.read.parquet(path).repartition(16).write.mode("overwrite").parquet(path)
    compact_table(spark, path, target_file_bytes=1, sort_col="id")
    import glob as _glob

    import pyarrow.parquet as pq

    ranges = []
    for f in _glob.glob(f"{path}/*.parquet"):
        md = pq.read_metadata(f)
        if md.num_rows == 0:
            continue
        col = md.row_group(0).column(0)
        lo = col.statistics.min
        hi = pq.read_metadata(f).row_group(md.num_row_groups - 1).column(0).statistics.max
        ranges.append((lo, hi))
    ranges.sort()
    assert len(ranges) > 1
    for prev, nxt in zip(ranges, ranges[1:]):
        assert prev[1] < nxt[0], (prev, nxt)
    assert checksum() == before


def test_snapshot_versioning_time_travel_and_rollback(spark, tmp_path):
    """Snapshot commits are atomic pointer flips: latest follows the
    newest commit, any old version stays readable (time travel),
    rollback is O(1) metadata, and vacuum never removes the live
    version."""
    from timer_pulsar_spark.store import (
        read_snapshot,
        rollback_snapshot,
        snapshot_versions,
        vacuum_snapshots,
        write_snapshot,
    )

    path = str(tmp_path / "snap")
    v0 = write_snapshot(spark.range(0, 100), path)
    v1 = write_snapshot(spark.range(0, 150), path)
    v2 = write_snapshot(spark.range(0, 120), path)
    assert (v0, v1, v2) == (0, 1, 2)
    assert snapshot_versions(path) == [0, 1, 2]

    assert read_snapshot(spark, path).count() == 120          # latest
    assert read_snapshot(spark, path, version=0).count() == 100  # travel

    rollback_snapshot(path, 1)
    assert read_snapshot(spark, path).count() == 150
    import pytest as _pytest

    with _pytest.raises(ValueError):
        rollback_snapshot(path, 99)

    # vacuum keeps the newest 1 AND the live version (1)
    removed = vacuum_snapshots(path, keep=1)
    assert 1 not in removed and 2 not in removed
    assert removed == [0]
    assert read_snapshot(spark, path).count() == 150


def test_compact_partitioned_preserves_layout(spark, tmp_path):
    """Per-leaf compaction must keep the hive layout (partition dirs
    intact, partition pruning still works) while shrinking file counts
    inside each leaf."""
    import glob as _glob

    from timer_pulsar_spark.store import compact_partitioned

    path = str(tmp_path / "hive")
    (
        spark.range(0, 4000)
        .select(F.col("id"), (F.col("id") % 4).alias("part"))
        .repartition(8)
        .write.partitionBy("part")
        .parquet(path)
    )
    before = len(_glob.glob(f"{path}/part=*/*.parquet"))
    stats = compact_partitioned(spark, path, target_file_bytes=1 << 30)
    after = len(_glob.glob(f"{path}/part=*/*.parquet"))
    assert stats["leaves"] == 4
    assert before > 4 and after == 4  # one bin-packed file per leaf
    back = spark.read.parquet(path)
    assert back.count() == 4000
    assert back.filter("part = 2").count() == 1000
    plan = back.filter("part = 2")._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
