"""Structured-Streaming execution pipeline (SURVEY.md entry point B)."""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import SparkSession


@contextmanager
def replay_state_partitions(spark: SparkSession, n: int = 8):
    """Size streaming state/shuffle partitions to a bounded replay.

    Stateful micro-batches commit one state-store delta PER SHUFFLE
    PARTITION per batch, so the analytics default (32) charges 32
    commit round-trips to every batch even when the replay holds a few
    thousand rows — measured 5x end-to-end on the interval-join replay
    (14.7 s -> 3.0 s at sf0.01). The value locks into the checkpoint at
    the first batch, which is why this wraps the whole run (each
    registered replay uses a fresh temp checkpoint). A real deployment
    sizes this to sustained rows/sec, not to the batch-analytics
    default — same principle, bigger n.
    """
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


def await_or_raise(q, timeout_sec: int) -> None:
    """``q.awaitTermination(timeout)`` with the failure modes surfaced
    (ADVICE r11): the bare call returns ``False`` on timeout and the
    replay code used to fall through and read a PARTIAL output dir as
    if the run had finished — a quietly-wrong result instead of an
    error on a slow machine. Raises ``TimeoutError`` on timeout and
    re-raises the query's own exception on failure, so every
    foreachBatch replay in the repo either completes or errors."""
    if not q.awaitTermination(timeout_sec):
        q.stop()
        raise TimeoutError(
            f"streaming replay did not finish within {timeout_sec}s "
            f"(query {q.id}); refusing to read a partial output"
        )
    exc = q.exception()
    if exc is not None:
        raise exc


def latest_state_version(work: str, before: int | None = None) -> str | None:
    """Highest-numbered ``state_<id>`` dir under ``work``; with
    ``before``, only versions strictly below it — the predecessor a
    (re)delivered batch must fold onto.

    This is the versioned-dir discipline EVERY manual foreachBatch
    fold in this repo follows (ADVICE r07, generalized in r8): a fold
    reads the newest state strictly OLDER than its own batch id and
    overwrites its own ``state_<batch_id>`` dir. Two failure modes die
    at once: (a) read-under-write — a batch redelivered after its
    state write but before the checkpoint commit never reads the dir
    it is overwriting; (b) double-fold — a versionless
    read-fold-replace state makes the retry fold the batch into state
    that ALREADY contains it, silently corrupting any non-idempotent
    aggregate (sums/counts; min/max only survive by luck). With the
    predecessor read, a retry recomputes byte-identical content from
    the same inputs."""
    import os
    import re

    vs = [
        int(m.group(1))
        for e in os.listdir(work)
        if (m := re.match(r"state_(\d+)$", e))
        and (before is None or int(m.group(1)) < before)
    ]
    return os.path.join(work, f"state_{max(vs)}") if vs else None


def stage_range_split(df, in_dir: str, n_files: int, sort_cols: list[str],
                      base_mtime: int = 1_700_000_000) -> int:
    """DISTRIBUTED arrival staging for streaming-twin replays: write
    the input as up to n_files range-partitioned parquet files
    (disjoint ascending ranges on sort_cols, sorted within each) and
    stamp explicit monotonic mtimes, so the file source's mtime
    ordering replays exact global arrival order. Range partitioning
    guarantees file i's keys all precede file i+1's, which is the only
    property the twins need — the replayed fold must equal the batch
    result for ANY time-ordered split (split-independence is the
    tested contract).

    This replaces the old orderBy().toPandas() staging: the corpus is
    range-exchanged executor-side and never crosses to the driver, so
    the twins stage at any SF the cluster can shuffle. Returns the
    number of files staged."""
    import glob
    import os
    import shutil
    import tempfile

    tmp = tempfile.mkdtemp(prefix="stage_rs_")
    (
        df.repartitionByRange(n_files, *sort_cols)
        .sortWithinPartitions(*sort_cols)
        .write.mode("overwrite")
        .parquet(tmp)
    )
    files = sorted(glob.glob(os.path.join(tmp, "part-*.parquet")))
    os.makedirs(in_dir, exist_ok=True)
    n = 0
    for fp in files:
        if os.path.getsize(fp) == 0:
            continue
        dest = os.path.join(in_dir, f"part-{n:03d}.parquet")
        shutil.move(fp, dest)
        os.utime(dest, (base_mtime + n, base_mtime + n))
        n += 1
    shutil.rmtree(tmp, ignore_errors=True)
    return n
