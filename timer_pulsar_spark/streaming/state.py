"""Partition-scoped, versioned, VACUUMABLE fold state (VERDICT r08 #1).

The r8 batch-id-versioned discipline (``streaming.latest_state_version``)
made every manual foreachBatch fold redelivery-safe, but the two
corpus-keyed count folds (exact-dedup canonical table, heavy-hitters
vocabulary) paid for it with the one remaining 100 TB scale-killer:
each micro-batch read the FULL predecessor state, re-aggregated, and
wrote a COMPLETE new ``state_<batch_id>`` copy, and no version was ever
deleted — O(accumulated state) I/O per batch and O(batches x state)
storage.

This module is the fix, reusing ``store.merge_table``'s leaf-scoped
idiom (store.py:211) at the state layer:

- State lives under ``root/p_<part>/v_<batch_id>/`` parquet leaves,
  ``part = pmod(xxhash64(key), n_parts)``. A fold touches ONLY the
  partitions its batch has keys for: per-batch I/O is
  O(batch + touched_fraction x state), never O(state) once n_parts
  exceeds the per-batch key count — the small-shard ingest shape a
  1-second micro-batch at 100 TB actually has.
- Every fold reads, per touched partition, the newest version STRICTLY
  below its own batch id (the r8 strict-predecessor law, now per
  partition), so a batch redelivered after its state write but before
  the checkpoint commit recomputes byte-identical leaves from the same
  inputs — sums cannot double-count and untouched partitions are never
  rewritten at all.
- Publish is ATOMIC per leaf (ADVICE r08): the folded frame is written
  once, partitionBy(part), into a ``stage_<batch_id>_<uuid>`` sibling,
  then each partition dir is os.rename()d into place — a reader
  resolving "latest version" can never select a half-written leaf,
  because leaves only appear under their selectable name complete.
- ``vacuum_state`` bounds versions: per partition it keeps the current
  batch's leaf plus the single newest strict-predecessor (what a
  crash-window retry of the CURRENT batch still needs) and deletes
  everything older — version count per partition is <= 2 at any stream
  length, storage O(state), not O(batches x state).

n_parts is pinned in ``root/_meta.json`` at the first fold: silently
changing it mid-stream would re-hash keys into different partitions and
split a key's history across leaves, so a mismatch raises.
"""

from __future__ import annotations

import json
import os
import re
import shutil
import uuid
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Replay-scale default. A real deployment sizes this like shuffle
# partitions: ~ state_bytes / 128 MiB, so one leaf stays one task.
STATE_PARTS = 8

_VRE = re.compile(r"v_(\d+)$")
_PRE = re.compile(r"p_(\d+)$")


def _pin_n_parts(root: str, n_parts: int) -> int:
    meta = os.path.join(root, "_meta.json")
    if os.path.exists(meta):
        with open(meta) as fh:
            pinned = json.load(fh)["n_parts"]
        if pinned != n_parts:
            raise ValueError(
                f"state at {root} was created with n_parts={pinned}; "
                f"refolding with n_parts={n_parts} would split key "
                "histories across partitions"
            )
        return pinned
    os.makedirs(root, exist_ok=True)
    with open(meta, "w") as fh:
        json.dump({"n_parts": n_parts}, fh)
    return n_parts


def partition_versions(
    root: str, parts: set[int] | None = None
) -> dict[int, list[int]]:
    """All published versions per partition: {part: sorted [batch_id]}.
    With ``parts``, lists ONLY those partition dirs — the per-fold fast
    path (a fold needs its touched partitions, never a full O(n_parts)
    directory walk per micro-batch)."""
    out: dict[int, list[int]] = {}
    if not os.path.isdir(root):
        return out
    if parts is not None:
        entries = [f"p_{p}" for p in parts]
    else:
        entries = [e for e in os.listdir(root) if _PRE.match(e)]
    for entry in entries:
        pdir = os.path.join(root, entry)
        if not os.path.isdir(pdir):
            continue
        vs = sorted(
            int(vm.group(1))
            for v in os.listdir(pdir)
            if (vm := _VRE.match(v))
        )
        if vs:
            out[int(_PRE.match(entry).group(1))] = vs
    return out


def latest_partition_versions(
    root: str, before: int | None = None, parts: set[int] | None = None
) -> dict[int, int]:
    """Newest published version per partition; with ``before``, only
    versions strictly below it — the per-partition predecessor a
    (re)delivered batch must fold onto."""
    out: dict[int, int] = {}
    for p, vs in partition_versions(root, parts).items():
        eligible = [v for v in vs if before is None or v < before]
        if eligible:
            out[p] = max(eligible)
    return out


def _leaf(root: str, part: int, version: int) -> str:
    return os.path.join(root, f"p_{part}", f"v_{version}")


def read_state(
    spark: SparkSession,
    root: str,
    before: int | None = None,
    parts: set[int] | None = None,
) -> DataFrame | None:
    """Union of the newest leaf per partition (optionally restricted to
    ``parts`` / versions strictly below ``before``); None if no state.
    With ``parts`` only those partition dirs are listed at all."""
    latest = latest_partition_versions(root, before, parts)
    paths = [_leaf(root, p, v) for p, v in sorted(latest.items())]
    return spark.read.parquet(*paths) if paths else None


def vacuum_state(
    root: str, current_batch_id: int, parts: set[int] | None = None
) -> int:
    """Delete state versions no future fold or retry can need: per
    partition keep the current batch's leaf plus the single newest
    version strictly below it (the crash-window retry of the CURRENT
    batch reads that predecessor; batches below it are checkpoint-
    committed, so their versions are dead). Also clears stage dirs left
    by crashed attempts of older batches. Returns #dirs removed.

    With ``parts``, vacuums only those partitions — the per-fold fast
    path. Scoping to the touched set preserves the <=2-versions bound
    globally: versions are only CREATED by a touch, and every touch
    vacuums its own partition, so an untouched partition stays frozen
    at whatever (already-bounded) version set its last touch left."""
    removed = 0
    for p, vs in partition_versions(root, parts).items():
        preds = [v for v in vs if v < current_batch_id]
        keep = set(preds[-1:]) | {current_batch_id}
        for v in vs:
            if v not in keep:
                shutil.rmtree(_leaf(root, p, v), ignore_errors=True)
                removed += 1
    # stale stage dirs (a crashed attempt's leftovers) need a root
    # listing — skip it on the scoped per-fold path (each fold removes
    # its own stage on success; at most one stray survives a crash and
    # any full vacuum or the replay-root pruning reclaims it)
    if parts is None and os.path.isdir(root):
        for entry in os.listdir(root):
            m = re.match(r"stage_(\d+)_", entry)
            if m and int(m.group(1)) < current_batch_id:
                shutil.rmtree(os.path.join(root, entry), ignore_errors=True)
                removed += 1
    return removed


def partitioned_fold(
    spark: SparkSession,
    root: str,
    batch_agg: DataFrame,
    key_col: str,
    remerge: Callable[[DataFrame], DataFrame],
    batch_id: int,
    n_parts: int = STATE_PARTS,
    vacuum: bool = True,
) -> set[int]:
    """One leaf-scoped fold step. ``batch_agg`` is the batch already
    reduced to one row per ``key_col``; ``remerge`` re-aggregates a
    union of predecessor + batch rows back to one row per key (the
    merge law: min/sum/union — must be commutative, associative, and
    equal to the one-shot aggregate). Returns the touched partitions.

    Cost shape: O(batch) to aggregate + O(touched partitions' state) to
    remerge/rewrite; partitions without batch keys are NOT read, NOT
    rewritten, and keep their old version (read_state takes the newest
    per partition, so mixed-version reads are the normal state)."""
    n_parts = _pin_n_parts(root, n_parts)
    part = F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_parts)).cast("int")
    # pin the (small: one row per batch key) aggregate so the touched-
    # partition probe and the merge don't recompute it twice
    agg = batch_agg.withColumn("fold_p", part).localCheckpoint(eager=True)
    touched = {
        r.fold_p for r in agg.select("fold_p").distinct().collect()
    }
    if not touched:
        return touched

    prev = read_state(spark, root, before=batch_id, parts=touched)
    merged = agg.drop("fold_p")
    if prev is not None:
        merged = remerge(prev.unionByName(merged))
    merged = merged.withColumn("fold_p", part)

    stage = os.path.join(root, f"stage_{batch_id}_{uuid.uuid4().hex[:8]}")
    merged.write.mode("overwrite").partitionBy("fold_p").parquet(stage)
    for p in sorted(touched):
        src = os.path.join(stage, f"fold_p={p}")
        dst = _leaf(root, p, batch_id)
        if not os.path.isdir(src):
            # a touched partition produced no merged rows. For the
            # merge laws this module serves (grow-only min/sum/union
            # folds) that cannot happen — prev ∪ batch is non-empty for
            # a touched partition. A law that can DELETE every row of a
            # partition (retention/decrement) must not skip here: the
            # stale old version would stay latest and resurrect the
            # deleted keys — such a law needs an explicit empty/
            # tombstone leaf, which partitionBy cannot emit. Guard it.
            raise ValueError(
                f"fold produced no rows for touched partition {p}; "
                "partitioned_fold only supports grow-only merge laws"
            )
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        # only a retry of THIS batch can own dst; checkpoint serializes
        # retries, so rmtree+rename races nothing
        shutil.rmtree(dst, ignore_errors=True)
        os.rename(src, dst)
    shutil.rmtree(stage, ignore_errors=True)
    if vacuum:
        vacuum_state(root, batch_id, parts=touched)
    return touched


def write_state_atomic(df: DataFrame, work: str, batch_id: int) -> str:
    """Single-dir versioned publish for bounded-state folds (KMV
    sketches: O(k) rows — partition-scoping buys nothing, but ADVICE
    r08 applies: a plain overwrite into ``state_<id>`` can crash
    mid-write and leave a PARTIAL dir that latest_state_version selects
    as newest on any read path that doesn't retry the batch. Write to a
    tmp sibling and os.rename into place so the selectable name only
    ever points at a complete leaf."""
    final = os.path.join(work, f"state_{batch_id}")
    tmp = final + f".tmp-{uuid.uuid4().hex[:8]}"
    df.write.mode("overwrite").parquet(tmp)
    shutil.rmtree(final, ignore_errors=True)
    os.rename(tmp, final)
    return final


def vacuum_versioned(work: str, current_batch_id: int) -> int:
    """vacuum_state's law for the flat ``state_<id>`` layout: keep the
    current version and its single newest strict predecessor, delete
    older versions and orphaned ``.tmp-`` dirs. Returns #dirs removed."""
    if not os.path.isdir(work):
        return 0
    vs = sorted(
        int(m.group(1))
        for e in os.listdir(work)
        if (m := re.match(r"state_(\d+)$", e))
    )
    preds = [v for v in vs if v < current_batch_id]
    keep = set(preds[-1:]) | {current_batch_id}
    removed = 0
    for v in vs:
        if v not in keep:
            shutil.rmtree(
                os.path.join(work, f"state_{v}"), ignore_errors=True
            )
            removed += 1
    for e in os.listdir(work):
        m = re.match(r"state_(\d+)\.tmp-", e)
        if m and int(m.group(1)) < current_batch_id:
            shutil.rmtree(os.path.join(work, e), ignore_errors=True)
            removed += 1
    return removed


_REPLAY_ROOT = None


def replay_workdir(prefix: str, keep: int = 48) -> str:
    """Scratch dir for a streaming-twin replay, under one shared root
    that self-prunes (VERDICT r08 #8): each call deletes the oldest
    dirs beyond ``keep``, so repeated bench/test/sweep sessions cannot
    fill the sandbox disk with dead checkpoints and state replicas.
    ``keep`` leaves enough headroom that a second process's IN-FLIGHT
    replay dirs (a concurrent sweep or test session) are never pruned
    out from under it — only dirs dozens of replays old are dead."""
    import tempfile

    global _REPLAY_ROOT
    if _REPLAY_ROOT is None:
        _REPLAY_ROOT = os.path.join(
            tempfile.gettempdir(), "timerlake_replays"
        )
    os.makedirs(_REPLAY_ROOT, exist_ok=True)
    entries = sorted(
        (os.path.getmtime(os.path.join(_REPLAY_ROOT, e)), e)
        for e in os.listdir(_REPLAY_ROOT)
        if os.path.isdir(os.path.join(_REPLAY_ROOT, e))
    )
    for _mt, e in entries[: max(0, len(entries) - keep)]:
        shutil.rmtree(os.path.join(_REPLAY_ROOT, e), ignore_errors=True)
    return tempfile.mkdtemp(prefix=f"{prefix}_", dir=_REPLAY_ROOT)
