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
split a key's history across leaves, so a mismatch raises. Round 10
adds the two escape hatches VERDICT r09 asked for:

- ``reshard_state`` — an OFFLINE epoch migration (run between streams,
  after the checkpoint has committed the newest batch): the full state
  is re-hashed under the new n_parts into ``root/e_<epoch>/`` and the
  ``_meta.json`` pointer is flipped atomically, so a stream that
  outgrows its initial sizing can follow the module's own
  "state_bytes / 128 MiB" law after all. The migrated leaves keep the
  newest folded batch id as their version, so the strict-predecessor
  law (and the crash-window retry of the NEXT batch) carries across
  the boundary unchanged.
- ``mode="delta"`` folds — the LSM shape: a fold appends its batch
  aggregate as a ``d_<batch_id>`` delta leaf (O(batch) write, no state
  read at all) and every ``compact_every`` deltas a partition compacts
  base + deltas into a new ``v_<batch_id>`` base. Steady-state write
  amplification is O(batch rows), not O(touched-leaf bytes) — the
  rewrite mode's 24-key batch against 128 MiB leaves no longer costs
  ~2.5 GB/tick. Reads remerge base ∪ deltas with the fold's own merge
  law; retry safety holds because a redelivered batch rewrites the
  SAME ``d_<batch_id>`` name from batch data alone, and a re-run
  compaction sees the identical (predecessor base, delta) inputs the
  vacuum law deliberately retains.

Cross-partition atomicity (ADVICE r09): publish is atomic per LEAF,
not per batch — a crash between the per-partition renames leaves the
batch applied to some partitions only. Inside the foreachBatch retry
discipline that is invisible (the retry rewrites every touched leaf
from the same inputs), but an OUT-OF-BAND reader must pass
``committed_only=True`` to ``read_state``: each fold writes a
``_commits/c_<batch_id>`` marker only after ALL its leaves are
renamed, and the committed read excludes any version newer than the
newest marker — a torn batch can never be observed.
"""

from __future__ import annotations

import json
import os
import re
import shutil
import uuid
from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# Replay-scale default. A real deployment sizes this like shuffle
# partitions: ~ state_bytes / 128 MiB, so one leaf stays one task.
STATE_PARTS = 8

_VRE = re.compile(r"v_(\d+)$")
_DRE = re.compile(r"d_(\d+)$")
_PRE = re.compile(r"p_(\d+)$")


# mtime-keyed meta cache: _leaf/partition_versions/vacuum resolve the
# base dir per partition, which would re-open and re-parse _meta.json
# O(n_parts) times per fold/read (at the module's own sizing law,
# ~800 opens per micro-batch for 100 GB state — real latency on an
# object store). Meta changes only via the atomic _write_meta rename;
# the cache key is the full (st_mtime_ns, st_size, st_ino) stat triple,
# not the float mtime (ADVICE r10): two renames landing within
# float-seconds precision — or a coarse-mtime filesystem — could
# otherwise serve a stale dict to a concurrent reader process. The
# rename always swaps in a fresh inode, so st_ino alone breaks ties the
# timestamp can't; same-process writers also invalidate explicitly.
_META_CACHE: dict[str, tuple[tuple[int, int, int], dict]] = {}


def _read_meta(root: str) -> dict | None:
    path = os.path.join(root, "_meta.json")
    try:
        st = os.stat(path)
    except OSError:
        _META_CACHE.pop(root, None)
        return None
    key = (st.st_mtime_ns, st.st_size, st.st_ino)
    hit = _META_CACHE.get(root)
    if hit is not None and hit[0] == key:
        return hit[1]
    with open(path) as fh:
        meta = json.load(fh)
    _META_CACHE[root] = (key, meta)
    return meta


def _write_meta(root: str, meta: dict) -> None:
    """Atomic meta flip: the pointer read_state resolves partitions
    through must never be observable half-written."""
    os.makedirs(root, exist_ok=True)
    path = os.path.join(root, "_meta.json")
    tmp = path + f".tmp-{uuid.uuid4().hex[:8]}"
    with open(tmp, "w") as fh:
        json.dump(meta, fh)
    os.rename(tmp, path)
    _META_CACHE.pop(root, None)


def _base_dir(root: str, meta: dict | None = None) -> str:
    """Directory the p_<i> partition dirs live under: ``root`` itself
    for epoch 0 (the pre-reshard layout, kept for compatibility),
    ``root/e_<epoch>`` after a reshard."""
    if meta is None:
        meta = _read_meta(root)
    epoch = (meta or {}).get("epoch", 0)
    return os.path.join(root, f"e_{epoch}") if epoch else root


def _pin_n_parts(root: str, n_parts: int) -> tuple[int, str]:
    meta = _read_meta(root)
    if meta is not None:
        pinned = meta["n_parts"]
        if pinned != n_parts:
            raise ValueError(
                f"state at {root} was created with n_parts={pinned}; "
                f"refolding with n_parts={n_parts} would split key "
                "histories across partitions — run "
                "reshard_state(root, new_n_parts) to migrate"
            )
        return pinned, _base_dir(root, meta)
    os.makedirs(root, exist_ok=True)
    _write_meta(root, {"n_parts": n_parts, "epoch": 0})
    return n_parts, root


def _partition_ids(
    base: str, parts: set[int] | None, regex: re.Pattern
) -> dict[int, list[int]]:
    out: dict[int, list[int]] = {}
    if not os.path.isdir(base):
        return out
    if parts is not None:
        entries = [f"p_{p}" for p in parts]
    else:
        entries = [e for e in os.listdir(base) if _PRE.match(e)]
    for entry in entries:
        pdir = os.path.join(base, entry)
        if not os.path.isdir(pdir):
            continue
        vs = sorted(
            int(vm.group(1))
            for v in os.listdir(pdir)
            if (vm := regex.match(v))
        )
        if vs:
            out[int(_PRE.match(entry).group(1))] = vs
    return out


def partition_versions(
    root: str, parts: set[int] | None = None
) -> dict[int, list[int]]:
    """All published BASE versions per partition: {part: sorted
    [batch_id]}. With ``parts``, lists ONLY those partition dirs — the
    per-fold fast path (a fold needs its touched partitions, never a
    full O(n_parts) directory walk per micro-batch)."""
    return _partition_ids(_base_dir(root), parts, _VRE)


def partition_deltas(
    root: str, parts: set[int] | None = None
) -> dict[int, list[int]]:
    """All published DELTA leaves per partition (mode='delta' folds):
    {part: sorted [batch_id]}."""
    return _partition_ids(_base_dir(root), parts, _DRE)


def latest_partition_versions(
    root: str, before: int | None = None, parts: set[int] | None = None
) -> dict[int, int]:
    """Newest published base version per partition; with ``before``,
    only versions strictly below it — the per-partition predecessor a
    (re)delivered batch must fold onto."""
    out: dict[int, int] = {}
    for p, vs in partition_versions(root, parts).items():
        eligible = [v for v in vs if before is None or v < before]
        if eligible:
            out[p] = max(eligible)
    return out


def _leaf(root: str, part: int, version: int, kind: str = "v") -> str:
    return os.path.join(_base_dir(root), f"p_{part}", f"{kind}_{version}")


def _commits_dir(root: str) -> str:
    return os.path.join(root, "_commits")


def _mark_committed(root: str, batch_id: int) -> None:
    """Per-BATCH commit marker (ADVICE r09): written only after every
    touched leaf of the batch is renamed into place, so an out-of-band
    reader can exclude torn batches. Markers are empty files; only the
    newest two are kept (the current batch and the predecessor a
    concurrent committed read may already have resolved)."""
    cdir = _commits_dir(root)
    os.makedirs(cdir, exist_ok=True)
    with open(os.path.join(cdir, f"c_{batch_id}"), "w"):
        pass
    ids = sorted(
        int(m.group(1))
        for e in os.listdir(cdir)
        if (m := re.match(r"c_(\d+)$", e))
    )
    for old in ids[:-2]:
        try:
            os.unlink(os.path.join(cdir, f"c_{old}"))
        except OSError:
            pass


def latest_committed_batch(root: str) -> int | None:
    """Newest batch id with a commit marker; None if the state has no
    markers at all (either empty, or written before markers existed —
    callers wanting torn-read protection on legacy state should re-fold
    once to mint a marker)."""
    cdir = _commits_dir(root)
    if not os.path.isdir(cdir):
        return None
    ids = [
        int(m.group(1))
        for e in os.listdir(cdir)
        if (m := re.match(r"c_(\d+)$", e))
    ]
    return max(ids) if ids else None


def read_state(
    spark: SparkSession,
    root: str,
    before: int | None = None,
    parts: set[int] | None = None,
    remerge: Callable[[DataFrame], DataFrame] | None = None,
    committed_only: bool = False,
) -> DataFrame | None:
    """Current state: per partition, the newest base leaf (optionally
    restricted to ``parts`` / versions strictly below ``before``) plus
    — for delta-mode folds — any delta leaves newer than that base,
    remerged with the fold's own merge law. None if no state. With
    ``parts`` only those partition dirs are listed at all.

    ``committed_only=True`` (ADVICE r09) additionally excludes any
    version newer than the newest per-batch commit marker: leaf
    publishes are atomic per PARTITION, so a crash between renames
    leaves a torn cross-partition batch — invisible to the checkpointed
    retry (which rewrites it), but observable to an out-of-band reader
    unless it reads at the committed horizon."""
    if committed_only:
        c = latest_committed_batch(root)
        if c is None:
            return None
        horizon = c + 1
        before = horizon if before is None else min(before, horizon)
    latest = latest_partition_versions(root, before, parts)
    paths = [_leaf(root, p, v, "v") for p, v in sorted(latest.items())]
    delta_paths: list[str] = []
    for p, ds in sorted(partition_deltas(root, parts).items()):
        base_v = latest.get(p, -1)
        delta_paths += [
            _leaf(root, p, d, "d")
            for d in ds
            if d > base_v and (before is None or d < before)
        ]
    if delta_paths and remerge is None:
        raise ValueError(
            f"state at {root} has unmerged delta leaves; read_state "
            "needs the fold's remerge law to combine base + deltas"
        )
    if not paths and not delta_paths:
        return None
    df = spark.read.parquet(*paths, *delta_paths)
    if delta_paths:
        df = remerge(df)
    return df


def vacuum_state(
    root: str, current_batch_id: int, parts: set[int] | None = None
) -> int:
    """Delete state versions no future fold or retry can need. Per
    partition, with W = the newest BASE version strictly below the
    current batch:

    - bases: keep the current batch's base (if it compacted one) plus
      W (the crash-window retry of the CURRENT batch re-reads it);
      everything older is checkpoint-committed and dead.
    - deltas (mode='delta' folds): keep deltas in (W, current] — a
      re-run compaction of the current batch needs exactly those —
      and delete deltas <= W, whose content W's compaction absorbed.

    Also clears stage dirs left by crashed attempts of older batches.
    Returns #dirs removed.

    With ``parts``, vacuums only those partitions — the per-fold fast
    path. Scoping to the touched set preserves the bounded-versions
    invariant globally: versions are only CREATED by a touch, and every
    touch vacuums its own partition, so an untouched partition stays
    frozen at whatever (already-bounded) version set its last touch
    left."""
    removed = 0
    deltas = partition_deltas(root, parts)
    for p, vs in partition_versions(root, parts).items():
        preds = [v for v in vs if v < current_batch_id]
        w = preds[-1] if preds else None
        keep = set(preds[-1:]) | {current_batch_id}
        for v in vs:
            if v not in keep:
                shutil.rmtree(_leaf(root, p, v, "v"), ignore_errors=True)
                removed += 1
        for d in deltas.pop(p, []):
            if w is not None and d <= w:
                shutil.rmtree(_leaf(root, p, d, "d"), ignore_errors=True)
                removed += 1
    # delta-only partitions (never compacted): all deltas still live
    base = _base_dir(root)
    # stale stage dirs (a crashed attempt's leftovers) need a listing —
    # skip it on the scoped per-fold path (each fold removes its own
    # stage on success; at most one stray survives a crash and any full
    # vacuum or the replay-root pruning reclaims it)
    if parts is None and os.path.isdir(base):
        for entry in os.listdir(base):
            m = re.match(r"stage_(\d+)_", entry)
            if m and int(m.group(1)) < current_batch_id:
                shutil.rmtree(os.path.join(base, entry), ignore_errors=True)
                removed += 1
    return removed


def _publish_partitions(
    df: DataFrame,
    base: str,
    touched: set[int],
    batch_id: int,
    kind: str,
) -> None:
    """Write ``df`` (carrying fold_p) partitionBy into a stage sibling,
    then atomically rename each partition dir to its ``<kind>_<batch>``
    leaf. Retry of the same batch replaces the same names — idempotent."""
    stage = os.path.join(base, f"stage_{batch_id}_{uuid.uuid4().hex[:8]}")
    df.write.mode("overwrite").partitionBy("fold_p").parquet(stage)
    for p in sorted(touched):
        src = os.path.join(stage, f"fold_p={p}")
        dst = os.path.join(base, f"p_{p}", f"{kind}_{batch_id}")
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


def partitioned_fold(
    spark: SparkSession,
    root: str,
    batch_agg: DataFrame,
    key_col: str,
    remerge: Callable[[DataFrame], DataFrame],
    batch_id: int,
    n_parts: int = STATE_PARTS,
    vacuum: bool = True,
    mode: str = "rewrite",
    compact_every: int = 8,
    metrics_registry=None,
    leaf_target: int = 128 << 20,
) -> set[int]:
    """One leaf-scoped fold step. ``batch_agg`` is the batch already
    reduced to one row per ``key_col``; ``remerge`` re-aggregates a
    union of predecessor + batch rows back to one row per key (the
    merge law: min/sum/union — must be commutative, associative, and
    equal to the one-shot aggregate). Returns the touched partitions.

    ``mode="rewrite"`` (default): each touched partition's state is
    read, remerged with the batch, and rewritten as a new base leaf —
    O(batch + touched partitions' state) per fold. Right when batches
    touch a small fraction of well-sized leaves.

    ``mode="delta"`` (VERDICT r09 #1): the batch aggregate is appended
    as a ``d_<batch_id>`` delta leaf per touched partition — NO state
    read, O(batch) write amplification — and once a partition
    accumulates ``compact_every`` deltas past its base it compacts them
    into a new base (the LSM shape). Right when leaves are large
    relative to batches (the 24-keys-against-128 MiB-leaves case where
    rewrite mode costs O(leaf bytes) per tick). Reads must pass the
    same ``remerge`` to read_state. Retry safety: a redelivered batch
    rewrites the SAME delta name from batch data alone, and a re-run
    compaction reads the identical (predecessor base, deltas) inputs —
    the vacuum law keeps exactly that window.

    The mode is pinned per state root (mixing them would leave deltas
    a rewrite fold silently ignores). Both modes publish atomically per
    leaf and stamp a per-BATCH ``_commits`` marker after the last
    rename (ADVICE r09) so out-of-band readers can exclude torn
    batches via ``read_state(committed_only=True)``.

    Cost shape: O(batch) to aggregate + (rewrite) O(touched partitions'
    state) or (delta) O(batch) to publish; partitions without batch
    keys are NOT read, NOT rewritten, and keep their old version
    (read_state takes the newest per partition, so mixed-version reads
    are the normal state)."""
    if mode not in ("rewrite", "delta"):
        raise ValueError(f"unknown fold mode {mode!r}")
    n_parts, base = _pin_n_parts_mode(root, n_parts, mode)
    part = F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_parts)).cast("int")
    # pin the (small: one row per batch key) aggregate so the touched-
    # partition probe and the merge don't recompute it twice
    agg = batch_agg.withColumn("fold_p", part).localCheckpoint(eager=True)
    touched = {
        r.fold_p for r in agg.select("fold_p").distinct().collect()
    }
    if not touched:
        return touched

    if mode == "rewrite":
        prev = read_state(spark, root, before=batch_id, parts=touched)
        merged = agg.drop("fold_p")
        if prev is not None:
            merged = remerge(prev.unionByName(merged))
        merged = merged.withColumn("fold_p", part)
        _publish_partitions(merged, base, touched, batch_id, "v")
    else:
        # delta publish: the batch aggregate itself IS the leaf
        _publish_partitions(agg, base, touched, batch_id, "d")
        _maybe_compact(
            spark, root, base, touched, batch_id, part, remerge,
            compact_every,
        )
    _mark_committed(root, batch_id)
    if vacuum:
        vacuum_state(root, batch_id, parts=touched)
    # stamp the live footprint so observe_drift is a meta read, not a
    # directory walk, on the hot path an operator polls (VERDICT r10
    # #7). Bookkeeping is PER-PARTITION and scoped to the partitions
    # this batch touched (the same O(touched) discipline as the fold
    # and vacuum themselves — a full-state walk per micro-batch would
    # negate delta mode's O(batch) claim at the 100 GB sizing law);
    # pre-upgrade roots pay one full walk to initialize. Single-writer,
    # so the meta rename is safe.
    meta = _read_meta(root) or {}
    part_bytes: dict[str, int] = dict(
        meta.get("part_bytes")
        or {str(p): b for p, b in _live_part_bytes(root).items()}
    )
    part_bytes.update(
        {str(p): b for p, b in _live_part_bytes(root, parts=touched).items()}
    )
    _write_meta(
        root,
        {
            **meta,
            "part_bytes": part_bytes,
            "state_bytes": sum(part_bytes.values()),
            "last_batch": batch_id,
        },
    )
    # live drift exposition (VERDICT r11 #8): with a registry wired,
    # every fold stamps the reshard signal into /metrics — a meta read
    # (the stamp above), not a directory walk, so the hot path stays
    # O(touched)
    if metrics_registry is not None:
        metrics_registry.record_state_drift(
            root, observe_drift(root, leaf_target)
        )
    return touched


def _pin_n_parts_mode(
    root: str, n_parts: int, mode: str
) -> tuple[int, str]:
    """_pin_n_parts plus the fold-mode pin: a root folded in delta mode
    must never be folded in rewrite mode (the rewrite would base-merge
    while stale deltas still shadow it). Legacy roots without a mode
    key adopt the caller's mode on first use after upgrade."""
    pinned, base = _pin_n_parts(root, n_parts)
    meta = _read_meta(root) or {}
    if "mode" not in meta:
        meta["mode"] = mode
        _write_meta(root, {**meta, "n_parts": pinned})
    elif meta["mode"] != mode:
        raise ValueError(
            f"state at {root} was folded with mode={meta['mode']!r}; "
            f"refolding with mode={mode!r} would corrupt the merge law"
        )
    return pinned, base


def _maybe_compact(
    spark: SparkSession,
    root: str,
    base: str,
    touched: set[int],
    batch_id: int,
    part: Column,
    remerge: Callable[[DataFrame], DataFrame],
    compact_every: int,
) -> set[int]:
    """Compact any touched partition whose delta count (past its newest
    base strictly below this batch) reached ``compact_every``: remerge
    predecessor base ∪ deltas (W, batch_id] into a new v_<batch_id>
    base. Deterministic on retry: vacuum keeps W and exactly those
    deltas until the NEXT batch commits."""
    bases = latest_partition_versions(root, before=batch_id, parts=touched)
    deltas = partition_deltas(root, parts=touched)
    compact_parts: set[int] = set()
    paths: list[str] = []
    for p in sorted(touched):
        w = bases.get(p, -1)
        live = [d for d in deltas.get(p, []) if w < d <= batch_id]
        if len(live) < compact_every:
            continue
        compact_parts.add(p)
        if w >= 0:
            paths.append(_leaf(root, p, w, "v"))
        paths += [_leaf(root, p, d, "d") for d in live]
    if not compact_parts:
        return compact_parts
    merged = remerge(spark.read.parquet(*paths).drop("fold_p"))
    merged = merged.withColumn("fold_p", part)
    _publish_partitions(merged, base, compact_parts, batch_id, "v")
    return compact_parts


def suggest_n_parts(state_bytes: int, leaf_target: int = 128 << 20) -> int:
    """The module's sizing law as code: one leaf should stay one task,
    so n_parts ~ state_bytes / 128 MiB (min 1). When the live value
    drifts far below this (the state outgrew its initial sizing), run
    reshard_state offline."""
    return max(1, -(-state_bytes // leaf_target))


def _dir_bytes(path: str) -> int:
    total = 0
    for dirpath, _d, files in os.walk(path):
        for fn in files:
            try:
                total += os.path.getsize(os.path.join(dirpath, fn))
            except OSError:
                pass
    return total


def _live_part_bytes(
    root: str, parts: set[int] | None = None
) -> dict[int, int]:
    """Per-partition bytes of the LIVE state only: the newest base
    leaf plus the deltas above it. Superseded versions awaiting vacuum
    are excluded — they are reclaimable space, not state, and counting
    them would overstate drift right after a compaction. Scoped by
    ``parts`` so the per-fold stamp costs O(touched), not O(n_parts)."""
    bases = latest_partition_versions(root, parts=parts)
    deltas = partition_deltas(root, parts=parts)
    out: dict[int, int] = {}
    for p in set(bases) | set(deltas):
        w = bases.get(p, -1)
        total = _dir_bytes(_leaf(root, p, w, "v")) if w >= 0 else 0
        for d in deltas.get(p, []):
            if d > w:
                total += _dir_bytes(_leaf(root, p, d, "d"))
        out[p] = total
    return out


def state_footprint(root: str) -> int:
    """Total live-state bytes — the full walk (all partitions). Used
    offline (reshard restamp, observe_drift fallback on pre-upgrade
    roots); the per-fold stamp instead updates only the partitions the
    batch touched."""
    return sum(_live_part_bytes(root).values())


def observe_drift(root: str, leaf_target: int = 128 << 20) -> dict:
    """Reshard-trigger signal (VERDICT r10 #7): the pinned n_parts vs
    what the sizing law would pick for the CURRENT footprint. Folds
    stamp state_bytes into _meta.json each batch, so this is a meta
    read plus arithmetic; a fresh walk backstops pre-upgrade roots.
    An operator (or the fold-state bench) watches
    ``suggested_n_parts > n_parts`` and schedules the offline
    reshard_state before rewrite/compaction write-amp bites."""
    meta = _read_meta(root)
    if meta is None:
        # no state exists (pre-first-batch poll or a mistyped root):
        # there is nothing to reshard — never report due for a state
        # that reshard_state would refuse to touch
        return {
            "n_parts": 0,
            "state_bytes": 0,
            "leaf_target": int(leaf_target),
            "suggested_n_parts": 0,
            "reshard_due": False,
        }
    bytes_now = meta.get("state_bytes")
    if bytes_now is None:
        bytes_now = state_footprint(root)
    suggested = suggest_n_parts(bytes_now, leaf_target)
    n_parts = meta.get("n_parts", 0)
    return {
        "n_parts": n_parts,
        "state_bytes": int(bytes_now),
        "leaf_target": int(leaf_target),
        "suggested_n_parts": int(suggested),
        "reshard_due": bool(suggested > n_parts),
    }


def reshard_state(
    spark: SparkSession,
    root: str,
    key_col: str,
    new_n_parts: int,
    remerge: Callable[[DataFrame], DataFrame] | None = None,
) -> int:
    """OFFLINE epoch migration to a new n_parts (VERDICT r09 #1: the
    pin protected key histories but left no way for a stream that
    outgrew its initial sizing to follow the state_bytes/128 MiB law).

    Run BETWEEN streams, after the checkpoint has committed the newest
    batch B. The full state (bases ∪ deltas, remerged) is re-hashed
    under the new n_parts and written to ``root/e_<epoch+1>/`` with
    version B, then the ``_meta.json`` pointer is flipped atomically
    and the old epoch's partition dirs are removed. Because the
    migrated leaves carry version B, the strict-predecessor law holds
    unchanged across the boundary: the next batch B+1 folds onto B,
    and a crash-window retry of B+1 re-reads the same migrated leaves.

    Rerun-safe: a crash before the meta flip leaves the old state
    live (the orphaned e_<k> stage is overwritten on rerun); a crash
    after the flip leaves the new state live and only dead old dirs
    behind, which the completed rerun removes. Returns the new epoch."""
    meta = _read_meta(root)
    if meta is None:
        raise ValueError(f"no state at {root} to reshard")
    old_base = _base_dir(root, meta)
    old_epoch = meta.get("epoch", 0)
    new_epoch = old_epoch + 1

    ids = list(latest_partition_versions(root).values())
    ids += [d for ds in partition_deltas(root).values() for d in ds]
    mig_v = max(ids, default=0)
    cur = read_state(spark, root, remerge=remerge)
    new_base = os.path.join(root, f"e_{new_epoch}")
    shutil.rmtree(new_base, ignore_errors=True)  # crashed prior attempt
    if cur is not None:
        part = F.pmod(
            F.xxhash64(F.col(key_col)), F.lit(new_n_parts)
        ).cast("int")
        merged = cur.withColumn("fold_p", part)
        stage = new_base + f".stage_{uuid.uuid4().hex[:8]}"
        merged.write.mode("overwrite").partitionBy("fold_p").parquet(stage)
        os.makedirs(new_base, exist_ok=True)
        for entry in os.listdir(stage):
            m = re.match(r"fold_p=(\d+)$", entry)
            if not m:
                continue
            p = int(m.group(1))
            dst = os.path.join(new_base, f"p_{p}", f"v_{mig_v}")
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            os.rename(os.path.join(stage, entry), dst)
        shutil.rmtree(stage, ignore_errors=True)
    else:
        os.makedirs(new_base, exist_ok=True)
    _write_meta(
        root, {**meta, "n_parts": new_n_parts, "epoch": new_epoch}
    )
    # the old epoch's dirs are dead the moment the pointer flipped
    if old_epoch:
        shutil.rmtree(old_base, ignore_errors=True)
    else:
        for entry in os.listdir(root):
            if _PRE.match(entry) or entry.startswith("stage_"):
                shutil.rmtree(os.path.join(root, entry), ignore_errors=True)
    # restamp the footprint under the new layout so observe_drift
    # reports against the migrated leaves — and REBUILD the
    # per-partition byte map: the old one is keyed by the previous
    # epoch's partition numbering and would corrupt the incremental
    # sums the next fold maintains
    meta = _read_meta(root) or {}
    part_bytes = {str(p): b for p, b in _live_part_bytes(root).items()}
    _write_meta(
        root,
        {
            **meta,
            "part_bytes": part_bytes,
            "state_bytes": sum(part_bytes.values()),
        },
    )
    return new_epoch


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


def _newest_mtime_under(path: str) -> float:
    """Newest mtime anywhere under ``path`` (ADVICE r09: a directory's
    own mtime is NOT updated by writes to nested files, so a long-lived
    replay dir a concurrent session is still streaming into can look
    stale by dir-mtime alone). Replay dirs hold checkpoint/state trees
    of bounded size, so a full walk stays cheap."""
    # every stat is individually guarded: a concurrent session's prune
    # can rmtree any entry between our listdir/walk and the stat, and
    # one vanished file must neither crash the caller nor hide the
    # OTHER files' mtimes (under-reporting could prune an active dir)
    def mt(p: str) -> float:
        try:
            return os.path.getmtime(p)
        except OSError:
            return 0.0

    newest = mt(path)
    for dirpath, _dirs, files in os.walk(path):
        newest = max(
            newest,
            mt(dirpath),
            *(mt(os.path.join(dirpath, f)) for f in files),
        )
    return newest


def replay_workdir(prefix: str, keep: int = 48, base: str | None = None) -> str:
    """Scratch dir for a streaming-twin replay, under one shared root
    that self-prunes (VERDICT r08 #8): each call deletes the oldest
    dirs beyond ``keep``, so repeated bench/test/sweep sessions cannot
    fill the sandbox disk with dead checkpoints and state replicas.
    ``keep`` leaves enough headroom that a second process's IN-FLIGHT
    replay dirs (a concurrent sweep or test session) are never pruned
    out from under it — only dirs dozens of replays old are dead.
    Age is judged by the NEWEST mtime found under each dir, not the
    dir's own mtime (ADVICE r09: nested checkpoint writes don't bump
    the dir mtime, so an actively-streaming dir must not read stale).
    ``base`` overrides the shared root — tests that shrink ``keep``
    must pass an isolated base so they never prune a concurrent
    session's margin."""
    import tempfile

    global _REPLAY_ROOT
    if _REPLAY_ROOT is None:
        _REPLAY_ROOT = os.path.join(
            tempfile.gettempdir(), "timerlake_replays"
        )
    root = base or _REPLAY_ROOT
    os.makedirs(root, exist_ok=True)
    entries = sorted(
        (_newest_mtime_under(os.path.join(root, e)), e)
        for e in os.listdir(root)
        if os.path.isdir(os.path.join(root, e))
    )
    for _mt, e in entries[: max(0, len(entries) - keep)]:
        shutil.rmtree(os.path.join(root, e), ignore_errors=True)
    return tempfile.mkdtemp(prefix=f"{prefix}_", dir=root)
