"""Round-10 machinery: delta-mode (LSM) folds, offline reshard, and
per-batch commit markers for the partition-scoped fold state
(VERDICT r09 #1 + ADVICE r09 torn-read protection)."""

from __future__ import annotations

import os
import shutil
from collections import Counter

import pyspark.sql.functions as F
import pytest


def _remerge(df):
    return df.groupBy("k").agg(F.sum("cnt").alias("cnt"))


def _fold(spark, root, rows, batch_id, n_parts=4, mode="delta",
          compact_every=3):
    from timer_pulsar_spark.streaming.state import partitioned_fold

    agg = spark.createDataFrame(rows, "k string, cnt long")
    return partitioned_fold(
        spark, root, agg, key_col="k", remerge=_remerge,
        batch_id=batch_id, n_parts=n_parts, mode=mode,
        compact_every=compact_every,
    )


def _state(spark, root, **kw):
    from timer_pulsar_spark.streaming.state import read_state

    df = read_state(spark, root, remerge=_remerge, **kw)
    return {} if df is None else {r.k: r.cnt for r in df.collect()}


_BATCHES = [
    [(f"key{(b * 3 + i) % 10}", 1) for i in range(6)] for b in range(7)
]
_ONE_SHOT = dict(Counter(k for rows in _BATCHES for k, _ in rows))


def test_delta_fold_equals_rewrite_and_oneshot(spark, tmp_path):
    """The delta (LSM) fold and the rewrite fold are two physical
    layouts of the SAME logical state: over any batch split both must
    equal each other and the one-shot aggregate of all rows."""
    r_delta = str(tmp_path / "d")
    r_rewrite = str(tmp_path / "r")
    for b, rows in enumerate(_BATCHES):
        _fold(spark, r_delta, rows, b, mode="delta")
        _fold(spark, r_rewrite, rows, b, mode="rewrite")
    assert _state(spark, r_delta) == _ONE_SHOT
    assert _state(spark, r_rewrite) == _ONE_SHOT


def test_delta_fold_appends_without_reading_or_rewriting_bases(
    spark, tmp_path
):
    """The whole point of delta mode (VERDICT r09 #1): a small batch
    against large leaves writes O(batch) delta bytes — every existing
    base leaf stays byte-identical (same files, sizes, mtimes), and no
    new base appears until compaction is due."""
    from timer_pulsar_spark.streaming.state import (
        partition_deltas,
        partition_versions,
    )
    from tests.test_round9_ops import _snapshot

    root = str(tmp_path / "st")
    # seed a large state, then force it into a base via compact_every=1
    _fold(spark, root, [(f"key{i}", 1) for i in range(64)], 0,
          n_parts=4, compact_every=1)
    assert all(len(v) == 1 for v in partition_versions(root).values())
    before = _snapshot(root)

    # a tiny batch, below the compaction threshold
    touched = _fold(spark, root, [("key3", 5)], 1, n_parts=4,
                    compact_every=8)
    (p_hot,) = touched
    after = _snapshot(root)
    # every pre-existing BASE leaf is byte-identical (the vacuum may
    # legitimately clear the touched partition's absorbed d_0 delta)
    for rel, sig in before.items():
        if f"{os.sep}v_" in rel:
            assert after.get(rel) == sig, rel
    # the batch added exactly one delta leaf past a base, no new base
    assert partition_deltas(root)[p_hot] == [1]
    assert all(len(v) == 1 for v in partition_versions(root).values())
    # and reads remerge base + delta correctly
    got = _state(spark, root)
    assert got["key3"] == 6 and got["key0"] == 1


def test_delta_compaction_and_vacuum_bound_leaf_counts(spark, tmp_path):
    """Once a partition accumulates compact_every deltas past its base
    it compacts into a new base; vacuum then keeps only the retry
    window — so live leaves per partition stay bounded (<=2 bases,
    <= compact_every + 1 deltas) over an arbitrarily long stream."""
    from timer_pulsar_spark.streaming.state import (
        partition_deltas,
        partition_versions,
    )

    root = str(tmp_path / "st")
    # single partition so every batch hits it: compaction every 3 deltas
    for b in range(12):
        _fold(spark, root, [("k", 1)], b, n_parts=1, compact_every=3)
    vs = partition_versions(root)
    ds = partition_deltas(root)
    assert all(len(v) <= 2 for v in vs.values()), vs
    assert all(len(d) <= 4 for d in ds.values()), ds
    assert _state(spark, root) == {"k": 12}


def test_delta_fold_crash_window_redelivery(spark, tmp_path):
    """Retry law in delta mode: a batch redelivered after its state
    write but before the checkpoint commit rewrites the SAME
    d_<batch_id> leaf (and re-runs the same compaction over the same
    retained inputs) — sums cannot double-count. Exercised both on a
    plain append batch and on a batch that triggered a compaction."""
    root = str(tmp_path / "st")
    for b, rows in enumerate(_BATCHES):
        _fold(spark, root, rows, b, n_parts=2, compact_every=3)
    committed = _state(spark, root)
    assert committed == _ONE_SHOT

    # redeliver the newest batch (plain append in some partitions,
    # compaction trigger in others — n_parts=2 with 6 keys/batch makes
    # both shapes occur across the replay)
    _fold(spark, root, _BATCHES[6], 6, n_parts=2, compact_every=3)
    assert _state(spark, root) == committed
    # and a second redelivery is still a fixed point
    _fold(spark, root, _BATCHES[6], 6, n_parts=2, compact_every=3)
    assert _state(spark, root) == committed


def test_fold_mode_is_pinned_per_root(spark, tmp_path):
    """A root folded in delta mode must refuse a rewrite fold (which
    would base-merge while stale deltas still shadow it), and vice
    versa."""
    root = str(tmp_path / "st")
    _fold(spark, root, [("a", 1)], 0, mode="delta")
    with pytest.raises(ValueError, match="mode"):
        _fold(spark, root, [("a", 1)], 1, mode="rewrite")


def test_pin_error_points_at_reshard(spark, tmp_path):
    """The n_parts pin error now names the escape hatch."""
    root = str(tmp_path / "st")
    _fold(spark, root, [("a", 1)], 0, n_parts=4)
    with pytest.raises(ValueError, match="reshard_state"):
        _fold(spark, root, [("a", 1)], 1, n_parts=8)


@pytest.mark.parametrize("mode", ["delta", "rewrite"])
def test_reshard_preserves_state_and_retry_law(spark, tmp_path, mode):
    """VERDICT r09 #1: the offline epoch migration. After reshard the
    state is identical under the new n_parts, the old epoch's dirs are
    gone, folding continues across the boundary, and a crash-window
    retry of the first post-reshard batch is still a fixed point."""
    from timer_pulsar_spark.streaming.state import (
        _read_meta,
        partition_versions,
        reshard_state,
    )

    root = str(tmp_path / "st")
    for b, rows in enumerate(_BATCHES[:5]):
        _fold(spark, root, rows, b, n_parts=2, mode=mode)
    before = _state(spark, root)

    epoch = reshard_state(spark, root, "k", 8, remerge=_remerge)
    assert epoch == 1
    meta = _read_meta(root)
    assert meta["n_parts"] == 8 and meta["epoch"] == 1
    # old layout removed: no p_* dirs directly under root
    assert not any(e.startswith("p_") for e in os.listdir(root))
    assert _state(spark, root) == before
    # migrated leaves spread across the new partition count
    assert len(partition_versions(root)) > 2

    # folding continues across the boundary with the NEW n_parts
    _fold(spark, root, _BATCHES[5], 5, n_parts=8, mode=mode)
    _fold(spark, root, _BATCHES[6], 6, n_parts=8, mode=mode)
    assert _state(spark, root) == _ONE_SHOT
    # retry of the newest post-reshard batch
    _fold(spark, root, _BATCHES[6], 6, n_parts=8, mode=mode)
    assert _state(spark, root) == _ONE_SHOT
    # the old n_parts now (correctly) raises
    with pytest.raises(ValueError, match="reshard_state"):
        _fold(spark, root, [("a", 1)], 7, n_parts=2, mode=mode)


def test_reshard_rerun_after_crash_before_flip(spark, tmp_path):
    """A reshard that crashed before the meta flip leaves the old state
    live; rerunning completes the migration from scratch."""
    from timer_pulsar_spark.streaming.state import reshard_state

    root = str(tmp_path / "st")
    for b, rows in enumerate(_BATCHES[:4]):
        _fold(spark, root, rows, b, n_parts=2)
    before = _state(spark, root)
    # plant a half-written target epoch dir (crash before flip)
    os.makedirs(os.path.join(root, "e_1", "p_0", "v_99"))
    assert _state(spark, root) == before  # old epoch still live
    reshard_state(spark, root, "k", 4, remerge=_remerge)
    assert _state(spark, root) == before  # junk leaf overwritten


def test_committed_only_read_excludes_torn_batch(spark, tmp_path):
    """ADVICE r09: leaf publish is atomic per PARTITION, so a crash
    between renames can leave a batch applied to some partitions only.
    read_state(committed_only=True) reads at the newest per-batch
    commit marker and can never observe the torn batch; the plain read
    (for the checkpointed retry path, which rewrites it) does see it."""
    from timer_pulsar_spark.streaming.state import latest_committed_batch

    root = str(tmp_path / "st")
    _fold(spark, root, [(f"key{i}", 1) for i in range(16)], 0, n_parts=4)
    _fold(spark, root, [(f"key{i}", 1) for i in range(16)], 1, n_parts=4)
    committed = _state(spark, root)
    assert latest_committed_batch(root) == 1

    # simulate batch 2 crashing between renames: exactly one partition
    # got its d_2 leaf, no commit marker was written
    pdirs = [e for e in os.listdir(root) if e.startswith("p_")]
    src = os.path.join(root, pdirs[0], "d_1")
    shutil.copytree(src, os.path.join(root, pdirs[0], "d_2"))

    torn = _state(spark, root)  # plain read sees the torn leaf
    assert torn != committed
    assert _state(spark, root, committed_only=True) == committed


def test_committed_only_on_unmarked_state_returns_none(spark, tmp_path):
    """Legacy state written before commit markers existed has no
    committed horizon — the committed read refuses (None) rather than
    guessing."""
    from timer_pulsar_spark.streaming.state import read_state

    root = str(tmp_path / "st")
    _fold(spark, root, [("a", 1)], 0)
    shutil.rmtree(os.path.join(root, "_commits"))
    assert read_state(spark, root, remerge=_remerge,
                      committed_only=True) is None
    assert _state(spark, root) == {"a": 1}


def test_commit_markers_are_bounded(spark, tmp_path):
    """Only the newest two markers survive — the marker dir cannot grow
    O(batches)."""
    root = str(tmp_path / "st")
    for b in range(9):
        _fold(spark, root, [("k", 1)], b, n_parts=1)
    marks = sorted(os.listdir(os.path.join(root, "_commits")))
    assert marks == ["c_7", "c_8"]


def test_read_state_with_deltas_requires_remerge(spark, tmp_path):
    """An un-remerged base∪delta read would silently return duplicate
    key rows — the read must refuse instead."""
    from timer_pulsar_spark.streaming.state import read_state

    root = str(tmp_path / "st")
    _fold(spark, root, [("a", 1)], 0, compact_every=8)
    _fold(spark, root, [("a", 1)], 1, compact_every=8)
    with pytest.raises(ValueError, match="remerge"):
        read_state(spark, root)


def test_suggest_n_parts_sizing_law(spark):
    from timer_pulsar_spark.streaming.state import suggest_n_parts

    mib = 1 << 20
    assert suggest_n_parts(1) == 1
    assert suggest_n_parts(128 * mib) == 1
    assert suggest_n_parts(128 * mib + 1) == 2
    assert suggest_n_parts(100 * 1024 * mib) == 800


def test_release_persisted_reclaims_postings_caches(spark):
    """ADVICE r09: the postings frames cooccurring_pairs persists are
    registered for session-level reclaim; release_persisted unpersists
    everything registered since the last call."""
    from timer_pulsar_spark.operators import dedup

    dedup.release_persisted()  # drain anything a prior test registered
    df = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "a"), (2, "b")], "doc_id long, sh string"
    )
    pairs = dedup.cooccurring_pairs(
        df, key_cols=["sh"], payload_cols=[], max_df=10
    )
    pairs.count()
    tracked = list(dedup._PERSISTED_FRAMES)
    assert len(tracked) == 1 and tracked[0].is_cached
    assert dedup.release_persisted() == 1
    assert not tracked[0].is_cached
    assert dedup._PERSISTED_FRAMES == []


# --- real-file image parsing: segment walk vs byte scan (VERDICT r09 #2)


def test_walk_dims_parses_golden_and_decoy_bytes():
    """The segment walker on real container bytes: canonical PNG, a
    JFIF-led baseline JPEG, a progressive JPEG, an EXIF-thumbnail-style
    decoy (embedded SOF with wrong dims inside APP1 — the case the
    byte-scan provably mis-parses), fill bytes before a marker, and
    garbage."""
    import base64

    from timer_pulsar_spark.operators.multimodal import _walk_dims

    png_1x1 = base64.b64decode(
        "iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJAAAADUlEQVR42mNk"
        "YPhfDwAChwGA60e6kgAAAABJRU5ErkJggg=="
    )
    assert _walk_dims(png_1x1) == ("png", 1, 1)

    # spec-exact APP0: declared length 16 == 2 + the 14 body bytes
    # (version 1.2, units 0, density 72x72, no thumbnail) — a segment
    # walker actually consumes the length field, so unlike the r9
    # byte-scan golden it must be internally consistent
    jfif = (
        bytes.fromhex("FFD8FFE00010")
        + b"JFIF\x00"
        + bytes.fromhex("010200004800480000")
    )
    sof0 = (
        bytes.fromhex("FFC0001108")
        + (480).to_bytes(2, "big") + (640).to_bytes(2, "big") + b"\x03"
    )
    assert _walk_dims(jfif + sof0) == ("jpeg", 640, 480)

    sof2 = (
        bytes.fromhex("FFC2001108")
        + (77).to_bytes(2, "big") + (31).to_bytes(2, "big") + b"\x03"
    )
    assert _walk_dims(jfif + sof2) == ("jpeg", 31, 77)

    # the adversarial case: APP1 whose body contains a complete decoy
    # SOF (wrong dims 9x9) BEFORE the real one — the walker must skip
    # the whole segment by its length field
    decoy_body = (
        bytes.fromhex("FFC0001108")
        + (9).to_bytes(2, "big") + (9).to_bytes(2, "big")
    )
    app1 = bytes.fromhex("FFE1") + (2 + len(decoy_body)).to_bytes(2, "big") + decoy_body
    exifish = bytes.fromhex("FFD8") + app1 + sof0
    assert _walk_dims(exifish) == ("jpeg", 640, 480)

    # fill bytes (FF FF FF) before a marker are legal padding
    filled = bytes.fromhex("FFD8FFFFFF") + sof0[1:]
    assert _walk_dims(filled) == ("jpeg", 640, 480)

    # DHT (C4) must NOT be taken for a SOF
    dht = bytes.fromhex("FFC4000400AA")
    assert _walk_dims(bytes.fromhex("FFD8") + dht + sof0) == (
        "jpeg", 640, 480,
    )

    assert _walk_dims(b"not an image at all") == ("unknown", None, None)
    assert _walk_dims(None) == ("unknown", None, None)
    # truncated: SOI then APP1 claiming more bytes than exist
    assert _walk_dims(bytes.fromhex("FFD8FFE1FFFF00")) == (
        "jpeg", None, None,
    )


def test_scan_fails_where_walk_succeeds_on_decoy_corpus(spark):
    """The point of q_image_dims_real: on the decoy-planted corpus the
    naive first-FFC0 byte-scan returns the APP1 thumbnail's WRONG dims
    while the segment walker recovers the planted truth — the two
    parsers must agree on PNGs and provably disagree on the decoy
    JPEGs, and the walker must match the oracle arithmetic."""
    from timer_pulsar_spark.operators.multimodal import (
        image_dims,
        image_dims_walk,
        planted_images_decoy,
    )

    frame = planted_images_decoy(
        spark, "/root/testdata/sf0.001"
    ).filter(F.col("doc_id") < 200)
    walk = {r.doc_id: r for r in image_dims_walk(frame).collect()}
    scan = {r.doc_id: r for r in image_dims(frame).collect()}

    disagree = 0
    for doc_id, w in walk.items():
        if doc_id % 2 == 0:
            assert w.codec == "png"
            s = scan[doc_id]
            assert (s.width, s.height) == (w.width, w.height)
        else:
            assert w.codec == "jpeg"
        # the walker recovers the PLANTED dims
        assert w.width == doc_id % 317 + 16, doc_id
        assert w.height == doc_id % 211 + 16, doc_id
        if doc_id % 2 == 1:
            s = scan[doc_id]
            # the scan read the decoy thumbnail header instead
            assert s.width == doc_id % 89 + 8, doc_id
            assert s.height == doc_id % 73 + 8, doc_id
            if (s.width, s.height) != (w.width, w.height):
                disagree += 1
    assert disagree > 80  # the decoys defeat the scan on almost all JPEGs


# ---------------------------------------------------------------- #
# Perceptual image dedup (VERDICT r09 #4): dHash over planted        #
# bitmaps + banded Hamming candidates                                #
# ---------------------------------------------------------------- #

def _dhash_py(pix: list[int]) -> tuple[int, int]:
    """Independent reference dHash (pure python) over a 72-byte grid."""
    hi = lo = 0
    for r in range(8):
        for c in range(8):
            if pix[r * 9 + c] < pix[r * 9 + c + 1]:
                pos = r * 8 + c
                if pos < 32:
                    lo |= 1 << pos
                else:
                    hi |= 1 << (pos - 32)
    return hi, lo


def _pix_py(doc_id: int) -> list[int]:
    base, v = doc_id - doc_id % 4, doc_id % 4
    out = []
    for idx in range(72):
        p = (base * 37 + idx * idx * (base % 17 + 3)
             + idx * (base % 13)) % 251
        if v > 0 and idx == (base * 7 + v * 23) % 72:
            p = (p + 125) % 251
        out.append(p)
    return out


def test_dhash64_parses_planted_bytes(spark):
    """dhash64 must recover, from the payload BYTES, the exact hash an
    independent python reference computes from the pixel grid."""
    from timer_pulsar_spark.operators.multimodal import (
        dhash64, planted_bitmaps,
    )

    sf = "/root/testdata/sf0.001"
    rows = {
        r.doc_id: (r.hi, r.lo)
        for r in dhash64(planted_bitmaps(spark, sf))
        .filter(F.col("doc_id") < 40).collect()
    }
    for doc_id in range(40):
        assert rows[doc_id] == _dhash_py(_pix_py(doc_id)), doc_id


def test_image_dedup_recovers_planted_groups(spark):
    """Every same-group pair (one-pixel variants, Hamming <= 4) must
    appear in the banded candidate output on THIS fixed corpus: each
    variant's <= 2 flipped bits are ADJACENT positions, landing in one
    band except at the three 16-bit boundaries, so same-group pairs
    share bands in practice (banded LSH recall is probabilistic in
    general — guaranteed only for Hamming <= 3 with 4 bands; this
    test pins the realistic-edit case empirically)."""
    from timer_pulsar_spark.operators.multimodal import q_image_dedup

    sf = "/root/testdata/sf0.001"
    got = {
        (r.doc_a, r.doc_b): r.hamming
        for r in q_image_dedup(spark, sf).collect()
    }
    for base in range(0, 500, 4):
        members = range(base, min(base + 4, 500))
        for i in members:
            for j in members:
                if i < j:
                    assert (i, j) in got, (i, j)
                    assert got[(i, j)] <= 8
    # hamming values agree with the python reference on a sample
    for (a, b), h in list(got.items())[:50]:
        ha, la = _dhash_py(_pix_py(a))
        hb, lb = _dhash_py(_pix_py(b))
        assert h == bin((ha ^ hb)).count("1") + bin(la ^ lb).count("1")


def test_image_dedup_plan_is_banded_not_allpairs(spark):
    """Candidate generation must be an equality join on band keys —
    never a cartesian/BNLJ over the corpus."""
    from timer_pulsar_spark.operators.multimodal import q_image_dedup

    plan = q_image_dedup(
        spark, "/root/testdata/sf0.001"
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_image_dedup_band_df_cap_drops_degenerate_buckets(spark):
    """A flat/degenerate corpus (every image identical) must not
    produce an n^2 reducer: the band df-cap drops buckets above the
    cap, bounding the worst join group — pairs collapse to whatever
    survives the cap (here: none)."""
    from timer_pulsar_spark.operators.multimodal import image_dedup_pairs

    n = 200  # one identical hash for all docs -> one bucket of 200 > 64
    hashes = spark.createDataFrame(
        [(i, 12345, 67890) for i in range(n)], "doc_id long, hi long, lo long"
    )
    assert image_dedup_pairs(hashes).count() == 0
    # under the cap the same corpus IS all-pairs duplicate
    small = spark.createDataFrame(
        [(i, 12345, 67890) for i in range(10)], "doc_id long, hi long, lo long"
    )
    assert image_dedup_pairs(small).count() == 10 * 9 // 2


# ---------------------------------------------------------------- #
# HTML boilerplate extraction (VERDICT r09 #5)                       #
# ---------------------------------------------------------------- #

def test_html_extract_drops_boilerplate_keeps_body(spark):
    """Planted page: script/style bodies (including a '<' comparison
    inside the script that defeats tag-first stripping) and all markup
    must vanish; the paragraph text survives; entities decode."""
    from timer_pulsar_spark.operators.textops import html_extract_text

    page = (
        '<html><head><script>if (a < b) { alert("x < y"); }</script>'
        "<style>p { margin: 0; }</style></head>"
        "<body><h1>Title</h1><!-- <em>commented-out draft</em> -->"
        "<p>real body text</p>"
        "<footer>Privacy &amp; Terms &copy; 2026 &lt;end&gt;</footer>"
        "</body></html>"
    )
    df = spark.createDataFrame([(page,)], "html string")
    out = df.select(html_extract_text(F.col("html")).alias("t")).first().t
    assert out == "Title real body text Privacy & Terms (c) 2026 <end>"
    assert "alert" not in out and "margin" not in out
    # the comment body must vanish WHOLE — a tag-only strip would
    # leak "commented-out draft" into the training text
    assert "draft" not in out


def test_html_link_density_gate_binds(spark):
    """The spam-link block drives link_density across the 0.2 gate:
    docs with many planted spam anchors and short bodies are dropped,
    long clean docs are kept — both outcomes must occur."""
    from timer_pulsar_spark.operators.textops import q_html_extract

    rows = q_html_extract(spark, "/root/testdata/sf0.001").collect()
    kept = [r for r in rows if r.kept]
    dropped = [r for r in rows if not r.kept]
    assert kept and dropped
    for r in rows:
        assert r.kept == (
            r.link_chars / max(r.body_chars, 1) < 0.2
        )
        # anchor inner text is counted from the original markup:
        # nav (4+5) + footer (7+5) + 9 per spam link
        assert r.link_chars == 21 + 9 * (r.doc_id % 5)


# ---------------------------------------------------------------- #
# IVF-PQ append drift guard (VERDICT r09 #7)                         #
# ---------------------------------------------------------------- #

def test_ivfpq_drift_guard_forces_rebuild_below_threshold(spark):
    """With rebuild_threshold below the actual appended/seed ratio
    (~1.0 from the xxhash half-split), the guard must retrain on the
    full corpus; with the default 1.5 it must keep the frozen-model
    index. The rebuilt index must still satisfy the recall floor."""
    from timer_pulsar_spark.operators.similarity import (
        q_ann_topk, stream_ivfpq_with_drift,
    )

    sf = "/root/testdata/sf0.001"
    search_drift, info_drift = stream_ivfpq_with_drift(
        spark, sf, rebuild_threshold=0.1
    )
    assert info_drift["rebuilt"] is True
    assert info_drift["ratio"] >= 0.1
    assert info_drift["n_seed"] > 0 and info_drift["n_appended"] > 0

    search_keep, info_keep = stream_ivfpq_with_drift(spark, sf)
    assert info_keep["rebuilt"] is False
    assert 0.5 <= info_keep["ratio"] <= 2.0

    truth = {
        (r.query_id, r.neighbor_id) for r in q_ann_topk(spark, sf).collect()
    }
    for search in (search_drift, search_keep):
        got = {(r.query_id, r.neighbor_id) for r in search.collect()}
        assert len(got & truth) / len(truth) >= 0.4


# ---------------------------------------------------------------- #
# Temperature-based language mixture                                #
# ---------------------------------------------------------------- #

def test_temperature_mix_law(spark):
    """alpha=0.5 temperature law: shares sum to 1, smaller languages
    get HIGHER sampling rates than larger ones (the anti-proportional
    upsampling the law exists for), epochs>1 only where the rate is
    pinned at 1.0, and the kept census tracks rate x mass within the
    integer-percent hash granularity."""
    from timer_pulsar_spark.operators.sampling import q_temperature_mix

    rows = q_temperature_mix(spark, "/root/testdata/sf0.001").collect()
    assert abs(sum(r.share for r in rows) - 1.0) < 1e-4
    by_mass = sorted(rows, key=lambda r: r.mass_chars)
    rates = [r.rate for r in by_mass]
    assert rates == sorted(rates, reverse=True), rates
    for r in rows:
        assert r.epochs >= 1.0
        if r.epochs > 1.0:
            assert r.rate == 1.0
        # hash gate selects bucket < rate*100 of 100 integer buckets:
        # expected kept mass fraction is within the bucket quantization
        got_frac = r.kept_chars / r.mass_chars
        assert abs(got_frac - r.rate) < 0.15, (r.lang, got_frac, r.rate)


# ---------------------------------------------------------------- #
# MP4 / ISO-BMFF video metadata                                      #
# ---------------------------------------------------------------- #

def _box(typ: bytes, payload: bytes) -> bytes:
    return (8 + len(payload)).to_bytes(4, "big") + typ + payload


def test_walk_mp4_parses_golden_and_edge_boxes():
    """The box walker must handle version-1 mvhd (64-bit times),
    largesize boxes, leading free boxes, truncated payloads, and
    refuse non-BMFF bytes — all without touching sample data."""
    from timer_pulsar_spark.operators.multimodal import _walk_mp4

    ftyp = _box(b"ftyp", b"isom" + b"\x00" * 4)
    matrix = bytes.fromhex(
        "00010000000000000000000000000000"
        "00010000000000000000000000000000"
        "40000000"
    )
    # version 1: ctime/mtime/duration are 64-bit, timescale still 32
    mvhd_v1 = _box(
        b"mvhd",
        bytes([1, 0, 0, 0]) + (0).to_bytes(8, "big") * 2
        + (1000).to_bytes(4, "big") + (90_000).to_bytes(8, "big")
        + (0x00010000).to_bytes(4, "big") + (0x0100).to_bytes(2, "big")
        + b"\x00" * 10 + matrix + b"\x00" * 24 + (2).to_bytes(4, "big"),
    )
    tkhd_v0 = _box(
        b"tkhd",
        bytes([0, 0, 0, 7]) + (0).to_bytes(4, "big") * 2
        + (1).to_bytes(4, "big") + b"\x00" * 4 + (90_000).to_bytes(4, "big")
        + b"\x00" * 8 + b"\x00" * 8 + matrix
        + (1920 << 16).to_bytes(4, "big") + (1080 << 16).to_bytes(4, "big"),
    )
    moov = _box(b"moov", mvhd_v1 + _box(b"trak", tkhd_v0))
    free = _box(b"free", b"\x00" * 5)
    assert _walk_mp4(ftyp + free + moov) == (
        "mp4", 1920, 1080, 90_000, None, None, 1,
    )

    # largesize (size field == 1, 64-bit size follows) on the free box
    large_free = (
        (1).to_bytes(4, "big") + b"free" + (21).to_bytes(8, "big")
        + b"\x00" * 5
    )
    assert _walk_mp4(ftyp + large_free + moov) == (
        "mp4", 1920, 1080, 90_000, None, None, 1,
    )

    # largesize on the CONTAINER (moov): children start at offset 16,
    # so an 8-byte-header assumption reads garbage (ADVICE r10)
    large_moov = (
        (1).to_bytes(4, "big") + b"moov"
        + (16 + len(moov) - 8).to_bytes(8, "big") + moov[8:]
    )
    assert _walk_mp4(ftyp + large_moov) == (
        "mp4", 1920, 1080, 90_000, None, None, 1,
    )

    # a second trak with 0x0 tkhd dims (the audio-trak shape) must not
    # clobber the video dims whatever the order (ADVICE r10)
    tkhd_zero = tkhd_v0[:8 + 76] + (0).to_bytes(8, "big")
    moov_av = _box(
        b"moov", mvhd_v1 + _box(b"trak", _box(b"tkhd", tkhd_zero[8:]))
        + _box(b"trak", tkhd_v0),
    )
    got = _walk_mp4(ftyp + moov_av)
    assert (got[1], got[2], got[6]) == (1920, 1080, 2)

    # truncated moov: codec recognized, fields degrade to None
    trunc = ftyp + moov[:40]
    codec, w, h, d, *_rest = _walk_mp4(trunc)
    assert codec == "mp4" and d is None

    assert _walk_mp4(b"RIFF1234WAVE")[0] == "unknown"
    assert _walk_mp4(None)[0] == "unknown"
    # malformed size < 8 must not loop forever
    assert _walk_mp4(ftyp + (3).to_bytes(4, "big") + b"junk")[0] == "mp4"


def test_video_meta_recovers_planted_boxes(spark):
    """End-to-end: the planted variable-free-box corpus parses to the
    doc_id-derived truth (a fixed-offset reader cannot — the moov
    position shifts with doc_id % 7)."""
    from timer_pulsar_spark.operators.multimodal import (
        planted_mp4s, video_meta_walk,
    )

    rows = {
        r.doc_id: r
        for r in video_meta_walk(planted_mp4s(spark, "/root/testdata/sf0.001"))
        .filter(F.col("doc_id") < 30).collect()
    }
    for i in range(30):
        r = rows[i]
        assert r.codec == "mp4"
        assert r.width == i % 317 + 16 and r.height == i % 211 + 16
        ts, dur = 600 + (i % 5) * 300, (i % 997 + 1) * 600
        assert r.duration_ms == dur * 1000 // ts
        assert r.video_codec == ("avc1" if i % 4 < 2 else "hvc1")
        assert r.audio_codec == "mp4a" and r.n_tracks == 2
        assert r.n_bytes == 518 + i % 7 + (8 if i % 3 == 0 else 0)
