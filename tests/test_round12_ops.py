"""Round-12 operators: the live fold-state drift gauge in the
/metrics exposition, the width-aware audio pipeline's companions (in
test_round11_ops.py next to their r11 siblings), the video content
fingerprint, and byte-level exact-substring dedup."""

from __future__ import annotations

import pytest

from .conftest import SF_DIR


# ------------------------------------- video content fingerprint

def test_mp4_sample_tables_golden_and_malformed():
    """Hand-built stsz/stsc/stco cases, independent of the plant
    generator: uniform-size stsz (table omitted), multi-chunk stsc
    run-length mapping, and malformed tables refused."""
    from timer_pulsar_spark.operators.multimodal import (
        _expand_sample_offsets,
        _parse_stco,
        _parse_stsc,
        _parse_stsz,
    )

    # uniform stsz: sample_size nonzero, no table
    b = bytes.fromhex("00000000" + "00000010" + "00000005")
    assert _parse_stsz(b, 0, len(b)) == [16] * 5
    # per-entry table
    b = bytes.fromhex(
        "00000000" + "00000000" + "00000003"
        + "0000000A" + "0000000B" + "0000000C"
    )
    assert _parse_stsz(b, 0, len(b)) == [10, 11, 12]
    # truncated table refused
    assert _parse_stsz(b[:-2], 0, len(b) - 2) is None

    # two stsc runs: chunks 1-2 carry 2 samples each, chunk 3+ carries 1
    stsc = [(1, 2, 1), (3, 1, 1)]
    stco = [100, 300, 500]
    sizes = [10, 20, 30, 40, 50]
    assert _expand_sample_offsets(sizes, stsc, stco) == [
        (100, 10), (110, 20),   # chunk 1
        (300, 30), (330, 40),   # chunk 2
        (500, 50),              # chunk 3
    ]
    # not enough chunks for the declared samples: malformed
    assert _expand_sample_offsets(sizes + [60], stsc, stco[:2]) is None
    # stsc parse round-trip
    raw = bytes.fromhex(
        "00000000" + "00000002"
        + "00000001" + "00000002" + "00000001"
        + "00000003" + "00000001" + "00000001"
    )
    assert _parse_stsc(raw, 0, len(raw)) == stsc
    raw = bytes.fromhex("00000000" + "00000002" + "00000064" + "0000012C")
    assert _parse_stco(raw, 0, len(raw)) == [100, 300]
    # co64: 64-bit offsets, including one above the u32 ceiling
    from timer_pulsar_spark.operators.multimodal import _parse_co64

    raw = bytes.fromhex(
        "00000000" + "00000002"
        + "0000000000000064" + "0000000120000000"
    )
    assert _parse_co64(raw, 0, len(raw)) == [100, 0x120000000]
    assert _parse_co64(raw[:-4], 0, len(raw) - 4) is None


def test_video_frames_walk_defeats_mdat_payload_shortcut(spark):
    """The planted corpus leaves 1..5 junk bytes between the mdat
    header and the first sample (real muxers leave interleaving
    slack), so 'skip to the mdat payload' reads shifted garbage on
    EVERY file — only the stco-addressed walk recovers the planted
    frame energies; and the planted groups of four pair at temporal
    Hamming <= 4 through image_dedup_pairs unchanged."""
    from pyspark.sql import functions as F

    from timer_pulsar_spark.operators.multimodal import (
        GRID_H,
        GRID_W,
        VID_FRAMES,
        _mp4_frame_slices,
        image_dedup_pairs,
        planted_mp4s_frames,
        video_frame_energies,
        video_sig64,
    )

    corpus = planted_mp4s_frames(spark, SF_DIR).filter(
        F.col("doc_id") < 128
    )
    rows = {r.doc_id: bytes(r.payload) for r in corpus.collect()}
    fb = GRID_W * GRID_H
    for doc_id, b in rows.items():
        walked = _mp4_frame_slices(b)
        assert walked is not None and len(walked) == VID_FRAMES
        # the naive read: find mdat, take frames from its payload start
        i = b.index(b"mdat") + 4
        naive = [
            sum(b[i + f * fb : i + (f + 1) * fb]) for f in range(VID_FRAMES)
        ]
        true = [
            sum(b[off : off + sz]) for off, sz in walked
        ]
        assert naive != true, f"doc {doc_id}: junk decoy not effective"
        # frame 0 of the truth is the planted gradient: amps[0] + i
        first = b[walked[0][0] : walked[0][0] + fb]
        assert all(
            first[i + 1] - first[i] == 1 for i in range(fb - 1)
        ), "frame 0 must be the planted +1 gradient"

    pairs = {
        (r.doc_a, r.doc_b): r.hamming
        for r in image_dedup_pairs(
            video_sig64(video_frame_energies(corpus))
        ).collect()
    }
    groups = {base: [base + v for v in range(4)] for base in range(0, 128, 4)}
    for base, members in groups.items():
        for i, a in enumerate(members):
            for bdoc in members[i + 1 :]:
                assert (a, bdoc) in pairs, f"lost same-group pair {(a, bdoc)}"
                assert pairs[(a, bdoc)] <= 8


# -------------------------------------------- ExactSubstr dedup

def test_exactsubstr_cut_contract(spark):
    """Planted-corpus contract for the byte-level ExactSubstr pass
    (Lee et al. 2022 semantics at threshold L): a shared substring of
    exactly L chars is reported as one L-length region in BOTH docs at
    the right offsets; a shared substring of L-1 chars is NOT reported
    (the threshold boundary); an INTRA-document repeat counts (the
    paper's law is total occurrences, not distinct docs); two nearby
    regions merge iff their covered windows overlap or touch."""
    from timer_pulsar_spark.operators.dedup import (
        EXSUB_L,
        exactsubstr_regions,
    )

    L = EXSUB_L
    shared = "X" + "abcdefghij"[: 0] + "".join(
        chr(ord("a") + (i * 7) % 26) for i in range(L - 1)
    )                                # exactly L chars, aperiodic
    assert len(shared) == L
    short = shared[: L - 1]          # L-1 chars: below threshold
    # unique fillers guarantee no accidental cross-doc windows
    fill = lambda tag, n: "".join(  # noqa: E731
        chr(ord("A") + (i * 11 + tag * 7) % 26) + str(tag)
        for i in range(n)
    )
    rows = [
        # docs 0/1 share `shared` at different offsets
        (0, fill(1, 20) + shared + fill(2, 20)),
        (1, fill(3, 5) + shared + fill(4, 35)),
        # docs 2/3 share only the L-1 prefix: below threshold
        (2, fill(5, 20) + short + fill(6, 20)),
        (3, fill(7, 20) + short + fill(8, 20)),
        # doc 4: intra-document repeat of `shared` (two occurrences)
        (4, shared + fill(9, 10) + shared),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    regions = {
        (r.doc_id, r.start): (r.region_len, r.max_occ)
        for r in exactsubstr_regions(d).collect()
    }
    # docs 0/1: exactly one region each, exactly the shared substring
    doc0_start = rows[0][1].index(shared) + 1
    doc1_start = rows[1][1].index(shared) + 1
    assert regions[(0, doc0_start)] == (L, 4)   # 2 inter + 2 intra-doc-4
    assert regions[(1, doc1_start)] == (L, 4)
    # threshold boundary: no region touches docs 2/3
    assert not any(doc in (2, 3) for doc, _ in regions)
    # intra-doc repeat: two L-length regions in doc 4
    doc4_starts = sorted(s for doc, s in regions if doc == 4)
    assert doc4_starts == [1, L + 20 + 1]
    for s in doc4_starts:
        assert regions[(4, s)][0] == L


def test_exactsubstr_scrub_cut_contract(spark):
    """The removal half: the canonical (globally first by (doc_id,
    pos)) occurrence is KEPT, every other occurrence's characters are
    cut exactly, shorter-than-threshold overlaps survive, and
    untouched docs pass through byte-identical."""
    from timer_pulsar_spark.operators.dedup import (
        EXSUB_L,
        exactsubstr_scrub,
    )

    L = EXSUB_L
    shared = "X" + "".join(
        chr(ord("a") + (i * 7) % 26) for i in range(L - 1)
    )
    fill = lambda tag, n: "".join(  # noqa: E731
        chr(ord("A") + (i * 11 + tag * 7) % 26) + str(tag)
        for i in range(n)
    )
    rows = [
        (0, fill(1, 10) + shared + fill(2, 10)),   # canonical keeper
        (1, fill(3, 5) + shared + fill(4, 5)),     # cut here
        (2, fill(5, 12)),                          # untouched
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in exactsubstr_scrub(d).collect()}
    assert got[0].clean_text == rows[0][1] and got[0].n_removed == 0
    assert got[2].clean_text == rows[2][1] and got[2].n_removed == 0
    # doc 1 loses exactly the shared window's L characters
    assert got[1].n_removed == L
    assert got[1].clean_text == fill(3, 5) + fill(4, 5)
    assert got[1].n_chars == len(rows[1][1])


# ------------------------------------- decontamination threshold

def test_decontaminate_ngram_boundary(spark):
    """VERDICT r11 #7: pin the decontamination threshold semantics —
    a train doc overlapping an eval doc on exactly DECON_N
    consecutive words is flagged with exactly that one n-gram hit,
    while an overlap of DECON_N - 1 words is CLEAN (no verdict row).
    Words are unique per doc elsewhere, so the planted window is the
    only candidate."""
    from timer_pulsar_spark.operators.dedup import (
        DECON_MOD,
        DECON_N,
        decontaminate_report,
    )

    leak = " ".join(f"leak{i}" for i in range(DECON_N))        # n words
    near = " ".join(f"edge{i}" for i in range(DECON_N - 1))    # n-1 words
    pad = lambda tag, n: " ".join(f"w{tag}x{i}" for i in range(n))  # noqa: E731
    rows = [
        # the eval doc (id % DECON_MOD == 0) carries both windows
        (0, f"{pad(0, 6)} {leak} {pad(1, 6)} {near} {pad(2, 6)}"),
        # train doc sharing exactly the n-word window: contaminated
        (DECON_MOD + 1, f"{pad(3, 5)} {leak} {pad(4, 5)}"),
        # train doc sharing only the (n-1)-word window: clean
        (DECON_MOD + 2, f"{pad(5, 5)} {near} {pad(6, 5)}"),
        # clean control
        (DECON_MOD + 3, pad(7, 20)),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in decontaminate_report(d).collect()}
    assert set(got) == {DECON_MOD + 1}, got
    hit = got[DECON_MOD + 1]
    assert hit.n_hits == 1 and hit.n_bench_docs == 1
    assert hit.first_bench == 0
    # contamination = 1 hit / (16 - n + 1 = 13) n-grams in the doc
    n_tokens = len(rows[1][1].split(" "))
    assert hit.contamination == round(1 / (n_tokens - DECON_N + 1), 6)


# ---------------------------------------- fold-state drift exposition

def test_fold_drift_gauges_in_metrics_exposition(spark, tmp_path):
    """VERDICT r11 #8: the reshard-drift signal must be visible to an
    operator DURING a real run, not only in the bench harness — a fold
    with a wired MetricsRegistry stamps fold_state_* gauges, the
    Prometheus exposition renders them, reshard_due crosses to 1 as
    state outgrows the pinned n_parts, and clears after
    reshard_state + the next fold."""
    import re

    from pyspark.sql import functions as F

    from timer_pulsar_spark.metrics import MetricsRegistry
    from timer_pulsar_spark.streaming.state import (
        partitioned_fold,
        reshard_state,
    )

    root = str(tmp_path / "drift_state")
    reg = MetricsRegistry()
    remerge = lambda df: df.groupBy("k").agg(F.sum("cnt").alias("cnt"))  # noqa: E731

    def batch(b: int, n: int):
        return (
            spark.range(n)
            .select(
                F.concat(F.lit("k"), F.lit(b * 10_000) + F.col("id")).alias("k")
            )
            .groupBy("k")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )

    def gauge(text: str, name: str) -> float:
        m = re.search(rf'^{name}{{state="drift_state"}} (\S+)$', text, re.M)
        assert m, f"{name} gauge missing from exposition:\n{text}"
        return float(m.group(1))

    partitioned_fold(
        spark, root, batch(0, 200), "k", remerge, 0,
        n_parts=2, mode="delta",
        metrics_registry=reg, leaf_target=16 << 10,
    )
    text = reg.render()
    assert "# TYPE fold_state_reshard_due gauge" in text
    assert gauge(text, "fold_state_n_parts") == 2
    assert gauge(text, "fold_state_bytes") > 0
    assert gauge(text, "fold_state_reshard_due") == 0

    for b in (1, 2):
        partitioned_fold(
            spark, root, batch(b, 4_000), "k", remerge, b,
            n_parts=2, mode="delta", compact_every=2,
            metrics_registry=reg, leaf_target=16 << 10,
        )
    grown = reg.render()
    assert gauge(grown, "fold_state_reshard_due") == 1
    suggested = gauge(grown, "fold_state_suggested_n_parts")
    assert suggested > 2

    reshard_state(spark, root, "k", int(suggested) * 2, remerge=remerge)
    partitioned_fold(
        spark, root, batch(3, 10), "k", remerge, 3,
        n_parts=int(suggested) * 2, mode="delta",
        metrics_registry=reg, leaf_target=16 << 10,
    )
    cleared = reg.render()
    assert gauge(cleared, "fold_state_reshard_due") == 0
    assert gauge(cleared, "fold_state_n_parts") == int(suggested) * 2


# ---------------------------------------- curation funnel composition

def test_curate_funnel_every_stage_binds(spark):
    """Planted corpus where EVERY funnel stage visibly cuts (the
    synthetic documents table has no exact duplicates and few
    non-English docs, so only the planted frame exercises all five
    laws): a marker-free doc stops at raw, a short doc at langid, the
    higher-id byte-exact duplicate at quality, the eval-slice doc and
    an n-gram-contaminated doc at dedup_exact, and the clean control
    survives to decontaminated."""
    from timer_pulsar_spark.operators.dedup import DECON_MOD, DECON_N
    from timer_pulsar_spark.operators.textops import curate_per_doc

    def words(tag, n, marker=True):
        body = " ".join(f"{tag}x{i}" for i in range(n - (1 if marker else 0)))
        return f"the {body}" if marker else body

    leak = " ".join(f"leak{i}" for i in range(DECON_N))
    dup_text = words("dup", 60)
    rows = [
        # stage 0: no EN marker at all (55 unique tokens, quality-ok)
        (1, "xx", words("nomark", 55, marker=False)),
        # stage 1: marker but only 10 tokens -> fails the n>=50 gate
        (2, "en", words("short", 10)),
        # stage 2: byte-exact duplicate pair; min doc_id 3 is canonical,
        # doc 4 drops at the dedup stage
        (3, "en", dup_text),
        (4, "en", dup_text),
        # stage 3a: the eval-slice doc itself (id % DECON_MOD == 0)
        (2 * DECON_MOD, "en", f"{words('eval', 55)} {leak}"),
        # stage 3b: train doc sharing the planted DECON_N-gram window
        (5, "en", f"{words('cont', 55)} {leak}"),
        # stage 4: clean survivor
        (6, "en", words("clean", 60)),
    ]
    d = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    per = {r.doc_id: r.last_stage for r in curate_per_doc(d).collect()}
    assert per == {
        1: 0, 2: 1, 3: 4, 4: 2, 2 * DECON_MOD: 3, 5: 3, 6: 4,
    }, per


def test_curate_funnel_counts_match_last_stage(spark, duck):
    """The registered funnel aggregate IS the cumulative count of
    last_stage verdicts (stage k counts docs with last_stage >= k),
    and both registered queries hash-match their DuckDB oracles at the
    test SF end-to-end."""
    from timer_pulsar_spark.operators.textops import (
        q_curate_funnel,
        q_curate_pipeline,
        _curate_per_doc,
    )
    from timer_pulsar_spark.operators.textops import ORACLES

    per = _curate_per_doc(spark, SF_DIR).collect()
    funnel = {r.stage: r for r in q_curate_funnel(spark, SF_DIR).collect()}
    assert set(funnel) == {0, 1, 2, 3, 4}
    for k in range(5):
        expect = [r for r in per if r.last_stage >= k]
        assert funnel[k].n_docs == len(expect), k
        assert funnel[k].n_tokens == sum(r.n_tokens for r in expect), k
    # survivors twin = the stage-4 docs exactly
    surv = q_curate_pipeline(spark, SF_DIR).collect()
    assert {r.doc_id for r in surv} == {
        r.doc_id for r in per if r.last_stage == 4
    }
    from .conftest import assert_matches_oracle

    assert_matches_oracle(
        q_curate_funnel(spark, SF_DIR), duck, ORACLES["q_curate_funnel"]
    )
    assert_matches_oracle(
        q_curate_pipeline(spark, SF_DIR), duck, ORACLES["q_curate_pipeline"]
    )


# ------------------------------- duplicate-box MP4 walks (first-wins)

def _box(typ: bytes, payload: bytes) -> bytes:
    return (8 + len(payload)).to_bytes(4, "big") + typ + payload


def _dual_box_mp4(swap_stsz: bool = False) -> bytes:
    """Hand-rolled ftyp + mdat-FIRST + moov file whose stbl carries TWO
    stsz boxes (real 3x8-byte frames vs a hostile 3x4-byte decoy) and
    whose mdia carries TWO hdlr boxes (vide, then a soun decoy).
    mdat precedes moov so absolute stco offsets stay valid however the
    moov grows; swap_stsz flips the stsz order to prove the two tables
    genuinely disagree (a last-wins reader returns the decoy slices)."""
    ftyp = _box(b"ftyp", b"isom" + b"\x00" * 8)
    frames = b"".join(bytes([16 * f + i for i in range(8)]) for f in range(3))
    mdat = _box(b"mdat", b"\xEE\xEE" + frames)  # 2 junk bytes pre-frame-0
    frame0 = len(ftyp) + 8 + 2
    stsz_real = _box(
        b"stsz",
        b"\x00" * 4 + (0).to_bytes(4, "big") + (3).to_bytes(4, "big")
        + b"".join((8).to_bytes(4, "big") for _ in range(3)),
    )
    stsz_decoy = _box(
        b"stsz",
        b"\x00" * 4 + (0).to_bytes(4, "big") + (3).to_bytes(4, "big")
        + b"".join((4).to_bytes(4, "big") for _ in range(3)),
    )
    stsc = _box(
        b"stsc",
        b"\x00" * 4 + (1).to_bytes(4, "big")
        + (1).to_bytes(4, "big") + (3).to_bytes(4, "big")
        + (1).to_bytes(4, "big"),
    )
    stco = _box(
        b"stco", b"\x00" * 4 + (1).to_bytes(4, "big")
        + frame0.to_bytes(4, "big")
    )
    first, second = (
        (stsz_decoy, stsz_real) if swap_stsz else (stsz_real, stsz_decoy)
    )
    stbl = _box(b"stbl", first + second + stsc + stco)
    minf = _box(b"minf", stbl)
    hdlr_vide = _box(b"hdlr", b"\x00" * 8 + b"vide" + b"\x00" * 12)
    hdlr_soun = _box(b"hdlr", b"\x00" * 8 + b"soun" + b"\x00" * 12)
    mdia = _box(b"mdia", hdlr_vide + hdlr_soun + minf)
    trak = _box(b"trak", mdia)
    moov = _box(b"moov", trak)
    return ftyp + mdat + moov


def test_mp4_duplicate_boxes_first_wins():
    """A hostile duplicate sample table or handler box must not
    re-address the samples: the walk takes the FIRST of every
    once-per-track box (the _walk_wav dual-data discipline, VERDICT
    r11 #2 applied to ISO-BMFF). The swapped-order file proves the
    decoy genuinely disagrees — a last-wins reader would have
    returned exactly those wrong slices."""
    from timer_pulsar_spark.operators.multimodal import _mp4_frame_slices

    good = _dual_box_mp4()
    sl = _mp4_frame_slices(good)
    frame0 = sl[0][0]
    assert sl == [(frame0, 8), (frame0 + 8, 8), (frame0 + 16, 8)]
    # same bytes, stsz order swapped: the decoy table IS different
    swapped = _mp4_frame_slices(_dual_box_mp4(swap_stsz=True))
    assert swapped == [(frame0, 4), (frame0 + 4, 4), (frame0 + 8, 4)]
    assert swapped != sl
    # the duplicate soun hdlr must not demote the video trak either:
    # slices were found, so handler stayed vide (first-wins)


def test_mp4_meta_duplicate_mvhd_hdlr_first_wins():
    """_walk_mp4's metadata path under the same hostility: a second
    mvhd declaring a 10x duration and a second hdlr must not
    overwrite what the first copies declared."""
    from timer_pulsar_spark.operators.multimodal import _walk_mp4

    ftyp = _box(b"ftyp", b"isom" + b"\x00" * 8)
    # v0 mvhd: payload = ver/flags(4) ctime(4) mtime(4) ts(4) dur(4)...
    def mvhd(ts, dur):
        return _box(
            b"mvhd",
            b"\x00" * 4 + b"\x00" * 8 + ts.to_bytes(4, "big")
            + dur.to_bytes(4, "big") + b"\x00" * 80,
        )

    stsd = _box(
        b"stsd",
        b"\x00" * 4 + (1).to_bytes(4, "big")
        + (16).to_bytes(4, "big") + b"avc1" + b"\x00" * 8,
    )
    stsd_decoy = _box(
        b"stsd",
        b"\x00" * 4 + (1).to_bytes(4, "big")
        + (16).to_bytes(4, "big") + b"hvc1" + b"\x00" * 8,
    )
    stbl = _box(b"stbl", stsd + stsd_decoy)
    minf = _box(b"minf", stbl)
    hdlr_vide = _box(b"hdlr", b"\x00" * 8 + b"vide" + b"\x00" * 12)
    hdlr_soun = _box(b"hdlr", b"\x00" * 8 + b"soun" + b"\x00" * 12)
    mdia = _box(b"mdia", hdlr_vide + hdlr_soun + minf)
    trak = _box(b"trak", mdia)
    moov = _box(b"moov", mvhd(1000, 5000) + mvhd(1000, 50000) + trak)
    meta = _walk_mp4(ftyp + moov)
    # (codec, w, h, dur_ms, video_codec, audio_codec, n_tracks)
    assert meta[0] == "mp4"
    assert meta[3] == 5000, meta      # first mvhd's 5 s, not the 50 s decoy
    assert meta[4] == "avc1", meta    # first stsd fourcc
    assert meta[5] is None            # the soun hdlr decoy won nothing


# ------------------------------ planted-corpus template generators

def test_pcm_and_gradient_templates_match_the_arithmetic_law():
    """The precomputed window-chunk templates (one substring per
    planted window; the per-byte HOF-lambda form they replaced made
    corpus generation dominate the media benches ~25x over the walks
    consuming it) must encode EXACTLY the arithmetic law: 4 samples
    [+a, -a, +a, -a] little-endian at each width (offset-binary at
    wb=1, two's-complement of amp*257*256^(wb-2) wider), and the
    0..190 pixel gradient."""
    from timer_pulsar_spark.operators.multimodal import (
        _GRADIENT_HEX,
        _PCM_TEMPLATES,
        _pcm_window_chunk,
    )

    assert _GRADIENT_HEX == "".join(format(x, "02X") for x in range(191))
    for wb in (1, 2, 3, 4):
        t = _PCM_TEMPLATES[wb - 1]
        assert len(t) == 120 * 8 * wb
        for a in (0, 1, 59, 118, 119):
            chunk = t[a * 8 * wb : (a + 1) * 8 * wb]
            assert chunk == _pcm_window_chunk(a, wb)
            raw = bytes.fromhex(chunk)
            if wb == 1:
                assert list(raw) == [128 + a, 128 - a, 128 + a, 128 - a]
            else:
                sc = 257 * 256 ** (wb - 2)
                vals = [
                    int.from_bytes(raw[i * wb : (i + 1) * wb],
                                   "little", signed=True)
                    for i in range(4)
                ]
                assert vals == [a * sc, -a * sc, a * sc, -a * sc]
