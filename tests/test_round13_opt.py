"""Round-13 optimization-round gates: the in-kernel numpy signature is
pinned bit-exactly against the JVM reference law (VERDICT r12 item 7 /
ADVICE r12 — the r11 equivalence test only covers the retired JVM
path), plus byte-identity gates for any corpus generation moved into
Arrow kernels this round."""

from __future__ import annotations

from .conftest import SF_DIR


def test_audio_pipeline_sigs_equals_jvm_law(spark):
    """audio_pipeline_sigs (RIFF walk + width-normalize + numpy
    signature in ONE kernel — what q_audio_pipeline ships) must equal
    the JVM reference composition energy_sig64_s16 ∘ audio_canonical_pcm
    bit-for-bit over the width-rotating decoy corpus, including the
    null/truncated guard rows: a kernel regression must fail pytest,
    not only the oracle sweep."""
    from pyspark.sql import functions as F

    from timer_pulsar_spark.operators.multimodal import (
        audio_canonical_pcm,
        audio_pipeline_sigs,
        energy_sig64_s16,
        planted_wavs_decoy,
    )

    corpus = (
        planted_wavs_decoy(spark, SF_DIR, with_content=True)
        .filter(F.col("doc_id") < 128)
        .cache()
    )
    # hostile rows the guard law must agree on: null payload, empty
    # payload, truncated container (shorter than the signature span),
    # and a valid header whose data chunk is cut mid-sample
    hostile = corpus.limit(4).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.when(F.col("doc_id") % 4 == 0, F.lit(None).cast("binary"))
        .when(F.col("doc_id") % 4 == 1, F.lit(b""))
        .when(F.col("doc_id") % 4 == 2, F.substring("payload", 1, 11))
        .otherwise(F.substring("payload", 1, 61))
        .alias("payload"),
    )
    full = corpus.unionByName(hostile)

    kernel = {
        r.doc_id: (r.hi, r.lo) for r in audio_pipeline_sigs(full).collect()
    }
    jvm = {
        r.doc_id: (r.hi, r.lo)
        for r in energy_sig64_s16(
            audio_canonical_pcm(full), payload_col="pcm16"
        ).collect()
    }
    corpus.unpersist()
    assert len(kernel) == len(jvm) > 4
    assert kernel == jvm
    # the hostile rows really exercised the no-signature guard
    assert all(
        kernel[d] == (None, None) for d in kernel if d >= 1_000_000
    )


def test_plant_mp4_byte_identical_to_jvm_expression(spark):
    """_plant_mp4 (the in-kernel Python MP4 builder q_video_dedup /
    q_video_fingerprint now generate through, VERDICT r12 #3) must
    produce byte-identical files to the original JVM hex-concat
    expression tree (via_kernel=False) across every container-form
    rotation: uniform vs per-entry stsz (doc%2), stco vs co64 (doc%3),
    largesize moov (doc%3), trak order (doc%2), both fourccs (doc%4),
    and every free/junk pad length (doc%7, doc%5). 420 = lcm of the
    rotation moduli, so 420 consecutive ids cover the full cross
    product."""
    from pyspark.sql import functions as F

    from timer_pulsar_spark.operators.multimodal import (
        _plant_mp4,
        planted_mp4s_frames,
    )

    jvm = {
        r.doc_id: bytes(r.payload)
        for r in planted_mp4s_frames(spark, SF_DIR, via_kernel=False)
        .filter(F.col("doc_id") < 420)
        .collect()
    }
    assert len(jvm) >= 420
    for doc_id, expected in jvm.items():
        assert _plant_mp4(doc_id) == expected, f"doc_id {doc_id}"


def test_plant_wav_byte_identical_to_jvm_expression(spark):
    """_plant_wav (the in-kernel Python WAV builder q_audio_pipeline
    now generates through — the _plant_mp4 pattern on the audio side)
    must produce byte-identical files to the original JVM hex-concat
    expression form across every container-form rotation: fmt kind
    16/18/40 (doc%3), sample width 8/16/24/32 (doc%4), channels
    (doc%2), rate (doc%5), LIST size + even padding (doc%7), and the
    amplitude group law (doc%4). 420 = lcm of the structural moduli,
    so 420 consecutive ids cover the full cross product."""
    from pyspark.sql import functions as F

    from timer_pulsar_spark.operators.multimodal import (
        _plant_wav,
        planted_wavs_decoy,
    )

    jvm = {
        r.doc_id: bytes(r.payload)
        for r in planted_wavs_decoy(spark, SF_DIR, with_content=True)
        .filter(F.col("doc_id") < 420)
        .collect()
    }
    assert len(jvm) >= 420
    for doc_id, expected in jvm.items():
        assert _plant_wav(doc_id) == expected, f"doc_id {doc_id}"


def test_plant_pcm_byte_identical_to_jvm_expression(spark):
    """_plant_pcm (the in-kernel raw-PCM builder behind
    planted_pcm_sigs) must produce byte-identical payloads to the
    planted_pcm JVM template expression for every amplitude group and
    variant (doc%4) — the corpus q_audio_fingerprint / q_audio_dedup
    fingerprint."""
    from timer_pulsar_spark.operators.multimodal import (
        _plant_pcm,
        planted_pcm,
    )

    jvm = {
        r.doc_id: bytes(r.payload)
        for r in planted_pcm(spark, SF_DIR).collect()
    }
    assert len(jvm) >= 420
    for doc_id, expected in jvm.items():
        assert _plant_pcm(doc_id) == expected, f"doc_id {doc_id}"


def test_planted_pcm_sigs_equals_jvm_energy_sig64(spark):
    """planted_pcm_sigs (fused gen+sig kernel, what q_audio_fingerprint
    / q_audio_dedup ship) must equal the JVM reference composition
    energy_sig64 ∘ planted_pcm bit-for-bit: the 8-bit energy law scales
    by exactly 256 under the canonical _widen_to_s16(·, 8) widening, so
    every adjacent-compare bit must survive — a kernel regression must
    fail pytest, not only the oracle sweep."""
    from timer_pulsar_spark.operators.multimodal import (
        energy_sig64,
        planted_pcm,
        planted_pcm_sigs,
    )

    jvm = {
        r.doc_id: (r.hi, r.lo)
        for r in energy_sig64(planted_pcm(spark, SF_DIR)).collect()
    }
    kernel = {
        r.doc_id: (r.hi, r.lo)
        for r in planted_pcm_sigs(spark, SF_DIR).collect()
    }
    assert len(kernel) == len(jvm) > 400
    assert kernel == jvm
