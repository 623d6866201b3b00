"""Round-7 coverage: the sampled recall reference of the near-dup
auto-switch check actually SAMPLING (mod > 1 — VERDICT r06 noted the
branch had only ever run with mod = 1), its bounded growth schedule,
and the ref_ok flag that surfaces a degenerate (too-few-pairs)
reference instead of letting a vacuous recall=1.0 read as green.
"""

from __future__ import annotations

import pytest

from .conftest import SF_DIR


@pytest.fixture
def dedup():
    import timer_pulsar_spark.operators.dedup as dedup

    return dedup


def _full_exact_pairs(dedup, spark):
    return dedup.q_dedup_near(spark, SF_DIR).count()


def test_auto_check_sampled_recall_actually_samples(
    spark, monkeypatch, dedup
):
    """Force the switch on AND mod > 1: the recall reference must be
    computed over a strict subset of the corpus (the O(sample) scale
    path), and the contract columns must still hold."""
    from timer_pulsar_spark.catalog import load_table

    n = load_table(spark, SF_DIR, "documents").count()
    monkeypatch.setattr(dedup, "NEAR_DUP_AUTO_THRESHOLD", 1)
    monkeypatch.setattr(dedup, "RECALL_SAMPLE_DOCS", max(1, n // 3))
    monkeypatch.setattr(dedup, "RECALL_MIN_REF_PAIRS", 0)
    monkeypatch.setattr(dedup, "RECALL_GROW_ROUNDS", 0)

    sampled_doc_counts: list[int] = []
    real = dedup.near_pairs_over

    def recording(docs_df, sp, **kw):
        sampled_doc_counts.append(docs_df.count())
        return real(docs_df, sp, **kw)

    monkeypatch.setattr(dedup, "near_pairs_over", recording)

    row = dedup.q_dedup_near_auto_check(spark, SF_DIR).collect()[0]
    assert row.switched and row.pairs_sound and row.recall_ok and row.ref_ok
    # the reference really ran on a hash sample, not the full corpus
    assert sampled_doc_counts and 0 < sampled_doc_counts[0] < n
    # sampled reference pairs are a subset of the full exact pair set
    assert 0 <= row.n_exact <= _full_exact_pairs(dedup, spark)


def test_auto_check_degenerate_sample_flags_ref_not_ok(
    spark, monkeypatch, dedup
):
    """A sample too small to hold RECALL_MIN_REF_PAIRS reference pairs
    (and a growth budget that cannot reach the full corpus) must come
    back ref_ok=false — the recall estimate is indeterminate, and the
    operator can now SEE that instead of a vacuously green recall_ok
    (ADVICE r06)."""
    monkeypatch.setattr(dedup, "NEAR_DUP_AUTO_THRESHOLD", 1)
    monkeypatch.setattr(dedup, "RECALL_SAMPLE_DOCS", 1)  # mod = n docs
    monkeypatch.setattr(dedup, "RECALL_GROW_ROUNDS", 0)

    row = dedup.q_dedup_near_auto_check(spark, SF_DIR).collect()[0]
    assert row.n_exact < dedup.RECALL_MIN_REF_PAIRS
    assert not row.ref_ok
    assert row.pairs_sound  # soundness is sample-independent


def test_auto_check_growth_reaches_complete_reference(
    spark, monkeypatch, dedup
):
    """With the normal growth budget, a sparse sample keeps growing
    (mod -> mod/8 -> ... -> 1); once it reaches the full corpus the
    reference is complete by definition and ref_ok is true even if
    the corpus genuinely holds few near-dup pairs."""
    monkeypatch.setattr(dedup, "NEAR_DUP_AUTO_THRESHOLD", 1)
    monkeypatch.setattr(dedup, "RECALL_SAMPLE_DOCS", 1)  # start tiny

    row = dedup.q_dedup_near_auto_check(spark, SF_DIR).collect()[0]
    assert row.ref_ok
    assert row.n_exact == _full_exact_pairs(dedup, spark)
    assert row.recall_ok
