"""Round-8 coverage: the sampled production trainers for the two
learned filters (VERDICT r07 item 6) — their fit-quality contracts,
and the measured reason their checks are NOT holdout contracts on this
synthetic corpus (no cross-document signal exists to generalize from;
the docstrings cite these tests so the claim stays data-backed).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .conftest import SF_DIR


# ---------------------------------------------------------------------------
# quality discriminator: sampled trainer
# ---------------------------------------------------------------------------


def test_qualclf_sampled_check_contract(spark):
    from timer_pulsar_spark.operators.textops import (
        q_quality_clf_sampled_check,
    )

    row = q_quality_clf_sampled_check(spark, SF_DIR).collect()[0]
    assert row.strict_sample
    assert row.within_eps
    assert row.beats_majority
    assert row.loss_monotone


def test_qualclf_sampled_trains_on_a_strict_hash_sample(spark):
    """The sampled trainer must really train on the deterministic
    xxhash64 bucket: refitting is bit-reproducible (same sample, same
    order-free sums) and the sample is a strict subset."""
    from timer_pulsar_spark.catalog import load_table
    from timer_pulsar_spark.operators.textops import qualclf_fit_sampled

    w1, l1, n1, mod = qualclf_fit_sampled(spark, SF_DIR)
    w2, l2, n2, mod2 = qualclf_fit_sampled(spark, SF_DIR)
    assert (w1, l1, n1, mod) == (w2, l2, n2, mod2)
    assert mod >= 2
    n_docs = load_table(spark, SF_DIR, "documents").count()
    # examples = 2 per trained doc; strictly fewer docs than the corpus
    assert 0 < n1 < 2 * n_docs


def test_qualclf_synthetic_corpus_does_not_generalize(spark):
    """The measured property that makes a holdout-gap contract vacuous
    HERE (and only here): the corpus vocabulary is near-uniform
    (q_zipf_fit: slope -0.18, R2 0.06), so documents share almost no
    bigram support and a model trained on half the docs scores the
    other half at ~the 0.5 majority rate — while fitting its own
    sample at ~0.85+. If this test ever fails with holdout accuracy
    ABOVE the bound, the corpus gained cross-document signal and the
    sampled checks should be upgraded to holdout contracts."""
    from timer_pulsar_spark.catalog import load_table
    from timer_pulsar_spark.operators.textops import (
        _qualclf_score_frame,
        qualclf_fit_sampled,
    )

    w, _losses, _n, mod = qualclf_fit_sampled(spark, SF_DIR)
    d = load_table(spark, SF_DIR, "documents")
    holdout = d.filter(F.pmod(F.xxhash64(F.col("doc_id")), F.lit(mod)) != 0)
    acc = (
        _qualclf_score_frame(spark, holdout, w)
        .agg(F.avg((F.col("pred") == F.col("label")).cast("double")))
        .collect()[0][0]
    )
    assert acc < 0.65  # measured 0.48-0.53 at sf0.001/0.01


# ---------------------------------------------------------------------------
# embedding linear probe: sampled trainer
# ---------------------------------------------------------------------------


def test_embed_sampled_check_contract(spark):
    from timer_pulsar_spark.operators.similarity import (
        q_embed_classifier_sampled_check,
    )

    row = q_embed_classifier_sampled_check(spark, SF_DIR).collect()[0]
    assert row.strict_sample
    assert row.within_eps
    assert row.beats_majority
    assert row.loss_monotone


def test_kcenter_sampled_contract_and_composition(spark):
    """Sample-then-select k-center (VERDICT r07 item 7): the contract
    row holds, the greedy loop really ran on a strict hash sample
    (every selected center's vec_id is in the sample bucket), and the
    full-corpus coverage radius is the sample radius or worse (set
    inclusion)."""
    from timer_pulsar_spark.operators.similarity import (
        kcenter_select_sampled,
        q_kcenter_sampled_check,
    )

    row = q_kcenter_sampled_check(spark, SF_DIR).collect()[0]
    assert row.strict_sample and row.radii_nonincreasing
    assert row.sample_covered_by_last_radius and row.centers_separated
    assert row.full_radius_ge_sample

    picks, covered_sample, covered_full, mod = kcenter_select_sampled(
        spark, SF_DIR
    )
    assert mod >= 2
    assert len(picks) == 16
    sel_ids = [v for _r, v, _d in picks]
    in_bucket = (
        spark.createDataFrame([(v,) for v in sel_ids], "vec_id long")
        .filter(F.pmod(F.xxhash64(F.col("vec_id")), F.lit(mod)) == 0)
        .count()
    )
    assert in_bucket == len(sel_ids)  # selection never left the sample
    # the full pass covers MORE points than the sample pass
    assert covered_full.count() > covered_sample.count()


def test_embed_probe_synthetic_labels_do_not_generalize(spark):
    """The embeddings' labels are noise with respect to the embedding
    geometry: a probe trained on half the rows scores the other half
    at ~the majority rate (measured 0.08-0.11 vs majority ~0.12),
    while fitting its own sample far above it — the measured reason
    q_embed_classifier_sampled_check bounds fit quality, not a
    holdout gap."""
    from timer_pulsar_spark.catalog import load_table
    from timer_pulsar_spark.operators.similarity import (
        _embed_probe_acc,
        embed_classifier_fit_sampled,
    )

    W, _losses, _n, C, mod = embed_classifier_fit_sampled(spark, SF_DIR)
    e = load_table(spark, SF_DIR, "embeddings").select(
        "vec_id", "embedding", "label"
    )
    holdout = e.filter(F.pmod(F.xxhash64(F.col("vec_id")), F.lit(mod)) != 0)
    acc = _embed_probe_acc(spark, W, C, holdout)
    assert acc < 0.25  # measured 0.08-0.11 at sf0.001/0.01
