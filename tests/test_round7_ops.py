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


def test_auto_check_growth_floors_at_mod_two(spark, monkeypatch, dedup):
    """ADVICE r07: the growth schedule must never degenerate to
    mod == 1 — a FULL-corpus run of the exact postings plan, exactly
    the quadratic-candidate plan the auto-switch exists to retire.
    Start just above the verdict's n=150k shape (initial mod = 3) with
    an unmeetable pair floor: the single grow round must land on the
    mod == 2 floor (never 1), every reference run must be a strict
    subset of the corpus, and the unmet floor must surface as
    ref_ok=false instead of an unbounded recompute."""
    from timer_pulsar_spark.catalog import load_table

    n = load_table(spark, SF_DIR, "documents").count()
    monkeypatch.setattr(dedup, "NEAR_DUP_AUTO_THRESHOLD", 1)
    monkeypatch.setattr(dedup, "RECALL_SAMPLE_DOCS", max(1, n // 3))
    monkeypatch.setattr(dedup, "RECALL_MIN_REF_PAIRS", 10**9)

    sampled_doc_counts: list[int] = []
    real = dedup.near_pairs_over

    def recording(docs_df, sp, **kw):
        sampled_doc_counts.append(docs_df.count())
        return real(docs_df, sp, **kw)

    monkeypatch.setattr(dedup, "near_pairs_over", recording)

    row = dedup.q_dedup_near_auto_check(spark, SF_DIR).collect()[0]
    assert sampled_doc_counts, "reference never ran"
    # the cost bound: NO reference run ever touched the full corpus
    assert all(c < n for c in sampled_doc_counts)
    # floor unmet at mod == 2 -> indeterminate, not silently green
    assert not row.ref_ok
    assert row.pairs_sound  # soundness is sample-independent


# ---------------------------------------------------------------------------
# Winnowing fingerprints (round-7 newcomer)
# ---------------------------------------------------------------------------


def _fps(spark, dedup, texts):
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    rows = dedup.winnow_fingerprints(docs).collect()
    return {r.doc_id: set(r.fps) for r in rows}


def test_winnow_guarantee_shared_run_shares_fingerprint(spark, dedup):
    """The winnowing guarantee (Schleimer et al. 2003): any shared
    token run of length >= W + K - 1 forces at least one shared
    fingerprint, whatever surrounds it."""
    run_len = dedup.WINNOW_W + dedup.WINNOW_K - 1
    shared_run = " ".join(f"s{i}" for i in range(run_len))
    a = "alpha beta " + shared_run + " gamma delta"
    b = "one two three " + shared_run
    fps = _fps(spark, dedup, [a, b])
    assert fps[0] & fps[1], "guaranteed shared fingerprint missing"


def test_winnow_short_doc_keeps_global_min(spark, dedup):
    """Docs with 1..W-1 grams keep exactly their global-min gram hash
    (the paper's short-document rule); docs below K tokens have no
    grams and no fingerprints."""
    k, w = dedup.WINNOW_K, dedup.WINNOW_W
    short = " ".join(f"t{i}" for i in range(k + w - 2))  # w-1 grams
    tiny = " ".join(f"t{i}" for i in range(k - 1))  # no gram
    fps = _fps(spark, dedup, [short, tiny])
    assert len(fps[0]) == 1
    assert fps[1] == set()


def test_winnow_density_below_full_gram_set(spark, dedup):
    """Winnowing is a SAMPLE of the gram hashes: on a long document
    the kept set must be materially smaller than the full gram set
    (expected density ~2/(W+1)) while staying non-empty."""
    text = " ".join(f"w{i * 7 % 13}x{i}" for i in range(300))
    fps = _fps(spark, dedup, [text])
    n_grams = 300 - dedup.WINNOW_K + 1
    assert 0 < len(fps[0]) < n_grams / 2


# ---------------------------------------------------------------------------
# IVF-PQ (round-7 newcomer)
# ---------------------------------------------------------------------------


def test_ivfpq_contract_and_bounded_model(spark):
    """IVF-PQ: the recall/exact-rerank contract holds, every corpus
    vector carries exactly m code rows plus one cell assignment, and
    the model state that crossed to the driver is bounded by
    k_coarse x dim + m x ksub x subdim — never corpus-sized."""
    import timer_pulsar_spark.operators.similarity as sim
    from timer_pulsar_spark.catalog import load_table

    import pyspark.sql.functions as F

    row = sim.q_ivfpq_check(spark, SF_DIR).collect()[0]
    assert row.recall_ok and row.exact_rerank_ok

    codes, cb, cents, subdim = sim.ivfpq_train_encode(spark, SF_DIR)
    n = load_table(spark, SF_DIR, "embeddings").count()
    assert codes.count() == n * sim.PQ_M
    per_vec = codes.groupBy("vec_id").agg(
        F.countDistinct("block").alias("nb"),
        F.countDistinct("cell_id").alias("nc"),
    )
    bad = per_vec.filter(
        (F.col("nb") != sim.PQ_M) | (F.col("nc") != 1)
    ).count()
    assert bad == 0
    assert len(cb) == sim.PQ_M * sim.PQ_KSUB
    assert len(cents) == sim._N_CENTROIDS
    assert all(0 <= c < sim.PQ_KSUB for _b, c, _cent in cb)


def test_ivfpq_scan_is_bounded_to_probed_cells(spark):
    """The ADC join keys on cell_id: a query's candidate set is the
    union of its probed cells only — the nprobe/k scan bound that
    distinguishes IVF-PQ from flat PQ's full-corpus ADC scan."""
    import timer_pulsar_spark.operators.similarity as sim

    import pyspark.sql.functions as F

    codes, _cb, _cents, _subdim = sim.ivfpq_train_encode(spark, SF_DIR)
    cell_sizes = {
        int(r.cell_id): int(r.n)
        for r in codes.filter(F.col("block") == 0)
        .groupBy("cell_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    total = sum(cell_sizes.values())
    # probing nprobe of k cells can never touch the whole corpus
    # unless the probed cells happen to contain it; with 16 cells and
    # nprobe=8 on hash-spread seeds the bound is strict
    top_probe = sum(sorted(cell_sizes.values())[-sim.IVFPQ_NPROBE :])
    assert top_probe < total


# ---------------------------------------------------------------------------
# Embedding linear probe (round-7 newcomer)
# ---------------------------------------------------------------------------


def test_embed_classifier_learns_labels_with_bounded_model(spark):
    """Distributed softmax regression: the convex full-batch loss
    decreases monotonically, the model is (C x dim) driver state, and
    the scored corpus beats the majority-class prior by the
    contract's margin — i.e. the probe learned label structure."""
    import timer_pulsar_spark.operators.similarity as sim

    W, losses, n, C = sim.embed_classifier_fit(spark, SF_DIR)
    assert len(W) == C and len({len(w) for w in W}) == 1
    assert all(
        losses[i + 1] <= losses[i] + 1e-9 for i in range(len(losses) - 1)
    )
    assert losses[-1] < losses[0]

    pdf = sim.q_embed_classifier(spark, SF_DIR).toPandas()
    assert len(pdf) == n
    assert pdf["pred_label"].between(0, C - 1).all()
    acc = float((pdf["label"] == pdf["pred_label"]).mean())
    majority = float(pdf["label"].value_counts().max()) / n
    # scale-valid margin contract (r8): multiplicative over majority,
    # not an absolute floor — training acc is memorization capacity on
    # noise labels and decays toward majority as rows grow
    assert acc >= sim.EMBED_CLS_ACC_MARGIN * majority > majority


def test_winnow_pairs_detects_partial_overlap(spark, dedup, tmp_path):
    """End-to-end q_winnow_pairs on a corpus where two documents share
    only a PARTIAL run (far below the 0.8 whole-set Jaccard the
    near-dup family needs): the pair must surface. Runs on a staged
    parquet dir so the registered query path (load_table) is what's
    exercised."""
    base = [f"body{i} filler{i * 3} pad{i}" for i in range(40)]
    shared = " ".join(f"quote{i}" for i in range(12))
    texts = [
        " ".join(base) + " " + shared,
        shared + " completely different tail " + " ".join(f"z{i}" for i in range(40)),
        "unrelated " + " ".join(f"u{i}" for i in range(50)),
    ]
    docs = spark.createDataFrame(
        [(i, t, "en", "test", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    pairs = dedup.q_winnow_pairs(spark, str(tmp_path)).collect()
    got = {(r.doc_a, r.doc_b) for r in pairs}
    assert (0, 1) in got
    assert all(2 not in p for p in got)


def _stage_docs(spark, tmp_path, texts):
    docs = spark.createDataFrame(
        [(i, t, "en", "test", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_span_scrub_cuts_non_canonical_keeps_canonical(spark, dedup, tmp_path):
    """A span shared by two docs (and repeated within the later doc)
    keeps exactly its global-first occurrence; every other occurrence's
    tokens are cut, including the within-doc repeat."""
    span = " ".join(f"s{i}" for i in range(8))
    texts = [
        "head0 head1 " + span + " tail0 tail1",
        "p0 p1 p2 " + span + " mid0 mid1 " + span + " q0",
        " ".join(f"u{i}" for i in range(20)),
    ]
    sf = _stage_docs(spark, tmp_path, texts)
    rows = {r.doc_id: r for r in dedup.q_span_scrub(spark, sf).collect()}
    assert rows[0].clean_text == texts[0] and rows[0].n_removed == 0
    # doc 1 loses both occurrences (16 tokens), keeps everything else
    assert rows[1].clean_text == "p0 p1 p2 mid0 mid1 q0"
    assert rows[1].n_removed == 16
    assert rows[1].n_tokens == len(texts[1].split(" "))
    assert rows[2].clean_text == texts[2] and rows[2].n_removed == 0


def test_span_scrub_overlapping_spans_union_coverage(spark, dedup, tmp_path):
    """Two docs sharing a 9-token run: both 8-token windows inside the
    run are hot, their coverage in the non-canonical doc unions to the
    9 run tokens (not 16), and the canonical doc is untouched."""
    run = " ".join(f"r{i}" for i in range(9))
    texts = [
        "a0 a1 " + run + " a2",
        "b0 " + run + " b1 b2 b3",
    ]
    sf = _stage_docs(spark, tmp_path, texts)
    rows = {r.doc_id: r for r in dedup.q_span_scrub(spark, sf).collect()}
    assert rows[0].clean_text == texts[0] and rows[0].n_removed == 0
    assert rows[1].clean_text == "b0 b1 b2 b3"
    assert rows[1].n_removed == 9


def test_span_scrub_invariants_on_corpus(spark, dedup):
    """Real-corpus invariants: clean tokens are a subsequence of the
    original tokens, and counts reconcile (n_removed = n_tokens -
    kept), including for fully-scrubbed docs (clean_text = '')."""
    from timer_pulsar_spark.catalog import load_table

    orig = {
        r.doc_id: r.text
        for r in load_table(spark, SF_DIR, "documents").collect()
    }
    out = dedup.q_span_scrub(spark, SF_DIR).collect()
    assert len(out) == len(orig)
    scrubbed = 0
    for r in out:
        toks = orig[r.doc_id].split(" ")
        kept = r.clean_text.split(" ") if r.clean_text != "" else []
        assert r.n_tokens == len(toks)
        assert r.n_removed == len(toks) - len(kept)
        it = iter(toks)
        assert all(k in it for k in kept), f"doc {r.doc_id} not a subsequence"
        scrubbed += r.n_removed > 0
    assert scrubbed >= 1, "corpus has planted dups; scrub must touch some"


def test_qualclf_negatives_preserve_unigrams_and_are_deterministic(spark):
    """The shuffled twin must hold EXACTLY the positive's token
    multiset (the discriminator can only learn order), and the
    permutation must be a pure function of (doc_id, position)."""
    import timer_pulsar_spark.operators.textops as t
    from timer_pulsar_spark.catalog import load_table

    d = load_table(spark, SF_DIR, "documents").limit(50)
    ex = t._qualclf_examples(d)
    # reconstruct per-example token multisets from the bias-free rows:
    # compare positive vs negative bucket histograms per doc — equal
    # UNIGRAM multisets imply nothing about bigrams, so instead rebuild
    # the shuffled arrays directly from the expression twice
    toks = d.select("doc_id", t._toks().alias("ws")).filter("size(ws) >= 2")
    shuf_expr = (
        "transform(array_sort(transform(ws, (x, i) -> struct("
        " xxhash64(concat(cast(doc_id AS string), '#', cast(i AS string))) AS k,"
        " x AS w))), s -> s.w)"
    )
    a = toks.selectExpr("doc_id", f"{shuf_expr} AS s").collect()
    b = toks.selectExpr("doc_id", f"{shuf_expr} AS s").collect()
    orig = {r.doc_id: r.ws for r in toks.collect()}
    assert {r.doc_id: r.s for r in a} == {r.doc_id: r.s for r in b}
    moved = 0
    for r in a:
        assert sorted(r.s) == sorted(orig[r.doc_id])
        moved += r.s != orig[r.doc_id]
    assert moved > len(a) * 0.9, "permutation must actually reorder"
    assert ex.filter("bucket = -1").count() == toks.count() * 2


def test_qualclf_learns_order_with_bounded_model(spark):
    """End-to-end contract at SF_DIR: model is DIM+1 driver floats,
    loss is monotone + improved, and accuracy clears the floor on a
    task whose unigram signal is zero by construction."""
    import timer_pulsar_spark.operators.textops as t
    from pyspark.sql import functions as F

    w, losses, n = t.qualclf_fit(spark, SF_DIR)
    assert len(w) == t.QUALCLF_DIM + 1
    assert len(losses) == t.QUALCLF_ITERS
    assert all(
        losses[i + 1] <= losses[i] + 1e-9 for i in range(len(losses) - 1)
    )
    assert losses[-1] < losses[0]
    scored = t.q_quality_clf(spark, SF_DIR)
    acc = scored.agg(
        F.avg((F.col("pred") == F.col("label")).cast("double"))
    ).collect()[0][0]
    assert acc >= t.QUALCLF_ACC_FLOOR, f"acc {acc}"
    row = t.q_quality_clf_check(spark, SF_DIR).collect()[0]
    assert row.loss_monotone and row.loss_improved
    assert row.acc_ok and row.beats_majority


def test_pca_matches_numpy_reference(spark):
    """The distributed one-pass moments must reproduce the numpy PCA
    of the same matrix: same eigenvalues, same (sign-canonicalized)
    top-k basis, to float-sum-order tolerance."""
    import numpy as np

    import timer_pulsar_spark.operators.similarity as sim
    from timer_pulsar_spark.catalog import load_table

    mean, V, eigvals, n = sim.pca_fit(spark, SF_DIR)
    X = np.array(
        [
            r.embedding
            for r in load_table(spark, SF_DIR, "embeddings")
            .orderBy("vec_id")
            .collect()
        ],
        dtype=np.float64,
    )
    assert n == len(X)
    ref_mean = X.mean(axis=0)
    ref_cov = np.cov(X, rowvar=False, bias=True)
    w, U = np.linalg.eigh(ref_cov)
    order = np.argsort(w)[::-1]
    w, U = w[order], U[:, order].T
    for c in range(sim.PCA_K):
        if U[c, np.argmax(np.abs(U[c]))] < 0:
            U[c] = -U[c]
    assert np.max(np.abs(mean - ref_mean)) < 1e-9
    assert np.max(np.abs(eigvals - w)) < 1e-8
    assert np.max(np.abs(V - U[: sim.PCA_K])) < 1e-6
    row = sim.q_pca_check(spark, SF_DIR).collect()[0]
    assert row.orthonormal and row.eigs_descending
    assert row.recon_matches_residual
    # projection really is 8-dim and bounded by the data scale
    proj = sim.q_pca_project(spark, SF_DIR)
    assert proj.count() == n
    assert len(proj.first().pc) == sim.PCA_K


def test_kcenter_matches_numpy_greedy_reference(spark):
    """The distributed farthest-first traversal must pick exactly the
    same centers, in the same order, as a driver-side numpy replay of
    Gonzalez's algorithm (deterministic: per-row distances, vec_id
    tie-break) — and the contract booleans must all hold."""
    import numpy as np

    import timer_pulsar_spark.operators.similarity as sim
    from timer_pulsar_spark.catalog import load_table

    rows = (
        load_table(spark, SF_DIR, "embeddings")
        .orderBy("vec_id")
        .collect()
    )
    ids = np.array([r.vec_id for r in rows])
    X = np.array([r.embedding for r in rows], dtype=np.float64)
    U = X / np.linalg.norm(X, axis=1, keepdims=True)
    sel = [0]
    dmin = 1.0 - U @ U[0]
    expect = [(1, int(ids[0]))]
    for rank in range(2, sim.KCENTER_K + 1):
        # argmax with vec_id tie-break = first max in id order
        far = int(np.lexsort((ids, -dmin))[0])
        expect.append((rank, int(ids[far])))
        dmin = np.minimum(dmin, 1.0 - U @ U[far])
    got = [
        (r.rank, r.vec_id)
        for r in sim.q_kcenter_select(spark, SF_DIR)
        .orderBy("rank")
        .collect()
    ]
    assert got == expect
    row = sim.q_kcenter_check(spark, SF_DIR).collect()[0]
    assert row.radii_nonincreasing and row.covered_by_last_radius
    assert row.centers_separated


def test_split_leakproof_no_near_dup_straddles_splits(spark, dedup):
    """THE property the op exists for: every near-dup pair lands in
    one split (q_split_assign's doc-keyed hash provably cannot ensure
    this), transitively through clusters; and non-clustered docs keep
    the plain doc-hash assignment (stable as the graph grows)."""
    from pyspark.sql import functions as F

    from timer_pulsar_spark.operators import sampling

    assign = sampling.q_split_leakproof(spark, SF_DIR)
    pairs = dedup.q_dedup_near(spark, SF_DIR).select("doc_a", "doc_b")
    a = assign.select(
        F.col("doc_id").alias("doc_a"), F.col("split").alias("split_a")
    )
    b = assign.select(
        F.col("doc_id").alias("doc_b"), F.col("split").alias("split_b")
    )
    straddling = (
        pairs.join(a, "doc_a").join(b, "doc_b")
        .filter("split_a != split_b")
        .count()
    )
    assert straddling == 0
    # singletons: split equals the doc-keyed rule
    clustered = dedup.q_dup_clusters(spark, SF_DIR).select("doc_id")
    singles = assign.join(clustered, "doc_id", "left_anti")
    bucket = sampling.hash_bucket(F.col("doc_id"))
    expect = (
        F.when(bucket < sampling.SPLIT_TRAIN, "train")
        .when(bucket < sampling.SPLIT_VAL, "val")
        .otherwise("test")
    )
    mismatches = singles.filter(F.col("split") != expect).count()
    assert mismatches == 0
    assert singles.count() > 0
    # all three splits exist at this SF
    assert assign.select("split").distinct().count() == 3


def test_stream_quality_clf_equals_batch_scoring(spark, tmp_path):
    """Serving parity: the micro-batch replay with a PINNED model must
    reproduce the one-shot batch scoring doc-for-doc (pred exactly;
    score to float-sum-order tolerance) — the stateless-scoring
    property that makes the deploy path trustworthy."""
    import timer_pulsar_spark.operators.textops as t
    from timer_pulsar_spark.catalog import load_table

    w, _losses, _n = t.qualclf_fit(spark, SF_DIR)
    streamed = t.stream_quality_clf_run(
        spark, SF_DIR, str(tmp_path / "serve"), w
    )
    batch = t._qualclf_score_frame(
        spark, load_table(spark, SF_DIR, "documents"), w
    )
    s = {r.ex_id: r for r in streamed.collect()}
    b = {r.ex_id: r for r in batch.collect()}
    assert set(s) == set(b) and len(s) > 0
    for ex_id, br in b.items():
        sr = s[ex_id]
        assert (sr.doc_id, sr.label) == (br.doc_id, br.label)
        assert abs(sr.score - br.score) < 1e-9, ex_id
        assert sr.pred == br.pred
