"""Tests for the LLM-training-data operators: dedup (exact, n-gram
Jaccard, MinHash-LSH, SimHash, embedding-cosine), similarity search
(brute-force + sign-LSH), text analysis, and multimodal plumbing.

Oracle-expressible queries are checked against DuckDB like the driver
gate; the probabilistic strategies are checked against their exact
counterparts (parity / subset / recall bounds)."""

from __future__ import annotations

import pytest

from .conftest import SF_DIR, assert_matches_oracle


def _q(name):
    import __spark_entry__ as entrymod

    return entrymod.queries()[name]


def _sql(name):
    import __spark_entry__ as entrymod

    return entrymod.oracle_sql()[name]


ORACLE_CHECKED = [
    "q_dedup_exact",
    "q_dedup_near",
    "q_dup_clusters",
    "q_dedup_simhash_check",
    "q_embed_dup",
    "q_embed_dup_lsh_check",
    "q_ann_topk",
    "q_ann_lsh_check",
    "q_ann_ivf_check",
    "q_textstats",
    "q_tokens",
    "q_langid",
    "q_fingerprint",
    "q_multimodal_meta",
    "q_multimodal_features",
    "q_repetition",
    "q_entropy",
    "q_semdedup",
]


@pytest.mark.parametrize("name", ORACLE_CHECKED)
def test_oracle_parity(spark, duck, name):
    assert_matches_oracle(_q(name)(spark, SF_DIR), duck, _sql(name))


def test_minhash_matches_exact_near_dup(spark):
    """MinHash-LSH candidates + exact-Jaccard verify must return exactly
    the exact n-gram query's pairs: at threshold 0.8 with 16 bands x 4
    rows, P(missing a true pair) ~ 1e-18."""
    near = _q("q_dedup_near")(spark, SF_DIR).toPandas()
    mh = _q("q_dedup_minhash")(spark, SF_DIR).toPandas()
    key = lambda df: set(map(tuple, df[["doc_a", "doc_b"]].values.tolist()))
    assert key(mh) == key(near)
    assert len(near) > 0, "testdata is expected to contain planted near-dups"


def test_dup_clusters_close_pairs_transitively(spark):
    """Every near-dup pair must land in one cluster (even pairs only
    connected through an intermediate doc), the canonical member is the
    cluster's min doc_id, and non-clustered docs never appear."""
    pairs = _q("q_dedup_near")(spark, SF_DIR).toPandas()
    clusters = _q("q_dup_clusters")(spark, SF_DIR).toPandas()
    label = dict(zip(clusters["doc_id"], clusters["cluster_id"]))
    for a, b in pairs[["doc_a", "doc_b"]].values.tolist():
        assert label[a] == label[b], (a, b)
    by_cluster = clusters.groupby("cluster_id")["doc_id"].min()
    for cid, min_id in by_cluster.items():
        assert cid == min_id
    assert set(clusters["doc_id"]) == set(pairs["doc_a"]) | set(pairs["doc_b"])
    assert (clusters["is_canonical"] == (clusters["doc_id"] == clusters["cluster_id"])).all()
    assert (clusters["cluster_size"] >= 2).all()


def test_simhash_pairs_are_true_near_dups(spark):
    """Hamming <= 3 on 3-gram SimHash is a high-precision subset of the
    Jaccard >= 0.8 truth set."""
    near = _q("q_dedup_near")(spark, SF_DIR).toPandas()
    sh = _q("q_dedup_simhash")(spark, SF_DIR).toPandas()
    near_pairs = set(map(tuple, near[["doc_a", "doc_b"]].values.tolist()))
    sh_pairs = set(map(tuple, sh[["doc_a", "doc_b"]].values.tolist()))
    assert sh_pairs, "simhash should find at least one pair"
    assert sh_pairs <= near_pairs


def test_ann_lsh_recall(spark):
    """Sign-LSH with 4x4-bit multi-probe bands must recover a reasonable
    share of the brute-force top-k."""
    brute = _q("q_ann_topk")(spark, SF_DIR).toPandas()
    lsh = _q("q_ann_lsh")(spark, SF_DIR).toPandas()
    truth = set(map(tuple, brute[["query_id", "neighbor_id"]].values.tolist()))
    got = set(map(tuple, lsh[["query_id", "neighbor_id"]].values.tolist()))
    recall = len(truth & got) / len(truth)
    assert recall >= 0.5, f"LSH recall {recall} too low"


def test_ann_ivf_recall_and_exact_scores(spark):
    """IVF probing (6 of 16 cells) must recover a usable share of the
    brute-force top-k, and every (query, neighbor) it returns must carry
    the exact brute-force cosine (the re-rank is exact arithmetic)."""
    brute = _q("q_ann_topk")(spark, SF_DIR).toPandas()
    ivf = _q("q_ann_ivf")(spark, SF_DIR).toPandas()
    truth = dict(
        ((q, n), c)
        for q, n, c in brute[["query_id", "neighbor_id", "cosine"]].values.tolist()
    )
    got = dict(
        ((q, n), c)
        for q, n, c in ivf[["query_id", "neighbor_id", "cosine"]].values.tolist()
    )
    recall = len(set(truth) & set(got)) / len(truth)
    assert recall >= 0.3, f"IVF recall {recall} too low"
    for pair in set(truth) & set(got):
        assert abs(truth[pair] - got[pair]) < 1e-9


def test_embed_dup_lsh_subset_and_recall(spark):
    """The LSH-bucketed embedding dedup returns a subset of the exact
    all-pairs result with usable recall."""
    exact = _q("q_embed_dup")(spark, SF_DIR).toPandas()
    lsh = _q("q_embed_dup_lsh")(spark, SF_DIR).toPandas()
    exact_pairs = set(map(tuple, exact[["vec_a", "vec_b"]].values.tolist()))
    lsh_pairs = set(map(tuple, lsh[["vec_a", "vec_b"]].values.tolist()))
    assert lsh_pairs <= exact_pairs
    if exact_pairs:
        assert len(lsh_pairs) / len(exact_pairs) >= 0.3


def test_multimodal_kernel_values(spark):
    """The mapInPandas kernel output must equal the pure-Python
    featurizer on raw bytes (deterministic fake decode)."""
    from timer_pulsar_spark.operators.multimodal import (
        byte_histogram_features,
        extract_features,
        media_frame,
    )

    mdf = media_frame(spark, SF_DIR)
    feats = {
        r["doc_id"]: r["features"]
        for r in extract_features(mdf).filter("doc_id < 3").collect()
    }
    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .filter("doc_id < 3")
        .collect()
    }
    for doc_id, text in docs.items():
        expected = byte_histogram_features(text.encode("utf-8"))
        assert feats[doc_id] == pytest.approx(expected)


def test_decode_image_is_stubbed():
    from timer_pulsar_spark.operators.multimodal import decode_image

    try:
        import PIL  # noqa: F401

        pytest.skip("Pillow present; decode is live")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG\r\n")


def test_simhash_plan_has_no_python_udf(spark):
    """The dedup signatures must stay JVM-side: no BatchEvalPython /
    ArrowEvalPython nodes in the physical plan."""
    df = _q("q_dedup_simhash")(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan


def test_cooccurring_pairs_df_cap_drops_hot_key(spark):
    """A degenerate hot posting key (df > max_df) must be dropped by the
    df-cap BEFORE pair expansion — bounding the quadratic blowup a
    stop-word shingle would cause at scale — while normal keys are
    unaffected and results below the cap are byte-identical."""
    from pyspark.sql import functions as F

    from timer_pulsar_spark.operators.dedup import cooccurring_pairs

    hot = [(i, "hot") for i in range(50)]          # df=50: 1225 pairs if uncapped
    cold = [(1, "cold"), (2, "cold"), (3, "cold")]  # df=3: 3 pairs
    postings = spark.createDataFrame(hot + cold, "doc_id long, sh string")

    capped = cooccurring_pairs(postings, ["sh"], ["doc_id"], max_df=10).toPandas()
    assert len(capped) == 3  # only the cold key's pairs survive
    assert set(map(tuple, capped.values.tolist())) == {(1, 2), (1, 3), (2, 3)}

    uncapped = cooccurring_pairs(postings, ["sh"], ["doc_id"]).toPandas()
    assert len(uncapped) == 3 + 50 * 49 // 2

    # cap above every group's size changes nothing
    wide = cooccurring_pairs(postings, ["sh"], ["doc_id"], max_df=1000).toPandas()
    assert len(wide) == len(uncapped)


def test_stream_dedup_folds_across_multiple_batches(spark):
    """q_stream_dedup_exact must genuinely fold state incrementally:
    the throttled replay (maxFilesPerTrigger=2 over 8 files) has to
    commit several micro-batches, and the folded state must equal the
    one-shot batch aggregation row-for-row."""
    import glob
    import re

    from pyspark.sql import functions as F

    out = _q("q_stream_dedup_exact")(spark, SF_DIR)
    batch_out = _q("q_dedup_exact")(spark, SF_DIR)
    a = out.orderBy("text_hash").toPandas()
    b = batch_out.orderBy("text_hash").toPandas()
    assert a[["text_hash", "canonical_doc_id"]].equals(b[["text_hash", "canonical_doc_id"]])
    assert (a["dup_cnt"].astype("int64") == b["dup_cnt"].astype("int64")).all()
    # the checkpoint records one offset file per committed micro-batch —
    # several must exist, or the "incremental" claim is vacuous
    from tests.conftest import replay_batch_ids

    batch_ids = replay_batch_ids("stream_dedup")
    assert len(batch_ids) >= 3, f"expected a multi-batch replay, saw {sorted(batch_ids)}"


def test_semdedup_subset_of_corpus_wide_pairs(spark):
    """SemDeDup prunes the pair space to within-cluster: its pairs must
    be a subset of the O(n^2) corpus-wide q_embed_dup pairs at the same
    threshold (the cell restriction can only REMOVE pairs, never score
    one differently), and the planted dup pairs it does keep must carry
    identical cosines."""
    sem = _q("q_semdedup")(spark, SF_DIR).toPandas()
    full = _q("q_embed_dup")(spark, SF_DIR).toPandas()
    key = lambda df: set(map(tuple, df[["vec_a", "vec_b"]].values.tolist()))
    assert key(sem) <= key(full)
    assert len(sem) > 0, "testdata is expected to contain semantic dups"
    merged = sem.merge(full, on=["vec_a", "vec_b"], suffixes=("_s", "_f"))
    assert (merged["cosine_s"] == merged["cosine_f"]).all()


def test_repetition_signals_bounded(spark):
    """Repetition fractions are probabilities; entropy is bounded by
    log2(n_words)."""
    import numpy as np

    rep = _q("q_repetition")(spark, SF_DIR).toPandas()
    for col in ("dup_word_frac", "top_bigram_frac", "dup_trigram_frac"):
        assert rep[col].between(0.0, 1.0).all(), col
    ent = _q("q_entropy")(spark, SF_DIR).toPandas()
    joined = rep.merge(ent, on="doc_id")
    assert len(joined) == len(rep)
    assert (joined["word_entropy"] >= 0).all()
    assert (
        # +1e-6: the query rounds entropy to 6 decimals, which can tip
        # an exactly-uniform doc (entropy == log2(n)) over the bound
        joined["word_entropy"] <= np.log2(joined["n_words"]) + 1e-6
    ).all()


def test_bigram_lm_and_pmi_semantics(spark):
    """Bigram-LM scores are negative log-probs over a doc's bigram
    population (inner-join: sub-2-word docs absent); PMI collocations
    respect the min-count guard and the reported pmi reproduces from
    the reported counts and corpus totals."""
    import numpy as np

    lm = _q("q_bigram_lm")(spark, SF_DIR).toPandas()
    assert len(lm) > 0
    assert (lm["avg_logprob"] < 0).all()  # probabilities < 1
    assert (lm["n_bigrams"] >= 1).all()

    pmi = _q("q_pmi_collocations")(spark, SF_DIR).toPandas()
    from timer_pulsar_spark.operators.textops import PMI_MIN_COUNT, PMI_TOP

    assert 0 < len(pmi) <= PMI_TOP
    assert (pmi["c_bg"] >= PMI_MIN_COUNT).all()
    # ranked descending on the rounded pmi
    assert (np.diff(pmi["pmi"].values) <= 1e-9).all()


def test_dedup_near_auto_switches_strategy(spark, monkeypatch):
    """Below the threshold the auto query IS the postings path; above
    it, the banded-MinHash path — and both return the same pair set on
    the fixture (the parity that makes them interchangeable)."""
    import timer_pulsar_spark.operators.dedup as dedup

    small = _q("q_dedup_near_auto")(spark, SF_DIR).toPandas()
    base = _q("q_dedup_near")(spark, SF_DIR).toPandas()
    key = lambda df: sorted(map(tuple, df[["doc_a", "doc_b"]].values.tolist()))
    assert key(small) == key(base)

    monkeypatch.setattr(dedup, "NEAR_DUP_AUTO_THRESHOLD", 1)
    big = dedup.q_dedup_near_auto(spark, SF_DIR).toPandas()
    mh = _q("q_dedup_minhash")(spark, SF_DIR).toPandas()
    assert key(big) == key(mh) == key(base)


def test_dedup_incremental_three_verdicts(spark, tmp_path):
    """Planted split corpus: an incoming copy of an existing text is
    exact_dup (and near, jaccard 1 — exact takes precedence), a
    one-token variant of an existing 50-token text is near_dup
    (3-gram jaccard 45/51 ~ 0.88), and an unrelated doc is new."""
    import hashlib

    from timer_pulsar_spark.operators.dedup import (
        INCR_EXISTING_PCT,
        q_dedup_incremental,
    )

    def bucket(i: int) -> int:
        return int(hashlib.md5(str(i).encode()).hexdigest()[:6], 16) % 100

    ex_ids = [i for i in range(1000) if bucket(i) < INCR_EXISTING_PCT]
    inc_ids = [i for i in range(1000) if bucket(i) >= INCR_EXISTING_PCT]
    base = " ".join(f"w{i}" for i in range(50))
    variant = " ".join(f"w{i}" for i in range(49)) + " CHANGED"
    alien = " ".join(f"z{i}" for i in range(50))
    rows = [
        (ex_ids[0], base, "en", "src0", len(base)),
        (ex_ids[1], "other existing text entirely", "en", "src0", 28),
        (inc_ids[0], base, "en", "src1", len(base)),       # exact copy
        (inc_ids[1], variant, "en", "src1", len(variant)), # near variant
        (inc_ids[2], alien, "en", "src1", len(alien)),     # brand new
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
        "n_chars int"
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")

    out = {
        r.doc_id: r
        for r in q_dedup_incremental(spark, str(tmp_path)).collect()
    }
    assert set(out) == {inc_ids[0], inc_ids[1], inc_ids[2]}
    copy, near, new = out[inc_ids[0]], out[inc_ids[1]], out[inc_ids[2]]
    assert copy.verdict == "exact_dup" and copy.n_exact == 1
    assert copy.n_near == 1  # jaccard 1 counts as near too
    assert near.verdict == "near_dup" and near.n_exact == 0
    assert near.n_near == 1
    assert new.verdict == "new" and new.n_exact == 0 and new.n_near == 0


def test_dedup_incremental_auto_switches_to_banded_arm(spark, monkeypatch):
    """VERDICT r07 item 3: the ingest gate mirrors q_dedup_near_auto —
    postings index below the threshold, banded MinHash index above it.
    With the threshold forced down the banded arm must run and (on
    this fixture, where the 16x4 s-curve catches 0.8-similar pairs
    with P ~ 0.9998) reproduce the exact arm's verdicts."""
    import timer_pulsar_spark.operators.dedup as dedup

    base = {
        r.doc_id: (r.n_exact, r.n_near, r.verdict)
        for r in dedup.q_dedup_incremental(spark, SF_DIR).collect()
    }

    # below the threshold the auto arm IS the postings arm
    auto = {
        r.doc_id: (r.n_exact, r.n_near, r.verdict)
        for r in dedup.dedup_incremental_auto(spark, SF_DIR).collect()
    }
    assert auto == base

    monkeypatch.setattr(dedup, "NEAR_DUP_AUTO_THRESHOLD", 1)
    banded = {
        r.doc_id: (r.n_exact, r.n_near, r.verdict)
        for r in dedup.dedup_incremental_auto(spark, SF_DIR).collect()
    }
    assert banded == base


def test_dedup_incremental_check_contract_both_arms(spark, monkeypatch):
    """The check must verify the switch law and hold its contract on
    BOTH arms: below the threshold (arms identical, recall 1.0) and
    with the banded arm forced on."""
    import timer_pulsar_spark.operators.dedup as dedup

    row = dedup.q_dedup_incremental_check(spark, SF_DIR).collect()[0]
    assert not row.switched
    assert row.exact_tier_identical and row.sound and row.recall_ok
    assert row.n_ref_near > 0  # the fixture corpus has planted dups

    monkeypatch.setattr(dedup, "NEAR_DUP_AUTO_THRESHOLD", 1)
    row = dedup.q_dedup_incremental_check(spark, SF_DIR).collect()[0]
    assert row.switched
    assert row.exact_tier_identical and row.sound and row.recall_ok
    assert row.n_ref_near > 0


def test_dedup_incremental_df_cap_parity_when_cap_binds(spark, tmp_path):
    """ADVICE r07: the oracle must mirror the existing-side df cap, so
    Spark/oracle parity is definitional rather than a coincidence of
    testdata never holding a hot shingle. Plant a corpus where ONE
    shingle's existing-side df exceeds SHINGLE_DF_CAP: its postings are
    dropped by BOTH engines (the incoming copy of that text still reads
    exact_dup through the uncapped hash dim, but n_near = 0 — uncapped
    it would equal the hot group's size), while a cold-shingle near
    pair is still found."""
    import hashlib

    import duckdb

    import timer_pulsar_spark.operators.dedup as dedup

    def bucket(i: int) -> int:
        return int(hashlib.md5(str(i).encode()).hexdigest()[:6], 16) % 100

    ex_ids = [i for i in range(2000) if bucket(i) < dedup.INCR_EXISTING_PCT]
    inc_ids = [i for i in range(2000) if bucket(i) >= dedup.INCR_EXISTING_PCT]
    n_hot = dedup.SHINGLE_DF_CAP + 100  # 1100 existing copies of one text
    assert len(ex_ids) >= n_hot + 1
    hot = "common hot gram"  # 3 tokens -> exactly one (hot) shingle
    base = " ".join(f"w{i}" for i in range(50))
    variant = " ".join(f"w{i}" for i in range(49)) + " CHANGED"
    rows = [(ex_ids[k], hot) for k in range(n_hot)]
    rows.append((ex_ids[n_hot], base))
    rows.append((inc_ids[0], hot))      # exact copy of the hot text
    rows.append((inc_ids[1], variant))  # near pair via cold shingles
    pq = f"{tmp_path}/documents.parquet"
    spark.createDataFrame(rows, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(pq)

    got = {
        r.doc_id: r for r in dedup.q_dedup_incremental(spark, str(tmp_path)).collect()
    }
    copy, near = got[inc_ids[0]], got[inc_ids[1]]
    # hash dim is uncapped: the exact tier still sees every copy
    assert copy.verdict == "exact_dup" and copy.n_exact == n_hot
    # the ONLY shared shingle is over the cap: near tier must drop it
    assert copy.n_near == 0
    assert near.verdict == "near_dup" and near.n_near == 1

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{pq}/*.parquet')"
    )
    want = con.execute(dedup.ORACLES["q_dedup_incremental"]).df()
    con.close()
    w = {
        int(r.doc_id): r for _, r in want.iterrows()
    }
    assert set(w) == set(got)
    for did in got:
        assert int(w[did].n_exact) == got[did].n_exact, did
        assert int(w[did].n_near) == got[did].n_near, did
        assert w[did].verdict == got[did].verdict, did


def test_banded_arm_sound_when_df_cap_binds(spark, tmp_path, monkeypatch):
    """ADVICE r08 (medium): q_dedup_incremental_check pins sound=true,
    but pre-fix the banded arm verified exact Jaccard on UNCAPPED
    shingle sets while the postings reference df-caps hot shingles —
    on a corpus where the cap binds, a banded hit through a hot-only
    overlap legitimately exceeded the capped reference and the
    always-on check failed on valid data. The verify now subtracts the
    same over-cap set, so soundness is structural: plant the binding
    corpus, force the switch, and the contract must hold — and the
    hot-only incoming copy must score n_near=0 on BOTH arms."""
    import hashlib

    import timer_pulsar_spark.operators.dedup as dedup

    def bucket(i: int) -> int:
        return int(hashlib.md5(str(i).encode()).hexdigest()[:6], 16) % 100

    ex_ids = [i for i in range(2000) if bucket(i) < dedup.INCR_EXISTING_PCT]
    inc_ids = [i for i in range(2000) if bucket(i) >= dedup.INCR_EXISTING_PCT]
    n_hot = dedup.SHINGLE_DF_CAP + 100
    hot = "common hot gram"  # 3 tokens -> exactly one (hot) shingle
    base = " ".join(f"w{i}" for i in range(50))
    variant = " ".join(f"w{i}" for i in range(49)) + " CHANGED"
    rows = [(ex_ids[k], hot) for k in range(n_hot)]
    rows.append((ex_ids[n_hot], base))
    rows.append((inc_ids[0], hot))      # hot-only overlap with existing
    rows.append((inc_ids[1], variant))  # near pair via cold shingles
    spark.createDataFrame(rows, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(f"{tmp_path}/documents.parquet")

    monkeypatch.setattr(dedup, "NEAR_DUP_AUTO_THRESHOLD", 1)
    row = dedup.q_dedup_incremental_check(spark, str(tmp_path)).collect()[0]
    assert row.switched
    assert row.sound  # pre-fix: banded found the hot pair, ref did not
    assert row.exact_tier_identical and row.recall_ok

    existing, incoming = dedup._incr_split(spark, str(tmp_path))
    banded = {
        r.doc_id: r.n_near
        for r in dedup._incr_near_banded(existing, incoming).collect()
    }
    # band buckets collide on the identical hot text, but the capped
    # verify scores the pair 0/… — no hit, matching the reference
    assert inc_ids[0] not in banded
    assert banded.get(inc_ids[1], 0) >= 1  # cold-shingle pair survives


def test_kmv_fold_retry_after_crash_window(spark, tmp_path):
    """ADVICE r07: a batch redelivered AFTER its state_<id> dir was
    written but BEFORE the checkpoint committed must not read the dir
    it is overwriting (pre-fix: the fold read latest_state() — its own
    crashed attempt's dir — and Spark raised 'Cannot overwrite a path
    that is also being read from', wedging the stream on that batch).
    The fold now reads the strictly-older predecessor, so the retry
    recomputes identical content from the same inputs."""
    from timer_pulsar_spark.operators.analytics import (
        kmv_fold_batch,
        kmv_latest_state,
    )

    docs = spark.createDataFrame(
        [(i, f"text number {i}", "A" if i % 2 else "B") for i in range(200)],
        "doc_id long, text string, source string",
    )
    work = str(tmp_path)

    def state(v: int):
        rows = spark.read.parquet(f"{work}/state_{v}").collect()
        return sorted((r.source, tuple(r.sk)) for r in rows)

    kmv_fold_batch(spark, work, docs.filter("doc_id < 100"), 0)
    kmv_fold_batch(spark, work, docs.filter("doc_id >= 100"), 1)
    committed = state(1)

    # crash window: state_1 is on disk, the checkpoint never committed,
    # the stream redelivers batch 1 — the retry must succeed and leave
    # the identical folded state
    kmv_fold_batch(spark, work, docs.filter("doc_id >= 100"), 1)
    assert state(1) == committed
    assert kmv_latest_state(work).endswith("state_1")
    # and the predecessor lookup really excludes the batch's own dir
    assert kmv_latest_state(work, before=1).endswith("state_0")
    assert kmv_latest_state(work, before=0) is None


def test_source_overlap_estimator_tracks_exact(spark, tmp_path):
    """Planted overlap: sources A and B hold 200 distinct texts each
    and share 100 (jaccard 1/3); C is disjoint. With n=200 > k=64 the
    bottom-k sketch genuinely estimates (at sf0.01 every source fits
    inside one sketch, so this is the only place the estimator is
    exercised): the estimate must be deterministic and land within the
    ~4-sigma KMV band of the exact value, and disjoint pairs must read
    exactly zero in both columns."""
    from timer_pulsar_spark.operators.analytics import (
        OVERLAP_K,
        q_source_overlap,
    )

    docs = []
    did = 0
    for i in range(300):  # 0-99 shared, 100-199 A-only, 200-299 B-only
        text = f"shared text number {i} " + " ".join(
            f"tok{i}x{j}" for j in range(5)
        )
        srcs = (
            ["A", "B"] if i < 100 else (["A"] if i < 200 else ["B"])
        )
        for s in srcs:
            docs.append((did, text, "en", s, len(text)))
            did += 1
    for i in range(50):
        docs.append((did, f"c only text {i}", "en", "C", 14))
        did += 1
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, "
        "n_chars int"
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")

    rows = {
        (r.src_a, r.src_b): r
        for r in q_source_overlap(spark, str(tmp_path)).collect()
    }
    ab = rows[("A", "B")]
    assert (ab.n_a, ab.n_b, ab.inter) == (200, 200, 100)
    assert abs(ab.jaccard_exact - 1 / 3) < 1e-6
    j = 1 / 3
    sigma = (j * (1 - j) / OVERLAP_K) ** 0.5
    assert abs(ab.jaccard_est - j) <= 4 * sigma
    assert rows[("A", "C")].jaccard_est == 0.0
    assert rows[("A", "C")].jaccard_exact == 0.0
    # determinism: the sketch is hash-ordered, not sampled
    again = {
        (r.src_a, r.src_b): r.jaccard_est
        for r in q_source_overlap(spark, str(tmp_path)).collect()
    }
    assert again[("A", "B")] == ab.jaccard_est


def test_zipf_fit_recovers_planted_power_law(spark, tmp_path):
    """A corpus planted with freq(rank i) = round(2000/i) must fit
    slope ~ -1 with near-perfect R2, while the repo's synthetic
    testdata (31 near-uniform tokens) reads slope -0.18 / R2 0.06 —
    the degenerate-corpus flag the operator exists to raise."""
    from timer_pulsar_spark.operators.textops import q_zipf_fit

    toks = []
    for i in range(1, 101):
        toks += [f"w{i:03d}"] * round(2000 / i)
    docs = [
        (j, " ".join(toks[j * 200 : (j + 1) * 200]), "en", "src0", 999)
        for j in range((len(toks) + 199) // 200)
    ]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, "
        "n_chars int"
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")

    row = q_zipf_fit(spark, str(tmp_path)).collect()[0]
    assert row.n_terms == 100
    assert -1.05 <= row.slope <= -0.95
    assert row.r2 > 0.99


def test_embed_prune_respects_per_cell_budget(spark):
    """Every cell prunes EXACTLY ceil(0.1 * cell_n) vectors (the
    guaranteed budget), they are that cell's weakest by (cosine,
    vec_id), and pruned sets from two runs are identical."""
    import math

    from timer_pulsar_spark.operators.similarity import (
        PRUNE_FRAC,
        q_centroid_assign,
        q_embed_prune,
    )

    pruned = q_embed_prune(spark, SF_DIR).collect()
    by_cell: dict[int, list] = {}
    for r in pruned:
        by_cell.setdefault(r.cell_id, []).append(r)
    full = q_centroid_assign(spark, SF_DIR).collect()
    cells: dict[int, list] = {}
    for r in full:
        cells.setdefault(r.cell_id, []).append(r)
    assert set(by_cell) <= set(cells)
    for cid, members in cells.items():
        budget = math.ceil(len(members) * PRUNE_FRAC)
        got = by_cell.get(cid, [])
        assert len(got) == budget
        weakest = sorted(members, key=lambda r: (r.cosine, r.vec_id))[
            :budget
        ]
        assert sorted(r.vec_id for r in got) == sorted(
            r.vec_id for r in weakest
        )


def test_stream_sketch_fold_equals_batch_sketch(spark, tmp_path):
    """Mergeability, end to end: folding per-batch bottom-k sketches
    across a multi-batch replay must land on EXACTLY the one-shot
    batch sketch — on a corpus big enough (n > k per source) that the
    fold genuinely discards and re-merges values every batch."""
    from timer_pulsar_spark.operators.analytics import (
        q_source_overlap,
        q_stream_source_overlap,
    )

    docs = []
    did = 0
    for i in range(300):
        text = f"shared body {i} " + " ".join(f"t{i}x{j}" for j in range(4))
        for s in ["A", "B"] if i < 100 else (["A"] if i < 200 else ["B"]):
            docs.append((did, text, "en", s, len(text)))
            did += 1
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, "
        "n_chars int"
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")

    streamed = {
        (r.src_a, r.src_b): r.jaccard_est
        for r in q_stream_source_overlap(spark, str(tmp_path)).collect()
    }
    batch = {
        (r.src_a, r.src_b): r.jaccard_est
        for r in q_source_overlap(spark, str(tmp_path)).collect()
    }
    assert streamed == batch and ("A", "B") in streamed
    assert 0 < streamed[("A", "B")] < 1


def test_dup_profile_consistent_with_exact_dedup(spark):
    """Cross-operator consistency: any document that q_dedup_exact
    groups with at least one other copy (dup_cnt >= 2) must profile at
    dup_frac == 1.0 when it is long enough to contain a span — its
    every 8-token span occurs in >= 2 docs by construction. And no
    dup_frac may leave [0, 1]."""
    from timer_pulsar_spark.operators.dedup import (
        SPAN_TOKENS,
        q_dedup_exact,
        q_dup_profile,
    )

    prof = {r.doc_id: r for r in q_dup_profile(spark, SF_DIR).collect()}
    assert all(0.0 <= r.dup_frac <= 1.0 for r in prof.values())
    groups = q_dedup_exact(spark, SF_DIR).collect()
    from timer_pulsar_spark.catalog import load_table
    from pyspark.sql import functions as F

    d = load_table(spark, SF_DIR, "documents")
    dup_hashes = {g.text_hash for g in groups if g.dup_cnt >= 2}
    dup_docs = [
        (r.doc_id, r.n)
        for r in d.select(
            "doc_id",
            F.md5("text").alias("h"),
            F.size(F.split("text", " ")).alias("n"),
        ).collect()
        if r.h in dup_hashes
    ]
    for doc_id, n in dup_docs:
        if n >= SPAN_TOKENS:
            assert prof[doc_id].dup_frac == 1.0, doc_id


def test_dup_profile_planted_full_and_partial(spark, tmp_path):
    """Planted: two identical 20-token docs profile at dup_frac 1.0;
    a doc sharing only its first 10 tokens with them covers exactly
    positions 0..9 (the 3 spans starting at 0,1,2 union to 10 tokens
    of its 20 -> 0.5); an unrelated doc profiles at 0."""
    from timer_pulsar_spark.operators.dedup import q_dup_profile

    shared = " ".join(f"s{i}" for i in range(10))
    tail_a = " ".join(f"a{i}" for i in range(10))
    tail_c = " ".join(f"c{i}" for i in range(10))
    rows = [
        (1, f"{shared} {tail_a}", "en", "src0", 1),
        (2, f"{shared} {tail_a}", "en", "src1", 1),  # exact copy of 1
        (3, f"{shared} {tail_c}", "en", "src2", 1),  # shares first 10
        (4, " ".join(f"z{i}" for i in range(20)), "en", "src3", 1),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
        "n_chars int"
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    prof = {
        r.doc_id: r for r in q_dup_profile(spark, str(tmp_path)).collect()
    }
    assert prof[1].dup_frac == 1.0 and prof[2].dup_frac == 1.0
    assert prof[1].dup_heavy and prof[2].dup_heavy
    assert prof[3].covered_tokens == 10 and prof[3].dup_frac == 0.5
    assert prof[4].dup_frac == 0.0 and not prof[4].dup_heavy
