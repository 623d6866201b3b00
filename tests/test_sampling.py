"""Curation-operator invariants beyond the oracle gate: determinism,
mass conservation, and the physical-plan shapes that make the stage
100 TB-safe (no shuffle for the samplers, broadcast for the benchmark
side of the contamination join)."""

from __future__ import annotations

from pyspark.sql import functions as F

from timer_pulsar_spark.catalog import load_table
from timer_pulsar_spark.operators import sampling as smp

from .conftest import SF_DIR


def test_sample_is_deterministic_subset_of_train(spark):
    """The 10% sample re-derives identically, and every sampled doc is
    a train-split doc (bucket < 10 < 90) — the nesting property that
    lets a small-sample experiment extrapolate to the full split."""
    ids1 = {r.doc_id for r in smp.q_sample_hash(spark, SF_DIR).collect()}
    ids2 = {r.doc_id for r in smp.q_sample_hash(spark, SF_DIR).collect()}
    assert ids1 == ids2 and ids1
    d = load_table(spark, SF_DIR, "documents")
    train = {
        r.doc_id
        for r in d.filter(smp.hash_bucket(F.col("doc_id")) < smp.SPLIT_TRAIN)
        .select("doc_id")
        .collect()
    }
    assert ids1 <= train


def test_split_partitions_whole_corpus(spark):
    """train+val+test counts and char mass must equal the corpus —
    no doc dropped or double-assigned."""
    d = load_table(spark, SF_DIR, "documents")
    total = d.agg(
        F.count(F.lit(1)).alias("n"), F.sum("n_chars").alias("c")
    ).collect()[0]
    rows = smp.q_split_assign(spark, SF_DIR).collect()
    assert {r.split for r in rows} <= {"train", "val", "test"}
    assert sum(r.n_docs for r in rows) == total.n
    assert sum(r.total_chars for r in rows) == total.c


def test_mix_keeps_full_rate_lang_complete(spark):
    """A 100% mixture rate must keep every document of that language."""
    d = load_table(spark, SF_DIR, "documents")
    full = [lang for lang, pct in smp.MIX_RATES.items() if pct == 100]
    mixed = {r.lang: r.n_docs for r in smp.q_mix_sources(spark, SF_DIR).collect()}
    exact = {
        r.lang: r.n
        for r in d.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    for lang in full:
        assert mixed.get(lang) == exact.get(lang), lang


def test_pack_conserves_tokens_and_orders_bins(spark):
    """Packing must conserve the token mass per language and emit
    contiguous bin ids from 0."""
    d = load_table(spark, SF_DIR, "documents")
    exact = {
        r.lang: r.t
        for r in d.groupBy("lang")
        .agg(F.sum(F.size(F.split("text", " "))).alias("t"))
        .collect()
    }
    by_lang: dict[str, list] = {}
    for r in smp.q_pack_sequences(spark, SF_DIR).collect():
        by_lang.setdefault(r.lang, []).append(r)
    assert set(by_lang) == set(exact)
    for lang, rows in by_lang.items():
        assert sum(r.bin_tokens for r in rows) == exact[lang]
        bins = [r.bin for r in rows]
        assert bins == list(range(len(bins))), lang


def test_shards_are_contiguous_permutation(spark):
    """Every doc lands in exactly one shard; positions are 1..n per
    shard with no gaps (a writer can stream them out directly)."""
    rows = smp.q_shuffle_shards(spark, SF_DIR).collect()
    d = load_table(spark, SF_DIR, "documents")
    assert len(rows) == d.count()
    assert len({r.doc_id for r in rows}) == len(rows)
    by_shard: dict[int, list] = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r.pos)
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(1, len(poss) + 1)), shard


def test_sampler_plans_have_no_shuffle(spark):
    """q_sample_hash / the mix filter are scan+filter: no hash exchange
    anywhere (the trailing orderBy is a range exchange for output
    determinism only, irrelevant at scale where the sink re-sorts)."""
    plan = (
        smp.q_sample_hash(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange hashpartitioning" not in plan


def test_contamination_broadcasts_benchmark_side(spark):
    """The benchmark n-gram set must broadcast — a shuffle join here
    would shuffle the full corpus's exploded n-grams at 100 TB."""
    df = smp.q_contamination(spark, SF_DIR)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def _write_documents(spark, path, rows):
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
        "n_chars int"
    ).write.mode("overwrite").parquet(f"{path}/documents.parquet")


def test_dsir_ranks_target_like_docs_first(spark, tmp_path):
    """Planted corpus: the target slice speaks 'alpha beta gamma';
    raw docs 1-2 share that vocabulary, raw docs 3-4 speak a disjoint
    one. DSIR must weight the target-like raw docs strictly higher and
    select them first — the Xie et al. resampling contract."""
    tgt_text = "alpha beta gamma alpha beta"
    _write_documents(
        spark, str(tmp_path),
        [
            (100, tgt_text, "en", "src0", len(tgt_text)),
            (101, "beta gamma alpha gamma", "en", "src0", 22),
            (1, "alpha beta gamma beta", "en", "src1", 21),
            (2, "gamma alpha beta alpha", "en", "src2", 22),
            (3, "zeta eta theta iota", "en", "src1", 19),
            (4, "iota theta eta zeta", "en", "src2", 19),
        ],
    )
    w = {
        r.doc_id: r.llr
        for r in smp.q_dsir_weights(spark, str(tmp_path)).collect()
    }
    assert set(w) == {1, 2, 3, 4}  # target slice is never scored
    assert min(w[1], w[2]) > max(w[3], w[4])
    assert w[1] > 0 > w[3]  # target-like above the prior, alien below
    sel = [
        r.doc_id
        for r in smp.q_dsir_sample(spark, str(tmp_path)).collect()
    ]
    assert set(sel[:2]) == {1, 2}


def test_dsir_ratio_model_broadcasts(spark):
    """The B-row log-ratio table must broadcast back onto the gram
    stream — a shuffle join there keys the full exploded corpus by
    bucket (256 values!) at 100 TB. Also pin the two-corpus-pass
    shape: the windowed totals keep the model subtree single-scan."""
    df = smp.q_dsir_weights(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert plan.count("Scan parquet") == 2


def test_pack_bfd_exact_bins_and_determinism(spark, tmp_path):
    """Planted packing instance with a known BFD solution
    (budget 512): sizes [400, 300, 212, 112, 100] pack as
    {400+112}, {300+212}, {100} — best-fit-decreasing puts 212 with
    300 (not with 400, where first-fit would leave 112 homeless) —
    plus an oversize 600-token doc in its own singleton bin. Re-run
    must emit identical rows."""
    from timer_pulsar_spark.operators.sampling import q_pack_bfd

    sizes = [400, 300, 212, 112, 100, 600]
    rows = [
        (i, " ".join(f"w{i}x{j}" for j in range(sz)), "en", "src0", 1)
        for i, sz in enumerate(sizes)
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
        "n_chars int"
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")

    got = [
        (r.bin_rank, r.n_docs, r.bin_tokens)
        for r in q_pack_bfd(spark, str(tmp_path)).collect()
    ]
    assert got == [(1, 1, 600), (2, 2, 512), (3, 2, 512), (4, 1, 100)]
    again = [
        (r.bin_rank, r.n_docs, r.bin_tokens)
        for r in q_pack_bfd(spark, str(tmp_path)).collect()
    ]
    assert again == got
