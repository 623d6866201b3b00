"""Deterministic sampling / splitting / mixing / packing for training-
data curation — the corpus-assembly stage between raw documents and a
tokenized training set.

Every operator here is keyed on a **content-stable hash bucket**
(md5 of the document key, first hex chars parsed as an integer), not
on `rand()`: the same document lands in the same sample / split /
shard on every run, on any engine, at any parallelism. That property
is what makes 100 TB curation reproducible — re-running a stage after
adding data never reshuffles the previously assigned documents, and
an external auditor can recompute membership from the key alone.

Scale notes:
- hash-sample / split / mix are scan + map + filter: no shuffle at
  all, perfectly parallel, and the filter is cheap enough to ride
  along any existing scan of the corpus.
- contamination joins the corpus's n-grams against the *benchmark*
  n-gram set — benchmarks are small by construction (eval sets, not
  corpora), so the build side broadcasts and the corpus is scanned
  exactly once, never self-joined.
- packing and shard interleave use one window each, partitioned by a
  bounded key (lang / shard id), so no partition exceeds the corpus
  share of one language / one shard; at 100 TB you'd sub-key by
  (lang, date) the same way q_sessionize notes salting.

Reference parity: the reference engine has no corpus stage (it is a
timer service); these operators cover the driver's training-data
north star alongside operators/dedup.py and operators/textops.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load_table
from .dedup import spread, with_shingles
from ..streaming.state import replay_workdir

# Parsing 6 hex chars (24 bits) keeps the value exact in both engines'
# 64-bit integers; 100 buckets ~ percentage semantics.
_HEX_CHARS = 6
_BUCKETS = 100

SAMPLE_PCT = 10          # q_sample_hash keep-rate
SPLIT_TRAIN, SPLIT_VAL = 90, 95  # <90 train, <95 val, else test
# per-language mixing rates (percent kept), the "data mixture" knob
MIX_RATES = {"en": 100, "de": 50, "fr": 50, "es": 50, "zh": 25}
BENCH_PCT = 5            # q_contamination: hash share held out as "benchmark"
CONTAM_MIN_SHARED = 2    # flag docs sharing >= this many 3-grams with it
PACK_BUDGET = 512        # q_pack_sequences: tokens per packed sequence
N_SHARDS = 8             # q_shuffle_shards fan-out


def hash_bucket(key: Column) -> Column:
    """Stable bucket in [0, 100) from md5 of the key's string form.

    Unlike Spark's murmur3 `F.hash`, md5-hex is bit-identical across
    engines (DuckDB, pandas, a Go service…), which is what lets an
    oracle — or a downstream consumer — recompute sample membership.
    """
    hexpart = F.substring(F.md5(key.cast("string")), 1, _HEX_CHARS)
    return (F.conv(hexpart, 16, 10).cast("long") % _BUCKETS).alias("bucket")


def _bucket_sql(key_sql: str) -> str:
    """DuckDB twin of hash_bucket (same md5 prefix, same modulus)."""
    return (
        f"(('0x' || substr(md5(CAST({key_sql} AS VARCHAR)), 1, {_HEX_CHARS}))"
        f"::BIGINT % {_BUCKETS})"
    )


def q_sample_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[curation: deterministic sample] keep a fixed hash share of the
    corpus (10%). Pure scan+filter — zero shuffle, and the predicate
    rides the parquet scan, so sampling 100 TB costs one pass."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.filter(hash_bucket(F.col("doc_id")) < SAMPLE_PCT)
        .select("doc_id", "source", "lang", "n_chars")
        .orderBy("doc_id")
    )


def q_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[curation: train/val/test split] assign every document to a
    split by hash bucket (90/5/5) and report per-split counts and
    char mass. Documents never migrate between splits as the corpus
    grows — the property that prevents eval contamination over time."""
    d = load_table(spark, sf_dir, "documents")
    b = hash_bucket(F.col("doc_id"))
    split = (
        F.when(b < SPLIT_TRAIN, "train").when(b < SPLIT_VAL, "val").otherwise("test")
    )
    return (
        d.select(split.alias("split"), "n_chars")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
        .orderBy("split")
    )


def q_split_leakproof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[curation: contamination-safe split] train/val/test assignment
    keyed by NEAR-DUP CLUSTER, not document: q_split_assign's per-doc
    hash leaks eval data whenever two near-duplicates hash to
    different splits (a training doc is then a paraphrase of a test
    doc — the contamination that inflates benchmarks). Here every doc
    carries its connected-component label from the near-dup pair
    graph (q_dup_clusters; singletons key by their own id), and the
    90/5/5 hash split is taken on that key — A~B and B~C land
    together even though A~C was never tested, because the component
    is the unit, not the pair.

    Scale shape: the cluster frame is proportional to the CLUSTERED
    subset (tiny in a real corpus), so the join back to documents
    broadcasts; everything upstream is q_dedup_near + O(diameter)
    label-propagation rounds, both already bounded (SCALE.md). Same
    md5 bucket as every sampling op — bit-stable across engines, so
    membership is recomputable by any downstream consumer."""
    from .dedup import q_dup_clusters

    clusters = q_dup_clusters(spark, sf_dir).select("doc_id", "cluster_id")
    d = load_table(spark, sf_dir, "documents").select("doc_id")
    keyed = d.join(clusters, "doc_id", "left").select(
        "doc_id",
        F.coalesce("cluster_id", F.col("doc_id")).alias("split_key"),
    )
    b = hash_bucket(F.col("split_key"))
    split = (
        F.when(b < SPLIT_TRAIN, "train")
        .when(b < SPLIT_VAL, "val")
        .otherwise("test")
    )
    return keyed.select(
        "doc_id", "split_key", split.alias("split")
    ).orderBy("doc_id")


def q_mix_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[curation: weighted mixture] downsample each language at its
    mixture rate (en 100%, de/fr/es 50%, zh 25%) in one pass. The rate
    lookup is a CASE expression, not a join — the mixture table is
    config, not data. Reports the post-mix per-language census."""
    d = load_table(spark, sf_dir, "documents")
    rate = F.lit(0)
    for lang, pct in MIX_RATES.items():
        rate = F.when(F.col("lang") == lang, pct).otherwise(rate)
    kept = d.filter(hash_bucket(F.col("doc_id")) < rate)
    return (
        kept.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
        .orderBy("lang")
    )


def q_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[curation: benchmark contamination] flag corpus documents whose
    3-gram shingles overlap a held-out "benchmark" set (the hash-lowest
    5% of docs stands in for an eval suite). The benchmark n-gram set
    is exploded, deduped, and **broadcast** — real benchmarks are tiny
    next to a 100 TB corpus, so the corpus is scanned once and never
    self-joined. Reports each contaminated doc with how many distinct
    benchmark n-grams and benchmark docs it touches."""
    d = load_table(spark, sf_dir, "documents")
    is_bench = hash_bucket(F.col("doc_id")) < BENCH_PCT
    shingled = with_shingles(spread(d, spark).select("doc_id", "text"), n=3)

    bench = (
        shingled.filter(is_bench)
        .select(
            F.col("doc_id").alias("bench_doc"),
            F.explode("shingles").alias("sh"),
        )
        .distinct()
    )
    corpus = shingled.filter(~is_bench).select(
        "doc_id", F.explode("shingles").alias("sh")
    )
    return (
        corpus.join(F.broadcast(bench), "sh")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("sh").alias("shared_ngrams"),
            F.countDistinct("bench_doc").alias("n_bench_docs"),
        )
        .filter(F.col("shared_ngrams") >= CONTAM_MIN_SHARED)
        .orderBy("doc_id")
    )


def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[curation: sequence packing] greedily pack documents into
    fixed-token-budget training sequences (512 whitespace tokens),
    per language in doc_id order: a doc starts in the bin where its
    running-total start offset falls. One window per language — the
    partition key is bounded (5 langs here; at 100 TB sub-key by
    (lang, shard) to cap partition width). Emits bin-level occupancy,
    the packing-efficiency report."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.size(F.split(F.col("text"), " "))
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    packed = d.select("doc_id", "lang", toks.alias("n_tokens")).withColumn(
        "bin",
        F.floor((F.sum("n_tokens").over(w) - F.col("n_tokens")) / PACK_BUDGET),
    )
    return (
        packed.groupBy("lang", "bin")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("bin_tokens"),
        )
        .orderBy("lang", "bin")
    )


def q_pack_bfd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[curation: hard-budget packing] best-fit-decreasing bin packing
    of documents into PACK_BUDGET-token training sequences, per
    language. q_pack_sequences' windowed greedy packer is one pass and
    pure SQL but lets a document span its bin boundary (bins can run
    over budget — fine when the trainer splits documents); this packer
    enforces the HARD budget a no-document-splitting loader needs:
    sort docs by token count descending, place each into the fullest
    bin that still fits (bisect on the sorted remaining-capacity
    list, O(n log n)), open a new bin otherwise; docs longer than the
    budget get a singleton oversize bin. BFD waste is provably within
    11/9·OPT+1 bins (classic bin-packing bound), far below naive
    arrival-order packing.

    Bin loads are a pure function of the capacity MULTISET, so the
    emitted per-bin occupancy is deterministic; bins are ranked by
    (bin_tokens desc, n_docs desc) for a stable output identity.

    Scale shape: one applyInPandas keyed by lang (bounded groups here;
    at 100 TB sub-key by (lang, shard) — the budget is ~10⁻⁶ of a
    shard's token mass, so per-shard BFD loses nothing measurable).
    The kernel ships (doc_id, n_tokens) pairs only, never text."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.size(F.split(F.col("text"), " "))
    slim = d.select("lang", "doc_id", toks.alias("n_tokens"))

    def pack(pdf):
        import bisect

        import pandas as pd

        pdf = pdf.sort_values(
            ["n_tokens", "doc_id"], ascending=[False, True]
        )
        # caps stays sorted; order[i] is the bin index owning caps[i]
        caps: list[int] = []
        bins_tokens: list[int] = []
        bins_docs: list[int] = []
        order: list[int] = []  # bin index for each caps slot
        for nt in pdf["n_tokens"]:
            nt = int(nt)
            # smallest remaining capacity >= nt (best fit)
            i = bisect.bisect_left(caps, nt)
            if i < len(caps):
                cap, bi = caps.pop(i), order.pop(i)
                newcap = cap - nt
                j = bisect.bisect_left(caps, newcap)
                caps.insert(j, newcap)
                order.insert(j, bi)
                bins_tokens[bi] += nt
                bins_docs[bi] += 1
            else:
                bi = len(bins_tokens)
                bins_tokens.append(nt)
                bins_docs.append(1)
                newcap = max(PACK_BUDGET - nt, 0)
                j = bisect.bisect_left(caps, newcap)
                caps.insert(j, newcap)
                order.insert(j, bi)
        lang = pdf["lang"].iloc[0]
        out = pd.DataFrame(
            {"bin_tokens": bins_tokens, "n_docs": bins_docs}
        ).sort_values(
            ["bin_tokens", "n_docs"], ascending=[False, False]
        )
        out["lang"] = lang
        out["bin_rank"] = range(1, len(out) + 1)
        return out[["lang", "bin_rank", "n_docs", "bin_tokens"]]

    return (
        slim.groupBy("lang")
        .applyInPandas(
            pack, "lang string, bin_rank int, n_docs long, bin_tokens long"
        )
        .orderBy("lang", "bin_rank")
    )


def q_pack_bfd_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORACLE-checked contract of the hard-budget packer: every
    multi-doc bin respects the budget (only oversize singletons may
    exceed it), token mass is conserved, and the bin count is
    NEAR-OPTIMAL — within the classic 11/9·OPT + 1-per-group BFD
    bound, where the optimum is lower-bounded by the greedy
    boundary-spanning packer's ⌈token mass / budget⌉ bins (greedy
    SPLITS documents, so it sits at the information-theoretic floor a
    no-split packer can approach but never beat; at sf0.01 BFD pays
    exactly one extra bin over that floor)."""
    bfd = q_pack_bfd(spark, sf_dir)
    agg = bfd.agg(
        F.sum(
            F.when(
                (F.col("bin_tokens") > PACK_BUDGET) & (F.col("n_docs") > 1),
                1,
            ).otherwise(0)
        ).alias("over_budget_multi"),
        F.count(F.lit(1)).alias("bfd_bins"),
        F.sum("bin_tokens").alias("bfd_tokens"),
    ).collect()[0]
    d = load_table(spark, sf_dir, "documents")
    toks = F.size(F.split(F.col("text"), " "))
    corpus = d.agg(
        F.sum(toks).alias("t"), F.countDistinct("lang").alias("n_langs")
    ).collect()[0]
    floor_bins = q_pack_sequences(spark, sf_dir).count()
    bound = (11.0 / 9.0) * floor_bins + corpus.n_langs
    return spark.createDataFrame(
        [
            (
                bool(agg.over_budget_multi == 0),
                bool(agg.bfd_tokens == corpus.t),
                bool(agg.bfd_bins <= bound),
            )
        ],
        "budget_ok boolean, conserve_ok boolean, near_optimal boolean",
    )


def q_pack_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[curation: concat-and-chunk packing] the third packing flavor —
    the one GPT-style loaders actually materialize: concatenate the
    documents of a shard in deterministic order and cut the token
    stream into chunks of EXACTLY PACK_BUDGET tokens (the last chunk
    of a shard may run short), letting documents continue across chunk
    boundaries. q_pack_sequences bins whole docs (bins may overflow);
    q_pack_bfd enforces the hard budget by reordering; this one keeps
    order and splits docs — zero padding, zero overflow, the shape a
    next-token-prediction loader consumes.

    Emitted per chunk: how many documents touch it (n_docs — crossing
    docs count in every chunk they span), how many START inside it
    (n_doc_starts — the boundary-token count an attention-masking
    loader needs), and its exact token length.

    Scale shape: one running-total window per shard key (lang here —
    bounded partitions; at 100 TB sub-key by (lang, shard) exactly as
    q_pack_sequences documents), then each doc explodes into the
    chunk RANGE it touches — ~n_tokens/PACK_BUDGET + 1 rows per doc,
    i.e. the output volume of the loader itself — and one hash agg by
    (shard, chunk). The per-shard token totals are a broadcast dim."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.size(F.split(F.col("text"), " "))
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    b = F.lit(PACK_BUDGET).cast("long")
    spans = (
        d.select("doc_id", "lang", toks.cast("long").alias("n_tokens"))
        .withColumn("end_off", F.sum("n_tokens").over(w))
        .withColumn("start_off", F.col("end_off") - F.col("n_tokens"))
    )
    touched = spans.select(
        "lang",
        "start_off",
        F.explode(
            F.sequence(
                F.floor(F.col("start_off") / b),
                F.floor((F.col("end_off") - 1) / b),
            )
        ).alias("chunk_id"),
    )
    totals = spans.groupBy("lang").agg(F.max("end_off").alias("total"))
    return (
        touched.groupBy("lang", "chunk_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(
                (F.floor(F.col("start_off") / b) == F.col("chunk_id")).cast(
                    "long"
                )
            ).alias("n_doc_starts"),
        )
        .join(F.broadcast(totals), "lang")
        .select(
            "lang",
            "chunk_id",
            "n_docs",
            "n_doc_starts",
            F.least(b, F.col("total") - F.col("chunk_id") * b).alias(
                "chunk_tokens"
            ),
        )
        .orderBy("lang", "chunk_id")
    )


CURRICULUM_PHASES = 4
TOKEN_BUDGET_PER_LANG = 2_000


def q_curriculum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[curation: curriculum ordering] assign every document a training
    PHASE by quality quantile within its language — the
    easy-to-hard schedule curriculum pipelines feed the loader.
    The quality signal is the distinct-token ratio (lexical diversity,
    one of the Gopher gate signals — deterministic, engine-portable);
    phases are ntile(CURRICULUM_PHASES) ordered by (score, doc_id), so
    phase 1 holds the most repetitive quartile and phase 4 the most
    diverse. Emitted per (lang, phase): doc count, token mass, and the
    score range — the mixture card a curriculum scheduler consumes.

    Scale shape: one window per lang (bounded partitions; sub-key by
    (lang, shard) at 100 TB exactly as q_pack_sequences — ntile within
    a shard preserves the schedule up to shard-local quantiles), then
    one hash aggregate."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    score = F.round(
        F.size(F.array_distinct(toks)) / F.size(toks), 6
    )
    w = Window.partitionBy("lang").orderBy("score", "doc_id")
    return (
        d.select(
            "doc_id",
            "lang",
            F.size(toks).cast("long").alias("n_tokens"),
            score.alias("score"),
        )
        .withColumn("phase", F.ntile(CURRICULUM_PHASES).over(w))
        .groupBy("lang", "phase")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("tokens"),
            F.round(F.min("score"), 6).alias("score_min"),
            F.round(F.max("score"), 6).alias("score_max"),
        )
        .orderBy("lang", "phase")
    )


def q_token_budget_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[curation: token-budget sampling] select documents until an
    exact per-language TOKEN budget is filled — the "give me N tokens
    of X" request every ablation run makes, where doc-count sampling
    (q_sample_hash) over- or under-shoots because document lengths
    vary. Selection order is the content-stable md5(doc_id) key (the
    q_shuffle_shards idiom — deterministic, engine-recomputable,
    uncorrelated with length or quality), and a document is kept while
    the running token total is within budget; the first over-budget
    doc and everything after it are dropped, so the selected mass is
    the largest prefix <= TOKEN_BUDGET_PER_LANG.

    Scale shape: one cumulative-sum window per lang over (order_key)
    — same bounded-partition note as q_pack_sequences; the output is
    the selected docs only, so downstream joins see budget-bounded
    rows at any corpus size."""
    d = load_table(spark, sf_dir, "documents")
    okey = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 12), 16, 10
    ).cast("long")
    w = (
        Window.partitionBy("lang")
        .orderBy("order_key", "doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        d.select(
            "doc_id",
            "lang",
            F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
            okey.alias("order_key"),
        )
        .withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .filter(F.col("cum_tokens") <= TOKEN_BUDGET_PER_LANG)
        .select("lang", "doc_id", "n_tokens", "cum_tokens")
        .orderBy("lang", "cum_tokens")
    )


PACK_SHARDS = 4  # (lang, shard) sub-key fan-out for the windowed ops
TOKEN_BUCKET_SHIFT = 36  # 48-bit order key >> 36 -> 4096 coarse buckets


def _order_key() -> Column:
    """Content-stable selection/order key: first 12 hex chars of
    md5(doc_id) as a 48-bit long — deterministic, engine-recomputable
    (the q_shuffle_shards idiom)."""
    return F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 12), 16, 10
    ).cast("long")


def q_pack_concat_sharded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[curation: SHARD-LOCAL concat-and-chunk packing] q_pack_concat
    with the (lang, shard) sub-keying its docstring only promised
    (VERDICT r08 #2): the running-total window partitions by
    (lang, shard) and chunks NEVER cross shards — which is the
    semantics real loaders have anyway (each loader worker owns whole
    shards and concatenates within them; a chunk spanning two shards
    would couple two workers). Shard assignment is the content-stable
    md5 order key mod PACK_SHARDS, so both engines recompute it.

    Why this is the 100 TB form: a per-lang window puts an entire
    language through ONE sort partition — tens of TB for `en` — and
    window partitions cannot be AQE-skew-split. Sub-keying bounds
    every sort partition at corpus/(langs x PACK_SHARDS) and the bound
    scales out by raising PACK_SHARDS; the only cross-shard artifact
    is one short tail chunk per (lang, shard) instead of per lang."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.size(F.split(F.col("text"), " "))
    shard = F.pmod(_order_key(), F.lit(PACK_SHARDS)).cast("int")
    w = (
        Window.partitionBy("lang", "shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    b = F.lit(PACK_BUDGET).cast("long")
    spans = (
        d.select(
            "doc_id",
            "lang",
            toks.cast("long").alias("n_tokens"),
            shard.alias("shard"),
        )
        .withColumn("end_off", F.sum("n_tokens").over(w))
        .withColumn("start_off", F.col("end_off") - F.col("n_tokens"))
    )
    touched = spans.select(
        "lang",
        "shard",
        "start_off",
        F.explode(
            F.sequence(
                F.floor(F.col("start_off") / b),
                F.floor((F.col("end_off") - 1) / b),
            )
        ).alias("chunk_id"),
    )
    totals = spans.groupBy("lang", "shard").agg(
        F.max("end_off").alias("total")
    )
    return (
        touched.groupBy("lang", "shard", "chunk_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(
                (F.floor(F.col("start_off") / b) == F.col("chunk_id")).cast(
                    "long"
                )
            ).alias("n_doc_starts"),
        )
        .join(F.broadcast(totals), ["lang", "shard"])
        .select(
            "lang",
            "shard",
            "chunk_id",
            "n_docs",
            "n_doc_starts",
            F.least(b, F.col("total") - F.col("chunk_id") * b).alias(
                "chunk_tokens"
            ),
        )
        .orderBy("lang", "shard", "chunk_id")
    )


def q_curriculum_sharded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[curation: SHARD-LOCAL curriculum phases] q_curriculum with the
    promised (lang, shard) sub-keying coded (VERDICT r08 #2): ntile
    runs within (lang, shard) — shard-local quantiles, the exact
    trade q_curriculum's docstring described — so no sort partition
    ever holds more than corpus/(langs x PACK_SHARDS) rows. The card
    still aggregates per (lang, phase): with the content-stable hash
    shard, shard-local quartiles are an unbiased estimate of the
    global ones, and the phase populations stay balanced by ntile's
    construction."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    score = F.round(F.size(F.array_distinct(toks)) / F.size(toks), 6)
    shard = F.pmod(_order_key(), F.lit(PACK_SHARDS)).cast("int")
    w = Window.partitionBy("lang", "shard").orderBy("score", "doc_id")
    return (
        d.select(
            "doc_id",
            "lang",
            F.size(toks).cast("long").alias("n_tokens"),
            score.alias("score"),
            shard.alias("shard"),
        )
        .withColumn("phase", F.ntile(CURRICULUM_PHASES).over(w))
        .groupBy("lang", "phase")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("tokens"),
            F.round(F.min("score"), 6).alias("score_min"),
            F.round(F.max("score"), 6).alias("score_max"),
        )
        .orderBy("lang", "phase")
    )


def q_token_budget_sample_2pass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[curation: token-budget sampling, two-pass 100 TB form] the
    SAME selected set as q_token_budget_sample (identical output, same
    oracle) without ever sorting a whole language in one window
    partition (VERDICT r08 #2). Pass 1: per-(lang, bucket) token
    totals — bucket is the top 12 bits of the 48-bit order key, so the
    cumulative-bucket window runs over <= 4096 ROWS per lang whatever
    the corpus size, and yields each bucket's global running-total
    BASE. Pass 2: buckets whose base already exceeds the budget are
    dropped in the (broadcast, map-side) join; surviving docs flow
    through a window partitioned by (lang, bucket) — every sort
    partition is ~corpus/4096 per lang — where base + within-bucket
    cumsum is the EXACT global running total, so the kept set is the
    identical maximal prefix.

    Scale shape: one map-side-combined hash agg, one window over a
    <=4096-rows-per-lang frame, one broadcast join, one bounded-
    partition window. Nothing sorts more than corpus/4096 rows in one
    task; the budget cut is applied map-side for all but the boundary
    bucket."""
    d = load_table(spark, sf_dir, "documents")
    keyed = d.select(
        "doc_id",
        "lang",
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
        _order_key().alias("order_key"),
    ).withColumn("bucket", F.shiftright("order_key", TOKEN_BUCKET_SHIFT))
    btot = keyed.groupBy("lang", "bucket").agg(
        F.sum("n_tokens").alias("btok")
    )
    wb = (
        Window.partitionBy("lang")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    live = (
        btot.withColumn("base", F.sum("btok").over(wb) - F.col("btok"))
        .filter(F.col("base") <= F.lit(TOKEN_BUDGET_PER_LANG))
        .select("lang", "bucket", "base")
    )
    wd = (
        Window.partitionBy("lang", "bucket")
        .orderBy("order_key", "doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        keyed.join(F.broadcast(live), ["lang", "bucket"])
        .withColumn(
            "cum_tokens", F.col("base") + F.sum("n_tokens").over(wd)
        )
        .filter(F.col("cum_tokens") <= TOKEN_BUDGET_PER_LANG)
        .select("lang", "doc_id", "n_tokens", "cum_tokens")
        .orderBy("lang", "cum_tokens")
    )


LENGTH_BUCKET_WIDTH = 64


def q_length_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[curation: batch bucketing card] histogram of documents by
    token-length bucket (width LENGTH_BUCKET_WIDTH) with the
    PADDING-WASTE estimate per bucket — the number a length-bucketed
    batching loader uses to pick its bucket grid: waste = what padding
    every doc to its bucket ceiling costs, as a fraction of the padded
    mass. Pure map + one hash aggregate (map-side combined), no
    window, no sort — the plan survives any corpus size unchanged."""
    d = load_table(spark, sf_dir, "documents")
    n = F.size(F.split("text", " ")).cast("long")
    b = F.lit(LENGTH_BUCKET_WIDTH).cast("long")
    ceiling = (F.floor((F.col("n_tokens") - 1) / b) + 1) * b
    return (
        d.select(n.alias("n_tokens"))
        .withColumn("bucket_max", ceiling)
        .groupBy("bucket_max")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("tokens"),
        )
        .withColumn(
            "pad_frac",
            F.round(
                (F.col("bucket_max") * F.col("n_docs") - F.col("tokens"))
                / (F.col("bucket_max") * F.col("n_docs")),
                6,
            ),
        )
        .orderBy("bucket_max")
    )


def q_shuffle_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[curation: deterministic global shuffle + sharding] assign each
    document a shard (hash mod 8) and a position within the shard
    (ordered by a longer hash prefix) — the reproducible analog of
    "shuffle the corpus and split into N training shards". Writing
    would be `.repartition('shard').sortWithinPartitions('pos')`;
    the window here is per-shard, so parallelism = shard count."""
    d = load_table(spark, sf_dir, "documents")
    # 12 hex chars = 48 bits: exact in a long, collision-free ordering
    # for any realistic corpus
    order_key = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 12), 16, 10
    ).cast("long")
    w = Window.partitionBy("shard").orderBy("order_key", "doc_id")
    return (
        d.select(
            "doc_id",
            (hash_bucket(F.col("doc_id")) % N_SHARDS).alias("shard"),
            order_key.alias("order_key"),
        )
        .withColumn("pos", F.row_number().over(w))
        .select("doc_id", "shard", "pos")
        .orderBy("shard", "pos")
    )


DOMAIN_CAP = 10          # q_domain_cap: max docs kept per source/domain
STRATUM_N = 30           # q_sample_stratified: docs per language stratum


def q_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[curation: per-domain cap] keep at most DOMAIN_CAP documents per
    source domain, preferring the longest (n_chars DESC, doc_id
    tiebreak) — the domain-balance guard that stops one crawler host
    from dominating a training mixture.

    The rank-filter pattern compiles to Spark's WindowGroupLimit: each
    input partition keeps only its local top-N per source BEFORE the
    shuffle (asserted by a plan gate), so a 100 TB corpus ships at most
    N rows per (source, input-partition) — the hot-domain skew that
    would otherwise melt one reducer is capped at the map side."""
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(F.col("n_chars").desc(), "doc_id")
    return (
        d.select("doc_id", "source", "n_chars")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= DOMAIN_CAP)
        .orderBy("source", "rk")
    )


def q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[curation: stratified fixed-size sample] exactly min(N, |stratum|)
    documents per language, chosen by content-stable md5 order — the
    "equal representation" counterpart of q_mix_sources's rate-based
    mixture (rates keep a fixed FRACTION; this keeps a fixed COUNT, the
    shape used for eval sets and per-language probes). Deterministic:
    membership is recomputable from the doc key alone, and adding new
    documents can only displace hash-later ones, never reshuffle the
    ordering. Same WindowGroupLimit map-side cap as q_domain_cap."""
    d = load_table(spark, sf_dir, "documents")
    order_key = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 12), 16, 10
    ).cast("long")
    w = Window.partitionBy("lang").orderBy("order_key", "doc_id")
    return (
        d.select("doc_id", "lang", order_key.alias("order_key"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= STRATUM_N)
        .select("doc_id", "lang", "rk")
        .orderBy("lang", "rk")
    )


_B = _bucket_sql("doc_id")

WEIGHTED_N = 50


def q_sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[curation: weighted sample without replacement] top-N documents
    by the Efraimidis-Spirakis exponential key — each doc's inclusion
    probability is proportional to its weight (n_chars here), chosen in
    ONE distributed pass: score = ln(u)/w with u a content-stable
    md5-uniform in (0,1], then global top-N by score (equivalent to
    ranking u^(1/w), the published A-ES key, under the monotone ln).
    This is how you draw a length-weighted corpus probe at 100 TB
    without rand(): membership is recomputable from the key alone and
    stable under corpus growth. TakeOrdered top-N — no global sort.

    The score is rounded to 9 decimals BEFORE ranking with a doc_id
    tie-break, so a sub-ulp libm difference between engines cannot
    flip the rank-N boundary."""
    d = load_table(spark, sf_dir, "documents")
    v = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 12), 16, 10).cast(
        "long"
    )
    u = (v + F.lit(1)) / F.lit(float(1 << 48))
    score = F.round(F.log(u) / F.col("n_chars"), 9)
    return (
        d.select("doc_id", "lang", "n_chars", score.alias("es_score"))
        .orderBy(F.col("es_score").desc(), "doc_id")
        .limit(WEIGHTED_N)
    )


def q_pretrain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[curation: full prep composition] the whole raw-documents →
    training-mixture prep as ONE declarative plan — the composition a
    user actually runs, stitched from the audited stage operators:

        quality gate (≥50 tokens, ≥0.2 distinct ratio)
          → exact-dedup canonical filter (min doc_id per md5(text))
          → per-domain cap (top-DOMAIN_CAP per source by length)
          → language mixture (content-stable hash rates per lang)

    Because it is one plan, Catalyst fuses the gate into the scan,
    the dedup dim aggregates to (hash, min_id) and broadcasts for the
    semi-join, the domain cap compiles to the map-side
    WindowGroupLimit, and the mixture filter is a pure map — the only
    corpus-wide shuffles are the dedup groupBy and the per-source
    window, both on bounded-cardinality keys. Nothing materializes
    between stages: at 100 TB that is the difference between one pass
    over the corpus and four.

    Fully deterministic (every stage is hash- or rank-based, no
    rand()) → the exact four-stage DuckDB oracle."""
    from .textops import _toks

    d = load_table(spark, sf_dir, "documents")
    toks = _toks()
    n = F.size(toks)
    n_distinct = F.size(F.array_distinct(toks))
    gated = d.filter((n >= 50) & (n_distinct / n >= 0.2))
    canon = gated.groupBy(F.md5("text").alias("h")).agg(
        F.min("doc_id").alias("doc_id")
    )
    surv = gated.join(canon, "doc_id", "left_semi")
    w = Window.partitionBy("source").orderBy(F.col("n_chars").desc(), "doc_id")
    capped = (
        surv.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= DOMAIN_CAP)
    )
    rate = F.lit(0)
    for lang, pct in MIX_RATES.items():
        rate = F.when(F.col("lang") == lang, pct).otherwise(rate)
    return capped.filter(hash_bucket(F.col("doc_id")) < rate).select(
        "doc_id", "lang", "source", F.size(_toks()).alias("n_tokens")
    )


# DSIR (Xie et al., NeurIPS 2023 "Data Selection for Language Models
# via Importance Resampling"): score raw documents by how much more
# likely their hashed n-gram features are under a target-domain bag-of-
# grams model than under the raw-pool model. 8 hex chars = 32 bits,
# exact in both engines' 64-bit ints.
DSIR_BUCKETS = 256
DSIR_HEX = 8
DSIR_TARGET_SOURCE = "src0"  # the "curated domain sample" stand-in
DSIR_N = 200                 # q_dsir_sample selection size


def _gram_rows(d: DataFrame) -> DataFrame:
    """(doc_id, source, bucket) rows: every unigram and word-bigram of
    text, md5-hashed into DSIR_BUCKETS feature buckets. Same guarded
    sequence idiom as textops._bigram_rows (sequence(1,0) DESCENDS in
    Spark, so 1-word docs must short-circuit to no bigrams)."""
    grams_expr = (
        "concat(ws, CASE WHEN size(ws) < 2 THEN array()::array<string>"
        " ELSE transform(sequence(1, size(ws) - 1),"
        " i -> concat(element_at(ws, i), ' ', element_at(ws, i + 1))) END)"
    )
    return (
        d.select("doc_id", "source", F.split(F.col("text"), " ").alias("ws"))
        .select("doc_id", "source", F.explode(F.expr(grams_expr)).alias("g"))
        .select(
            "doc_id",
            "source",
            (
                F.conv(F.substring(F.md5("g"), 1, DSIR_HEX), 16, 10).cast(
                    "long"
                )
                % DSIR_BUCKETS
            ).alias("bucket"),
        )
    )


def dsir_ratio_model(d: DataFrame) -> DataFrame:
    """The ≤ DSIR_BUCKETS-row log-ratio table: per feature bucket,
    ln p_target(b) − ln p_raw(b) with add-one smoothing. ONE hash
    aggregate keyed by bucket — map-side combined to ≤ B rows per task
    at any corpus size; model totals fold in as an unpartitioned window
    over the B-row model frame (single small task), NOT a separate
    scalar agg joined back: a scalar-agg subtree is not reused by
    Catalyst, so it would re-scan the corpus."""
    g = _gram_rows(d)
    is_t = F.col("source") == DSIR_TARGET_SOURCE
    model = g.groupBy("bucket").agg(
        F.sum(F.when(is_t, 1).otherwise(0)).alias("c_tgt"),
        F.sum(F.when(is_t, 0).otherwise(1)).alias("c_raw"),
    )
    w_all = Window.partitionBy(F.lit(1))
    B = F.lit(float(DSIR_BUCKETS))
    return model.select(
        "bucket",
        (
            F.log(
                (F.col("c_tgt") + 1.0) / (F.sum("c_tgt").over(w_all) + B)
            )
            - F.log(
                (F.col("c_raw") + 1.0) / (F.sum("c_raw").over(w_all) + B)
            )
        ).alias("lr"),
    )


def _dsir_score(docs: DataFrame, ratio: DataFrame) -> DataFrame:
    """Score the raw-pool docs of a frame against a (bucket, lr) model:
    broadcast the B-row table onto the exploded gram stream (no
    shuffle), then one linear pre-combined per-doc sum."""
    g = _gram_rows(docs).filter(F.col("source") != DSIR_TARGET_SOURCE)
    return (
        g.join(F.broadcast(ratio), "bucket")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.round(F.sum("lr"), 6).alias("llr"),
            F.round(F.sum("lr") / F.count(F.lit(1)), 6).alias("llr_per_gram"),
        )
    )


def q_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[curation: DSIR importance weights] per-document log-likelihood
    ratio between a target-domain hashed-n-gram model and the raw-pool
    model (Xie et al. 2023): docs whose gram distribution looks like
    the target domain score high and get selected for pretraining.
    Target = the DSIR_TARGET_SOURCE slice; raw = every other source.
    Add-one smoothing over DSIR_BUCKETS buckets on both models.

    Scale shape: dsir_ratio_model's single bounded-key aggregate +
    _dsir_score's broadcast-join-and-fold — two corpus passes total
    (model + scoring), the same linear shape as q_unigram_lm."""
    # spread before the two per-gram md5 passes (r12, guide §2): the
    # single-file scan is ONE partition, which single-threaded both the
    # model aggregate's and the scorer's gram explosion — measured
    # 2.6 -> 1.2 s at sf0.1; guarded no-op on a many-split lake
    from .dedup import spread

    d = spread(load_table(spark, sf_dir, "documents"), spark)
    return _dsir_score(d, dsir_ratio_model(d)).orderBy("doc_id")


def q_dsir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[curation: DSIR selection] the resampling step: keep the DSIR_N
    raw documents whose hashed-n-gram profile is most target-like
    (highest llr, doc_id tiebreak — deterministic, so re-runs and the
    oracle select the identical set). Compiles to a TakeOrdered top-k
    over q_dsir_weights' output: no extra corpus pass, no global sort
    materialization."""
    return (
        q_dsir_weights(spark, sf_dir)
        .orderBy(F.col("llr").desc(), "doc_id")
        .limit(DSIR_N)
    )


def q_stream_dsir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[curation: DSIR at ingest] the streaming twin of q_dsir_weights,
    ORACLE-checked: the log-ratio model is fit OFFLINE once (its ≤ 256
    rows are the only state collected — the DSIR analog of a trained
    classifier checkpoint), then the corpus replays as a multi-batch
    file stream and every arriving shard is scored statelessly against
    the frozen broadcast model. Scoring is per-document, so the union
    over any batch split equals the one-shot batch weights — which is
    how targeted selection actually deploys at 100 TB: new data is
    scored as it lands, at O(shard) per shard, and the model is only
    refit on a schedule, never per ingest."""
    import os

    work = replay_workdir("stream_dsir")
    in_dir = os.path.join(work, "docs")
    out = os.path.join(work, "scored")
    ckpt = os.path.join(work, "ckpt")

    d = load_table(spark, sf_dir, "documents")
    d.repartition(8).write.mode("overwrite").parquet(in_dir)
    # freeze the model: materialize the B-row table once — re-using the
    # lazy frame inside foreachBatch would re-run the two model
    # aggregates against the static table on EVERY micro-batch
    ratio = spark.createDataFrame(dsir_ratio_model(d).collect())

    def score(batch_df: DataFrame, batch_id: int) -> None:
        _dsir_score(batch_df, ratio).write.mode("append").parquet(out)

    from ..streaming import await_or_raise, replay_state_partitions

    with replay_state_partitions(spark):
        q = (
            spark.readStream.schema(d.schema)
            .option("maxFilesPerTrigger", "2")  # 8 files -> 4 real batches
            .parquet(in_dir)
            .writeStream.foreachBatch(score)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        try:
            await_or_raise(q, 180)
        finally:
            if q.isActive:
                q.stop()
    return spark.read.parquet(out).select(
        "doc_id", "n_grams", "llr", "llr_per_gram"
    ).orderBy("doc_id")


def _dsir_gram_bucket_sql() -> str:
    """DuckDB twin of _gram_rows (1-indexed lists; range(a,b) is
    half-open, so range(1, len(ws)) stops at the last bigram start)."""
    return f"""
        SELECT doc_id, source,
               (('0x' || substr(md5(g), 1, {DSIR_HEX}))::BIGINT
                % {DSIR_BUCKETS}) AS bucket
        FROM (
            SELECT doc_id, source,
                   unnest(string_split(text, ' ') ||
                          list_transform(range(1, len(string_split(text, ' '))),
                              i -> string_split(text, ' ')[i] || ' ' ||
                                   string_split(text, ' ')[i+1])) AS g
            FROM documents)
    """


def _dsir_weights_sql() -> str:
    return f"""
        WITH g AS ({_dsir_gram_bucket_sql()}),
        model AS (
            SELECT bucket,
                   sum(CASE WHEN source = '{DSIR_TARGET_SOURCE}'
                            THEN 1 ELSE 0 END) AS c_tgt,
                   sum(CASE WHEN source = '{DSIR_TARGET_SOURCE}'
                            THEN 0 ELSE 1 END) AS c_raw
            FROM g GROUP BY bucket
        ),
        totals AS (
            SELECT sum(c_tgt) AS t_tgt, sum(c_raw) AS t_raw FROM model
        ),
        ratio AS (
            SELECT bucket,
                   ln((c_tgt + 1.0) / (t_tgt + {DSIR_BUCKETS}.0))
                   - ln((c_raw + 1.0) / (t_raw + {DSIR_BUCKETS}.0)) AS lr
            FROM model, totals
        )
        SELECT g.doc_id,
               count(*) AS n_grams,
               round(sum(r.lr), 6) AS llr,
               round(sum(r.lr) / count(*), 6) AS llr_per_gram
        FROM g JOIN ratio r USING (bucket)
        WHERE g.source <> '{DSIR_TARGET_SOURCE}'
        GROUP BY g.doc_id
    """


ORACLES: dict[str, str] = {
    "q_dsir_weights": f"SELECT * FROM ({_dsir_weights_sql()}) ORDER BY doc_id",
    # frozen model + stateless per-doc scoring => the streamed union
    # must equal the one-shot batch weights row-for-row
    "q_stream_dsir": f"SELECT * FROM ({_dsir_weights_sql()}) ORDER BY doc_id",
    # the packer itself is a sequential kernel (rows-only); its
    # contract twin is the oracle surface
    "q_pack_bfd_check": (
        "SELECT true AS budget_ok, true AS conserve_ok,"
        " true AS near_optimal"
    ),
    "q_dsir_sample": f"""
        SELECT * FROM ({_dsir_weights_sql()})
        ORDER BY llr DESC, doc_id LIMIT {DSIR_N}
    """,
    "q_pretrain_mix": """
        WITH gated AS (
            SELECT * FROM documents
            WHERE len(string_split(text, ' ')) >= 50
              AND len(list_distinct(string_split(text, ' '))) * 1.0
                  / len(string_split(text, ' ')) >= 0.2
        ),
        canon AS (
            SELECT md5(text) AS h, min(doc_id) AS doc_id
            FROM gated GROUP BY md5(text)
        ),
        surv AS (
            SELECT g.* FROM gated g
            WHERE EXISTS (SELECT 1 FROM canon c WHERE c.doc_id = g.doc_id)
        ),
        capped AS (
            SELECT *, row_number() OVER (PARTITION BY source
                                         ORDER BY n_chars DESC, doc_id) AS rk
            FROM surv
        )
        SELECT doc_id, lang, source,
               len(string_split(text, ' ')) AS n_tokens
        FROM capped
        WHERE rk <= 10
          AND (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6))::BIGINT
               % 100) < CASE lang
              WHEN 'en' THEN 100 WHEN 'de' THEN 50
              WHEN 'fr' THEN 50 WHEN 'es' THEN 50
              WHEN 'zh' THEN 25 ELSE 0 END
    """,
    "q_sample_weighted": f"""
        SELECT doc_id, lang, n_chars,
               round(ln((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12))::BIGINT + 1)
                        / 281474976710656.0) / n_chars, 9) AS es_score
        FROM documents
        ORDER BY es_score DESC, doc_id LIMIT {WEIGHTED_N}
    """,

    "q_domain_cap": f"""
        SELECT doc_id, source, n_chars, CAST(rk AS INT) AS rk FROM (
            SELECT doc_id, source, n_chars,
                   row_number() OVER (PARTITION BY source
                                      ORDER BY n_chars DESC, doc_id) AS rk
            FROM documents)
        WHERE rk <= {DOMAIN_CAP} ORDER BY source, rk
    """,
    "q_sample_stratified": f"""
        SELECT doc_id, lang, CAST(rk AS INT) AS rk FROM (
            SELECT doc_id, lang,
                   row_number() OVER (PARTITION BY lang
                       ORDER BY ('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                                                1, 12))::BIGINT,
                                doc_id) AS rk
            FROM documents)
        WHERE rk <= {STRATUM_N} ORDER BY lang, rk
    """,
    "q_sample_hash": f"""
        SELECT doc_id, source, lang, n_chars
        FROM documents WHERE {_B} < {SAMPLE_PCT}
        ORDER BY doc_id
    """,
    "q_split_assign": f"""
        SELECT CASE WHEN {_B} < {SPLIT_TRAIN} THEN 'train'
                    WHEN {_B} < {SPLIT_VAL} THEN 'val'
                    ELSE 'test' END AS split,
               count(*) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS total_chars
        FROM documents GROUP BY split ORDER BY split
    """,
    "q_mix_sources": f"""
        SELECT lang, count(*) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS total_chars
        FROM documents
        WHERE {_B} < CASE lang
            WHEN 'en' THEN {MIX_RATES['en']} WHEN 'de' THEN {MIX_RATES['de']}
            WHEN 'fr' THEN {MIX_RATES['fr']} WHEN 'es' THEN {MIX_RATES['es']}
            WHEN 'zh' THEN {MIX_RATES['zh']} ELSE 0 END
        GROUP BY lang ORDER BY lang
    """,
    "q_contamination": f"""
        WITH shingled AS (
            SELECT doc_id, {_B} AS bucket,
                   list_distinct(list_transform(range(1, len(string_split(text, ' ')) - 1),
                       i -> string_split(text, ' ')[i] || ' ' ||
                            string_split(text, ' ')[i+1] || ' ' ||
                            string_split(text, ' ')[i+2])) AS shingles
            FROM documents
        ), bench AS (
            SELECT DISTINCT doc_id AS bench_doc, unnest(shingles) AS sh
            FROM shingled WHERE bucket < {BENCH_PCT}
        ), corpus AS (
            SELECT doc_id, unnest(shingles) AS sh
            FROM shingled WHERE bucket >= {BENCH_PCT}
        )
        SELECT doc_id,
               count(DISTINCT sh) AS shared_ngrams,
               count(DISTINCT bench_doc) AS n_bench_docs
        FROM corpus JOIN bench USING (sh)
        GROUP BY doc_id
        HAVING count(DISTINCT sh) >= {CONTAM_MIN_SHARED}
        ORDER BY doc_id
    """,
    "q_pack_sequences": f"""
        WITH packed AS (
            SELECT lang,
                   CAST(floor((sum(len(string_split(text, ' ')))
                           OVER (PARTITION BY lang ORDER BY doc_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        - len(string_split(text, ' '))) / {PACK_BUDGET}) AS BIGINT)
                       AS bin,
                   len(string_split(text, ' ')) AS n_tokens
            FROM documents
        )
        SELECT lang, bin, count(*) AS n_docs,
               CAST(sum(n_tokens) AS BIGINT) AS bin_tokens
        FROM packed GROUP BY lang, bin ORDER BY lang, bin
    """,
    "q_shuffle_shards": f"""
        WITH keyed AS (
            SELECT doc_id,
                   {_B} % {N_SHARDS} AS shard,
                   ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12))::BIGINT
                       AS order_key
            FROM documents
        )
        SELECT doc_id, shard,
               CAST(row_number() OVER (PARTITION BY shard
                                       ORDER BY order_key, doc_id) AS INT) AS pos
        FROM keyed ORDER BY shard, pos
    """,
}


def _leakproof_oracle_sql() -> str:
    # the cluster labeling is exactly q_dup_clusters' oracle, embedded
    # as a CTE (nested WITH RECURSIVE is legal DuckDB); the split CASE
    # is q_split_assign's, keyed on the cluster label
    from .dedup import ORACLES as _DEDUP_ORACLES

    kb = _bucket_sql("split_key")
    return f"""
        WITH clusters AS ({_DEDUP_ORACLES["q_dup_clusters"]}),
        keyed AS (
            SELECT d.doc_id,
                   coalesce(c.cluster_id, d.doc_id) AS split_key
            FROM documents d LEFT JOIN clusters c ON d.doc_id = c.doc_id
        )
        SELECT doc_id, split_key,
               CASE WHEN {kb} < {SPLIT_TRAIN} THEN 'train'
                    WHEN {kb} < {SPLIT_VAL} THEN 'val'
                    ELSE 'test' END AS split
        FROM keyed ORDER BY doc_id
    """


ORACLES["q_split_leakproof"] = _leakproof_oracle_sql()
ORACLES["q_length_buckets"] = f"""
    WITH t AS (
        SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        FROM documents
    ),
    g AS (
        SELECT ((n_tokens - 1) // {LENGTH_BUCKET_WIDTH} + 1)
                   * {LENGTH_BUCKET_WIDTH} AS bucket_max,
               count(*) AS n_docs,
               CAST(sum(n_tokens) AS BIGINT) AS tokens
        FROM t GROUP BY 1
    )
    SELECT bucket_max, n_docs, tokens,
           round((bucket_max * n_docs - tokens) * 1.0
                 / (bucket_max * n_docs), 6) AS pad_frac
    FROM g ORDER BY bucket_max
"""
ORACLES["q_curriculum"] = f"""
    WITH scored AS (
        SELECT doc_id, lang,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
               round(len(list_distinct(string_split(text, ' '))) * 1.0
                     / len(string_split(text, ' ')), 6) AS score
        FROM documents
    ),
    phased AS (
        SELECT *, ntile({CURRICULUM_PHASES})
                   OVER (PARTITION BY lang ORDER BY score, doc_id) AS phase
        FROM scored
    )
    SELECT lang, CAST(phase AS INT) AS phase,
           count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS tokens,
           round(min(score), 6) AS score_min,
           round(max(score), 6) AS score_max
    FROM phased GROUP BY lang, phase ORDER BY lang, phase
"""
ORACLES["q_token_budget_sample"] = f"""
    WITH keyed AS (
        SELECT doc_id, lang,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
               ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12))::BIGINT
                   AS order_key
        FROM documents
    ),
    cum AS (
        SELECT lang, doc_id, n_tokens,
               CAST(sum(n_tokens) OVER (PARTITION BY lang
                                        ORDER BY order_key, doc_id
                                        ROWS UNBOUNDED PRECEDING)
                    AS BIGINT) AS cum_tokens
        FROM keyed
    )
    SELECT lang, doc_id, n_tokens, cum_tokens
    FROM cum WHERE cum_tokens <= {TOKEN_BUDGET_PER_LANG}
    ORDER BY lang, cum_tokens
"""
ORACLES["q_pack_concat"] = f"""
    WITH spans AS (
        SELECT lang, doc_id,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
               CAST(sum(len(string_split(text, ' ')))
                    OVER (PARTITION BY lang ORDER BY doc_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS end_off
        FROM documents
    ),
    s2 AS (SELECT *, end_off - n_tokens AS start_off FROM spans),
    touched AS (
        SELECT lang, start_off, CAST(u.c AS BIGINT) AS chunk_id
        FROM s2, UNNEST(range(start_off // {PACK_BUDGET},
                              (end_off - 1) // {PACK_BUDGET} + 1)) AS u(c)
    ),
    totals AS (SELECT lang, max(end_off) AS total FROM s2 GROUP BY lang)
    SELECT t.lang, t.chunk_id,
           count(*) AS n_docs,
           CAST(sum(CASE WHEN start_off // {PACK_BUDGET} = chunk_id
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_doc_starts,
           CAST(least({PACK_BUDGET}, tot.total - chunk_id * {PACK_BUDGET})
                AS BIGINT) AS chunk_tokens
    FROM touched t JOIN totals tot USING (lang)
    GROUP BY t.lang, t.chunk_id, tot.total
    ORDER BY lang, chunk_id
"""

_SHARD_SQL = (
    "CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12))::BIGINT"
    f" % {PACK_SHARDS} AS INT)"
)
ORACLES["q_pack_concat_sharded"] = f"""
    WITH spans AS (
        SELECT lang, {_SHARD_SQL} AS shard, doc_id,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
               CAST(sum(len(string_split(text, ' ')))
                    OVER (PARTITION BY lang, {_SHARD_SQL} ORDER BY doc_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS end_off
        FROM documents
    ),
    s2 AS (SELECT *, end_off - n_tokens AS start_off FROM spans),
    touched AS (
        SELECT lang, shard, start_off, CAST(u.c AS BIGINT) AS chunk_id
        FROM s2, UNNEST(range(start_off // {PACK_BUDGET},
                              (end_off - 1) // {PACK_BUDGET} + 1)) AS u(c)
    ),
    totals AS (
        SELECT lang, shard, max(end_off) AS total FROM s2 GROUP BY 1, 2
    )
    SELECT t.lang, t.shard, t.chunk_id,
           count(*) AS n_docs,
           CAST(sum(CASE WHEN start_off // {PACK_BUDGET} = chunk_id
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_doc_starts,
           CAST(least({PACK_BUDGET}, tot.total - chunk_id * {PACK_BUDGET})
                AS BIGINT) AS chunk_tokens
    FROM touched t JOIN totals tot USING (lang, shard)
    GROUP BY t.lang, t.shard, t.chunk_id, tot.total
    ORDER BY lang, shard, chunk_id
"""
ORACLES["q_curriculum_sharded"] = f"""
    WITH scored AS (
        SELECT doc_id, lang, {_SHARD_SQL} AS shard,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
               round(len(list_distinct(string_split(text, ' '))) * 1.0
                     / len(string_split(text, ' ')), 6) AS score
        FROM documents
    ),
    phased AS (
        SELECT *, ntile({CURRICULUM_PHASES})
                   OVER (PARTITION BY lang, shard
                         ORDER BY score, doc_id) AS phase
        FROM scored
    )
    SELECT lang, CAST(phase AS INT) AS phase,
           count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS tokens,
           round(min(score), 6) AS score_min,
           round(max(score), 6) AS score_max
    FROM phased GROUP BY lang, phase ORDER BY lang, phase
"""
# the two-pass form selects the IDENTICAL maximal prefix — it shares
# the one-pass definition as its oracle verbatim
ORACLES["q_token_budget_sample_2pass"] = ORACLES["q_token_budget_sample"]

# Temperature-based language mixture (mC4 / XLM-R style): sampling
# share per language q_l ∝ mass_l^alpha with alpha = 0.5 — written as
# sqrt(), which is IEEE-correctly-rounded in BOTH engines (a pow()
# call could differ sub-ulp across libms). The budget is a fraction
# of total corpus mass; a language whose share exceeds its own mass
# cannot be downsampled past rate 1.0 — the surplus is reported as
# `epochs` (the repeat factor an upsampling data loader applies).
TEMP_MIX_BUDGET_FRAC = 0.5


def q_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[curation: temperature mixture] derive per-language sampling
    rates FROM THE CORPUS CENSUS (unlike q_mix_sources' fixed config
    rates): share_l = sqrt(mass_l) / Σ sqrt(mass), target mass =
    share_l × (0.5 × total mass), rate_l = min(1, target/mass_l) —
    the α=0.5 temperature law that upsamples low-resource languages
    relative to proportional sampling. Two corpus passes, both the
    right plan at 100 TB: a map-side-combined per-lang census (5-row
    result), then the content-stable hash gate with the 5-row rates
    frame broadcast onto the scan. Rates are rounded to 6 decimals
    BEFORE gating in BOTH engines, so a sub-ulp difference in the
    cross-language sqrt sum cannot flip a doc's membership. Output is
    the per-language card: census mass, share, rate, epochs, and the
    actually-kept doc/char counts (which verify the gate itself)."""
    d = load_table(spark, sf_dir, "documents")
    census = d.groupBy("lang").agg(
        F.sum("n_chars").cast("double").alias("mass")
    )
    tot = census.agg(
        F.sum(F.sqrt(F.col("mass"))).alias("s"),
        F.sum("mass").alias("m"),
    )
    raw = F.sqrt(F.col("mass")) / F.col("s")
    target = raw * (F.lit(TEMP_MIX_BUDGET_FRAC) * F.col("m"))
    rates = census.crossJoin(F.broadcast(tot)).select(
        "lang",
        F.col("mass").cast("long").alias("mass_chars"),
        F.round(raw, 6).alias("share"),
        F.round(F.least(F.lit(1.0), target / F.col("mass")), 6).alias(
            "rate"
        ),
        F.round(F.greatest(F.lit(1.0), target / F.col("mass")), 6).alias(
            "epochs"
        ),
    )
    kept = (
        d.join(F.broadcast(rates.select("lang", "rate")), "lang")
        .filter(hash_bucket(F.col("doc_id")) < F.col("rate") * 100)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("kept_docs"),
            F.sum("n_chars").alias("kept_chars"),
        )
    )
    return (
        rates.join(kept, "lang", "left")
        .select(
            "lang", "mass_chars", "share", "rate", "epochs",
            F.coalesce("kept_docs", F.lit(0)).alias("kept_docs"),
            F.coalesce("kept_chars", F.lit(0)).alias("kept_chars"),
        )
        .orderBy("lang")
    )


ORACLES["q_temperature_mix"] = f"""
    WITH census AS (
        SELECT lang, CAST(SUM(n_chars) AS DOUBLE) AS mass
        FROM documents GROUP BY lang
    ),
    tot AS (SELECT SUM(sqrt(mass)) AS s, SUM(mass) AS m FROM census),
    rates AS (
        SELECT lang, CAST(mass AS BIGINT) AS mass_chars,
               round(sqrt(mass) / s, 6) AS share,
               round(least(1.0, (sqrt(mass) / s)
                     * ({TEMP_MIX_BUDGET_FRAC} * m) / mass), 6) AS rate,
               round(greatest(1.0, (sqrt(mass) / s)
                     * ({TEMP_MIX_BUDGET_FRAC} * m) / mass), 6) AS epochs
        FROM census, tot
    ),
    kept AS (
        SELECT d.lang,
               count(*) AS kept_docs,
               CAST(sum(d.n_chars) AS BIGINT) AS kept_chars
        FROM documents d JOIN rates r USING (lang)
        WHERE {_bucket_sql("doc_id")} < r.rate * 100
        GROUP BY d.lang
    )
    SELECT r.lang, r.mass_chars, r.share, r.rate, r.epochs,
           CAST(COALESCE(k.kept_docs, 0) AS BIGINT) AS kept_docs,
           CAST(COALESCE(k.kept_chars, 0) AS BIGINT) AS kept_chars
    FROM rates r LEFT JOIN kept k USING (lang)
    ORDER BY r.lang
"""


QUERIES = {
    name: fn
    for name, fn in list(globals().items())
    if callable(fn) and name.startswith("q_")
}
