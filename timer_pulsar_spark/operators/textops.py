"""Text analysis over the `documents` table — quality scoring, token
counting, language-ID heuristics, and document fingerprinting for a
training-data pipeline.

Everything is built-in column expressions / JVM higher-order functions
(no Python UDFs): per-row array lambdas run inside whole-stage codegen,
so these operators stream through a 100 TB corpus with zero shuffle —
they are pure map-side projections. Each has an exact DuckDB oracle.

A production language-ID model (fastText-style) would plug in as an
Arrow-batched pandas UDF with the same output schema as q_langid; the
heuristic here keeps the operator deterministic and oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table

STOPWORDS = ("the", "a")
EN_MARKERS = ("the", "a")
FP_MOD = 1_000_000_007
FP_MULT = 131


def _toks() -> F.Column:
    return F.split(F.col("text"), " ")


def q_textstats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality stats: token count, average token length,
    stopword ratio — the length/stopword quality heuristics used to
    filter web-scale corpora."""
    d = load_table(spark, sf_dir, "documents")
    toks = _toks()
    n_tokens = F.size(toks)
    char_sum = F.aggregate(
        F.transform(toks, lambda x: F.length(x).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    stop_list = ", ".join(f"'{w}'" for w in STOPWORDS)
    stop_hits = F.expr(f"size(filter(split(text, ' '), x -> x in ({stop_list})))")
    return d.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        F.round(char_sum / n_tokens, 6).alias("avg_token_len"),
        F.round(stop_hits / n_tokens, 6).alias("stop_ratio"),
        F.length("text").alias("n_chars_calc"),
    )


def q_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting two ways: whitespace split, and a BPE-ish subword
    estimate (ceil(len/4) pieces per word — the ~4-chars-per-token rule
    of thumb for byte-pair vocabularies), plus a regex word count."""
    d = load_table(spark, sf_dir, "documents")
    toks = _toks()
    bpe = F.aggregate(
        F.transform(toks, lambda x: F.ceil(F.length(x) / 4).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return d.select(
        "doc_id",
        F.size(toks).alias("n_ws_tokens"),
        F.size(F.expr("regexp_extract_all(text, '[a-z]+', 0)")).alias("n_re_tokens"),
        bpe.alias("n_bpe_tokens"),
    )


def q_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language ID: English-marker token hits vs the labelled
    lang column. Marker-unigram scoring is the degenerate (n=1) case of
    char/word n-gram profile language ID; the output contract
    (doc_id, pred_lang, confidence-ish score) is what a model-backed
    pandas-UDF implementation would also return."""
    d = load_table(spark, sf_dir, "documents")
    marker_list = ", ".join(f"'{w}'" for w in EN_MARKERS)
    en_hits = F.expr(f"size(filter(split(text, ' '), x -> x in ({marker_list})))")
    n_tokens = F.size(_toks())
    return d.select(
        "doc_id",
        "lang",
        en_hits.alias("en_hits"),
        F.round(en_hits / n_tokens, 6).alias("en_score"),
        F.when(en_hits >= 1, F.lit("en")).otherwise(F.lit("und")).alias("pred_lang"),
    )


def q_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus quality scoring: repetition (distinct-token ratio, top
    token share), character-class ratios (alpha / punctuation), and the
    resulting keep/drop gate — the C4/Gopher-style rule set expressed as
    pure column expressions (map-side only, no shuffle at any scale).
    top_token_frac is O(distinct x tokens) per row inside codegen; for
    pathological documents cap the token list upstream."""
    d = load_table(spark, sf_dir, "documents")
    toks = _toks()
    n = F.size(toks)
    n_distinct = F.size(F.array_distinct(toks))
    top = F.expr(
        "array_max(transform(array_distinct(split(text, ' ')),"
        " u -> size(filter(split(text, ' '), x -> x = u))))"
    )
    alpha = F.length(F.regexp_replace(F.col("text"), "[^a-zA-Z]", ""))
    space = F.length(F.regexp_replace(F.col("text"), "[^ ]", ""))
    text_len = F.length("text")
    return d.select(
        "doc_id",
        F.round(n_distinct / n, 6).alias("distinct_ratio"),
        F.round(top / n, 6).alias("top_token_frac"),
        F.round(alpha / text_len, 6).alias("alpha_ratio"),
        F.round((text_len - alpha - space) / text_len, 6).alias("punct_ratio"),
        ((n >= 50) & (n_distinct / n >= 0.2)).cast("int").alias("keep"),
    )


def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprint: polynomial rolling hash over the token
    stream ((acc*131 + ascii(tok)+len(tok)) mod 1e9+7) — order-sensitive
    (unlike the dedup set hashes), so re-orderings fingerprint
    differently. Strict left fold on both engines."""
    d = load_table(spark, sf_dir, "documents")
    vals = F.transform(_toks(), lambda x: (F.ascii(x) + F.length(x)).cast("long"))
    fp = F.aggregate(
        vals,
        F.lit(0).cast("long"),
        lambda acc, x: (acc * FP_MULT + x) % FP_MOD,
    )
    return d.select("doc_id", fp.alias("fingerprint"))


def q_corpus_curate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus curation in ONE declarative plan: quality gate
    (length + repetition) -> exact-dedup canonical filter (keep the
    lowest doc_id per content hash) -> token-count enrichment. Composes
    three operators without materializing between stages, so Catalyst
    fuses the quality projections into the scan and the only shuffle is
    the dedup groupBy. The canonical-id filter is a self-aggregation
    join kept broadcastable by aggregating to (hash, min_id) first —
    at 100 TB that dim is |distinct docs| rows of 2 columns."""
    d = load_table(spark, sf_dir, "documents")
    toks = _toks()
    n = F.size(toks)
    n_distinct = F.size(F.array_distinct(toks))
    gated = d.filter((n >= 50) & (n_distinct / n >= 0.2))
    canon = gated.groupBy(F.md5("text").alias("h")).agg(
        F.min("doc_id").alias("doc_id")
    )
    return (
        gated.join(canon, "doc_id", "left_semi")
        .select(
            "doc_id",
            "lang",
            F.size(_toks()).alias("n_tokens"),
            F.length("text").alias("n_chars_calc"),
        )
    )


ORACLES: dict[str, str] = {
    "q_textstats": """
        SELECT doc_id,
               len(string_split(text, ' ')) AS n_tokens,
               round(list_sum(list_transform(string_split(text, ' '), x -> length(x))) * 1.0
                     / len(string_split(text, ' ')), 6) AS avg_token_len,
               round(len(list_filter(string_split(text, ' '), x -> x = 'the' OR x = 'a')) * 1.0
                     / len(string_split(text, ' ')), 6) AS stop_ratio,
               length(text) AS n_chars_calc
        FROM documents
    """,
    "q_tokens": """
        SELECT doc_id,
               len(string_split(text, ' ')) AS n_ws_tokens,
               len(regexp_extract_all(text, '[a-z]+')) AS n_re_tokens,
               CAST(list_sum(list_transform(string_split(text, ' '),
                    x -> ceil(length(x) / 4))) AS BIGINT) AS n_bpe_tokens
        FROM documents
    """,
    "q_langid": """
        SELECT doc_id, lang,
               len(list_filter(string_split(text, ' '), x -> x = 'the' OR x = 'a')) AS en_hits,
               round(len(list_filter(string_split(text, ' '), x -> x = 'the' OR x = 'a')) * 1.0
                     / len(string_split(text, ' ')), 6) AS en_score,
               CASE WHEN len(list_filter(string_split(text, ' '),
                                         x -> x = 'the' OR x = 'a')) >= 1
                    THEN 'en' ELSE 'und' END AS pred_lang
        FROM documents
    """,
    "q_quality": """
        SELECT doc_id,
               round(len(list_distinct(string_split(text, ' '))) * 1.0
                     / len(string_split(text, ' ')), 6) AS distinct_ratio,
               round(list_max(list_transform(list_distinct(string_split(text, ' ')),
                         u -> len(list_filter(string_split(text, ' '), x -> x = u)))) * 1.0
                     / len(string_split(text, ' ')), 6) AS top_token_frac,
               round(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) * 1.0
                     / length(text), 6) AS alpha_ratio,
               round((length(text) - length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))
                      - length(regexp_replace(text, '[^ ]', '', 'g'))) * 1.0
                     / length(text), 6) AS punct_ratio,
               CASE WHEN len(string_split(text, ' ')) >= 50
                     AND len(list_distinct(string_split(text, ' '))) * 1.0
                         / len(string_split(text, ' ')) >= 0.2
                    THEN 1 ELSE 0 END AS keep
        FROM documents
    """,
    "q_corpus_curate": """
        WITH gated AS (
            SELECT * FROM documents
            WHERE len(string_split(text, ' ')) >= 50
              AND len(list_distinct(string_split(text, ' '))) * 1.0
                  / len(string_split(text, ' ')) >= 0.2
        ),
        canon AS (
            SELECT md5(text) AS h, min(doc_id) AS doc_id FROM gated GROUP BY md5(text)
        )
        SELECT g.doc_id,
               g.lang,
               len(string_split(g.text, ' ')) AS n_tokens,
               length(g.text) AS n_chars_calc
        FROM gated g WHERE EXISTS (SELECT 1 FROM canon c WHERE c.doc_id = g.doc_id)
    """,
    "q_fingerprint": """
        SELECT doc_id,
               list_reduce(
                   list_prepend(CAST(0 AS BIGINT),
                       list_transform(string_split(text, ' '),
                                      x -> CAST(ascii(x) + length(x) AS BIGINT))),
                   (a, b) -> (a * 131 + b) % 1000000007) AS fingerprint
        FROM documents
    """,
}

QUERIES = {
    name: fn
    for name, fn in list(globals().items())
    if callable(fn) and name.startswith("q_")
}
