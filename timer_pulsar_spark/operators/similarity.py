"""Similarity search over the `embeddings` table (vec_id,
embedding: array<float>, label).

Three paths, mirroring how a production vector pipeline is layered:

- `q_ann_topk` — brute-force cosine top-k: the correctness baseline,
  all arithmetic in JVM higher-order functions (zip_with/aggregate in
  double), DuckDB-oracle-checked. The query side is a tiny broadcast
  dimension; the corpus side streams — so the plan is a broadcast
  nested-loop over corpus partitions + per-query TakeOrdered, which
  scales linearly in corpus size (never corpus x corpus).
- `q_ann_lsh` — random-hyperplane (sign) LSH: 16-bit signatures from
  fixed seeded hyperplanes, candidates restricted to same-bucket
  vectors (multi-probe via 4 bands of 4 bits), exact cosine re-rank of
  candidates. This is the 100 TB path: bucket sizes bound the join.
  Engine-independent arithmetic but the bucket restriction makes
  results recall-bounded, not exact → rows-only gate; recall vs
  brute-force is asserted in tests/test_llm_ops.py.
- `q_ann_ivf` — inverted-file (IVF) probing: nearest-centroid cell
  assignment against a broadcast 16-centroid codebook (Arrow-batched
  numpy kernel), candidates = equi-join on the query's nprobe closest
  cells, exact cosine re-rank. The coarse-quantizer layout every
  billion-vector ANN service uses.

The JVM paths use no Python UDFs; `q_ann_matmul` is the deliberate
exception — the Arrow-batched numpy-matmul twin of the brute-force
baseline (one BLAS call per batch, per-partition pre-ranked top-k),
kept oracle-identical so the two execution strategies are
interchangeable and comparable (0.61 s vs 1.04 s warm at sf0.1).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load_table
from .dedup import cosine_sim, dot_product, l2_norm
from ..streaming.state import replay_workdir

TOP_K = 5
N_QUERIES = 5  # vec_id < 5 are the query vectors

# --- deterministic hyperplanes for sign-LSH --------------------------------
# 16 hyperplanes x 64 dims from a fixed-seed LCG mapped to [-1, 1).
_DIM = 64
_N_PLANES = 16
_LSH_BANDS = 4
_BITS_PER_BAND = _N_PLANES // _LSH_BANDS


def _hyperplanes() -> list[list[float]]:
    seed = 20240813
    planes = []
    for _ in range(_N_PLANES):
        row = []
        for _ in range(_DIM):
            seed = (seed * 6364136223846793005 + 1442695040888963407) % (1 << 63)
            row.append((seed >> 11) / float(1 << 52) - 1.0)
        planes.append(row)
    return planes


_PLANES = _hyperplanes()


def q_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k for each query vector (vec_id < 5):
    broadcast the queries, score every corpus vector, keep the top 5 per
    query via row_number. Ties broken on (rounded cosine, neighbor_id)
    so ranking is engine-stable."""
    e = load_table(spark, sf_dir, "embeddings")
    # norms once per side (5 query rows + one corpus pass), not per pair
    queries = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        l2_norm(F.col("embedding")).alias("q_norm"),
    )
    corpus = e.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("c_emb"),
        l2_norm(F.col("embedding")).alias("c_norm"),
    )
    scored = (
        corpus.join(F.broadcast(queries), F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cosine",
            F.round(
                dot_product(F.col("q_emb"), F.col("c_emb"))
                / (F.col("q_norm") * F.col("c_norm")),
                6,
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_K)
        .select("query_id", "neighbor_id", "cosine", "rnk")
    )


def q_ann_matmul(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized twin of q_ann_topk: the same brute-force cosine
    top-k, but scored by an Arrow-batched numpy MATMUL kernel
    (mapInPandas) instead of JVM higher-order functions — the shape to
    reach for when profiling shows the per-element lambda dominates
    (dense linear algebra is where Python-side Arrow batches beat
    codegen: one BLAS dgemm per batch vs 64 lambda evals per pair).

    Each Arrow batch computes batch_rows x n_queries cosines in one
    matmul and emits only its LOCAL top-k per query (pre-ranked under
    the exact (rounded cosine, neighbor_id) global order), so the
    shuffle carries at most k x n_queries rows per partition — the
    global row_number then ranks ~partitions x k rows, never the
    corpus. Same oracle as q_ann_topk: results must be identical."""
    e = load_table(spark, sf_dir, "embeddings")
    qrows = e.filter(F.col("vec_id") < N_QUERIES).orderBy("vec_id").collect()
    q_ids = np.array([r["vec_id"] for r in qrows])
    q_mat = np.array([r["embedding"] for r in qrows], dtype=np.float64)
    q_norms = np.sqrt((q_mat * q_mat).sum(axis=1))

    out_schema = "query_id long, neighbor_id long, cosine double"

    def kernel(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf["vec_id"].to_numpy()
            m = np.array(list(pdf["embedding"]), dtype=np.float64)
            sims = (m @ q_mat.T) / (
                np.sqrt((m * m).sum(axis=1))[:, None] * q_norms[None, :]
            )
            sims = np.round(sims, 6)
            rows = {"query_id": [], "neighbor_id": [], "cosine": []}
            for j, qid in enumerate(q_ids):
                mask = ids != qid
                cand_ids, cand = ids[mask], sims[mask, j]
                # local pre-rank under the GLOBAL order: (-cosine, id)
                order = np.lexsort((cand_ids, -cand))[:TOP_K]
                rows["query_id"] += [qid] * len(order)
                rows["neighbor_id"] += list(cand_ids[order])
                rows["cosine"] += list(cand[order])
            yield pd.DataFrame(rows)

    local_topk = e.select("vec_id", "embedding").mapInPandas(kernel, out_schema)
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        local_topk.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_K)
        .select("query_id", "neighbor_id", "cosine", "rnk")
    )


def signature_bits(emb: Column) -> Column:
    """Sign-LSH signature: one bit per hyperplane (1 iff dot >= 0),
    packed into a long. Hyperplanes ship as literal arrays — evaluated
    entirely in whole-stage codegen."""
    demb = F.transform(emb, lambda x: x.cast("double"))
    bits = []
    for i, plane in enumerate(_PLANES):
        plane_col = F.array(*[F.lit(v) for v in plane])
        dot = F.aggregate(
            F.zip_with(demb, plane_col, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bits.append(
            F.when(dot >= 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(F.lit(0).cast("long"))
        )
    out = bits[0]
    for b in bits[1:]:
        out = out.bitwiseOR(b)
    return out


def q_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed ANN: queries and corpus get 16-bit sign signatures;
    candidates are corpus vectors sharing any 4-bit band with the query
    (multi-probe), re-ranked by exact cosine. Same output shape as
    q_ann_topk; recall measured in tests."""
    e = load_table(spark, sf_dir, "embeddings")
    sigs = e.select("vec_id", "embedding", signature_bits(F.col("embedding")).alias("sig"))

    def banded(df: DataFrame, id_alias: str, emb_alias: str) -> DataFrame:
        return df.select(
            F.col("vec_id").alias(id_alias),
            F.col("embedding").alias(emb_alias),
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(i).alias("band_id"),
                            F.shiftright(F.col("sig"), i * _BITS_PER_BAND)
                            .bitwiseAND(F.lit((1 << _BITS_PER_BAND) - 1))
                            .alias("band_val"),
                        )
                        for i in range(_LSH_BANDS)
                    ]
                )
            ).alias("b"),
        ).select(id_alias, emb_alias, "b.band_id", "b.band_val")

    queries = banded(sigs.filter(F.col("vec_id") < N_QUERIES), "query_id", "q_emb")
    corpus = banded(sigs, "neighbor_id", "c_emb")
    cand = (
        queries.join(corpus, ["band_id", "band_val"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "q_emb", "neighbor_id", "c_emb")
        .distinct()
    )
    scored = cand.withColumn("cosine", F.round(cosine_sim(F.col("q_emb"), F.col("c_emb")), 6))
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_K)
        .select("query_id", "neighbor_id", "cosine", "rnk")
    )


_N_CENTROIDS = 16
_NPROBE = 6  # cells probed per query (of 16) — recall/cost knob


def q_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN, the third layer of the similarity stack:

    1. centroids — 16 fixed corpus vectors (vec_id 5..20) stand in for
       a trained k-means codebook; like any model parameter they are
       fetched to the driver (16 rows) and shipped inside the kernel
       closure (a broadcast, NOT a data-scale collect).
    2. assignment — every corpus vector gets its nearest-centroid cell
       via one Arrow-batched pandas UDF (numpy matmul over the whole
       batch): map-side, zero shuffle, linear scan — the shape that
       survives 100 TB.
    3. probe — each query expands to its _NPROBE closest cells; the
       candidate set is an **equi-join on cell id** (shuffle bounded to
       corpus/16 x nprobe rows), then exact JVM-side cosine re-rank.

    Same output shape as q_ann_topk; recall-bounded -> rows-only gate,
    recall vs brute force asserted in tests/test_llm_ops.py."""

    e = load_table(spark, sf_dir, "embeddings")
    cents = (
        e.filter(
            (F.col("vec_id") >= N_QUERIES)
            & (F.col("vec_id") < N_QUERIES + _N_CENTROIDS)
        )
        .select("vec_id", "embedding")
        .collect()
    )
    cent_ids = np.array([r.vec_id for r in cents])
    C = np.array([r.embedding for r in cents], dtype="float64")
    Cn = (C / np.linalg.norm(C, axis=1, keepdims=True)).T  # dim x K

    def _sims(embs: pd.Series) -> np.ndarray:
        M = np.stack(embs.to_numpy()).astype("float64")
        M /= np.linalg.norm(M, axis=1, keepdims=True)
        return M @ Cn  # batch x K cosine vs every centroid

    @F.pandas_udf("long")
    def assign_cell(embs: pd.Series) -> pd.Series:
        return pd.Series(cent_ids[np.argmax(_sims(embs), axis=1)])

    @F.pandas_udf("array<long>")
    def probe_cells(embs: pd.Series) -> pd.Series:
        order = np.argsort(-_sims(embs), axis=1)[:, :_NPROBE]
        return pd.Series(list(cent_ids[order]))

    corpus = e.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("c_emb"),
        assign_cell("embedding").alias("cell"),
    )
    queries = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.explode(probe_cells("embedding")).alias("cell"),
    )
    cand = queries.join(corpus, "cell").filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    scored = cand.withColumn(
        "cosine", F.round(cosine_sim(F.col("q_emb"), F.col("c_emb")), 6)
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_K)
        .select("query_id", "neighbor_id", "cosine", "rnk")
    )


def q_centroid_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vector quantization, oracle-checked: assign EVERY corpus vector
    to its nearest of the 16 fixed centroids (the same codebook rows
    q_ann_ivf uses) with the exact cosine. Unlike q_ann_ivf's
    pandas-UDF kernel this stays JVM-side: broadcast the 16-row
    codebook, nested-loop every vector against it inside codegen, and
    keep the argmax with one row_number per vec_id — so the whole
    assignment is a map-side pass plus a shuffle of N pre-ranked rows.
    At 100 TB the broadcast side is still 16 rows; the window
    partitions by vec_id (perfectly uniform).

    This is one Lloyd half-step (the E-step of k-means); iterating
    M-steps would recompute the codebook as groupBy(cell) avg — same
    primitive, driver-side loop like q_dup_clusters."""
    e = load_table(spark, sf_dir, "embeddings").withColumn(
        "v_norm", l2_norm(F.col("embedding"))  # once per vector, not x16
    )
    cents = e.filter(
        (F.col("vec_id") >= N_QUERIES) & (F.col("vec_id") < N_QUERIES + _N_CENTROIDS)
    ).select(
        F.col("vec_id").alias("cell_id"),
        F.col("embedding").alias("cent_emb"),
        F.col("v_norm").alias("c_norm"),
    )
    scored = e.crossJoin(F.broadcast(cents)).withColumn(
        "cosine",
        F.round(
            dot_product(F.col("embedding"), F.col("cent_emb"))
            / (F.col("v_norm") * F.col("c_norm")),
            6,
        ),
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("cosine").desc(), F.col("cell_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") == 1)
        .select("vec_id", "cell_id", "cosine")
    )


PRUNE_FRAC = 0.10  # least-central share removed per cell


def q_embed_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prototypicality pruning (Sorscher et al. 2022, "Beyond neural
    scaling laws"): within every quantization cell, flag the
    PRUNE_FRAC least-central vectors — the lowest cosine to their own
    centroid — as prune candidates. Distance-to-prototype rank is the
    standard cheap data-pruning signal for embedding corpora (noise /
    mislabeled / off-manifold points sit at cell edges).

    Rank-based, not threshold-based, on purpose: a z-score cut
    compares against float moments whose last bits are engine- and
    order-dependent, while "bottom ceil(0.1·n) by (rounded cosine,
    vec_id)" selects the identical set everywhere — and gives the
    operator a guaranteed pruning budget per cell, which is what a
    100 TB curation pass actually provisions for.

    Scale shape: q_centroid_assign's broadcast-codebook map + ONE
    window keyed by cell_id (bounded cardinality, uniform cells);
    per-cell counts ride the same window frame, no second shuffle."""
    assigned = q_centroid_assign(spark, sf_dir)
    wc = Window.partitionBy("cell_id")
    wr = Window.partitionBy("cell_id").orderBy(F.col("cosine").asc(), "vec_id")
    return (
        assigned.withColumn("cell_n", F.count(F.lit(1)).over(wc))
        .withColumn("rk", F.row_number().over(wr))
        .filter(F.col("rk") <= F.ceil(F.col("cell_n") * PRUNE_FRAC))
        .select(
            "vec_id",
            "cell_id",
            "cosine",
            F.col("rk").cast("int").alias("rk"),
            "cell_n",
        )
        .orderBy("cell_id", "rk")
    )


def q_embed_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding normalization — the map-side preprocessing step every
    vector pipeline runs before cosine retrieval (unit vectors turn
    cosine into a plain dot product). Pure JVM higher-order functions,
    zero shuffle; verified through scalar projections of the unit
    vector (head component + component sum) so the oracle compare
    stays scalar-typed."""
    e = load_table(spark, sf_dir, "embeddings")
    demb = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    norm = F.sqrt(
        F.aggregate(F.transform(demb, lambda x: x * x), F.lit(0.0), lambda a, v: a + v)
    )
    total = F.aggregate(demb, F.lit(0.0), lambda a, v: a + v)
    return e.select(
        "vec_id",
        F.round(norm, 6).alias("l2_norm"),
        F.round(F.element_at(demb, 1) / norm, 6).alias("unit_head"),
        F.round(total / norm, 6).alias("unit_sum"),
    )


_KMEANS_ITERS = 3


def kmeans_train(
    spark: SparkSession, sf_dir: str, iters: int = _KMEANS_ITERS
) -> tuple[list[tuple[int, list[float]]], list[float], int]:
    """Lloyd's k-means over the embeddings table — the iterative-
    algorithm pattern (q_centroid_assign's docstring promises exactly
    this M-step loop): driver-side iteration, data-side compute.

    Per iteration: E-step = broadcast the 16-row codebook, JVM-codegen
    cosine argmax per vector (map-side + one vec_id window shuffle);
    M-step = per-cell elementwise mean via posexplode -> groupBy
    (cell, dim) — a (k x dim)-row aggregate, NEVER a per-cell
    collect_list of members, so cluster size is unbounded at 100 TB.
    Only the codebook (k x dim floats, model state) crosses to the
    driver each round, exactly like q_ann_ivf's closure — bounded by k,
    independent of corpus size.

    Returns (final centroids, per-iteration inertia, corpus count).

    This is the deterministic FIXTURE (fixed 16 seed rows) that
    q_kmeans_check / q_centroid_assign oracle against; the general
    trainer with caller-chosen k is kmeans_fit."""
    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    seeds = e.filter(
        (F.col("vec_id") >= N_QUERIES) & (F.col("vec_id") < N_QUERIES + _N_CENTROIDS)
    )
    return kmeans_fit(spark, e, _N_CENTROIDS, iters=iters, seed_df=seeds)


def kmeans_fit(
    spark: SparkSession,
    e: DataFrame,
    k: int,
    iters: int = _KMEANS_ITERS,
    seed_df: DataFrame | None = None,
) -> tuple[list[tuple[int, list[float]]], list[float], int]:
    """General Lloyd's k-means over a (vec_id, embedding) frame — same
    distributed loop as kmeans_train (broadcast codebook E-step,
    (k×dim)-row M-step aggregate, only the codebook crossing to the
    driver) but with caller-chosen k. Default seeding is a
    deterministic hash-spread sample: order by xxhash64(vec_id), take
    k — stable across runs and partitionings, spread across the id
    space without a shuffle of the data itself."""
    n_corpus = e.count()
    seeds = (
        seed_df
        if seed_df is not None
        else e.orderBy(F.xxhash64(F.col("vec_id")), "vec_id").limit(k)
    )
    cents = [
        (int(r.vec_id), [float(v) for v in r.embedding]) for r in seeds.collect()
    ]
    inertias: list[float] = []
    for _ in range(iters):
        cdf = spark.createDataFrame(
            [(cid, emb) for cid, emb in cents], "cell_id long, cent_emb array<double>"
        )
        scored = e.crossJoin(F.broadcast(cdf)).withColumn(
            "cos", cosine_sim(F.col("embedding"), F.col("cent_emb"))
        )
        w = Window.partitionBy("vec_id").orderBy(F.col("cos").desc(), F.col("cell_id"))
        assign = (
            scored.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") == 1)
            .select("vec_id", "embedding", "cell_id", "cos")
        )
        stats = assign.agg(
            F.sum(1 - F.col("cos")).alias("inertia"), F.count("*").alias("n")
        ).collect()[0]
        assert stats.n == n_corpus
        inertias.append(float(stats.inertia))
        dim_means = (
            assign.select("cell_id", F.posexplode("embedding").alias("pos", "v"))
            .groupBy("cell_id", "pos")
            .agg(F.avg(F.col("v").cast("double")).alias("m"))
            .collect()
        )
        by_cell: dict[int, dict[int, float]] = {}
        for r in dim_means:
            by_cell.setdefault(int(r.cell_id), {})[int(r.pos)] = float(r.m)
        cents = [
            (cid, [dims[p] for p in sorted(dims)]) for cid, dims in sorted(by_cell.items())
        ]
    return cents, inertias, n_corpus


def q_kmeans_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORACLE-checked contract of the iterative k-means trainer: the
    Lloyd update never increases inertia (monotone booleans over 3
    iterations — deterministic on fixed data and init), and every
    corpus vector stays assigned each round. The centroid floats
    themselves are summation-order-sensitive, so the contract — not
    the raw model — is the driver-checked surface."""
    _, inertias, _ = kmeans_train(spark, sf_dir)
    monotone = all(
        inertias[i + 1] <= inertias[i] + 1e-9 for i in range(len(inertias) - 1)
    )
    improved = inertias[-1] < inertias[0]
    return spark.createDataFrame(
        [(len(inertias), bool(monotone), bool(improved))],
        "iters int, inertia_monotone boolean, inertia_improved boolean",
    )


def _ann_check(spark: SparkSession, sf_dir: str, approx_fn, min_recall: float) -> DataFrame:
    """Oracle-checkable contract of a recall-bounded ANN variant,
    computed in ONE Spark plan against the brute-force truth:

    - recall_ok  — |approx ∩ truth| / |truth| ≥ min_recall. The
      threshold sits under the measured recall at every test SF; both
      sides are deterministic (fixed hyperplanes/codebook, fixed data),
      so the boolean is stable, and DuckDB's side is literal `true`.
    - exact_rerank_ok — every (query, neighbor) the variant shares with
      the truth carries the IDENTICAL cosine: the re-rank is exact
      arithmetic, only the candidate set is approximate.
    """
    truth = q_ann_topk(spark, sf_dir).select(
        "query_id", "neighbor_id", F.col("cosine").alias("t_cos")
    )
    approx = approx_fn(spark, sf_dir).select(
        "query_id", "neighbor_id", F.col("cosine").alias("a_cos")
    )
    hits = approx.join(truth, ["query_id", "neighbor_id"], "inner").agg(
        F.count("*").alias("n_hit"),
        F.max(F.abs(F.col("a_cos") - F.col("t_cos"))).alias("max_dev"),
    )
    total = truth.agg(F.count("*").alias("n_truth"))
    return hits.crossJoin(total).select(
        (F.col("n_hit") / F.col("n_truth") >= min_recall).alias("recall_ok"),
        (F.coalesce(F.col("max_dev"), F.lit(0.0)) < 1e-9).alias("exact_rerank_ok"),
    )


def q_ann_lsh_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORACLE-checked contract for q_ann_lsh (measured recall: 0.52 at
    sf0.001, 0.32 at sf0.01 — threshold 0.25 holds deterministically)."""
    return _ann_check(spark, sf_dir, q_ann_lsh, 0.25)


def q_ann_ivf_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORACLE-checked contract for q_ann_ivf (measured recall: 0.60 at
    sf0.001, 0.40 at sf0.01 — threshold 0.30 holds deterministically)."""
    return _ann_check(spark, sf_dir, q_ann_ivf, 0.30)


_COS = (
    "round(list_dot_product(q.embedding::DOUBLE[], c.embedding::DOUBLE[])"
    " / (sqrt(list_dot_product(q.embedding::DOUBLE[], q.embedding::DOUBLE[]))"
    " * sqrt(list_dot_product(c.embedding::DOUBLE[], c.embedding::DOUBLE[]))), 6)"
)

_CHECK_ORACLE = "SELECT true AS recall_ok, true AS exact_rerank_ok"

ORACLES: dict[str, str] = {
    "q_ann_topk": f"""
        SELECT query_id, neighbor_id, cosine, rnk FROM (
            SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                   {_COS} AS cosine,
                   row_number() OVER (PARTITION BY q.vec_id
                                      ORDER BY {_COS} DESC, c.vec_id) AS rnk
            FROM embeddings q
            JOIN embeddings c ON q.vec_id < {N_QUERIES} AND c.vec_id <> q.vec_id
        ) WHERE rnk <= {TOP_K}
    """,
    # q_ann_lsh / q_ann_ivf: recall-bounded by design → the pair-set
    # queries stay rows-only, and their deterministic quality contract
    # is driver-verified through the *_check twins below.
    "q_ann_lsh_check": _CHECK_ORACLE,
    "q_ann_ivf_check": _CHECK_ORACLE,
    "q_embed_norm": """
        SELECT vec_id,
               round(sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])), 6) AS l2_norm,
               round((embedding::DOUBLE[])[1]
                     / sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])), 6) AS unit_head,
               round(list_sum(embedding::DOUBLE[])
                     / sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])), 6) AS unit_sum
        FROM embeddings
    """,
    "q_kmeans_check": (
        f"SELECT {_KMEANS_ITERS} AS iters, true AS inertia_monotone,"
        " true AS inertia_improved"
    ),
    "q_centroid_assign": f"""
        SELECT vec_id, cell_id, cosine FROM (
            SELECT q.vec_id, cent.vec_id AS cell_id,
                   {_COS.replace('c.embedding', 'cent.embedding')} AS cosine,
                   row_number() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY {_COS.replace('c.embedding', 'cent.embedding')} DESC,
                                cent.vec_id) AS rnk
            FROM embeddings q
            JOIN embeddings cent
              ON cent.vec_id >= {N_QUERIES}
             AND cent.vec_id < {N_QUERIES + _N_CENTROIDS}
        ) WHERE rnk = 1
    """,
}


def q_stream_centroid_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental embedding indexing — the streaming twin of
    q_centroid_assign, ORACLE-checked: replay the embeddings table as a
    multi-batch file stream (maxFilesPerTrigger forces several real
    micro-batches) and assign each arriving batch to the broadcast
    codebook, appending assignments per batch. Assignment is a
    STATELESS per-row map against a fixed dimension, so the result is
    batch-split-independent and must equal the one-shot batch
    quantization — this is how a 100 TB vector store indexes new
    arrivals: each shard pays O(shard x k), never a corpus re-scan."""
    import os

    from pyspark.sql.window import Window as W

    work = replay_workdir("stream_vq")
    in_dir = os.path.join(work, "vecs")
    out = os.path.join(work, "assigned")
    ckpt = os.path.join(work, "ckpt")

    e = load_table(spark, sf_dir, "embeddings")
    e.repartition(8).write.mode("overwrite").parquet(in_dir)
    cents = (
        e.filter(
            (F.col("vec_id") >= N_QUERIES)
            & (F.col("vec_id") < N_QUERIES + _N_CENTROIDS)
        )
        .select(
            F.col("vec_id").alias("cell_id"),
            F.col("embedding").alias("cent_emb"),
            l2_norm(F.col("embedding")).alias("c_norm"),
        )
    )

    def assign(batch_df: DataFrame, batch_id: int) -> None:
        scored = (
            batch_df.withColumn("v_norm", l2_norm(F.col("embedding")))
            .crossJoin(F.broadcast(cents))
            .withColumn(
                "cosine",
                F.round(
                    dot_product(F.col("embedding"), F.col("cent_emb"))
                    / (F.col("v_norm") * F.col("c_norm")),
                    6,
                ),
            )
        )
        w = W.partitionBy("vec_id").orderBy(F.col("cosine").desc(), F.col("cell_id"))
        (
            scored.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") == 1)
            .select("vec_id", "cell_id", "cosine")
            .write.mode("append")
            .parquet(out)
        )

    from ..streaming import await_or_raise, replay_state_partitions

    with replay_state_partitions(spark):
        q = (
            spark.readStream.schema(e.schema)
            .option("maxFilesPerTrigger", "2")  # 8 files -> 4 real batches
            .parquet(in_dir)
            .writeStream.foreachBatch(assign)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        try:
            await_or_raise(q, 120)
        finally:
            if q.isActive:
                q.stop()
    return spark.read.parquet(out)


# stateless per-row assignment against a fixed codebook is
# batch-split-independent: the incremental index must equal the batch one
ORACLES["q_stream_centroid_assign"] = ORACLES["q_centroid_assign"]
ORACLES["q_embed_prune"] = f"""
    WITH assigned AS ({ORACLES["q_centroid_assign"]}),
    sized AS (
        SELECT vec_id, cell_id, cosine,
               count(*) OVER (PARTITION BY cell_id) AS cell_n,
               row_number() OVER (PARTITION BY cell_id
                                  ORDER BY cosine ASC, vec_id) AS rk
        FROM assigned
    )
    SELECT vec_id, cell_id, cosine, CAST(rk AS INT) AS rk, cell_n
    FROM sized WHERE rk <= ceil(cell_n * {PRUNE_FRAC})
    ORDER BY cell_id, rk
"""

# identical arithmetic contract: the numpy-matmul kernel must reproduce
# the JVM brute-force result bit-for-bit at 6 decimals
ORACLES["q_ann_matmul"] = ORACLES["q_ann_topk"]


SEMDEDUP_THRESHOLD = 0.45


def q_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    deduplication by clustering embeddings, then finding near-duplicate
    pairs only WITHIN each cluster. Assignment is the same broadcast
    16-row codebook nearest-centroid pass as q_centroid_assign; the
    pairwise cosine then runs per cell, so the pair space is
    sum(cell_size^2) instead of corpus^2 — the published trick that
    makes embedding-level dedup tractable at web scale. THIS fixed-16
    form is the deterministic ORACLE FIXTURE only: its cells grow
    O(n/16), so the production path is semdedup_scaled below, where
    k = ceil(n / target_cell_size) tracks the corpus and centroids
    come from the distributed kmeans_fit trainer. Compare q_embed_dup,
    the O(n^2) corpus-wide baseline both replace at 100 TB.

    Fully deterministic (fixed codebook, exact cosine) → exact DuckDB
    oracle, unlike the recall-bounded LSH twin q_embed_dup_lsh."""
    e = load_table(spark, sf_dir, "embeddings").withColumn(
        "v_norm", l2_norm(F.col("embedding"))
    )
    cents = e.filter(
        (F.col("vec_id") >= N_QUERIES) & (F.col("vec_id") < N_QUERIES + _N_CENTROIDS)
    ).select(
        F.col("vec_id").alias("cell_id"),
        F.col("embedding").alias("cent_emb"),
        F.col("v_norm").alias("c_norm"),
    )
    scored = e.crossJoin(F.broadcast(cents)).withColumn(
        "cent_cos",
        dot_product(F.col("embedding"), F.col("cent_emb"))
        / (F.col("v_norm") * F.col("c_norm")),
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.col("cent_cos").desc(), F.col("cell_id")
    )
    assigned = (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") == 1)
        .select("vec_id", "cell_id", "embedding", "v_norm")
    )
    return _within_cell_pairs(assigned, SEMDEDUP_THRESHOLD)


def _within_cell_pairs(assigned: DataFrame, threshold: float) -> DataFrame:
    """Exact-cosine pair scan restricted to same-cell vectors: the
    equi-join on cell_id keeps the pair space at sum(cell_size²)."""
    a = assigned.select(
        F.col("vec_id").alias("vec_a"),
        "cell_id",
        F.col("embedding").alias("emb_a"),
        F.col("v_norm").alias("n_a"),
    )
    b = assigned.select(
        F.col("vec_id").alias("vec_b"),
        F.col("cell_id").alias("cell_b"),
        F.col("embedding").alias("emb_b"),
        F.col("v_norm").alias("n_b"),
    )
    return (
        a.join(
            b,
            (F.col("cell_id") == F.col("cell_b")) & (F.col("vec_a") < F.col("vec_b")),
        )
        .withColumn(
            "cosine",
            F.round(
                dot_product(F.col("emb_a"), F.col("emb_b"))
                / (F.col("n_a") * F.col("n_b")),
                6,
            ),
        )
        .filter(F.col("cosine") >= threshold)
        .select("vec_a", "vec_b", "cell_id", "cosine")
    )


SEMDEDUP_TARGET_CELL = 32
SEMDEDUP_FLAT_K = 64  # above this, two-level IVF assignment
# Hard ceiling on cluster count: k = ceil(n/target) tracks the corpus
# only up to here, then CELL SIZE grows instead — the paper's regime
# (Abbas et al. 2023 run a fixed ~50k clusters over LAION and let
# cells scale). This is what keeps DRIVER state bounded: the codebook
# is the one thing collect()ed (kmeans_fit / _ivf_scored), and with
# the cap it is ≤ 64k rows × dim doubles regardless of corpus size —
# without it, k = n/32 puts tens of GB on the driver at n ~ 1e10.
SEMDEDUP_K_CAP = 65_536


def _ivf_scored(spark: SparkSession, e: DataFrame, env: DataFrame, k: int) -> DataFrame:
    """Two-level centroid scoring for large k: hash-spread codebook,
    coarse groups over the codebook computed driver-side (numpy Lloyd
    over k rows — model state, never data), coarse top-2 probe per
    vector, then fine scoring restricted to the probed groups via a
    broadcast equi-join on coarse_id. Each fine centroid belongs to
    exactly one coarse group, so (vec, cell) candidates are unique."""
    import math

    import numpy as np

    seeds = e.orderBy(F.xxhash64(F.col("vec_id")), "vec_id").limit(k).collect()
    cents = [(int(r.vec_id), [float(v) for v in r.embedding]) for r in seeds]
    C = np.array([emb for _, emb in cents])
    m = max(1, int(round(math.sqrt(k))))
    Cn = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)
    coarse = C[:m].copy()  # hash-spread order → already a spread sample
    for _ in range(2):  # two numpy Lloyd passes over the k-row codebook
        Gn = coarse / np.maximum(np.linalg.norm(coarse, axis=1, keepdims=True), 1e-12)
        g = (Cn @ Gn.T).argmax(axis=1)
        for j in range(m):
            if (g == j).any():
                coarse[j] = C[g == j].mean(axis=0)
    Gn = coarse / np.maximum(np.linalg.norm(coarse, axis=1, keepdims=True), 1e-12)
    g = (Cn @ Gn.T).argmax(axis=1)

    coarse_df = spark.createDataFrame(
        [(j, coarse[j].tolist()) for j in range(m)],
        "coarse_id int, co_emb array<double>",
    ).withColumn("co_norm", l2_norm(F.col("co_emb")))
    fine_df = spark.createDataFrame(
        [(int(g[i]), cents[i][0], cents[i][1]) for i in range(k)],
        "coarse_id int, cell_id long, cent_emb array<double>",
    ).withColumn("c_norm", l2_norm(F.col("cent_emb")))

    wq = Window.partitionBy("vec_id").orderBy(
        F.col("co_cos").desc(), F.col("coarse_id")
    )
    probed = (
        env.crossJoin(F.broadcast(coarse_df))
        .withColumn(
            "co_cos",
            dot_product(F.col("embedding"), F.col("co_emb"))
            / (F.col("v_norm") * F.col("co_norm")),
        )
        .withColumn("co_rnk", F.row_number().over(wq))
        .filter(F.col("co_rnk") <= 2)
        .select("vec_id", "embedding", "v_norm", "coarse_id")
    )
    return probed.join(F.broadcast(fine_df), "coarse_id").withColumn(
        "cent_cos",
        dot_product(F.col("embedding"), F.col("cent_emb"))
        / (F.col("v_norm") * F.col("c_norm")),
    )


def semdedup_scaled(
    spark: SparkSession,
    sf_dir: str,
    *,
    target_cell_size: int = SEMDEDUP_TARGET_CELL,
    k: int | None = None,
    iters: int = 1,
    threshold: float = SEMDEDUP_THRESHOLD,
    n_probes: int = 3,
) -> tuple[DataFrame, DataFrame, int, int]:
    """SemDeDup, scale-correct form: k GROWS WITH THE CORPUS
    (k = min(SEMDEDUP_K_CAP, ceil(n / target_cell_size)) by default)
    and the codebook comes from the distributed kmeans_fit trainer, so
    expected cell size stays ~target_cell_size no matter the corpus
    and the within-cell pair join is O(n × target_cell_size) — the
    published linear-ish behavior (Abbas et al. 2023 run ~50k clusters
    over LAION). Past the cap, cell size — not driver state — absorbs
    further growth (the paper's fixed-cluster regime); the cap is what
    keeps the collect()ed codebook bounded at any corpus (VERDICT r04
    item 3 / ADVICE r04). The fixed-16 q_semdedup stays as the
    deterministic oracle fixture; its cells grow O(n/16), which is
    exactly the quadratic creep this variant removes (VERDICT r03
    item 2).

    Assignment cost is the crux once k tracks the corpus: a flat
    nearest-centroid scan is O(n·k) = O(n²/target) — quadratic again,
    just moved into the E-step (measured 16.6× wall at 16× corpus).
    So above SEMDEDUP_FLAT_K the codebook is probed TWO-LEVEL (the IVF
    shape): centroids are grouped into ~sqrt(k) coarse centers
    (driver-side numpy over the k-row codebook — bounded model state),
    each vector scores the coarse centers, probes its top-2 coarse
    groups, and scores only those groups' fine centroids —
    O(n·sqrt(k)) dot products instead of O(n·k). At this regime the
    codebook is a hash-spread sample (no Lloyd refinement: with k
    growing with the corpus, cell quality comes from codebook density,
    not convergence — the paper's FAISS setup makes the same trade).

    Returns (pairs, assigned, k, n)."""
    import math

    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    n = e.count()
    if k is None:
        k = min(SEMDEDUP_K_CAP, max(1, math.ceil(n / target_cell_size)))
    env = e.withColumn("v_norm", l2_norm(F.col("embedding")))
    if k <= SEMDEDUP_FLAT_K:
        cents, _, _ = kmeans_fit(spark, e, k, iters=iters)
        cdf = spark.createDataFrame(
            [(cid, emb) for cid, emb in cents],
            "cell_id long, cent_emb array<double>",
        ).withColumn("c_norm", l2_norm(F.col("cent_emb")))
        scored = env.crossJoin(F.broadcast(cdf)).withColumn(
            "cent_cos",
            dot_product(F.col("embedding"), F.col("cent_emb"))
            / (F.col("v_norm") * F.col("c_norm")),
        )
    else:
        scored = _ivf_scored(spark, e, env, k)
    w = Window.partitionBy("vec_id").orderBy(
        F.col("cent_cos").desc(), F.col("cell_id")
    )
    # multi-probe assignment (the IVF nprobe analog): each vector joins
    # the pair scan in its n_probes closest cells, so a pair split
    # across a cell boundary is still found when the cells overlap —
    # the standard recall fix for cluster-restricted dedup at a linear
    # n_probes× cost. Cell-size stats and the dedup decision use probe
    # rank 1 (the primary cell).
    assigned = (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= n_probes)
        .select("vec_id", "cell_id", "embedding", "v_norm", "rnk")
    )
    pairs = (
        _within_cell_pairs(assigned.drop("rnk"), threshold)
        # a pair can co-occur in up to n_probes shared cells: keep one
        .groupBy("vec_a", "vec_b")
        .agg(F.min("cell_id").alias("cell_id"), F.first("cosine").alias("cosine"))
        .select("vec_a", "vec_b", "cell_id", "cosine")
    )
    primary = assigned.filter(F.col("rnk") == 1).drop("rnk")
    return pairs, primary, k, n


def q_semdedup_scaled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The scaled SemDeDup pair set (rows-only registration — the
    clustering is data-dependent, so the pair set is not
    SQL-expressible; the oracle-checked contract is
    q_semdedup_scaled_check)."""
    pairs, _assigned, _k, _n = semdedup_scaled(spark, sf_dir)
    return pairs


def q_semdedup_scaled_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORACLE-checked contract of the scaled SemDeDup: k follows the
    corpus (k = ceil(n / target) — the oracle recomputes it from
    count(*), so the scaling law itself is driver-verified), cells
    stay bounded (max cell ≤ 8× target — one Lloyd pass over hash
    seeds is deliberately rough; the bound is the claim), every
    emitted pair clears the cosine threshold, and recall vs the exact
    O(n²) pair set (q_embed_dup semantics at the same threshold) is
    ≥ 0.5 — the honest figure for cluster-restricted dedup: SemDeDup
    trades recall on cell-boundary pairs for the n² → n×cell cost
    drop."""
    pairs, assigned, k, n = semdedup_scaled(spark, sf_dir)
    pairs = pairs.persist()
    try:
        max_cell = (
            assigned.groupBy("cell_id").count().agg(F.max("count")).collect()[0][0]
        )
        import math

        k_scales = k == min(
            SEMDEDUP_K_CAP, max(1, math.ceil(n / SEMDEDUP_TARGET_CELL))
        )
        # past the cap the effective cell target is ceil(n/k), so the
        # bound follows it (identical to 8×target while the cap is slack)
        eff_target = max(SEMDEDUP_TARGET_CELL, math.ceil(n / k))
        bad_pairs = pairs.filter(F.col("cosine") < SEMDEDUP_THRESHOLD).count()
        exact = embed_dup_pairs_at(spark, sf_dir, SEMDEDUP_THRESHOLD).select(
            "vec_a", "vec_b"
        )
        n_exact = exact.count()
        n_hit = exact.join(pairs.select("vec_a", "vec_b"), ["vec_a", "vec_b"]).count()
        recall = (n_hit / n_exact) if n_exact else 1.0
        return spark.createDataFrame(
            [
                (
                    int(n),
                    int(k),
                    bool(k_scales),
                    bool(max_cell <= 8 * eff_target),
                    bool(bad_pairs == 0),
                    bool(recall >= 0.5),
                )
            ],
            "n int, k int, k_scales boolean, cells_bounded boolean,"
            " pairs_sound boolean, recall_ok boolean",
        )
    finally:
        pairs.unpersist()


def embed_dup_pairs_at(
    spark: SparkSession, sf_dir: str, threshold: float
) -> DataFrame:
    """Exact O(n²) cosine pair set at an arbitrary threshold — the
    verify baseline the scaled SemDeDup's recall is measured against
    (test scale only; never in a composed pipeline at 100 TB)."""
    e = load_table(spark, sf_dir, "embeddings")
    a = e.select(
        F.col("vec_id").alias("vec_a"),
        F.col("embedding").alias("emb_a"),
        l2_norm(F.col("embedding")).alias("n_a"),
    )
    b = e.select(
        F.col("vec_id").alias("vec_b"),
        F.col("embedding").alias("emb_b"),
        l2_norm(F.col("embedding")).alias("n_b"),
    )
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .withColumn(
            "cosine",
            F.round(
                dot_product(F.col("emb_a"), F.col("emb_b"))
                / (F.col("n_a") * F.col("n_b")),
                6,
            ),
        )
        .filter(F.col("cosine") >= threshold)
        .select("vec_a", "vec_b", "cosine")
    )


_CENT_COS_RAW = (
    "(list_dot_product(q.embedding::DOUBLE[], cent.embedding::DOUBLE[])"
    " / (sqrt(list_dot_product(q.embedding::DOUBLE[], q.embedding::DOUBLE[]))"
    " * sqrt(list_dot_product(cent.embedding::DOUBLE[], cent.embedding::DOUBLE[]))))"
)

ORACLES["q_semdedup"] = f"""
    WITH assigned AS (
        SELECT vec_id, cell_id, embedding FROM (
            SELECT q.vec_id, cent.vec_id AS cell_id, q.embedding,
                   row_number() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY {_CENT_COS_RAW} DESC, cent.vec_id) AS rnk
            FROM embeddings q
            JOIN embeddings cent
              ON cent.vec_id >= {N_QUERIES}
             AND cent.vec_id < {N_QUERIES + _N_CENTROIDS}
        ) WHERE rnk = 1
    )
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.cell_id,
           round(list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
                 / (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))
                    * sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))),
                 6) AS cosine
    FROM assigned a
    JOIN assigned b ON a.cell_id = b.cell_id AND a.vec_id < b.vec_id
    WHERE round(list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
                / (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))
                   * sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))),
                6) >= {SEMDEDUP_THRESHOLD}
"""

# the k-scaling law is recomputed by the oracle from count(*), so the
# driver verifies k = min(cap, ceil(n / target)) holds at whatever SF
# it runs; the cluster-quality booleans are the deterministic contract
ORACLES["q_semdedup_scaled_check"] = f"""
    SELECT CAST(count(*) AS INT) AS n,
           CAST(least({SEMDEDUP_K_CAP},
                      ceil(count(*) / {SEMDEDUP_TARGET_CELL}.0)) AS INT) AS k,
           true AS k_scales, true AS cells_bounded,
           true AS pairs_sound, true AS recall_ok
    FROM embeddings
"""



# ---------------------------------------------------------------------------
# Product quantization (PQ): the memory-compression path for 100 TB
# embedding stores (Jégou, Douze, Schmid, "Product Quantization for
# Nearest Neighbor Search", TPAMI 2011)
# ---------------------------------------------------------------------------

PQ_M = 8  # subspaces (dim 64 -> 8 sub-blocks of 8)
PQ_KSUB = 16  # codes per subspace (4 bits)
PQ_SHORTLIST = 24 * TOP_K  # ADC candidates per query before exact re-rank


def pq_train_encode(
    spark: SparkSession,
    sf_dir: str,
    m: int = PQ_M,
    ksub: int = PQ_KSUB,
    iters: int = 2,
) -> tuple[DataFrame, list, list[float], int]:
    """Train per-subspace codebooks and encode the corpus: vectors are
    L2-NORMALIZED (so subspace L2 == cosine ordering: ||a-b||² =
    2-2cosθ on unit vectors), split into m contiguous sub-blocks, and
    each block is vector-quantized against its own ksub-word codebook.
    A vector compresses to m small codes — 8×4 bits here vs 64 float32
    (32×) — which is what lets a 100 TB embedding store sit in RAM for
    candidate generation.

    Distributed exactly like kmeans_fit, but ALL m codebooks train in
    ONE loop: posexplode the sub-blocks (block id = position), E-step =
    broadcast (m·ksub)-row codebook equi-joined on block + a
    min(struct(dist, code)) aggregate (deterministic ties), M-step =
    per-(block, code, dim) mean — a (m·ksub·subdim)-row aggregate,
    never a per-cell collect. Only the codebook (m·ksub·subdim floats,
    1 KB here) ever crosses to the driver, independent of corpus size.

    Returns (assign frame (vec_id, block, code), codebook rows
    [(block, code, centroid)], per-iter inertias, subdim)."""
    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    dim = len(e.select("embedding").first()[0])
    assert dim % m == 0, (dim, m)
    subdim = dim // m

    norm = e.select(
        "vec_id",
        F.expr(
            "transform(embedding, x -> CAST(x AS DOUBLE)"
            " / sqrt(aggregate(embedding,"
            " CAST(0 AS DOUBLE), (s, v) -> s + CAST(v AS DOUBLE) * v)))"
        ).alias("u"),
    )
    sub = _pq_blocks(norm, "u", m, subdim)
    final_assign, cb, inertias = _pq_fit(spark, sub, ksub, iters)
    return final_assign, cb, inertias, subdim


def _pq_blocks(vectors: DataFrame, col: str, m: int, subdim: int) -> DataFrame:
    """(vec_id, <col>: array<double>) -> (vec_id, block, sv) sub-block
    rows, lineage-truncated (the PQ fit loop iterates over it)."""
    return vectors.select(
        "vec_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, {m - 1}),"
                f" b -> slice({col}, b * {subdim} + 1, {subdim}))"
            )
        ).alias("block", "sv"),
    ).localCheckpoint()


def _pq_fit(
    spark: SparkSession, sub: DataFrame, ksub: int, iters: int
) -> tuple[DataFrame, list, list[float]]:
    """The distributed per-subspace Lloyd loop shared by flat PQ
    (pq_train_encode) and IVF-PQ residual training (ivfpq_train_encode)
    — see pq_train_encode's docstring for the E/M-step shapes.
    Returns (codes (vec_id, block, code), codebook rows, inertias)."""
    # deterministic hash-spread seeding, ksub per block
    wseed = Window.partitionBy("block").orderBy(
        F.xxhash64(F.col("vec_id")), "vec_id"
    )
    seed_rows = (
        sub.withColumn("rn", F.row_number().over(wseed))
        .filter(F.col("rn") <= ksub)
        .select("block", (F.col("rn") - 1).alias("code"), "sv")
        .collect()
    )
    cb = [(int(r.block), int(r.code), [float(v) for v in r.sv]) for r in seed_rows]

    dist_expr = (
        "aggregate(zip_with(sv, cent, (x, y) -> (x - y) * (x - y)),"
        " CAST(0 AS DOUBLE), (s, v) -> s + v)"
    )
    inertias: list[float] = []
    assign = None
    for _ in range(iters):
        cb_df = spark.createDataFrame(
            cb, "block int, code int, cent array<double>"
        )
        scored = sub.join(F.broadcast(cb_df), "block").withColumn(
            "dist", F.expr(dist_expr)
        )
        assign = (
            scored.groupBy("vec_id", "block")
            .agg(
                F.min(F.struct("dist", "code")).alias("best"),
                F.first("sv").alias("sv"),
            )
            .select(
                "vec_id",
                "block",
                F.col("best.code").alias("code"),
                F.col("best.dist").alias("dist"),
                "sv",
            )
            .localCheckpoint()
        )
        inertias.append(float(assign.agg(F.sum("dist")).collect()[0][0]))
        dim_means = (
            assign.select("block", "code", F.posexplode("sv").alias("pos", "v"))
            .groupBy("block", "code", "pos")
            .agg(F.avg("v").alias("mu"))
            .collect()
        )
        by_bc: dict[tuple[int, int], dict[int, float]] = {}
        for r in dim_means:
            by_bc.setdefault((int(r.block), int(r.code)), {})[int(r.pos)] = float(
                r.mu
            )
        cb = [
            (b, c, [dims[p] for p in sorted(dims)])
            for (b, c), dims in sorted(by_bc.items())
        ]
    # final E-step so the returned CODES encode against the returned
    # CODEBOOK (the model) — without this the codes reflect the
    # pre-M-step centroids and any consumer joining codes against the
    # model (the ADC LUT, the online encoder) sees an inconsistent pair
    final_cb_df = spark.createDataFrame(
        cb, "block int, code int, cent array<double>"
    )
    final_assign = (
        sub.join(F.broadcast(final_cb_df), "block")
        .withColumn("dist", F.expr(dist_expr))
        .groupBy("vec_id", "block")
        .agg(F.min(F.struct("dist", "code")).alias("best"))
        .select("vec_id", "block", F.col("best.code").alias("code"))
        .localCheckpoint()
    )
    return final_assign, cb, inertias


def q_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ-ADC approximate nearest neighbors with exact re-rank — the
    compressed-domain analog of q_ann_lsh/q_ann_ivf: per query, an
    asymmetric-distance LUT (query sub-block vs every codebook word —
    m·ksub = 128 entries, computed driver-side from model state) is
    broadcast and equi-joined against the corpus CODES on (block,
    code); summing the m looked-up entries per (query, vector) gives
    the ADC distance without touching a single corpus float. The
    shortlist (PQ_SHORTLIST = 24·k per query) then gets the standard
    exact-cosine re-rank, so emitted scores are exact and only the
    candidate set is approximate (rows-only gate; contract =
    q_pq_check).

    Scale shape: the ADC join streams (corpus × m) code rows against a
    broadcast 640-row LUT — linear in corpus, zero full-width vector
    reads until the PQ_SHORTLIST (120 rows at k=5) per-query
    re-rank."""
    assign, cb, _inertias, subdim = pq_train_encode(spark, sf_dir)
    e = load_table(spark, sf_dir, "embeddings")

    qrows = (
        e.filter(F.col("vec_id") < N_QUERIES)
        .select("vec_id", "embedding")
        .collect()
    )
    cbm: dict[tuple[int, int], np.ndarray] = {
        (b, c): np.array(cent) for b, c, cent in cb
    }
    lut_rows = []
    for r in qrows:
        q = np.array([float(v) for v in r.embedding])
        q = q / np.linalg.norm(q)
        for (b, c), cent in cbm.items():
            d = float(((q[b * subdim : (b + 1) * subdim] - cent) ** 2).sum())
            lut_rows.append((int(r.vec_id), b, c, d))
    lut = spark.createDataFrame(
        lut_rows, "query_id long, block int, code int, d double"
    )

    adc = (
        assign.join(F.broadcast(lut), ["block", "code"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", "vec_id")
        .agg(F.sum("d").alias("adc"))
    )
    wq = Window.partitionBy("query_id").orderBy(F.col("adc").asc(), F.col("vec_id"))
    shortlist = (
        adc.withColumn("srnk", F.row_number().over(wq))
        .filter(F.col("srnk") <= PQ_SHORTLIST)
        .select("query_id", F.col("vec_id").alias("neighbor_id"))
    )

    return _exact_rerank(e, shortlist)


def _exact_rerank(e: DataFrame, shortlist: DataFrame) -> DataFrame:
    """Exact-cosine re-rank of a (query_id, neighbor_id) shortlist to
    TOP_K — the shared tail of every compressed-domain ANN path, so
    emitted scores are exact and only the candidate set is
    approximate."""
    queries = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        l2_norm(F.col("embedding")).alias("q_norm"),
    )
    corpus = e.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("c_emb"),
        l2_norm(F.col("embedding")).alias("c_norm"),
    )
    rescored = (
        shortlist.join(corpus, "neighbor_id")
        .join(F.broadcast(queries), "query_id")
        .withColumn(
            "cosine",
            F.round(
                dot_product(F.col("q_emb"), F.col("c_emb"))
                / (F.col("q_norm") * F.col("c_norm")),
                6,
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        rescored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_K)
        .select("query_id", "neighbor_id", "cosine", "rnk")
    )


def q_pq_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORACLE-checked contract for q_pq_topk (same shape as the
    LSH/IVF twins): recall vs the brute-force truth above a floor that
    holds deterministically at every test SF (measured 0.96 at
    sf0.001, 0.84 at sf0.01 with the 24·k shortlist — threshold 0.5
    holds with margin), and exact re-rank — any (query, neighbor)
    shared with the truth carries the identical cosine. PQ recall is
    structurally higher than LSH/IVF probing at the same data (the ADC
    scan ranks EVERY corpus vector, it never drops candidates to a
    bucket) — the cost moved to approximation error in the distance,
    which the shortlist + exact re-rank absorbs."""
    return _ann_check(spark, sf_dir, q_pq_topk, 0.5)


ORACLES["q_pq_check"] = _CHECK_ORACLE


# ---------------------------------------------------------------------------
# IVF-PQ: coarse cells + PQ codes on residuals (the faiss IVFPQ shape)
# ---------------------------------------------------------------------------

IVFPQ_NPROBE = 8  # coarse cells probed per query (of _N_CENTROIDS)


def ivfpq_train_encode(
    spark: SparkSession,
    sf_dir: str,
    k_coarse: int = _N_CENTROIDS,
    m: int = PQ_M,
    ksub: int = PQ_KSUB,
    iters: int = 2,
) -> tuple[DataFrame, list, list, int]:
    """IVF-PQ index build — the composition that actually serves ANN
    at 100 TB (Jégou et al. 2011; faiss IndexIVFPQ): a coarse k-means
    quantizer partitions the corpus into cells, and product
    quantization encodes each vector's RESIDUAL (u - centroid) rather
    than the vector itself. Search then probes a few cells (bounding
    the scan to nprobe/k of the corpus) and ranks candidates from
    codes alone; residual encoding keeps the PQ codebook spent on the
    small within-cell displacements instead of re-describing the
    coarse structure.

    Distributed build, bounded driver state: the coarse codebook
    comes from kmeans_fit (broadcast E-step, (k x dim)-row M-step);
    cell assignment + residuals are one broadcast join; the PQ
    residual fit is the same _pq_fit loop as flat PQ. Model state
    crossing to the driver = k_coarse x dim + m x ksub x subdim
    floats, independent of corpus size.

    Returns (codes (vec_id, cell_id, block, code), pq codebook rows,
    coarse centroids [(cell_id, centroid)], subdim)."""
    return ivfpq_train_encode_over(
        spark,
        load_table(spark, sf_dir, "embeddings").select(
            "vec_id", "embedding"
        ),
        k_coarse,
        m,
        ksub,
        iters,
    )


def ivfpq_train_encode_over(
    spark: SparkSession,
    e: DataFrame,
    k_coarse: int = _N_CENTROIDS,
    m: int = PQ_M,
    ksub: int = PQ_KSUB,
    iters: int = 2,
) -> tuple[DataFrame, list, list, int]:
    """The IVF-PQ build over an arbitrary (vec_id, embedding) frame —
    shared by the one-shot index build and the streaming append path's
    seed training (train once on the seed, encode forever)."""
    dim = len(e.select("embedding").first()[0])
    assert dim % m == 0, (dim, m)
    subdim = dim // m

    norm = e.select(
        "vec_id",
        F.expr(
            "transform(embedding, x -> CAST(x AS DOUBLE)"
            " / sqrt(aggregate(embedding,"
            " CAST(0 AS DOUBLE), (s, v) -> s + CAST(v AS DOUBLE) * v)))"
        ).alias("u"),
    )
    cents, _inertias, _n = kmeans_fit(
        spark,
        norm.select("vec_id", F.col("u").alias("embedding")),
        k_coarse,
        iters=2,
    )
    cdf = spark.createDataFrame(
        [(int(cid), c) for cid, c in cents], "cell_id long, cent array<double>"
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.col("cos").desc(), F.col("cell_id")
    )
    assigned = (
        norm.crossJoin(F.broadcast(cdf))
        .withColumn("cos", cosine_sim(F.col("u"), F.col("cent")))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") == 1)
        .select(
            "vec_id",
            "cell_id",
            F.expr("zip_with(u, cent, (x, y) -> x - y)").alias("r"),
        )
        .localCheckpoint()
    )
    sub = _pq_blocks(assigned, "r", m, subdim)
    codes, cb, _pq_inertias = _pq_fit(spark, sub, ksub, iters)
    codes = codes.join(
        assigned.select("vec_id", "cell_id"), "vec_id"
    ).localCheckpoint()
    return codes, cb, cents, subdim


def q_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ ANN search: per query, rank the coarse cells by cosine
    (driver-side — the coarse codebook is model state, like
    q_ann_ivf's closure), take the IVFPQ_NPROBE closest, and build a
    PER-CELL ADC lookup table against the query's residual in that
    cell (q - centroid): nprobe x m x ksub entries per query. The
    broadcast LUT equi-joins corpus codes on (cell_id, block, code) —
    so only vectors in probed cells are scanned at all (nprobe/k of
    the corpus; flat PQ scans everything), and within them the
    distance comes from summing m looked-up scalars, zero corpus
    float reads. PQ_SHORTLIST survivors get the exact-cosine re-rank.
    Rows-only gate; contract = q_ivfpq_check."""
    codes, cb, cents, subdim = ivfpq_train_encode(spark, sf_dir)
    e = load_table(spark, sf_dir, "embeddings")
    return _ivfpq_search(spark, e, codes, cb, cents, subdim)


def _ivfpq_search(
    spark: SparkSession,
    e: DataFrame,
    codes: DataFrame,
    cb: list,
    cents: list,
    subdim: int,
) -> DataFrame:
    """The IVF-PQ probe/ADC/re-rank pipeline over a codes frame —
    shared by the one-shot index and the streamed (seed + appended)
    index, so the append path is searched by the identical plan."""
    qrows = (
        e.filter(F.col("vec_id") < N_QUERIES)
        .select("vec_id", "embedding")
        .collect()
    )
    C = {int(cid): np.array(c, dtype="float64") for cid, c in cents}
    cbm: dict[tuple[int, int], np.ndarray] = {
        (b, c): np.array(cent) for b, c, cent in cb
    }
    lut_rows = []
    for r in qrows:
        q = np.array([float(v) for v in r.embedding])
        q = q / np.linalg.norm(q)
        sims = {
            cid: float(q @ (c / np.linalg.norm(c))) for cid, c in C.items()
        }
        probed = sorted(C, key=lambda cid: (-sims[cid], cid))[:IVFPQ_NPROBE]
        for cid in probed:
            qr = q - C[cid]
            for (b, c2), cent in cbm.items():
                d = float(
                    ((qr[b * subdim : (b + 1) * subdim] - cent) ** 2).sum()
                )
                lut_rows.append((int(r.vec_id), cid, b, c2, d))
    lut = spark.createDataFrame(
        lut_rows, "query_id long, cell_id long, block int, code int, d double"
    )

    adc = (
        codes.join(F.broadcast(lut), ["cell_id", "block", "code"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", "vec_id")
        .agg(F.sum("d").alias("adc"))
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.col("adc").asc(), F.col("vec_id")
    )
    shortlist = (
        adc.withColumn("srnk", F.row_number().over(wq))
        .filter(F.col("srnk") <= PQ_SHORTLIST)
        .select("query_id", F.col("vec_id").alias("neighbor_id"))
    )
    return _exact_rerank(e, shortlist)


def q_ivfpq_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORACLE-checked contract for q_ivfpq_topk: recall vs brute force
    above the floor, exact re-rank scores. Recall sits between flat
    PQ (which ADC-ranks every vector) and plain IVF probing: cell
    pruning can drop a true neighbor whose cell the query doesn't
    probe, residual ADC is finer than raw-vector ADC within probed
    cells (measured 0.80 at sf0.001, 0.72 at sf0.01 with nprobe=8 of
    16 cells; 0.64/0.60 at nprobe=6 — floor 0.5 holds with margin)."""
    return _ann_check(spark, sf_dir, q_ivfpq_topk, 0.5)


ORACLES["q_ivfpq_check"] = _CHECK_ORACLE


# ---------------------------------------------------------------------------
# Linear probe: distributed softmax regression on embeddings
# ---------------------------------------------------------------------------

EMBED_CLS_LR = 50.0
EMBED_CLS_ITERS = 12
# Training-accuracy contract: a MULTIPLICATIVE margin over the
# majority class, not an absolute floor (r8 fix). The labels carry no
# geometric signal (tests/test_round8_ops.py pins that), so the probe's
# training accuracy is pure memorization capacity — fixed C x dim
# parameters spread over n rows, decaying toward majority as n grows:
# measured acc/majority = 3.6x at n=500 (acc 0.42) but 1.9x at
# n=2,000 (acc 0.21). The r7 absolute floor of 0.3 encoded the
# 500-row fixture and silently failed at sf0.1; 1.5x majority holds
# with >=29% headroom at every tested SF and states the actual claim:
# the optimizer extracts measurably more than the prior at any scale.
EMBED_CLS_ACC_MARGIN = 1.5


def embed_classifier_fit(
    spark: SparkSession,
    sf_dir: str,
    lr: float = EMBED_CLS_LR,
    iters: int = EMBED_CLS_ITERS,
) -> tuple[list[list[float]], list[float], int, int]:
    """Distributed full-batch softmax regression over the embeddings
    table against its `label` column — the LINEAR PROBE every
    classifier-based curation step needs (quality filters, domain
    routers, fasttext-style heads over frozen embeddings), and the
    supervised sibling of the kmeans_fit loop: the (C x dim) weight
    matrix is driver-held model state, each iteration broadcasts it,
    computes per-row softmax probabilities JVM-side (zip_with dot
    products + two vec_id windows), and folds the full-batch gradient
    with one (C x dim)-row aggregate — per-class probability error
    times feature value, summed over rows. The training loss rides
    the same aggregate (attached to the pos=0 gradient rows), so each
    iteration is exactly one Spark job and only model-sized state
    ever crosses to the driver. Deterministic: zeros init, full
    batch, fixed order-free sums.

    At 100 TB the same loop runs with minibatch sampling (a hash
    filter on vec_id) and more iterations; the per-iteration shapes —
    broadcast model, map-side scoring, model-sized gradient aggregate
    — are unchanged.

    Returns (W (C x dim), per-iter losses, n rows, C classes)."""
    return _embed_classifier_fit_over(
        spark,
        load_table(spark, sf_dir, "embeddings").select(
            "vec_id", "embedding", "label"
        ),
        lr,
        iters,
    )


def _embed_classifier_fit_over(
    spark: SparkSession,
    e: DataFrame,
    lr: float = EMBED_CLS_LR,
    iters: int = EMBED_CLS_ITERS,
) -> tuple[list[list[float]], list[float], int, int]:
    norm = e.select(
        "vec_id",
        "label",
        F.expr(
            "transform(embedding, x -> CAST(x AS DOUBLE)"
            " / sqrt(aggregate(embedding,"
            " CAST(0 AS DOUBLE), (s, v) -> s + CAST(v AS DOUBLE) * v)))"
        ).alias("u"),
    ).localCheckpoint()
    n = norm.count()
    C = int(norm.agg(F.max("label")).collect()[0][0]) + 1
    dim = len(norm.select("u").first()[0])

    dot = (
        "aggregate(zip_with(u, w, (x, y) -> x * y),"
        " CAST(0 AS DOUBLE), (s, v) -> s + v)"
    )
    W = [[0.0] * dim for _ in range(C)]
    losses: list[float] = []
    wv = Window.partitionBy("vec_id")
    for _ in range(iters):
        wdf = spark.createDataFrame(
            [(c, W[c]) for c in range(C)], "cls int, w array<double>"
        )
        p = (
            norm.crossJoin(F.broadcast(wdf))
            .withColumn("z", F.expr(dot))
            .withColumn("ez", F.exp(F.col("z") - F.max("z").over(wv)))
            .withColumn("p", F.col("ez") / F.sum("ez").over(wv))
            .withColumn(
                "coef",
                (F.col("p") - (F.col("cls") == F.col("label")).cast("double"))
                / F.lit(float(n)),
            )
        )
        grad_loss = (
            p.select(
                "cls",
                "coef",
                (F.col("cls") == F.col("label")).cast("double").alias("y"),
                F.col("p").alias("pp"),
                "u",
            )
            .select(
                "cls", "coef", "y", "pp", F.posexplode("u").alias("pos", "v")
            )
            .groupBy("cls", "pos")
            .agg(
                F.sum(F.col("coef") * F.col("v")).alias("g"),
                F.sum(
                    F.when(
                        (F.col("y") == 1.0) & (F.col("pos") == 0),
                        -F.log(F.col("pp") + 1e-12),
                    ).otherwise(0.0)
                ).alias("l"),
            )
            .collect()
        )
        losses.append(sum(r.l for r in grad_loss) / n)
        for r in grad_loss:
            W[r.cls][r.pos] -= lr * r.g
    return W, losses, n, C


def q_embed_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Score the corpus with the trained linear probe: per vector the
    argmax-class prediction next to the true label. Deterministic
    (fixed init/data/step count) but 12 GD iterations are beyond any
    practical SQL oracle — rows-only gate; the oracle-checked surface
    is q_embed_classifier_check."""
    W, _losses, _n, C = embed_classifier_fit(spark, sf_dir)
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding", "label"
    )
    norm = e.select(
        "vec_id",
        "label",
        F.expr(
            "transform(embedding, x -> CAST(x AS DOUBLE)"
            " / sqrt(aggregate(embedding,"
            " CAST(0 AS DOUBLE), (s, v) -> s + CAST(v AS DOUBLE) * v)))"
        ).alias("u"),
    )
    wdf = spark.createDataFrame(
        [(c, W[c]) for c in range(C)], "cls int, w array<double>"
    )
    dot = (
        "aggregate(zip_with(u, w, (x, y) -> x * y),"
        " CAST(0 AS DOUBLE), (s, v) -> s + v)"
    )
    wv = Window.partitionBy("vec_id").orderBy(F.col("z").desc(), F.col("cls"))
    return (
        norm.crossJoin(F.broadcast(wdf))
        .withColumn("z", F.expr(dot))
        .withColumn("rnk", F.row_number().over(wv))
        .filter(F.col("rnk") == 1)
        .select(
            "vec_id", "label", F.col("cls").alias("pred_label")
        )
    )


def q_embed_classifier_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORACLE-checked contract of the linear probe: full-batch
    gradient descent on a convex loss with a safe step never
    increases the loss (monotone + strictly improved over the run),
    and final training accuracy clears EMBED_CLS_ACC_MARGIN x the
    majority-class share (recomputed here from the labels, never
    hardcoded), so the probe demonstrably extracts more than the
    prior. The margin is multiplicative, not an absolute floor: the
    labels are noise w.r.t. the geometry, so training accuracy is
    memorization capacity and decays toward majority as rows grow —
    an absolute floor pinned to one SF flaps at another (the r7 0.3
    floor passed at 500 rows, failed at 2,000)."""
    W, losses, n, C = embed_classifier_fit(spark, sf_dir)
    wdf = spark.createDataFrame(
        [(c, W[c]) for c in range(C)], "cls int, w array<double>"
    )
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding", "label"
    )
    norm = e.select(
        "vec_id",
        "label",
        F.expr(
            "transform(embedding, x -> CAST(x AS DOUBLE)"
            " / sqrt(aggregate(embedding,"
            " CAST(0 AS DOUBLE), (s, v) -> s + CAST(v AS DOUBLE) * v)))"
        ).alias("u"),
    )
    dot = (
        "aggregate(zip_with(u, w, (x, y) -> x * y),"
        " CAST(0 AS DOUBLE), (s, v) -> s + v)"
    )
    wv = Window.partitionBy("vec_id").orderBy(F.col("z").desc(), F.col("cls"))
    acc = (
        norm.crossJoin(F.broadcast(wdf))
        .withColumn("z", F.expr(dot))
        .withColumn("rnk", F.row_number().over(wv))
        .filter(F.col("rnk") == 1)
        .agg(F.avg((F.col("cls") == F.col("label")).cast("double")))
        .collect()[0][0]
    )
    maj = (
        load_table(spark, sf_dir, "embeddings")
        .groupBy("label")
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
        / n
    )
    monotone = all(
        losses[i + 1] <= losses[i] + 1e-9 for i in range(len(losses) - 1)
    )
    return spark.createDataFrame(
        [
            (
                len(losses),
                bool(monotone),
                bool(losses[-1] < losses[0]),
                bool(acc >= EMBED_CLS_ACC_MARGIN * maj),
                bool(acc > maj),
            )
        ],
        "iters int, loss_monotone boolean, loss_improved boolean, "
        "acc_ok boolean, beats_majority boolean",
    )


ORACLES["q_embed_classifier_check"] = f"""
    SELECT {EMBED_CLS_ITERS} AS iters, true AS loss_monotone,
           true AS loss_improved, true AS acc_ok, true AS beats_majority
"""

# sampled-trainer knobs (VERDICT r07 item 6) — same shape as
# textops.QUALCLF_SAMPLE_*: sample sized to ~TARGET rows with a mod
# floor of 2, one-sided fit-quality bound vs the full-batch fixture
EMBED_CLS_SAMPLE_TARGET = 1_000
EMBED_CLS_SAMPLE_EPS = 0.1


def embed_classifier_fit_sampled(
    spark: SparkSession,
    sf_dir: str,
    lr: float = EMBED_CLS_LR,
    iters: int = EMBED_CLS_ITERS,
) -> tuple[list[list[float]], list[float], int, int, int]:
    """The PRODUCTION training path for the linear probe (VERDICT r07
    item 6): fit on a deterministic xxhash64 vec_id bucket sized to
    ~EMBED_CLS_SAMPLE_TARGET rows (mod floor 2), then score the corpus
    once with the frozen weights — iters x O(sample) training instead
    of iters x full-corpus shuffles. The full-batch
    embed_classifier_fit stays as the oracle/contract fixture.

    Returns (W, losses, n_train, C, mod)."""
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding", "label"
    )
    mod = max(2, e.count() // EMBED_CLS_SAMPLE_TARGET)
    train = e.filter(F.pmod(F.xxhash64(F.col("vec_id")), F.lit(mod)) == 0)
    W, losses, n, C = _embed_classifier_fit_over(spark, train, lr, iters)
    return W, losses, n, C, mod


def _embed_probe_acc(
    spark: SparkSession, W: list[list[float]], C: int, frame: DataFrame
) -> float:
    """Accuracy of a FROZEN probe on an arbitrary embeddings frame —
    the stateless scoring pass shared by the sampled-trainer check."""
    wdf = spark.createDataFrame(
        [(c, W[c]) for c in range(C)], "cls int, w array<double>"
    )
    norm = frame.select(
        "vec_id",
        "label",
        F.expr(
            "transform(embedding, x -> CAST(x AS DOUBLE)"
            " / sqrt(aggregate(embedding,"
            " CAST(0 AS DOUBLE), (s, v) -> s + CAST(v AS DOUBLE) * v)))"
        ).alias("u"),
    )
    dot = (
        "aggregate(zip_with(u, w, (x, y) -> x * y),"
        " CAST(0 AS DOUBLE), (s, v) -> s + v)"
    )
    wv = Window.partitionBy("vec_id").orderBy(F.col("z").desc(), F.col("cls"))
    return float(
        norm.crossJoin(F.broadcast(wdf))
        .withColumn("z", F.expr(dot))
        .withColumn("rnk", F.row_number().over(wv))
        .filter(F.col("rnk") == 1)
        .agg(F.avg((F.col("cls") == F.col("label")).cast("double")))
        .collect()[0][0]
    )


def q_embed_classifier_sampled_check(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """ORACLE-checked contract of the sampled probe trainer — optimizer
    health under sampling (the exact analog of
    q_quality_clf_sampled_check): the sampled model's accuracy on its
    own training sample must not fall more than EMBED_CLS_SAMPLE_EPS
    below the full-batch model's on the full table, both must beat the
    majority class on their domain, the sampled loss must stay
    monotone, and the sample must be strict.

    NOT a holdout contract, deliberately: the synthetic embeddings'
    labels are noise with respect to the embedding geometry — a probe
    trained on half the rows scores the other half AT the majority
    rate (measured 0.08-0.11 vs majority 0.12), while any model's
    training accuracy is ~0.4 — so a holdout-gap bound would pin a
    corpus artifact, not the trainer. tests/test_round8_ops.py pins
    the measured no-generalization property instead."""
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding", "label"
    )
    n_rows = e.count()
    W_f, _l1, n_f, C_f = embed_classifier_fit(spark, sf_dir)
    W_s, losses_s, n_s, C_s, mod = embed_classifier_fit_sampled(
        spark, sf_dir
    )
    sample = e.filter(F.pmod(F.xxhash64(F.col("vec_id")), F.lit(mod)) == 0)
    acc_full = _embed_probe_acc(spark, W_f, C_f, e)
    acc_smp = _embed_probe_acc(spark, W_s, C_s, sample)

    def majority(frame: DataFrame, n: int) -> float:
        return (
            frame.groupBy("label").count().agg(F.max("count")).collect()[0][0]
            / n
        )

    monotone = all(
        losses_s[i + 1] <= losses_s[i] + 1e-9
        for i in range(len(losses_s) - 1)
    )
    return spark.createDataFrame(
        [
            (
                int(n_rows),
                bool(mod >= 2),
                bool(acc_smp >= acc_full - EMBED_CLS_SAMPLE_EPS),
                bool(
                    acc_smp > majority(sample, n_s)
                    and acc_full > majority(e, n_f)
                ),
                bool(monotone),
            )
        ],
        "n_rows long, strict_sample boolean, within_eps boolean, "
        "beats_majority boolean, loss_monotone boolean",
    )


ORACLES["q_embed_classifier_sampled_check"] = """
    SELECT CAST(count(*) AS BIGINT) AS n_rows, true AS strict_sample,
           true AS within_eps, true AS beats_majority,
           true AS loss_monotone
    FROM embeddings
"""


# ---------------------------------------------------------------------------
# distributed PCA (embedding compression/whitening — the reduction
# SemDeDup-style pipelines run before clustering 100 TB of embeddings)
# ---------------------------------------------------------------------------

PCA_K = 8
PCA_RECON_TOL = 0.05


def pca_fit(
    spark: SparkSession, sf_dir: str, k: int = PCA_K
) -> tuple[np.ndarray, np.ndarray, np.ndarray, int]:
    """One-pass distributed PCA. Arrow batches accumulate second
    moments with one BLAS X^T X per batch and emit (i, j, s) partials
    — dim² + dim + 1 rows per batch regardless of batch row count — a
    single hash aggregation reduces them, and the driver
    eigendecomposes the dim×dim covariance (64×64 = 4 KB: only the
    MODEL crosses the driver, never vectors). Eigenvectors are
    sign-canonicalized (largest-|coordinate| entry positive) so the
    basis is deterministic up to float-sum order.

    Returns (mean (dim,), components (k, dim) row-orthonormal,
    eigenvalues descending (dim,), n)."""
    e = load_table(spark, sf_dir, "embeddings").select("embedding")

    def moments(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.array(list(pdf["embedding"]), dtype=np.float64)
            d = X.shape[1]
            yield pd.concat(
                [
                    pd.DataFrame(
                        {
                            "i": np.repeat(np.arange(d), d),
                            "j": np.tile(np.arange(d), d),
                            "s": (X.T @ X).ravel(),
                        }
                    ),
                    pd.DataFrame(
                        {"i": -1, "j": np.arange(d), "s": X.sum(axis=0)}
                    ),
                    pd.DataFrame({"i": [-2], "j": [0], "s": [float(len(X))]}),
                ]
            )

    rows = (
        e.mapInPandas(moments, "i int, j int, s double")
        .groupBy("i", "j")
        .agg(F.sum("s").alias("s"))
        .collect()
    )
    n = int(next(r.s for r in rows if r.i == -2))
    dim = max(r.j for r in rows) + 1
    sums = np.zeros(dim)
    S = np.zeros((dim, dim))
    for r in rows:
        if r.i == -1:
            sums[r.j] = r.s
        elif r.i >= 0:
            S[r.i, r.j] = r.s
    mean = sums / n
    cov = S / n - np.outer(mean, mean)
    eigvals, eigvecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(eigvals)[::-1]
    eigvals = eigvals[order]
    V = eigvecs[:, order].T  # rows = components
    for c in range(V.shape[0]):  # deterministic sign
        if V[c, np.argmax(np.abs(V[c]))] < 0:
            V[c] = -V[c]
    return mean, V[:k], eigvals, n


def q_pca_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Project every embedding onto the top-PCA_K principal components
    (broadcast (k×dim) model, one matmul per Arrow batch) — the 8×
    -smaller representation downstream clustering/dedup would consume.
    Rows-only gate (eigenvectors are deterministic only up to
    float-sum order across partitions); the oracle-checked surface is
    q_pca_check."""
    mean, V, _eigvals, _n = pca_fit(spark, sf_dir)
    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")

    def project(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.array(list(pdf["embedding"]), dtype=np.float64)
            P = np.round((X - mean) @ V.T, 4)
            yield pd.DataFrame(
                {"vec_id": pdf["vec_id"], "pc": list(P)}
            )

    return e.mapInPandas(project, "vec_id long, pc array<double>")


def q_pca_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORACLE-checked contract of the distributed PCA: the basis is
    row-orthonormal, eigenvalues are non-negative and sorted
    descending, and — the fit's global correctness in one number —
    the DISTRIBUTED mean reconstruction error of the top-k projection
    equals the residual eigenvalue mass (|avg‖x−x̂‖² − Σλ_{>k}| ≤
    PCA_RECON_TOL · Σλ): a covariance assembled wrong anywhere would
    break that identity."""
    mean, V, eigvals, n = pca_fit(spark, sf_dir)
    orthonormal = bool(
        np.max(np.abs(V @ V.T - np.eye(V.shape[0]))) < 1e-8
    )
    descending = bool(
        np.all(np.diff(eigvals) <= 1e-9) and eigvals[-1] > -1e-9
    )
    e = load_table(spark, sf_dir, "embeddings").select("embedding")

    def err(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.array(list(pdf["embedding"]), dtype=np.float64) - mean
            r2 = (X * X).sum(axis=1) - ((X @ V.T) ** 2).sum(axis=1)
            yield pd.DataFrame({"e": [float(r2.sum())], "c": [len(X)]})

    tot = (
        e.mapInPandas(err, "e double, c long")
        .agg(F.sum("e").alias("e"), F.sum("c").alias("c"))
        .collect()[0]
    )
    avg_err = tot.e / tot.c
    resid = float(eigvals[V.shape[0]:].sum())
    total = float(eigvals.sum())
    recon_ok = bool(abs(avg_err - resid) <= PCA_RECON_TOL * total)
    return spark.createDataFrame(
        [
            (
                int(mean.shape[0]),
                int(V.shape[0]),
                int(n),
                orthonormal,
                descending,
                recon_ok,
            )
        ],
        "dim int, k int, n int, orthonormal boolean, "
        "eigs_descending boolean, recon_matches_residual boolean",
    )


ORACLES["q_pca_check"] = f"""
    SELECT 64 AS dim, {PCA_K} AS k,
           CAST(count(*) AS INT) AS n, true AS orthonormal,
           true AS eigs_descending, true AS recon_matches_residual
    FROM embeddings
"""


# ---------------------------------------------------------------------------
# greedy k-center coreset selection (farthest-first traversal)
# ---------------------------------------------------------------------------

KCENTER_K = 16


def kcenter_select(
    spark: SparkSession, sf_dir: str, k: int = KCENTER_K
) -> tuple[list[tuple[int, int, float]], DataFrame]:
    """Greedy k-center / farthest-first traversal (Gonzalez 1985) —
    the diversity-maximizing coreset selection data-pruning pipelines
    use to pick representative exemplars: start from the lowest
    vec_id, then k−1 times add the point FARTHEST (cosine distance)
    from the selected set. Classic guarantee: coverage radius ≤ 2×
    optimal, and the selected centers are mutually ≥ R_final apart —
    both verified by q_kcenter_check.

    Scale shape: driver state is the k selected (id, vector) pairs
    and each round is ONE distributed argmax returning ONE row (order
    by dmin desc, tie-broken by vec_id). dmin is recomputed from the
    immutable base frame against the current center literals — O(n·k)
    work in the last round and O(n·k²) total, linear in n with a tiny
    constant at coreset-scale k; the alternative (incremental dmin
    carried via localCheckpoint) trades k corpus-sized checkpoint
    writes for the k² factor and wins only when k grows past ~10³.
    Deterministic: distances are per-row float ops (no
    cross-partition sum order anywhere), ties break on vec_id.

    At 100 TB the k sequential full scans are the wrong cost for the
    selection itself — use kcenter_select_sampled (hash-sample ->
    greedy over the sample -> ONE distributed coverage pass over the
    full corpus), the composition q_kcenter_sampled_check gates."""
    return kcenter_select_over(
        spark,
        load_table(spark, sf_dir, "embeddings").select(
            "vec_id", "embedding"
        ),
        k,
    )


def kcenter_select_over(
    spark: SparkSession, frame: DataFrame, k: int = KCENTER_K
) -> tuple[list[tuple[int, int, float]], DataFrame]:
    """The greedy loop over an arbitrary (vec_id, embedding) frame —
    the building block the full-corpus fixture and the sampled
    production path share."""
    e = frame.localCheckpoint()
    first = e.orderBy("vec_id").first()
    if first is None:
        raise ValueError(
            "k-center selection over an empty frame (guard upstream: "
            "a hash-sample bucket can be empty on a tiny corpus)"
        )
    centers: list[tuple[int, list[float]]] = [
        (int(first.vec_id), [float(v) for v in first.embedding])
    ]
    picks: list[tuple[int, int, float]] = [(1, int(first.vec_id), float("nan"))]

    def dmin_col() -> Column:
        dists = [
            F.lit(1.0)
            - cosine_sim(
                F.col("embedding"),
                F.array(*[F.lit(float(v)) for v in emb]),
            )
            for _cid, emb in centers
        ]
        return F.least(*dists) if len(dists) > 1 else dists[0]

    for rank in range(2, k + 1):
        far = (
            e.withColumn("dmin", dmin_col())
            .orderBy(F.col("dmin").desc(), "vec_id")
            .first()
        )
        centers.append((int(far.vec_id), [float(v) for v in far.embedding]))
        picks.append((rank, int(far.vec_id), float(far.dmin)))
    covered = e.withColumn("dmin", dmin_col())
    return picks, covered


def q_kcenter_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The selected coreset: (rank, vec_id, radius) where radius is
    the coverage radius at the moment of selection (the point's
    distance to the previously-selected set; NaN for the seed).
    Rows-only gate (k chained argmaxes are beyond practical SQL); the
    oracle-checked surface is q_kcenter_check."""
    picks, _covered = kcenter_select(spark, sf_dir)
    return spark.createDataFrame(
        [(r, v, round(d, 6) if d == d else None) for r, v, d in picks],
        "rank int, vec_id long, radius double",
    )


def q_kcenter_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORACLE-checked contract of greedy k-center: selection radii are
    nonincreasing (each pick is the farthest remaining point, so the
    uncovered radius can only shrink), the final DISTRIBUTED coverage
    radius max_x min_c d(x, c) is ≤ the last selection radius, and
    the selected centers are mutually ≥ final-radius apart (the
    separation property behind the 2-approximation bound)."""
    import math

    picks, covered = kcenter_select(spark, sf_dir)
    radii = [d for _r, _v, d in picks[1:]]
    monotone = all(
        radii[i + 1] <= radii[i] + 1e-9 for i in range(len(radii) - 1)
    )
    r_final = covered.agg(F.max("dmin")).collect()[0][0]
    e = load_table(spark, sf_dir, "embeddings")
    sel_ids = [v for _r, v, _d in picks]
    sel = {
        int(r.vec_id): np.array(r.embedding, dtype=np.float64)
        for r in e.filter(F.col("vec_id").isin(sel_ids)).collect()
    }
    min_sep = math.inf
    for i, a in enumerate(sel_ids):
        for b in sel_ids[i + 1 :]:
            u, v = sel[a], sel[b]
            cos = float(
                u @ v / (np.linalg.norm(u) * np.linalg.norm(v))
            )
            min_sep = min(min_sep, 1.0 - cos)
    return spark.createDataFrame(
        [
            (
                len(picks),
                bool(monotone),
                bool(r_final <= (radii[-1] if radii else math.inf) + 1e-9),
                bool(min_sep >= r_final - 1e-9),
            )
        ],
        "k int, radii_nonincreasing boolean, covered_by_last_radius boolean, "
        "centers_separated boolean",
    )


ORACLES["q_kcenter_check"] = f"""
    SELECT {KCENTER_K} AS k, true AS radii_nonincreasing,
           true AS covered_by_last_radius, true AS centers_separated
"""

# sample-then-select knobs (VERDICT r07 item 7): the greedy loop runs
# over a hash sample of ~this many rows (mod floor 2), so selection
# cost is k x O(sample) whatever the corpus; the one remaining
# corpus-sized pass is the final coverage radius.
KCENTER_SAMPLE_TARGET = 250


def kcenter_select_sampled(
    spark: SparkSession, sf_dir: str, k: int = KCENTER_K
) -> tuple[list[tuple[int, int, float]], DataFrame, DataFrame, int]:
    """The 100 TB shape of greedy k-center (VERDICT r07 item 7):
    hash-sample the embeddings to ~KCENTER_SAMPLE_TARGET rows
    (deterministic xxhash64 bucket, mod floor 2), run the k-round
    greedy loop over the SAMPLE (k x O(sample) instead of k x
    O(corpus) scans), then compute the coverage radius of the selected
    centers over the FULL corpus in ONE distributed pass — the only
    corpus-sized work left. The classic 2-approximation bound holds on
    the sample; what the full corpus adds is measured, not assumed:
    q_kcenter_sampled_check reports the full-corpus radius against the
    sample's and gates every property that IS guaranteed.

    Returns (picks, covered_sample, covered_full, mod)."""
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    mod = max(2, e.count() // KCENTER_SAMPLE_TARGET)
    sample = e.filter(F.pmod(F.xxhash64(F.col("vec_id")), F.lit(mod)) == 0)
    # ADVICE r08: mod is floored at 2 but membership of bucket 0 is not
    # guaranteed on a tiny corpus — an empty sample would crash the
    # greedy seed lookup. Fall back to the full frame (mod=1, honestly
    # reported so strict_sample reads false downstream).
    if sample.limit(1).count() == 0:
        sample, mod = e, 1
    picks, covered_sample = kcenter_select_over(spark, sample, k)
    # one full-corpus pass: min distance to the k selected centers
    centers = [
        (int(r.vec_id), [float(v) for v in r.embedding])
        for r in covered_sample.filter(
            F.col("vec_id").isin([v for _r, v, _d in picks])
        ).collect()
    ]
    dists = [
        F.lit(1.0)
        - cosine_sim(
            F.col("embedding"), F.array(*[F.lit(float(v)) for v in emb])
        )
        for _cid, emb in centers
    ]
    covered_full = e.withColumn(
        "dmin", F.least(*dists) if len(dists) > 1 else dists[0]
    )
    return picks, covered_sample, covered_full, mod


def q_kcenter_sampled_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORACLE-checked contract of sample-then-select k-center. Gated:
    every property the composition guarantees — selection radii
    nonincreasing, the sample covered by the last selection radius,
    centers mutually >= the sample's final radius apart (all inherited
    from the greedy loop), the FULL-corpus coverage radius >= the
    sample's (set inclusion: the sample is a subset of the corpus),
    and the sample strict (mod >= 2). The full-vs-sample radius RATIO
    has no distribution-free bound — it is what the one corpus pass
    measures — so it is deliberately not a pinned boolean; SCALE.md
    records it as the corpus replicates."""
    import math

    picks, covered_sample, covered_full, mod = kcenter_select_sampled(
        spark, sf_dir
    )
    radii = [d for _r, _v, d in picks[1:]]
    monotone = all(
        radii[i + 1] <= radii[i] + 1e-9 for i in range(len(radii) - 1)
    )
    r_sample = covered_sample.agg(F.max("dmin")).collect()[0][0]
    r_full = covered_full.agg(F.max("dmin")).collect()[0][0]
    sel = {
        int(r.vec_id): np.array(r.embedding, dtype=np.float64)
        for r in covered_sample.filter(
            F.col("vec_id").isin([v for _r, v, _d in picks])
        ).collect()
    }
    sel_ids = [v for _r, v, _d in picks]
    min_sep = math.inf
    for i, a in enumerate(sel_ids):
        for b in sel_ids[i + 1 :]:
            u, v = sel[a], sel[b]
            cos = float(u @ v / (np.linalg.norm(u) * np.linalg.norm(v)))
            min_sep = min(min_sep, 1.0 - cos)
    return spark.createDataFrame(
        [
            (
                len(picks),
                bool(mod >= 2),
                bool(monotone),
                bool(r_sample <= (radii[-1] if radii else math.inf) + 1e-9),
                bool(min_sep >= r_sample - 1e-9),
                bool(r_full >= r_sample - 1e-9),
            )
        ],
        "k int, strict_sample boolean, radii_nonincreasing boolean, "
        "sample_covered_by_last_radius boolean, centers_separated "
        "boolean, full_radius_ge_sample boolean",
    )


ORACLES["q_kcenter_sampled_check"] = f"""
    SELECT {KCENTER_K} AS k, true AS strict_sample,
           true AS radii_nonincreasing,
           true AS sample_covered_by_last_radius,
           true AS centers_separated, true AS full_radius_ge_sample
"""


def save_pq_model(
    spark: SparkSession, path: str, cb: list, subdim: int
) -> None:
    """Persist a trained PQ codebook as a tiny parquet table (m·ksub
    rows) + a _MODEL json sidecar — the model-store step that lets the
    offline trainer and the online encoder be different jobs (at
    100 TB you train once on a sample and encode shards for weeks).
    Atomic: written to a tmp dir and os.replace()d into place."""
    import json
    import os
    import shutil
    import uuid

    tmp = f"{path}.model-{uuid.uuid4().hex[:8]}"
    spark.createDataFrame(
        cb, "block int, code int, cent array<double>"
    ).coalesce(1).write.mode("overwrite").parquet(tmp)
    with open(os.path.join(tmp, "_MODEL"), "w") as f:
        json.dump(
            {
                "kind": "pq",
                "m": max(b for b, _c, _v in cb) + 1,
                "ksub": max(c for _b, c, _v in cb) + 1,
                "subdim": subdim,
            },
            f,
        )
    if os.path.exists(path):
        shutil.rmtree(path)
    os.replace(tmp, path)


def load_pq_model(spark: SparkSession, path: str) -> tuple[list, dict]:
    """Load a persisted PQ codebook: returns (codebook rows sorted by
    (block, code) — bit-identical to what save_pq_model received —
    and the _MODEL metadata)."""
    import json
    import os

    with open(os.path.join(path, "_MODEL")) as f:
        meta = json.load(f)
    rows = (
        spark.read.parquet(path)
        .orderBy("block", "code")
        .collect()
    )
    cb = [(int(r.block), int(r.code), [float(v) for v in r.cent]) for r in rows]
    return cb, meta


def pq_encode_with_model(
    spark: SparkSession, e: DataFrame, cb: list, subdim: int
) -> DataFrame:
    """Encode a (vec_id, embedding) frame against a FIXED codebook —
    the online half of the PQ split (no training jobs): normalize,
    posexplode sub-blocks, one broadcast equi-join on block, one
    min(struct) aggregate. Stateless per row, so it composes with
    streaming ingestion exactly like q_stream_centroid_assign."""
    m = max(b for b, _c, _v in cb) + 1
    norm = e.select(
        "vec_id",
        F.expr(
            "transform(embedding, x -> CAST(x AS DOUBLE)"
            " / sqrt(aggregate(embedding,"
            " CAST(0 AS DOUBLE), (s, v) -> s + CAST(v AS DOUBLE) * v)))"
        ).alias("u"),
    )
    sub = norm.select(
        "vec_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, {m - 1}),"
                f" b -> slice(u, b * {subdim} + 1, {subdim}))"
            )
        ).alias("block", "sv"),
    )
    cb_df = spark.createDataFrame(cb, "block int, code int, cent array<double>")
    scored = sub.join(F.broadcast(cb_df), "block").withColumn(
        "dist",
        F.expr(
            "aggregate(zip_with(sv, cent, (x, y) -> (x - y) * (x - y)),"
            " CAST(0 AS DOUBLE), (s, v) -> s + v)"
        ),
    )
    return (
        scored.groupBy("vec_id", "block")
        .agg(F.min(F.struct("dist", "code")).alias("best"))
        .select("vec_id", "block", F.col("best.code").alias("code"))
    )


def ivfpq_encode_with_model(
    spark: SparkSession,
    e: DataFrame,
    cents: list,
    cb: list,
    subdim: int,
) -> DataFrame:
    """Encode a (vec_id, embedding) frame against a FROZEN IVF-PQ model
    — the online half of the index split (VERDICT r08 #6): assign each
    vector to its nearest coarse cell (broadcast centroid dim), take
    the residual, and code each residual sub-block against the fixed
    PQ codebook. Stateless per row and zero training jobs, so it
    composes with streaming ingestion exactly like
    q_stream_centroid_assign — the shape a production embedding store
    runs (train once, encode/append forever)."""
    m = max(b for b, _c, _v in cb) + 1
    norm = e.select(
        "vec_id",
        F.expr(
            "transform(embedding, x -> CAST(x AS DOUBLE)"
            " / sqrt(aggregate(embedding,"
            " CAST(0 AS DOUBLE), (s, v) -> s + CAST(v AS DOUBLE) * v)))"
        ).alias("u"),
    )
    cdf = spark.createDataFrame(
        [(int(cid), [float(v) for v in c]) for cid, c in cents],
        "cell_id long, cent array<double>",
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.col("cos").desc(), F.col("cell_id")
    )
    assigned = (
        norm.crossJoin(F.broadcast(cdf))
        .withColumn("cos", cosine_sim(F.col("u"), F.col("cent")))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") == 1)
        .select(
            "vec_id",
            "cell_id",
            F.expr("zip_with(u, cent, (x, y) -> x - y)").alias("r"),
        )
    )
    sub = assigned.select(
        "vec_id",
        "cell_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, {m - 1}),"
                f" b -> slice(r, b * {subdim} + 1, {subdim}))"
            )
        ).alias("block", "sv"),
    )
    cb_df = spark.createDataFrame(
        cb, "block int, code int, cent array<double>"
    )
    scored = sub.join(F.broadcast(cb_df), "block").withColumn(
        "dist",
        F.expr(
            "aggregate(zip_with(sv, cent, (x, y) -> (x - y) * (x - y)),"
            " CAST(0 AS DOUBLE), (s, v) -> s + v)"
        ),
    )
    return (
        scored.groupBy("vec_id", "cell_id", "block")
        .agg(F.min(F.struct("dist", "code")).alias("best"))
        .select(
            "vec_id", "cell_id", "block", F.col("best.code").alias("code")
        )
    )


def _ivfpq_streamed_index(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame, list, list, int]:
    """Build the streamed IVF-PQ index (VERDICT r08 #6): train coarse
    centroids + residual codebook ONCE on the seed half of the corpus
    (content-stable xxhash64 bucket), then replay the other half as a
    multi-batch file stream, each batch encoded against the frozen
    model and appended as a batch-id-keyed partition — a foreachBatch
    retry REPLACES its own ``batch=N`` dir, never double-appends
    (the near_dup_fold_batch idiom). Returns (full embeddings frame,
    seed+appended codes, cb, cents, subdim)."""
    import os

    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    seed = e.filter(F.pmod(F.xxhash64(F.col("vec_id")), F.lit(2)) == 0)
    arriving = e.filter(F.pmod(F.xxhash64(F.col("vec_id")), F.lit(2)) != 0)

    codes_seed, cb, cents, subdim = ivfpq_train_encode_over(spark, seed)

    work = replay_workdir("stream_ivfpq")
    idx = os.path.join(work, "codes")
    in_dir = os.path.join(work, "arrive")
    ckpt = os.path.join(work, "ckpt")
    codes_seed.withColumn("batch", F.lit(-1)).write.partitionBy(
        "batch"
    ).mode("overwrite").parquet(idx)
    arriving.repartition(8).write.mode("overwrite").parquet(in_dir)

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        ivfpq_encode_with_model(
            spark, batch_df, cents, cb, subdim
        ).write.mode("overwrite").parquet(
            os.path.join(idx, f"batch={batch_id}")
        )

    from ..streaming import await_or_raise, replay_state_partitions

    with replay_state_partitions(spark):
        q = (
            spark.readStream.schema(arriving.schema)
            .option("maxFilesPerTrigger", "2")  # 8 files -> 4 appends
            .parquet(in_dir)
            .writeStream.foreachBatch(fold)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        try:
            await_or_raise(q, 180)
        finally:
            if q.isActive:
                q.stop()
    codes = spark.read.parquet(idx).select(
        "vec_id", "cell_id", "block", "code", "batch"
    )
    return e, codes, cb, cents, subdim


def q_stream_ivfpq_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming IVF-PQ index maintenance, searched end-to-end: ANN
    top-k over the union of seed codes + streamed appends, using the
    IDENTICAL probe/ADC/re-rank plan as the one-shot q_ivfpq_topk.
    Rows-only gate (engine-specific codes); the oracle-checked
    contract — recall vs brute force after the appends + exact re-rank
    — is q_stream_ivfpq_append_check, and the encode-parity pytest
    pins streamed codes == one-shot frozen-model codes."""
    e, codes, cb, cents, subdim = _ivfpq_streamed_index(spark, sf_dir)
    return _ivfpq_search(
        spark, e, codes.drop("batch"), cb, cents, subdim
    )


def q_stream_ivfpq_append_check(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """ORACLE-checked contract for the streamed IVF-PQ index: recall
    vs brute force above the floor AFTER the appends, exact re-rank
    scores. The model sees only the seed half at train time, so the
    floor sits under the half-trained measurement (measured 0.76 at
    sf0.001, 0.88 at sf0.01 with nprobe=8 of 16 cells — floor 0.4
    holds deterministically with wide margin; fixed data + fixed seed
    split)."""
    return _ann_check(spark, sf_dir, q_stream_ivfpq_append, 0.4)


ORACLES["q_stream_ivfpq_append_check"] = _CHECK_ORACLE


# Appended/seed mass ratio beyond which the frozen seed-trained model
# is declared stale and the index is retrained on the full corpus
# (VERDICT r09 #7): residual codebooks fitted to the seed distribution
# decay silently as appended mass grows — the guard makes the decay
# observable and the rebuild deterministic.
IVFPQ_REBUILD_THRESHOLD = 1.5


def stream_ivfpq_with_drift(
    spark: SparkSession,
    sf_dir: str,
    rebuild_threshold: float = IVFPQ_REBUILD_THRESHOLD,
) -> tuple[DataFrame, dict]:
    """The streamed IVF-PQ index with a DRIFT GUARD: after the appends,
    measure appended/seed vector mass; at or above `rebuild_threshold`
    the seed-trained model is stale — retrain coarse centroids +
    residual codebook on the FULL corpus and re-encode (the offline
    rebuild a production index schedules), else keep serving the
    frozen-model index. Returns (search results, drift info). The two
    counts are cell-count aggregates over the slim codes frame
    (distinct vec_id per batch sign) — driver state is two scalars."""
    e, codes, cb, cents, subdim = _ivfpq_streamed_index(spark, sf_dir)
    row = (
        codes.select("vec_id", "batch")
        .distinct()
        .agg(
            F.count(F.when(F.col("batch") == -1, 1)).alias("n_seed"),
            F.count(F.when(F.col("batch") >= 0, 1)).alias("n_appended"),
        )
        .first()
    )
    ratio = row.n_appended / max(row.n_seed, 1)
    rebuilt = ratio >= rebuild_threshold
    if rebuilt:
        codes_full, cb, cents, subdim = ivfpq_train_encode_over(spark, e)
        search = _ivfpq_search(spark, e, codes_full, cb, cents, subdim)
    else:
        search = _ivfpq_search(
            spark, e, codes.drop("batch"), cb, cents, subdim
        )
    info = {
        "n_seed": row.n_seed,
        "n_appended": row.n_appended,
        "ratio": ratio,
        "rebuild_threshold": rebuild_threshold,
        "rebuilt": rebuilt,
    }
    return search, info


def q_stream_ivfpq_drift_check(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """ORACLE-checked drift contract for the streamed IVF-PQ index
    (VERDICT r09 #7): exposes the appended/seed mass ratio next to the
    recall contract so staleness is observable, and pins the rebuild
    trigger logic:

    - n_indexed — every embedding is in the index exactly once
      (seed + appended partitions cover the corpus);
    - ratio_in_band — the content-stable xxhash64 half-split keeps
      appended/seed mass near 1.0 (deterministic for fixed data);
    - rebuild_due — false at the default 1.5 threshold (the pytest
      forces the true branch with a low threshold and asserts the
      full-corpus retrain actually happens);
    - trigger_consistent — the applied action equals the declared
      decision rule (ratio >= threshold);
    - recall_ok / exact_rerank_ok — the un-rebuilt index still meets
      the append-check floor (0.4) with exact re-rank scores."""
    search, info = stream_ivfpq_with_drift(spark, sf_dir)
    truth = q_ann_topk(spark, sf_dir).select(
        "query_id", "neighbor_id", F.col("cosine").alias("t_cos")
    )
    approx = search.select(
        "query_id", "neighbor_id", F.col("cosine").alias("a_cos")
    )
    hits = approx.join(truth, ["query_id", "neighbor_id"], "inner").agg(
        F.count("*").alias("n_hit"),
        F.max(F.abs(F.col("a_cos") - F.col("t_cos"))).alias("max_dev"),
    )
    total = truth.agg(F.count("*").alias("n_truth"))
    return hits.crossJoin(total).select(
        F.lit(info["n_seed"] + info["n_appended"])
        .cast("long")
        .alias("n_indexed"),
        F.lit(0.5 <= info["ratio"] <= 2.0).alias("ratio_in_band"),
        F.lit(info["rebuilt"]).alias("rebuild_due"),
        F.lit(
            info["rebuilt"] == (info["ratio"] >= info["rebuild_threshold"])
        ).alias("trigger_consistent"),
        (F.col("n_hit") / F.col("n_truth") >= 0.4).alias("recall_ok"),
        (F.coalesce(F.col("max_dev"), F.lit(0.0)) < 1e-9).alias(
            "exact_rerank_ok"
        ),
    )


ORACLES["q_stream_ivfpq_drift_check"] = """
    SELECT CAST(count(*) AS BIGINT) AS n_indexed,
           true AS ratio_in_band,
           false AS rebuild_due,
           true AS trigger_consistent,
           true AS recall_ok,
           true AS exact_rerank_ok
    FROM embeddings
"""


# --- hybrid retrieval: reciprocal rank fusion -------------------------------

RRF_K = 60  # the standard RRF damping constant (Cormack et al. 2009)
RRF_POOL = 50  # per-ranker candidate pool fed into the fusion
RRF_TOP = 20  # fused results returned
RRF_QUERY_VEC = 0  # vec_id of the dense query vector


def q_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: reciprocal rank fusion (Cormack, Clarke &
    Buettcher 2009) of a SPARSE ranker (the Okapi BM25 scorer from
    textops, fixed query-term set) and a DENSE ranker (exact cosine
    against the query embedding, vec_id = RRF_QUERY_VEC) —
    rrf(d) = Σ_r 1/(RRF_K + rank_r(d)) over the rankers that retrieved
    d in their top-RRF_POOL. This is the standard production shape for
    RAG / retrieval curation: two incomparable score scales fused on
    RANKS, so neither needs calibration.

    Scale shape: each ranker reduces to its top-RRF_POOL via
    orderBy().limit() — Spark plans that as TakeOrderedAndProject
    (per-partition heaps + driver merge, one corpus scan each, no
    global sort shuffle). Only then does row_number assign ranks, over
    RRF_POOL rows on a single partition (the unpartitioned window is
    deliberate and bounded — never corpus-sized). The fusion join and
    final top-RRF_TOP run on ≤ 2·RRF_POOL rows. Ranks and fused scores
    order on ROUNDED values with doc_id tiebreaks, so the ranking is
    engine-stable; docs missed by one ranker carry rank 0 (absent) and
    contribute only the other ranker's term."""
    from .textops import q_bm25

    sparse_pool = q_bm25(spark, sf_dir, _spread=False).orderBy(
        F.col("bm25").desc(), "doc_id"
    ).limit(RRF_POOL)
    sparse = sparse_pool.withColumn(
        "r_sparse",
        F.row_number().over(Window.orderBy(F.col("bm25").desc(), "doc_id")),
    ).select("doc_id", "r_sparse")

    e = load_table(spark, sf_dir, "embeddings")
    qv = e.filter(F.col("vec_id") == RRF_QUERY_VEC).select(
        F.col("embedding").alias("q_emb"),
        l2_norm(F.col("embedding")).alias("q_norm"),
    )
    dense_pool = (
        e.filter(F.col("vec_id") != RRF_QUERY_VEC)
        .join(F.broadcast(qv))
        .select(
            F.col("vec_id").alias("doc_id"),
            F.round(
                dot_product(F.col("q_emb"), F.col("embedding"))
                / (F.col("q_norm") * l2_norm(F.col("embedding"))),
                6,
            ).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), "doc_id")
        .limit(RRF_POOL)
    )
    dense = dense_pool.withColumn(
        "r_dense",
        F.row_number().over(Window.orderBy(F.col("cosine").desc(), "doc_id")),
    ).select("doc_id", "r_dense")

    fused = (
        sparse.join(dense, "doc_id", "full_outer")
        .withColumn(
            "rrf",
            F.round(
                F.coalesce(
                    F.lit(1.0) / (F.lit(RRF_K) + F.col("r_sparse")), F.lit(0.0)
                )
                + F.coalesce(
                    F.lit(1.0) / (F.lit(RRF_K) + F.col("r_dense")), F.lit(0.0)
                ),
                6,
            ),
        )
        .select(
            "doc_id",
            F.coalesce("r_sparse", F.lit(0)).alias("r_sparse"),
            F.coalesce("r_dense", F.lit(0)).alias("r_dense"),
            "rrf",
        )
    )
    return fused.orderBy(F.col("rrf").desc(), "doc_id").limit(RRF_TOP)


def _rrf_oracle_sql() -> str:
    # the sparse arm reuses textops' BM25_ORACLE_CTES verbatim — one
    # copy of the BM25 recipe, so a future tokenization/idf fix there
    # cannot silently diverge from this fusion's oracle
    from .textops import BM25_ORACLE_CTES

    return f"""
        WITH {BM25_ORACLE_CTES}, sp AS (
            SELECT doc_id,
                   row_number() OVER (ORDER BY bm25 DESC, doc_id) AS r_sparse
            FROM bm ORDER BY bm25 DESC, doc_id LIMIT {RRF_POOL}
        ), co AS (
            SELECT c.vec_id AS doc_id, {_COS} AS cosine
            FROM embeddings c, embeddings q
            WHERE q.vec_id = {RRF_QUERY_VEC}
              AND c.vec_id <> {RRF_QUERY_VEC}
        ), de AS (
            SELECT doc_id,
                   row_number() OVER (ORDER BY cosine DESC, doc_id) AS r_dense
            FROM co ORDER BY cosine DESC, doc_id LIMIT {RRF_POOL}
        )
        SELECT doc_id,
               coalesce(r_sparse, 0) AS r_sparse,
               coalesce(r_dense, 0) AS r_dense,
               round(coalesce(1.0::DOUBLE / ({RRF_K} + r_sparse), 0)
                     + coalesce(1.0::DOUBLE / ({RRF_K} + r_dense), 0),
                     6) AS rrf
        FROM sp FULL JOIN de USING (doc_id)
        ORDER BY rrf DESC, doc_id LIMIT {RRF_TOP}
    """


ORACLES["q_rrf_fusion"] = _rrf_oracle_sql()


QUERIES = {
    name: fn
    for name, fn in list(globals().items())
    if callable(fn) and name.startswith("q_")
}
