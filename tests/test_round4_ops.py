"""Round-4 operators: BM25 retrieval scoring, corpus heavy hitters,
substring-span dedup, large-star/small-star connected components,
per-domain caps, and stratified fixed-size sampling.

Oracle parity mirrors the driver gate; the star-contraction CC is
additionally stress-tested on a long chain — the exact topology where
the diameter-bound min-label loop needs O(n) rounds and the star
algorithm must stay O(log n)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from .conftest import SF_DIR, assert_matches_oracle


def _q(name):
    import __spark_entry__ as entrymod

    return entrymod.queries()[name]


def _sql(name):
    import __spark_entry__ as entrymod

    return entrymod.oracle_sql()[name]


NEW_ORACLE_CHECKED = [
    "q_bm25",
    "q_heavy_hitters",
    "q_dedup_span",
    "q_dup_clusters_star",
    "q_domain_cap",
    "q_sample_stratified",
    "q_outliers",
    "q_zorder",
    "q_jsonl_roundtrip",
    "q_csv_roundtrip",
    "q_orc_roundtrip",
    "q_unpivot",
    "q_range_window",
    "q_heavy_hitters_sketch_check",
    "q_stream_quality",
    "q_stream_scd2",
    "q_ann_matmul",
    "q_session_window",
    "q_stream_session_window",
    "q_bpe_check",
    "q_gapfill_interp",
    "q_json_variant",
    "q_sample_weighted",
    "q_record_linkage",
    "q_langid_eval",
    "q_hopping_window",
    "q_stream_hopping",
    "q_dedup_plan",
    "q_dedup_containment",
    "q_asof_tolerance",
    "q_stream_dedup_near",
    "q_dist_rank",
    "q_corpus_card",
    "q_pagerank",
    "q_stream_centroid_assign",
    "q_stream_heavy_hitters",
    "q_chunk_cdc",
    "q_table_checksum",
    "q_semdedup_scaled_check",
    "q_bigram_lm",
    "q_pmi_collocations",
    "q_dedup_near_auto_check",
    "q_binaryfile_ingest",
    "q_scd2_lookup",
    "q_stream_join_outer",
]


def test_checksum_is_partition_order_independent(spark, tmp_path):
    """Rewriting the table with a different partitioning/row order must
    not move the checksum; flipping one character must."""
    import timer_pulsar_spark.catalog as catalog
    from timer_pulsar_spark.operators import formats

    base = formats.q_table_checksum(spark, SF_DIR).collect()[0]
    shuffled = (
        catalog.load_table(spark, SF_DIR, "documents")
        .repartition(7)
        .sortWithinPartitions("source")
    )
    corrupted = catalog.load_table(spark, SF_DIR, "documents").withColumn(
        "text",
        F.when(
            F.col("doc_id") == 0, F.concat(F.col("text"), F.lit("x"))
        ).otherwise(F.col("text")),
    )
    orig = catalog.load_table
    try:
        catalog.load_table = lambda s, d, t: shuffled
        formats.load_table = catalog.load_table
        reordered = formats.q_table_checksum(spark, "ignored").collect()[0]
        catalog.load_table = lambda s, d, t: corrupted
        formats.load_table = catalog.load_table
        bad = formats.q_table_checksum(spark, "ignored").collect()[0]
    finally:
        catalog.load_table = orig
        formats.load_table = orig
    assert reordered["checksum"] == base["checksum"]
    assert bad["checksum"] != base["checksum"]
    assert bad["n_rows"] == base["n_rows"]


def test_cdc_chunks_survive_prefix_edit(spark):
    """The content-defined property: inserting tokens at the front of
    a document may change the first chunk(s), but every chunk after
    the next boundary must keep its hash — fixed-stride chunking
    (q_chunk) shifts every window instead. This is why CDC chunk
    hashes stay dedupable across document edits."""
    import timer_pulsar_spark.catalog as catalog
    from timer_pulsar_spark.operators import textops

    base = _q("q_textstats")(spark, SF_DIR)  # just to get a session
    del base
    doc = " ".join(f"tok{i % 97}" for i in range(400))
    edited = "zzz qqq " + doc
    df = spark.createDataFrame(
        [(1, doc), (2, edited)], "doc_id long, text string"
    )
    orig = catalog.load_table
    try:
        catalog.load_table = lambda s, d, t: df
        textops.load_table = catalog.load_table
        rows = textops.q_chunk_cdc(spark, "ignored").collect()
    finally:
        catalog.load_table = orig
        textops.load_table = orig
    h1 = [r["chunk_md5"] for r in rows if r["doc_id"] == 1]
    h2 = [r["chunk_md5"] for r in rows if r["doc_id"] == 2]
    assert len(h1) > 3, "need several chunks for the property to bite"
    # the inserted prefix lands before the first boundary, so chunk 0
    # changes and every later chunk keeps its exact hash and position
    assert len(h1) == len(h2)
    assert h1[0] != h2[0]
    assert h1[1:] == h2[1:]


def test_pagerank_mass_conservation(spark):
    """On a symmetric graph with no dangling nodes, total rank mass
    must stay 1 through every power iteration."""
    got = _q("q_pagerank")(spark, SF_DIR).agg({"rank": "sum"}).collect()[0][0]
    assert abs(got - 1.0) < 1e-3


@pytest.mark.parametrize("name", NEW_ORACLE_CHECKED)
def test_oracle_parity(spark, duck, name):
    assert_matches_oracle(_q(name)(spark, SF_DIR), duck, _sql(name))


def test_star_cc_on_long_chain(spark):
    """A 40-node path graph has diameter 40: min-label propagation
    needs ~40 rounds, large/small-star must label it in its 30-round
    budget (O(log n)) — and every node must get label 0."""
    from timer_pulsar_spark.operators.dedup import connected_components_star

    edges = spark.range(39).select(
        F.col("id").alias("u"), (F.col("id") + 1).alias("v")
    )
    got = {
        (r["node"], r["label"])
        for r in connected_components_star(edges).collect()
    }
    assert got == {(i, 0) for i in range(40)}


def test_star_cc_multiple_components_and_orientation(spark):
    """Components must not merge across gaps, and input edge
    orientation (u<v vs u>v, duplicates, self-loops) must not matter."""
    from timer_pulsar_spark.operators.dedup import connected_components_star

    rows = [(1, 2), (2, 1), (3, 2), (5, 5), (10, 11), (12, 11), (20, 20)]
    edges = spark.createDataFrame(rows, "u long, v long")
    got = {
        (r["node"], r["label"])
        for r in connected_components_star(edges).collect()
    }
    # self-loop-only nodes (5, 20) carry no dedup information and drop out
    assert got == {(1, 1), (2, 1), (3, 1), (10, 10), (11, 10), (12, 10)}


def test_star_cc_matches_min_label_clusters(spark):
    """Both CC algorithms must produce the identical labeling on the
    real near-dup graph."""
    a = _q("q_dup_clusters")(spark, SF_DIR).toPandas()
    b = _q("q_dup_clusters_star")(spark, SF_DIR).toPandas()
    assert a.sort_values("doc_id").reset_index(drop=True).equals(
        b.sort_values("doc_id").reset_index(drop=True)
    )


def test_domain_cap_plan_uses_window_group_limit(spark):
    """The rank<=N filter must push a map-side WindowGroupLimit below
    the shuffle: at 100 TB a hot domain would otherwise funnel its
    entire row set through one reducer before filtering."""
    for name in ("q_domain_cap", "q_sample_stratified"):
        df = _q(name)(spark, SF_DIR)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "WindowGroupLimit" in plan, name
        assert "Partial" in plan, name  # the pre-shuffle local limit


def test_bm25_plan_has_no_shuffle_for_tf(spark):
    """Term frequencies are map-side array expressions; the only
    exchanges allowed are the single-row stats aggregation and its
    broadcast back — never a shuffle keyed on terms or doc ids."""
    df = _q("q_bm25")(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    # only the scalar stats agg (SinglePartition), the presentation
    # sort (rangepartitioning over result rows), and the KEYLESS
    # corpus spread (RoundRobinPartitioning — the r12 single-chain
    # gram-explode fan-out, which carries no key by construction) may
    # exchange — never a shuffle keyed on terms or doc ids
    import re

    shuffles = re.findall(r"(?<![A-Za-z])Exchange (\w+)", plan)  # not BroadcastExchange
    assert all(
        s.rstrip(",") in ("SinglePartition", "RoundRobinPartitioning")
        or s.startswith("rangepartitioning")
        for s in shuffles
    ), shuffles


def test_heavy_hitters_partial_agg_and_takeordered(spark):
    df = _q("q_heavy_hitters")(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan  # top-k, not a global sort
    assert "partial_count" in plan  # map-side combine bounds token skew


def test_zorder_layout_shrinks_rowgroup_bounding_boxes(spark, tmp_path):
    """Writing events sorted by the Morton value must cluster BOTH
    dimensions: the average per-row-group (zx-range x zy-range)
    bounding box must shrink vs the unsorted layout — that area is
    exactly what parquet min/max stats prune on a 2-D range scan."""
    import os

    import pyarrow.parquet as pq

    from timer_pulsar_spark.store import write_zordered

    df = _q("q_zorder")(spark, SF_DIR)
    plain = str(tmp_path / "plain")
    zord = str(tmp_path / "zord")
    df.write.mode("overwrite").parquet(plain)
    write_zordered(df, zord, "zval", n_files=4)

    def avg_box_area(path):
        areas, groups = 0.0, 0
        for f in os.listdir(path):
            if not f.endswith(".parquet"):
                continue
            md = pq.ParquetFile(os.path.join(path, f)).metadata
            for g in range(md.num_row_groups):
                rg = md.row_group(g)
                cols = {
                    rg.column(c).path_in_schema: rg.column(c).statistics
                    for c in range(rg.num_columns)
                }
                zx, zy = cols["zx"], cols["zy"]
                areas += (zx.max - zx.min + 1) * (zy.max - zy.min + 1)
                groups += 1
        return areas / groups

    assert avg_box_area(zord) < avg_box_area(plain) / 2


def test_outlier_rule_flags_planted_extreme(spark):
    """A value 1000 MADs out must be counted as an outlier."""
    from timer_pulsar_spark.operators import analytics

    rows = [("a", float(v)) for v in range(100)] + [("a", 1e7)]
    df = spark.createDataFrame(rows, "event_type string, value double")
    import timer_pulsar_spark.catalog as catalog

    orig = catalog.load_table
    try:
        catalog.load_table = lambda s, d, t: df
        analytics.load_table = catalog.load_table
        got = analytics.q_outliers(spark, "ignored").collect()
    finally:
        catalog.load_table = orig
        analytics.load_table = orig
    assert got[0]["n_outliers"] >= 1 and got[0]["n"] == 101


def test_dedup_span_positions_are_cuttable(spark, duck):
    """Every reported (doc, pos) span must reproduce its md5 from the
    document text — the contract a span-removal pass depends on."""
    import hashlib

    got = _q("q_dedup_span")(spark, SF_DIR).collect()
    assert got, "planted duplicates must produce repeated spans"
    texts = dict(
        duck.execute("SELECT doc_id, text FROM documents").fetchall()
    )
    for r in got[:50]:
        toks = texts[r["doc_id"]].split(" ")
        span = " ".join(toks[r["pos"] : r["pos"] + 8])
        assert hashlib.md5(span.encode()).hexdigest() == r["span_md5"]


def test_stream_scd2_folds_across_multiple_batches(spark):
    """The incremental SCD2 dimension must be built over several real
    micro-batches (8 files at maxFilesPerTrigger=2), not one shot —
    the checkpoint must record multiple committed offsets."""
    from tests.conftest import replay_batch_ids

    out = _q("q_stream_scd2")(spark, SF_DIR)
    assert out.filter("is_current").count() > 0
    batch_ids = replay_batch_ids("stream_scd2")
    assert len(batch_ids) >= 3, f"expected a multi-batch replay, saw {sorted(batch_ids)}"


def test_scd2_fold_retry_is_noop(spark, tmp_path):
    """At-least-once safety of the incremental SCD2 fold: replaying an
    already-applied batch_id (the foreachBatch crash-between-swap-and-
    checkpoint-commit scenario) must leave the dimension byte-for-byte
    identical — including a batch that CONTAINED changes, where the
    fold body alone would re-close the open interval and append
    duplicate rows."""
    from timer_pulsar_spark.operators.analytics import scd2_fold_batch

    dim = str(tmp_path / "dim")

    def batch(rows):
        return spark.createDataFrame(
            rows, "event_id long, ts timestamp_ntz, user_id long, event_type string"
        ).selectExpr("event_id", "CAST(ts AS timestamp_ntz) ts", "user_id", "event_type")

    import datetime as dt

    t = lambda m: dt.datetime(2024, 1, 1, 0, m)
    b0 = batch([(1, t(0), 7, "view"), (2, t(1), 7, "click")])  # has a change
    b1 = batch([(3, t(2), 7, "purchase")])

    def snapshot():
        return sorted(
            map(tuple, spark.read.parquet(dim).collect())
        )

    scd2_fold_batch(spark, dim, b0, 0)
    s0 = snapshot()
    scd2_fold_batch(spark, dim, b0, 0)  # redelivery of a change batch
    assert snapshot() == s0, "retry of an applied batch must be a no-op"

    scd2_fold_batch(spark, dim, b1, 1)
    s1 = snapshot()
    assert s1 != s0  # genuinely new batch applies
    scd2_fold_batch(spark, dim, b1, 1)
    assert snapshot() == s1
    # the dimension is the expected 3-interval history for user 7
    cur = [r for r in s1 if r[4]]
    assert len(cur) == 1 and cur[0][1] == "purchase"
    assert len(s1) == 3


def test_stream_session_window_folds_across_multiple_batches(spark):
    """Native streaming session_window must merge open-session state
    over several real micro-batches (7 files at maxFilesPerTrigger=2)."""
    from tests.conftest import replay_batch_ids

    out = _q("q_stream_session_window")(spark, SF_DIR)
    assert out.count() > 0
    batch_ids = replay_batch_ids("stream_sw")
    assert len(batch_ids) >= 3, f"expected a multi-batch replay, saw {sorted(batch_ids)}"


def test_binaryfile_metadata_projection_skips_content(spark, tmp_path):
    """binaryFile's content column must be pruned away for
    metadata-only projections (ReadSchema excludes it) — at 100 TB a
    listing/length query must never read payload bytes."""
    for i in range(3):
        (tmp_path / f"doc_{i}.bin").write_bytes(b"x" * (100 + i))
    meta_only = (
        spark.read.format("binaryFile")
        .load(str(tmp_path))
        .select("path", "length")
    )
    plan = meta_only._jdf.queryExecution().executedPlan().toString()
    read_schema = plan.split("ReadSchema")[1][:200] if "ReadSchema" in plan else plan
    assert "content" not in read_schema, read_schema
    assert meta_only.count() == 3


def test_scd2_lookup_tie_semantics_planted(spark):
    """The window fold must reproduce the interval algebra on the hard
    cases the fixture may not contain: a probe AT a transition instant
    sees the new state, a zero-length interval (two same-instant
    changes) matches nothing, and a probe before the first change has
    no state."""
    import datetime as dt

    import timer_pulsar_spark.catalog as catalog
    from timer_pulsar_spark.operators import analytics

    t = lambda m: dt.datetime(2024, 1, 1, 0, m)
    # states come from the event types; clicks are probes AND changes
    # (like real event data). The same-instant signup+purchase pair
    # plants a zero-length [2,2) interval.
    df = spark.createDataFrame(
        [
            (1, t(0), 1, "view"),
            (10, t(2), 1, "signup"),     # same-instant pair ->
            (11, t(2), 1, "purchase"),   # [2,2) signup is zero-length
            (20, t(5), 1, "click"),      # probe at 5: state 'click'
                                         # (the click itself is a change)
        ],
        "event_id long, ts timestamp_ntz, user_id long, event_type string",
    )
    orig = catalog.load_table
    try:
        catalog.load_table = lambda s, d, t_: df
        analytics.load_table = catalog.load_table
        got = {
            (r["event_id"], r["state"])
            for r in analytics.q_scd2_lookup(spark, "ignored").collect()
        }
        dim = analytics.q_scd2(spark, "ignored").collect()
    finally:
        catalog.load_table = orig
        analytics.load_table = orig
    # the zero-length interval exists in the dim...
    zero = [r for r in dim if r["valid_from"] == r["valid_to"]]
    assert len(zero) == 1 and zero[0]["state"] == "signup"
    # ...and the probe at its instant resolves to the surviving state
    assert got == {(20, "click")}
