"""The relational read surface — every scan/filter/join/agg/sort/paginate
operator the reference exposes, re-expressed as declarative DataFrame plans.

Reference parity map (SURVEY.md §2, file:line into /root/reference):
- scans + closure predicates  -> gotimer_web/dao/timer/timer.go:42-49,
  dao/task/task.go:30-38; here plain ``read.parquet().filter``
  (Catalyst pushes the predicate into the scan).
- equality / IN / range / point / LIKE filters
  -> dao/task/option.go:10-50, dao/timer/option.go:11-51.
- hash-bucket predicate (timer_id % N == b)
  -> gotimer_web/service/trigger/task.go:42-49.
- semi-join + broadcast dimension lookup
  -> gotimer_web/service/executor/timer.go:41-85.
- COUNT with predicates -> dao/task/task.go:45-52.
- ORDER BY + OFFSET/LIMIT pagination -> dao/task/option.go:52-69,
  vo/base.go:34-47 (page default 1, size default 10).
- client-side re-sort by id -> service/webserver/timer.go:169-171
  (folded into a total ORDER BY here — distributed engines need a
  total order for deterministic pages).

Every function takes (spark, sf_dir) and returns a DataFrame; the paired
DuckDB oracle SQL lives in ORACLES under the same key. Column names are
aliased identically on both sides (driver hash-compares by sorted column
name). Aggregated doubles are rounded on both sides so double summation
order (which legitimately differs between engines) cannot flip the 1e-9
canonical hash.

Scale notes (100 TB design):
- filters/projections are pushed to parquet (verified via
  .explain: PushedFilters / ReadSchema) — see tests/test_plans.py.
- dimension joins broadcast the small side explicitly; fact-fact joins
  shuffle on the join key and rely on AQE for skew.
- no operator collects to the driver.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.timeutil import epoch_micros, epoch_millis
from pyspark.sql.window import Window

from ..catalog import load_table

# ---------------------------------------------------------------------------
# S1/S2 scans + P1-P5 filters
# ---------------------------------------------------------------------------


def q_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[Q-scan] Projected, filtered scan (dao/task/task.go:30-38 analog).

    Column pruning: only 3 of 11 lineitem columns are read; the range
    predicate reaches the parquet reader (row-group skipping at scale).
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= "1995-01-01") & (F.col("l_shipdate") < "1995-07-01")
    ).select("l_orderkey", "l_extendedprice", "l_shipdate")


def q_filter_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[Q-filter-eq] status = ? (dao/task/option.go:40-44)."""
    o = load_table(spark, sf_dir, "orders")
    return o.filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )


def q_filter_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[Q-filter-in] status IN (...) (dao/task/option.go:46-50; the
    reference filters tasks to Running/Successed/Failed,
    service/webserver/task.go:31-35)."""
    e = load_table(spark, sf_dir, "events")
    return e.filter(F.col("event_type").isin("purchase", "signup", "error")).select(
        "event_id", "event_type", "user_id"
    )


def q_filter_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[Q-filter-range] half-open run_timer range (dao/task/option.go:28-38)."""
    e = load_table(spark, sf_dir, "events")
    return e.filter(
        (F.col("ts") >= "2024-01-05 00:00:00") & (F.col("ts") < "2024-01-06 00:00:00")
    ).select("event_id", "ts", "user_id", "event_type")


def q_filter_point(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[Q-filter-point] point lookup by key (dao/timer/option.go:11-15)."""
    c = load_table(spark, sf_dir, "customer")
    return c.filter(F.col("c_custkey") == 42).select("c_custkey", "c_name", "c_mktsegment")


def q_filter_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[Q-filter-like] name LIKE '%fuzzy%' (dao/timer/option.go:47-51)."""
    p = load_table(spark, sf_dir, "part")
    return p.filter(F.col("p_name").like("%blue%")).select("p_partkey", "p_name", "p_brand")


def q_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[Q-bucket] hash-bucket predicate: keep rows with
    timer_id % maxBucket == bucket (gotimer_web/service/trigger/task.go:42-49).
    The reference applies this *post-scan in Go*; here it is a pushable
    column predicate — `%` (sign-preserving) matches both Go's `%` and
    the DuckDB oracle's `%`, so negative keys bucket identically.
    """
    e = load_table(spark, sf_dir, "events")
    return e.filter(F.col("user_id") % 10 == 3).select(
        "event_id", "user_id", "event_type"
    )


# ---------------------------------------------------------------------------
# P8/P9 projections, JSON
# ---------------------------------------------------------------------------


def q_proj(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[Q-proj]+[Q-substr] po->vo projection/rename with the minute key
    LEFT(run_timer,16) (dao/task/sql.go:3, vo/task.go:37-47)."""
    e = load_table(spark, sf_dir, "events")
    return e.select(
        F.col("event_id").alias("task_id"),
        F.substring(F.date_format("ts", "yyyy-MM-dd HH:mm:ss"), 1, 16).alias("minute"),
        F.col("event_type").alias("kind"),
    )


def q_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[Q-json] JSON extract (notify_http_param string <-> struct,
    vo/timer.go:79-93)."""
    e = load_table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k"),
    )


def q_json_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[Q-json, VariantType] the same extraction as q_json through
    Spark 4's VARIANT encoding: parse_json builds the binary
    semi-structured value ONCE per row and variant_get then walks the
    encoded path — with several extractions per row this beats
    get_json_object, which re-tokenizes the source string on every
    call. At 100 TB the variant column is also what you'd persist
    (parquet VARIANT / shredded subcolumns) so the parse cost is paid
    at ingest, not per query. Results must equal the string-path
    twin."""
    e = load_table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.expr("variant_get(parse_json(props), '$.k', 'int')").alias("k"),
    )


def q_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[Q-json] both JSON directions (vo/timer.go:79-93 read,
    114-135 write): construct a JSON document from columns (to_json of
    a struct) then extract the fields back — engine-independent because
    the comparison is on the extracted values, not the serialized
    formatting."""
    e = load_table(spark, sf_dir, "events")
    doc = F.to_json(
        F.struct(F.col("user_id").alias("uid"), F.col("event_type").alias("et"))
    )
    return e.select(
        "event_id",
        F.get_json_object(doc, "$.uid").cast("long").alias("uid"),
        F.get_json_object(doc, "$.et").alias("et"),
    )


def q_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[Q-string] composite-key codec: build "<id>_<unixms>" task keys and
    parse them back (gotimer_web/common/utils/timer.go:12-23,
    service/trigger/worker.go:52-67)."""
    e = load_table(spark, sf_dir, "events")
    keyed = e.select(
        F.concat_ws("_", F.col("user_id"), epoch_millis(e, "ts")).alias("task_key")
    )
    parts = F.split(F.col("task_key"), "_")
    return keyed.select(
        "task_key",
        parts.getItem(0).cast("long").alias("k_id"),
        parts.getItem(1).cast("long").alias("k_unix_ms"),
    )


# ---------------------------------------------------------------------------
# J1-J3 joins
# ---------------------------------------------------------------------------


def q_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[Q-join] tasks-in-window ⨝ enabled timer dimension
    (getTimersByTime, gotimer_web/service/executor/timer.go:70-85).

    The reference does: distinct timer_ids -> WHERE id IN (...) -> hash
    map lookup. Spark-first: inner join with a pre-filtered dimension —
    one scan, no driver round-trip. No forced broadcast hint: customer
    grows with SF, so the build-side strategy is left to
    autoBroadcastJoinThreshold/AQE — broadcast while it fits (it does at
    bench scale), graceful shuffle join at 100 TB instead of an OOM.
    Hints are reserved for truly bounded dims (nation/region/scalars).
    """
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    return (
        o.join(c, o.o_custkey == c.c_custkey, "inner")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 4).alias("total_price"),
        )
    )


def q_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[Q-join] semi-join reduction: rows whose key appears in the dim
    (the reference's distinct-IDs-then-IN pattern,
    gotimer_web/service/executor/timer.go:41-54 + dao/timer/option.go:17-21).
    """
    o = load_table(spark, sf_dir, "orders")
    big = load_table(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 5000).select("c_custkey")
    return o.join(big, o.o_custkey == big.c_custkey, "left_semi").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )


def q_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[Q-anti] dup-check anti-join: drop rows already present in the
    executed set (bloom + status probe,
    gotimer_web/service/executor/woker.go:59-67). Expressed as a
    broadcast left-anti join — Spark 3.3+ can also inject a runtime
    bloom filter for exactly the reference's read-avoidance trick.
    """
    c = load_table(spark, sf_dir, "customer")
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 300000)
        .select("o_custkey")
    )
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name", "c_acctbal"
    )


# ---------------------------------------------------------------------------
# A1-A6 aggregations
# ---------------------------------------------------------------------------


def q_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[Q-count] COUNT(*) with predicates — pagination totals
    (dao/task/task.go:45-52)."""
    e = load_table(spark, sf_dir, "events")
    return e.filter(
        (F.col("event_type") == "purchase") & (F.col("value") > 50)
    ).agg(F.count("*").alias("cnt"))


def q_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[Q-distinct] distinct timer IDs in a window (map-based dedup in the
    reference, gotimer_web/service/executor/timer.go:41-54). Partial
    aggregation makes this a map-side-combined shuffle, not a full sort.
    """
    e = load_table(spark, sf_dir, "events")
    return (
        e.filter((F.col("ts") >= "2024-01-02") & (F.col("ts") < "2024-01-09"))
        .select("user_id")
        .distinct()
    )


def q_distinct_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe distinct count per key: a hot key's whole distinct set
    normally funnels through ONE reducer (partial agg dedups map-side
    but the merge is single-task). Salting on a hash of the *value*
    splits that state 32 ways — identical users share a salt, so
    summing the per-salt distinct counts is exact, not approximate.
    This is the hand-salting pattern the brief's "skewed keys" note
    calls for where AQE can't help (AQE splits skewed join partitions,
    not skewed aggregation state). The HLL twin (approx_count_distinct)
    is the sketch alternative when ±2% error is acceptable."""
    e = load_table(spark, sf_dir, "events")
    partial = e.groupBy(
        "event_type", F.pmod(F.hash("user_id"), F.lit(32)).alias("salt")
    ).agg(F.count_distinct("user_id").alias("part_users"))
    return (
        partial.groupBy("event_type")
        .agg(F.sum("part_users").alias("n_users"))
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    *,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-mitigating shuffle equi-join: each left row gets a
    deterministic salt in [0, n_salts) from its full row hash, the
    right side is replicated once per salt (explode over a sequence —
    one map-side pass, no shuffle to replicate), and the join key
    becomes (key..., salt). A hot left key then spreads across n_salts
    reducers instead of funnelling through one.

    When to use it instead of AQE's skew-join (on by default,
    session.py): AQE splits oversized SORT-MERGE partitions at runtime,
    which covers most cases for free — but it cannot help when the
    downstream stage must keep the key partitioning (stateful ops,
    groupBy on the same key fused into the join stage) or when a
    known-extreme key should never land in one task even transiently.
    Cost is explicit: right-side bytes x n_salts through the shuffle.
    Results are exactly the plain join's (salts agree by construction:
    every left row matches the one right replica carrying its salt) —
    for LEFT-PRESERVING join types only. right/full outer are refused:
    the right side is replicated per salt BEFORE the join, so every
    unmatched right row would surface n_salts times (and right outer
    additionally has its skew on the un-salted side — salt the swapped
    join instead)."""
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi",
               "leftsemi", "left_anti", "leftanti", "cross"}
    if how.lower().replace("_", "") not in {a.replace("_", "") for a in allowed}:
        raise ValueError(
            f"salted_join: join type {how!r} is not equivalence-safe "
            "(unmatched right rows would be emitted once per salt); "
            "use a left-preserving type or swap the sides"
        )
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(n_salts))
    lhs = left.withColumn("__salt", salt.cast("int"))
    rhs = right.select(
        "*",
        F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("__salt"),
    ).withColumn("__salt", F.col("__salt").cast("int"))
    return lhs.join(rhs, [*on, "__salt"], how).drop("__salt")


def q_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[Q-quantile] delay quantiles {.5,.9,.99} per group (Prometheus
    summary, gotimer_web/pkg/promethus/reporter.go:74-83). Exact
    interpolated percentile on both engines (Spark `percentile`,
    DuckDB `quantile_cont`), rounded to survive float canonicalization.
    At 100 TB one would flip to approx_percentile (t-digest) — same call
    shape; tested separately in tests/test_relational.py.
    """
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(value, 0.9)"), 6).alias("p90"),
        F.round(F.expr("percentile(value, 0.99)"), 6).alias("p99"),
    )


def q_quantile_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[Q-quantile] scale variant: approx_percentile — a mergeable
    sketch with bounded memory per group, the only quantile shape that
    survives 100 TB (exact percentile buffers every value per group; a
    hot event_type would OOM an executor).

    The sketch value is engine-specific, so the ORACLE-checked contract
    is the Greenwald-Khanna rank guarantee: each approx quantile must
    lie within the exact value range at quantile ±0.015 (≥3 rank
    positions at the smallest test SF's ~200-row groups; the sketch's
    own bound is ~±1 rank, and Spark's GK is deterministic given the
    data, so the boolean is stable). DuckDB's side is the same groups
    with `true`; the raw estimates stay pytest-gated against the exact
    twin q_quantile."""
    e = load_table(spark, sf_dir, "events")
    checks = []
    for q in (0.5, 0.9, 0.99):
        lo = F.expr(f"percentile(value, greatest(0.0, {q} - 0.015))")
        hi = F.expr(f"percentile(value, least(1.0, {q} + 0.015))")
        approx = F.expr(f"approx_percentile(value, {q})")
        checks.append(
            ((approx >= lo) & (approx <= hi)).alias(f"p{int(q * 100)}_ok")
        )
    return e.groupBy("event_type").agg(*checks)


def q_hash_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[Q-hash] digest parity over composite task keys ("<id>_<unixms>",
    utils/timer.go:12): md5 + sha256, engine-independent hex."""
    e = load_table(spark, sf_dir, "events")
    key = F.concat_ws("_", F.col("user_id"), epoch_millis(e, "ts"))
    return e.select(
        key.alias("task_key"),
        F.md5(key).alias("h_md5"),
        F.sha2(key, 256).alias("h_sha256"),
    )


def q_hash_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[Q-hash] the reference bloom filter's exact two hashes
    (pkg/hash/murmur3.go:14-16 seed-0 murmur3-32; pkg/hash/sha1.go:17-24
    sha1-base32-bigint) and their k=2 bit positions
    (pkg/bloom/fillter.go:10-15, m=2^32). Pure-Python reimplementations
    as Arrow-batched pandas UDFs.

    DuckDB has neither hash, so the oracle is a golden-vector table:
    task keys derived from the fixed 5-row region dimension (identical
    at every SF) with expected values precomputed by the same functions
    that tests/test_api_metrics_hash.py pins against the Go library's
    published test vectors — the oracle checks the full Spark UDF
    machinery reproduces the externally-verified constants. The
    corpus-scale hash path stays driver-verified via q_hash_digest
    (md5/sha256 over all events, full DuckDB oracle)."""
    from ..functions.hashing import murmur3_32_udf, sha1_uint64_udf

    r = load_table(spark, sf_dir, "region")
    key = F.concat_ws("_", F.col("r_name"), F.lit(1704067200000))
    m = F.lit(1 << 32).cast("long")
    keyed = r.select(key.alias("task_key")).withColumn(
        "h_murmur3", murmur3_32_udf(F.col("task_key"))
    ).withColumn("h_sha1_64", sha1_uint64_udf(F.col("task_key")))
    return keyed.select(
        "task_key",
        "h_murmur3",
        "h_sha1_64",
        F.pmod(F.col("h_murmur3"), m).alias("bloom_bit1"),
        F.pmod(F.col("h_sha1_64"), m).alias("bloom_bit2"),
    )


# ---------------------------------------------------------------------------
# O1-O4 sorts / limits / pagination
# ---------------------------------------------------------------------------


def q_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[Q-sort]+top-k: ORDER BY run_timer DESC limit N
    (dao/task/option.go:52-62). Spark executes limit+sort as TakeOrdered
    (per-partition top-N then merge) — no global sort at scale.
    """
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .select("o_orderkey", "o_totalprice")
        .limit(100)
    )


def q_paginate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[Q-paginate] OFFSET/LIMIT page (page=3, size=10 over the dim table;
    dao/task/option.go:65-69, defaults vo/base.go:34-47). Total order on
    the primary key — the reference re-sorts pages by id client-side
    (service/webserver/timer.go:169-171); a distributed engine needs the
    total order stated up front for deterministic pages.
    """
    p = load_table(spark, sf_dir, "part")
    return (
        p.orderBy(F.col("p_retailprice").desc(), F.col("p_partkey"))
        .select("p_partkey", "p_name", "p_retailprice")
        .offset(20)
        .limit(10)
    )


def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer segment — the row_number() form that
    distributed pagination takes (SURVEY.md §2.5)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    j = o.join(c, o.o_custkey == c.c_custkey)
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        j.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("c_mktsegment", "rn", "o_orderkey", "o_totalprice")
    )


# ---------------------------------------------------------------------------
# flagship analytical queries (bench headliners)
# ---------------------------------------------------------------------------


def tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 pricing summary — the engine's flagship batch aggregation:
    2 group cols, 8 aggregates, fully map-side-combinable (partial+final
    hash agg; whole-stage codegen end to end)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("sum_disc_price"),
            F.round(
                F.sum(
                    F.col("l_extendedprice")
                    * (1 - F.col("l_discount"))
                    * (1 + F.col("l_tax"))
                ),
                4,
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 forecasting revenue change — the pure filter+scalar-agg
    shape: every predicate pushes to the scan, zero shuffles beyond the
    single partial/final agg exchange."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1994-01-01")
            & (F.col("l_shipdate") < "1995-01-01")
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 4).alias(
                "revenue"
            )
        )
    )


def tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shipping priority — broadcast dim (customer) + shuffled
    fact-fact join (orders⨝lineitem) + top-10; the canonical
    join-then-agg shape for the bench."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1995-03-15")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1995-03-15")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


def tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 order-priority checking (adapted: the testdata lineitem
    has no commitdate/receiptdate, so "late" = shipped more than 60 days
    after the order date). EXISTS lowers to a left-semi join with a
    mixed equi + range condition; the quarter filter pushes to the
    orders scan before the join."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-04-01")
    )
    li = load_table(spark, sf_dir, "lineitem")
    late = o.join(
        li,
        (o.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > F.expr("o_orderdate + INTERVAL 60 DAYS")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


def tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 local-supplier volume: the 6-way join (lineitem ⨝ orders
    ⨝ customer ⨝ supplier ⨝ nation ⨝ region) with the c_nationkey =
    s_nationkey locality condition. nation/region are constant-size ->
    explicit broadcast; the fact-fact joins shuffle on their keys and
    Catalyst/AQE pick the order. Declared declaratively so join
    reordering stays the optimizer's job."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    j = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    return (
        j.groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc())
    )


def tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (adapted: testdata has no l_shipmode, so the
    group key is l_returnflag): conditional aggregation — CASE WHEN
    inside SUM splits high/low-priority line counts in one pass, the
    partial+final agg keeps it one shuffle."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    o = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH").cast("long")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(high).alias("high_line_count"),
            F.sum(1 - high).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


def tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 promotion effect: broadcast dim join (part) + a ratio
    of two conditional sums collapsed into a single scalar aggregate."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-09-01") & (F.col("l_shipdate") < "1997-10-01")
    )
    p = load_table(spark, sf_dir, "part")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", disc_price).otherwise(F.lit(0.0))
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .agg(
            F.round(100 * F.sum(promo) / F.sum(disc_price), 6).alias("promo_revenue")
        )
    )


def tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 large-volume customers: aggregate-then-join — the
    HAVING filter shrinks lineitem to a handful of hot orders *before*
    any join, so the surviving side is broadcast and the big tables are
    never shuffled against each other."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("qty_raw"))
        .filter(F.col("qty_raw") > 250)
        .select("l_orderkey", F.round(F.col("qty_raw"), 4).alias("sum_qty"))
    )
    return (
        o.join(big, o.o_orderkey == big.l_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice", "sum_qty"
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
    )


def tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 top supplier — aggregate reuse: the quarterly revenue
    aggregate feeds both the supplier join and the scalar max. Declared
    once and referenced twice; Spark caches nothing here but Catalyst
    dedups the subplan into a ReusedExchange under AQE, so the heavy
    lineitem aggregation runs once."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    s = load_table(spark, sf_dir, "supplier")
    revenue = li.groupBy("l_suppkey").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
            "total_rev"
        )
    )
    max_rev = revenue.agg(F.max("total_rev").alias("max_rev"))
    return (
        revenue.crossJoin(F.broadcast(max_rev))
        .filter(F.col("total_rev") == F.col("max_rev"))
        .join(s, F.col("l_suppkey") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_rev")
    )


def tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 customer order-count distribution — the engine's LEFT
    OUTER JOIN shape: customers with zero matching orders must survive
    with count 0, so the join condition (priority filter) lives in the
    join, not a WHERE. Two aggregations, both map-side combinable."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    j = c.join(
        o,
        (c.c_custkey == o.o_custkey) & (o.o_orderpriority != "5-LOW"),
        "left_outer",
    )
    per_cust = j.groupBy("c_custkey").agg(F.count("o_orderkey").alias("c_count"))
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


def tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 small-quantity-order revenue — the correlated scalar
    subquery (per-part average quantity) decorrelated by hand into an
    aggregate + broadcast join: the per-part threshold dim is |parts|
    rows of 2 columns, broadcast to every lineitem partition, so the
    big table is scanned twice but never shuffled."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#23") & (F.col("p_type") == "MEDIUM")
    )
    thresh = li.groupBy("l_partkey").agg(
        (F.avg("l_quantity") * 0.2).alias("qty_cap")
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(thresh, "l_partkey")
        .filter(F.col("l_quantity") < F.col("qty_cap"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 4).alias("avg_yearly"))
    )


def tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 global sales opportunity (adapted: no c_phone column,
    so the country code is c_nationkey, and every testdata customer has
    orders, so the anti-join target is *urgent* orders): scalar
    aggregate subquery (global average balance) + anti-join. The scalar
    is a 1-row broadcast; the anti-join shuffles on custkey once."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    rich = (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
    )
    return (
        rich.groupBy(F.col("c_nationkey").alias("cntrycode"))
        .agg(
            F.count("*").alias("numcust"),
            F.round(F.sum("c_acctbal"), 4).alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )


def tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 volume shipping: two roles of the same dimension
    (supplier nation vs customer nation) with a symmetric pair filter.
    supplier/nation broadcast; lineitem⨝orders is the only fact-fact
    shuffle, and the pair predicate prunes before the aggregate."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1995-01-01") & (F.col("l_shipdate") <= "1996-12-31")
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    n1 = n.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    j = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .filter(
            (
                (F.col("supp_nation") == "NATION_1")
                & (F.col("cust_nation") == "NATION_2")
            )
            | (
                (F.col("supp_nation") == "NATION_2")
                & (F.col("cust_nation") == "NATION_1")
            )
        )
    )
    return (
        j.withColumn("l_year", F.year("l_shipdate"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


def tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 national market share: the widest join in the suite
    (lineitem ⨝ orders ⨝ customer ⨝ supplier ⨝ part ⨝ nation×2 ⨝
    region) feeding a conditional-sum ratio per year. Dims broadcast;
    the p_type filter prunes lineitem through the part join before the
    fact-fact shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1995-01-01") & (F.col("o_orderdate") <= "1996-12-31")
    )
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n1 = n.select(F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey"))
    n2 = n.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("nation")
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    j = (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("c_nk"))
        .join(F.broadcast(r), F.col("n_regionkey") == r.r_regionkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("s_nk"))
    )
    return (
        j.withColumn("o_year", F.year("o_orderdate"))
        .groupBy("o_year")
        .agg(
            F.round(
                F.sum(F.when(F.col("nation") == "NATION_3", vol).otherwise(0.0))
                / F.sum(vol),
                6,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


def tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 product-type profit (adapted: the testdata has no
    partsupp, so supply cost is modeled as 0.5 × p_retailprice ×
    quantity): LIKE-filtered part dim broadcast into the fact, profit
    aggregated by supplier nation × order year."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    s = load_table(spark, sf_dir, "supplier")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    n = load_table(spark, sf_dir, "nation")
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - 0.5 * F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    j = (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
    )
    return (
        j.select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
            amount.alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(F.round(F.sum("amount"), 4).alias("sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


def tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 returned-item reporting: quarter of orders × returned
    lines, revenue per customer, top 20 — join-heavy with a high-
    cardinality group key (custkey), the classic shuffle-agg + TakeOrdered
    shape."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1995-10-01") & (F.col("o_orderdate") < "1996-01-01")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


def tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 supplier-part relationship count (adapted: no partsupp
    table, so lineitem is the part↔supplier bridge, and the excluded
    "complaint" suppliers are those with negative balance): NOT-IN
    subquery lowered to a broadcast anti-join, then COUNT(DISTINCT)
    over a 3-column group — Spark expands distinct-agg to a two-level
    aggregate, both levels partial."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5")
        & (F.col("p_size").isin(1, 4, 9, 14, 19, 24, 29, 34))
    )
    bad_s = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(bad_s, li.l_suppkey == bad_s.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(
            F.col("supplier_cnt").desc(),
            F.col("p_brand"),
            F.col("p_type"),
            F.col("p_size"),
        )
    )


def tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 discounted revenue (adapted: container/shipmode are
    absent, so the disjunct arms pair brand with size and quantity
    bands): the OR-of-ANDs predicate across two tables — Catalyst keeps
    the join an equi-join on partkey and evaluates the residual
    disjunction post-join; the common p_partkey IN side-push still
    prunes the scan."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    j = li.join(p, li.l_partkey == p.p_partkey)
    arm1 = (
        (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 11)
    )
    arm2 = (
        (F.col("p_brand") == "Brand#13")
        & F.col("p_size").between(1, 25)
        & F.col("l_quantity").between(10, 20)
    )
    arm3 = (
        (F.col("p_brand") == "Brand#23")
        & F.col("p_size").between(1, 35)
        & F.col("l_quantity").between(20, 30)
    )
    return j.filter(arm1 | arm2 | arm3).agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
        ).alias("revenue")
    )


def tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 minimum-cost supplier (adapted: no partsupp table, so
    supply cost is derived from lineitem as the cheapest observed unit
    price per (part, supplier) pair). The correlated MIN subquery is
    decorrelated into a per-part minimum dim broadcast back onto the
    candidate rows — the classic argmin-per-group shape with no
    re-shuffle of the big side. Region restriction flows supplier →
    nation → region through two broadcast hops."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_size") == 15) & (F.col("p_type") == "LARGE")
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eligible_supp = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    cost = (
        li.join(p.select("p_partkey", "p_name"), li.l_partkey == F.col("p_partkey"))
        .join(eligible_supp, li.l_suppkey == F.col("s_suppkey"))
        .groupBy("p_partkey", "p_name", "s_suppkey", "s_name", "s_acctbal", "n_name")
        .agg(F.round(F.min(F.col("l_extendedprice") / F.col("l_quantity")), 4).alias("supply_cost"))
    )
    min_cost = cost.groupBy(F.col("p_partkey").alias("mc_partkey")).agg(
        F.min("supply_cost").alias("min_cost")
    )
    return (
        cost.join(
            min_cost,
            (cost.p_partkey == F.col("mc_partkey"))
            & (cost.supply_cost == F.col("min_cost")),
        )
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name", "supply_cost")
        .orderBy(
            F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey"
        )
        .limit(100)
    )


def tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 important stock (adapted: part value in a nation is the
    total lineitem revenue supplied by that nation's suppliers, standing
    in for supplycost*availqty). The HAVING > scalar-subquery shape:
    the national total is a 1-row aggregate cross-joined (broadcast)
    into the per-part HAVING filter, so the heavy aggregation runs once
    and the global total is derived from a second pass over the same
    shuffled data (ReusedExchange under AQE)."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_9")
    nat_supp = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).select("s_suppkey")
    nat_li = li.join(nat_supp, li.l_suppkey == F.col("s_suppkey"))
    per_part = nat_li.groupBy("l_partkey").agg(
        F.sum("l_extendedprice").alias("part_value")
    )
    total = per_part.agg((F.sum("part_value") * 0.001).alias("threshold"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("part_value") > F.col("threshold"))
        .select("l_partkey", F.round("part_value", 4).alias("part_value"))
        .orderBy(F.col("part_value").desc(), "l_partkey")
    )


def tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 potential part promotion (adapted: availability is
    derived from shipped volume — a supplier qualifies for a part when
    it shipped more than 20% of that part's 1996 volume). Nested
    decorrelation: per-(part,supplier) quantity vs a per-part total,
    both from one aggregation tree; `5*pair > total` keeps the
    comparison exact for integral quantities. Qualifying suppliers are
    then a semi-join target (EXISTS), never multiplied out."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("small%"))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    pair_qty = (
        li.join(p.select("p_partkey"), li.l_partkey == F.col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("pair_qty"))
    )
    part_total = pair_qty.groupBy(F.col("l_partkey").alias("pt_partkey")).agg(
        F.sum("pair_qty").alias("part_qty")
    )
    qualifying = (
        pair_qty.join(part_total, pair_qty.l_partkey == F.col("pt_partkey"))
        .filter(F.col("pair_qty") * 5 > F.col("part_qty"))
        .select("l_suppkey")
        .distinct()
    )
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .join(qualifying, s.s_suppkey == F.col("l_suppkey"), "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


def tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 suppliers who kept orders waiting (adapted: no
    receipt/commit dates, so the "late" signal is a returned lineitem —
    a supplier is blamed for a finished multi-supplier order when it is
    the ONLY supplier whose lineitem came back 'R'). The EXISTS /
    NOT-EXISTS pair is decorrelated into per-order distinct-supplier
    counts (total and returned) computed in one aggregation, then joined
    back onto the returned lineitems (order-count-scaled, so no forced
    broadcast — AQE picks broadcast while it fits)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    s = load_table(spark, sf_dir, "supplier")
    f_li = li.join(
        o.select("o_orderkey"), li.l_orderkey == F.col("o_orderkey")
    )
    order_dim = f_li.groupBy("l_orderkey").agg(
        F.count_distinct("l_suppkey").alias("n_supp"),
        F.count_distinct(
            F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
        ).alias("n_r_supp"),
    )
    blamed = (
        f_li.filter(F.col("l_returnflag") == "R")
        .join(
            order_dim.filter((F.col("n_supp") > 1) & (F.col("n_r_supp") == 1)),
            "l_orderkey",
        )
        .groupBy("l_suppkey")
        .agg(F.count_distinct("l_orderkey").alias("numwait"))
    )
    return (
        blamed.join(s, blamed.l_suppkey == s.s_suppkey)
        .select("s_name", "numwait")
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )


def q_runtime_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime bloom-filter join pruning — the semi-join reduction
    that keeps a 100 TB fact scan from shuffling rows a selective dim
    filter is about to discard: Spark's InjectRuntimeFilter builds a
    bloom over the filtered orders keys and pushes
    bloom_filter_might_contain(l_orderkey) beneath the lineitem
    shuffle, so ~4/5 of the fact rows (the non-URGENT orders' lines)
    die at the scan instead of crossing the wire.

    The optimization is conf-gated by size thresholds tuned for real
    clusters: the application side must scan >= 10 GiB (crossed
    trivially at 100 TB, never by the local testdata), so this query
    scopes the threshold down — and disables broadcast, as a 100 TB
    plan would — to produce locally the exact plan shape a cluster
    gets for free. The scoped confs are restored before returning;
    the join MATERIALIZES inside the scope (localCheckpoint) because
    runtime-filter injection happens at physical-planning time, not
    DataFrame-construction time. tests/test_plans.py gates the
    bloom_filter_agg / might_contain pair in the executed plan."""
    with runtime_filter_scope(spark):
        return _runtime_filter_join(spark, sf_dir).localCheckpoint()


@contextmanager
def runtime_filter_scope(spark: SparkSession):
    """Conf scope reproducing the 100 TB planning regime locally: the
    application-side size gate at 0 (a real fact table crosses the
    10 GiB default on its own) and broadcast off (a real filtered dim
    is past broadcast size). Restored on exit; also entered by the
    plan gate in tests/test_plans.py."""
    prev = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "0",
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        yield
    finally:
        for k, v in prev.items():
            spark.conf.set(k, v)


def _runtime_filter_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("cnt"),
            F.round(F.sum("l_extendedprice"), 2).alias("revenue"),
        )
    )


# ---------------------------------------------------------------------------
# DuckDB oracle SQL (same aliases, same rounding)
# ---------------------------------------------------------------------------

ORACLES: dict[str, str] = {
    "q_runtime_filter": """
        SELECT o_orderpriority, count(*) AS cnt,
               round(sum(l_extendedprice), 2) AS revenue
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE o_orderpriority = '1-URGENT'
        GROUP BY o_orderpriority
    """,
    "q_scan": """
        SELECT l_orderkey, l_extendedprice, l_shipdate
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_shipdate < TIMESTAMP '1995-07-01'
    """,
    "q_filter_eq": """
        SELECT o_orderkey, o_custkey, o_totalprice FROM orders WHERE o_orderstatus = 'F'
    """,
    "q_filter_in": """
        SELECT event_id, event_type, user_id FROM events
        WHERE event_type IN ('purchase', 'signup', 'error')
    """,
    "q_filter_range": """
        SELECT event_id, ts, user_id, event_type FROM events
        WHERE ts >= TIMESTAMP '2024-01-05 00:00:00' AND ts < TIMESTAMP '2024-01-06 00:00:00'
    """,
    "q_filter_point": """
        SELECT c_custkey, c_name, c_mktsegment FROM customer WHERE c_custkey = 42
    """,
    "q_filter_like": """
        SELECT p_partkey, p_name, p_brand FROM part WHERE p_name LIKE '%blue%'
    """,
    "q_bucket": """
        SELECT event_id, user_id, event_type FROM events WHERE user_id % 10 = 3
    """,
    "q_proj": """
        SELECT event_id AS task_id,
               substr(strftime(ts, '%Y-%m-%d %H:%M:%S'), 1, 16) AS minute,
               event_type AS kind
        FROM events
    """,
    "q_json": """
        SELECT event_id, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k FROM events
    """,
    # same truth through the VARIANT path
    "q_json_variant": """
        SELECT event_id, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k FROM events
    """,
    "q_json_roundtrip": """
        SELECT event_id,
               CAST(json_extract_string(json_object('uid', user_id, 'et', event_type),
                                        '$.uid') AS BIGINT) AS uid,
               json_extract_string(json_object('uid', user_id, 'et', event_type),
                                   '$.et') AS et
        FROM events
    """,
    "q_string": """
        SELECT user_id || '_' || epoch_ms(ts) AS task_key,
               CAST(string_split(user_id || '_' || epoch_ms(ts), '_')[1] AS BIGINT) AS k_id,
               CAST(string_split(user_id || '_' || epoch_ms(ts), '_')[2] AS BIGINT) AS k_unix_ms
        FROM events
    """,
    "q_join": """
        SELECT c_mktsegment, count(*) AS n_orders, round(sum(o_totalprice), 4) AS total_price
        FROM orders JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
        GROUP BY c_mktsegment
    """,
    "q_semi": """
        SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        WHERE EXISTS (SELECT 1 FROM customer
                      WHERE c_custkey = o_custkey AND c_acctbal > 5000)
    """,
    "q_anti": """
        SELECT c_custkey, c_name, c_acctbal FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey AND o_totalprice > 300000)
    """,
    "q_count": """
        SELECT count(*) AS cnt FROM events WHERE event_type = 'purchase' AND value > 50
    """,
    "q_distinct": """
        SELECT DISTINCT user_id FROM events
        WHERE ts >= TIMESTAMP '2024-01-02' AND ts < TIMESTAMP '2024-01-09'
    """,
    "q_distinct_salted": """
        SELECT event_type, count(DISTINCT user_id) AS n_users
        FROM events GROUP BY event_type
    """,
    "q_quantile": """
        SELECT event_type,
               round(quantile_cont(value, 0.5), 6) AS p50,
               round(quantile_cont(value, 0.9), 6) AS p90,
               round(quantile_cont(value, 0.99), 6) AS p99
        FROM events GROUP BY event_type
    """,
    "q_hash_digest": """
        SELECT user_id || '_' || epoch_ms(ts) AS task_key,
               md5(user_id || '_' || epoch_ms(ts)) AS h_md5,
               sha256(user_id || '_' || epoch_ms(ts)) AS h_sha256
        FROM events
    """,
    # assertion-form oracle: the GK rank-bound check must hold per group
    "q_quantile_approx": """
        SELECT event_type,
               true AS p50_ok, true AS p90_ok, true AS p99_ok
        FROM events GROUP BY event_type
    """,
    # golden vectors: precomputed by the pinned (externally test-vectored)
    # murmur3/sha1-base32 implementations over the fixed region keys
    "q_hash_bloom": """
        SELECT task_key,
               CAST(h_murmur3 AS BIGINT) AS h_murmur3,
               CAST(h_sha1_64 AS BIGINT) AS h_sha1_64,
               CAST(bloom_bit1 AS BIGINT) AS bloom_bit1,
               CAST(bloom_bit2 AS BIGINT) AS bloom_bit2
        FROM (VALUES
            ('AFRICA_1704067200000', 2671156855, -3696705503578598171, 2671156855, 871847141),
            ('AMERICA_1704067200000', 2257639622, -7785231985294518750, 2257639622, 3733116450),
            ('ASIA_1704067200000', 1896406616, 4839196299467085463, 1896406616, 740218519),
            ('EUROPE_1704067200000', 2727558720, -4296762114062251801, 2727558720, 1526106343),
            ('MIDDLE EAST_1704067200000', 1174169336, 4334550638762498831, 1174169336, 744594191)
        ) AS t(task_key, h_murmur3, h_sha1_64, bloom_bit1, bloom_bit2)
    """,
    "q_sort": """
        SELECT o_orderkey, o_totalprice FROM orders
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 100
    """,
    "q_paginate": """
        SELECT p_partkey, p_name, p_retailprice FROM part
        ORDER BY p_retailprice DESC, p_partkey LIMIT 10 OFFSET 20
    """,
    "q_topk_per_group": """
        SELECT c_mktsegment, rn, o_orderkey, o_totalprice FROM (
            SELECT c_mktsegment, o_orderkey, o_totalprice,
                   row_number() OVER (PARTITION BY c_mktsegment
                                      ORDER BY o_totalprice DESC, o_orderkey) AS rn
            FROM orders JOIN customer ON o_custkey = c_custkey
        ) WHERE rn <= 3
    """,
    "tpch_q1": """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 4) AS sum_qty,
               round(sum(l_extendedprice), 4) AS sum_base_price,
               round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
               round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 4) AS sum_charge,
               round(avg(l_quantity), 6) AS avg_qty,
               round(avg(l_extendedprice), 6) AS avg_price,
               round(avg(l_discount), 6) AS avg_disc,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    "tpch_q6": """
        SELECT round(sum(l_extendedprice * l_discount), 4) AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1994-01-01'
          AND l_shipdate < TIMESTAMP '1995-01-01'
          AND l_discount >= 0.05 AND l_discount <= 0.07
          AND l_quantity < 24
    """,
    "tpch_q3": """
        SELECT l_orderkey, o_orderdate, o_orderpriority,
               round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1995-03-15'
          AND l_shipdate > TIMESTAMP '1995-03-15'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, l_orderkey LIMIT 10
    """,
    "tpch_q4": """
        SELECT o_orderpriority, count(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1996-04-01'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey
                        AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
    "tpch_q5": """
        SELECT n_name,
               round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1997-01-01'
        GROUP BY n_name
        ORDER BY revenue DESC
    """,
    "tpch_q12": """
        SELECT l_returnflag,
               CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
    "tpch_q14": """
        SELECT round(100 * sum(CASE WHEN p_type = 'PROMO'
                                    THEN l_extendedprice * (1 - l_discount)
                                    ELSE 0 END)
                     / sum(l_extendedprice * (1 - l_discount)), 6) AS promo_revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1997-09-01'
          AND l_shipdate < TIMESTAMP '1997-10-01'
    """,
    "tpch_q18": """
        SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
               round(qty_raw, 4) AS sum_qty
        FROM (SELECT l_orderkey, sum(l_quantity) AS qty_raw
              FROM lineitem GROUP BY l_orderkey
              HAVING sum(l_quantity) > 250) big
        JOIN orders ON o_orderkey = big.l_orderkey
        JOIN customer ON c_custkey = o_custkey
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 100
    """,
    "tpch_q15": """
        WITH revenue AS (
            SELECT l_suppkey, round(sum(l_extendedprice * (1 - l_discount)), 4) AS total_rev
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1996-04-01'
            GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, total_rev
        FROM supplier JOIN revenue ON s_suppkey = l_suppkey
        WHERE total_rev = (SELECT max(total_rev) FROM revenue)
    """,
    "tpch_q13": """
        SELECT c_count, count(*) AS custdist FROM (
            SELECT c_custkey, count(o_orderkey) AS c_count
            FROM customer LEFT OUTER JOIN orders
              ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
            GROUP BY c_custkey
        ) GROUP BY c_count
        ORDER BY custdist DESC, c_count DESC
    """,
    "tpch_q17": """
        SELECT round(sum(l_extendedprice) / 7.0, 4) AS avg_yearly
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        WHERE p_brand = 'Brand#23' AND p_type = 'MEDIUM'
          AND l_quantity < (SELECT 0.2 * avg(l_quantity)
                            FROM lineitem l2 WHERE l2.l_partkey = part.p_partkey)
    """,
    "tpch_q22": """
        SELECT c_nationkey AS cntrycode, count(*) AS numcust,
               round(sum(c_acctbal), 4) AS totacctbal
        FROM customer
        WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
          AND NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey
                            AND o_orderpriority = '1-URGENT')
        GROUP BY c_nationkey
        ORDER BY cntrycode
    """,
    "tpch_q7": """
        SELECT supp_nation, cust_nation, l_year, round(sum(volume), 4) AS revenue
        FROM (
            SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                   year(l_shipdate) AS l_year,
                   l_extendedprice * (1 - l_discount) AS volume
            FROM lineitem
            JOIN orders   ON l_orderkey = o_orderkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation n1 ON s_nationkey = n1.n_nationkey
            JOIN nation n2 ON c_nationkey = n2.n_nationkey
            WHERE l_shipdate BETWEEN DATE '1995-01-01' AND DATE '1996-12-31'
              AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
                OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        )
        GROUP BY supp_nation, cust_nation, l_year
        ORDER BY supp_nation, cust_nation, l_year
    """,
    "tpch_q8": """
        SELECT o_year,
               round(sum(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END)
                     / sum(volume), 6) AS mkt_share
        FROM (
            SELECT year(o_orderdate) AS o_year,
                   l_extendedprice * (1 - l_discount) AS volume,
                   n2.n_name AS nation
            FROM lineitem
            JOIN part     ON l_partkey = p_partkey
            JOIN orders   ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation n1 ON c_nationkey = n1.n_nationkey
            JOIN region   ON n1.n_regionkey = r_regionkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation n2 ON s_nationkey = n2.n_nationkey
            WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
              AND o_orderdate BETWEEN DATE '1995-01-01' AND DATE '1996-12-31'
        )
        GROUP BY o_year
        ORDER BY o_year
    """,
    "tpch_q9": """
        SELECT nation, o_year, round(sum(amount), 4) AS sum_profit
        FROM (
            SELECT n_name AS nation, year(o_orderdate) AS o_year,
                   l_extendedprice * (1 - l_discount)
                   - 0.5 * p_retailprice * l_quantity AS amount
            FROM lineitem
            JOIN part     ON l_partkey = p_partkey
            JOIN orders   ON l_orderkey = o_orderkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation   ON s_nationkey = n_nationkey
            WHERE p_name LIKE '%red%'
        )
        GROUP BY nation, o_year
        ORDER BY nation, o_year DESC
    """,
    "tpch_q10": """
        SELECT c_custkey, c_name, c_acctbal, n_name,
               round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        WHERE o_orderdate >= DATE '1995-10-01' AND o_orderdate < DATE '1996-01-01'
          AND l_returnflag = 'R'
        GROUP BY c_custkey, c_name, c_acctbal, n_name
        ORDER BY revenue DESC, c_custkey
        LIMIT 20
    """,
    "tpch_q16": """
        SELECT p_brand, p_type, p_size,
               count(DISTINCT l_suppkey) AS supplier_cnt
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        WHERE p_brand <> 'Brand#5'
          AND p_size IN (1, 4, 9, 14, 19, 24, 29, 34)
          AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        GROUP BY p_brand, p_type, p_size
        ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
    "tpch_q19": """
        SELECT round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#3'  AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 1 AND 11)
           OR (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 25
               AND l_quantity BETWEEN 10 AND 20)
           OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 35
               AND l_quantity BETWEEN 20 AND 30)
    """,
    "tpch_q2": """
        WITH eligible_supp AS (
            SELECT s_suppkey, s_name, s_acctbal, n_name
            FROM supplier
            JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            WHERE r_name = 'EUROPE'
        ), cost AS (
            SELECT p_partkey, p_name, s_suppkey, s_name, s_acctbal, n_name,
                   round(min(l_extendedprice / l_quantity), 4) AS supply_cost
            FROM lineitem
            JOIN part ON l_partkey = p_partkey
            JOIN eligible_supp ON l_suppkey = s_suppkey
            WHERE p_size = 15 AND p_type = 'LARGE'
            GROUP BY ALL
        ), min_cost AS (
            SELECT p_partkey AS mc_partkey, min(supply_cost) AS min_cost
            FROM cost GROUP BY 1
        )
        SELECT s_acctbal, s_name, n_name, p_partkey, p_name, supply_cost
        FROM cost JOIN min_cost
          ON p_partkey = mc_partkey AND supply_cost = min_cost
        ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
        LIMIT 100
    """,
    "tpch_q11": """
        WITH per_part AS (
            SELECT l_partkey, sum(l_extendedprice) AS part_value
            FROM lineitem
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            WHERE n_name = 'NATION_9'
            GROUP BY 1
        )
        SELECT l_partkey, round(part_value, 4) AS part_value
        FROM per_part
        WHERE part_value > (SELECT sum(part_value) * 0.001 FROM per_part)
        ORDER BY part_value DESC, l_partkey
    """,
    "tpch_q20": """
        WITH pair_qty AS (
            SELECT l_partkey, l_suppkey, sum(l_quantity) AS pair_qty
            FROM lineitem
            JOIN part ON l_partkey = p_partkey
            WHERE p_name LIKE 'small%'
              AND l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate <  TIMESTAMP '1997-01-01'
            GROUP BY 1, 2
        ), part_total AS (
            SELECT l_partkey AS pt_partkey, sum(pair_qty) AS part_qty
            FROM pair_qty GROUP BY 1
        ), qualifying AS (
            SELECT DISTINCT l_suppkey
            FROM pair_qty JOIN part_total ON l_partkey = pt_partkey
            WHERE pair_qty * 5 > part_qty
        )
        SELECT s_name, s_acctbal
        FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND s_suppkey IN (SELECT l_suppkey FROM qualifying)
        ORDER BY s_name
    """,
    "tpch_q21": """
        WITH f_li AS (
            SELECT l_orderkey, l_suppkey, l_returnflag
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            WHERE o_orderstatus = 'F'
        ), order_dim AS (
            SELECT l_orderkey,
                   count(DISTINCT l_suppkey) AS n_supp,
                   count(DISTINCT CASE WHEN l_returnflag = 'R'
                                       THEN l_suppkey END) AS n_r_supp
            FROM f_li GROUP BY 1
        )
        SELECT s_name, count(DISTINCT f_li.l_orderkey) AS numwait
        FROM f_li
        JOIN order_dim ON f_li.l_orderkey = order_dim.l_orderkey
        JOIN supplier ON f_li.l_suppkey = s_suppkey
        WHERE f_li.l_returnflag = 'R' AND n_supp > 1 AND n_r_supp = 1
        GROUP BY s_name
        ORDER BY numwait DESC, s_name
        LIMIT 20
    """,
}

QUERIES = {
    name: fn
    for name, fn in list(globals().items())
    if callable(fn) and (name.startswith("q_") or name.startswith("tpch_"))
}
