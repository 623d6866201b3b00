"""Oracle-checked correctness for the relational + time-series surface.

Every registered query that declares an oracle is run through PySpark and
DuckDB over the same sf0.001 parquet and compared with the driver's
canonicalization rules (tests mirror CORRECTNESS_r{N}.json)."""

from __future__ import annotations

import pytest

from timer_pulsar_spark import registry

from .conftest import SF_DIR, assert_matches_oracle

QUERIES = registry.queries()
ORACLES = registry.oracle_sql()
ORACLE_KEYS = sorted(ORACLES)


@pytest.mark.parametrize("name", ORACLE_KEYS)
def test_query_matches_oracle(spark, duck, name):
    df = QUERIES[name](spark, SF_DIR)
    assert_matches_oracle(df, duck, ORACLES[name])


def test_every_query_runs_and_has_stable_schema(spark):
    for name, fn in QUERIES.items():
        df = fn(spark, SF_DIR)
        assert df.schema is not None and len(df.schema) > 0, name
        assert df.count() >= 0, name


def test_approx_users_within_hll_bound(spark):
    """q_approx_users now returns the ORACLE-checked assertion form
    (within_bound booleans); this test additionally pins the raw HLL
    estimate within 5% of the exact distinct count per event_type."""
    from timer_pulsar_spark.operators.timeseries import q_approx_users
    from timer_pulsar_spark.catalog import load_table
    from pyspark.sql import functions as F

    bounds = {
        r.event_type: r.within_bound
        for r in q_approx_users(spark, SF_DIR).collect()
    }
    assert bounds and all(bounds.values()), bounds

    e = load_table(spark, SF_DIR, "events")
    raw = e.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("est"),
        F.countDistinct("user_id").alias("exact"),
    ).collect()
    assert {r.event_type for r in raw} == set(bounds)
    for r in raw:
        assert abs(r.est - r.exact) <= max(1, 0.05 * r.exact), (
            r.event_type, r.est, r.exact,
        )


def test_entry_contract(spark):
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(os.path.dirname(__file__), "..", "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    out = mod.entry(spark)
    rows = out.collect()
    assert len(rows) > 0
    assert set(mod.oracle_sql()) <= set(mod.queries())


def test_salted_join_matches_plain_join_and_spreads_hot_key(spark):
    """Planted 10k-row hot key: the salted join must return exactly the
    plain join's rows, and the hot key's rows must spread across every
    salt group instead of one reducer."""
    from timer_pulsar_spark.operators.relational import salted_join

    left = (
        spark.range(0, 10_000)
        .selectExpr("0 AS k", "id AS payload")          # one hot key
        .union(spark.range(0, 100).selectExpr("id + 1 AS k", "id AS payload"))
    )
    right = spark.range(0, 101).selectExpr("id AS k", "id * 2 AS rv")

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        got = salted_join(left, right, ["k"], n_salts=8).toPandas()
        want = left.join(right, "k").toPandas()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    key = lambda df: sorted(map(tuple, df[["k", "payload", "rv"]].values.tolist()))
    assert key(got) == key(want)

    # the hot key's salt distribution: all 8 salts used, none dominant
    from pyspark.sql import functions as F

    salts = (
        left.withColumn(
            "s", F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(8))
        )
        .filter("k = 0")
        .groupBy("s")
        .count()
        .collect()
    )
    assert len(salts) == 8
    assert max(r["count"] for r in salts) < 10_000 * 0.3


def test_salted_join_left_preserving_only(spark):
    """Left joins keep unmatched-left semantics exactly; right/full
    outer are refused (the per-salt right replication would emit every
    unmatched right row n_salts times)."""
    import pytest

    from timer_pulsar_spark.operators.relational import salted_join

    left = spark.range(0, 10).selectExpr("id AS k", "id AS payload")
    right = spark.range(5, 20).selectExpr("id AS k", "id * 2 AS rv")

    got = sorted(
        map(tuple, salted_join(left, right, ["k"], how="left").collect())
    )
    want = sorted(map(tuple, left.join(right, "k", "left").collect()))
    assert got == want

    for bad in ("right", "right_outer", "full", "full_outer", "outer"):
        with pytest.raises(ValueError):
            salted_join(left, right, ["k"], how=bad)
