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
    """q_approx_users is rows-only in the driver gate (HLL estimates
    are engine-specific); here it must land within 5% of the exact
    distinct count per event_type."""
    from timer_pulsar_spark.operators.timeseries import q_approx_users
    from timer_pulsar_spark.catalog import load_table
    from pyspark.sql import functions as F

    approx = {
        r.event_type: r.approx_users
        for r in q_approx_users(spark, SF_DIR).collect()
    }
    exact = {
        r.event_type: r.exact
        for r in load_table(spark, SF_DIR, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("exact"))
        .collect()
    }
    assert set(approx) == set(exact)
    for t, est in approx.items():
        assert abs(est - exact[t]) <= max(1, 0.05 * exact[t]), (t, est, exact[t])


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
