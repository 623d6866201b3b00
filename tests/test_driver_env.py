"""Driver-environment reproduction: run EVERY registered query under a
SparkSession built with *default confs* (no get_spark() tuning), exactly
how the driver's correctness gate invokes ``__spark_entry__.queries()``.

Round 1 failed 15/27 queries solely because the nanos-parquet conf lived
only in the builder's session factory — this test exists so a
"works in my session" gap can never ship again.
"""

from __future__ import annotations

import os

import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def vanilla_spark(spark):
    """A session with *driver-like* conf: strip every conf get_spark()
    set that a query could accidentally depend on.

    local-mode Spark keeps one JVM per process, so we can't truly build a
    second independent session; instead we unset the load-bearing runtime
    confs on a fresh ``newSession`` (separate SQLConf), which is exactly
    the state the driver's vanilla session starts in.
    """
    s = spark.newSession()
    for key in (
        "spark.sql.legacy.parquet.nanosAsLong",
        "spark.sql.parquet.aggregatePushdown",
    ):
        try:
            s.conf.unset(key)
        except Exception:
            pass
    return s


def test_vanilla_session_reads_events(vanilla_spark):
    from timer_pulsar_spark.catalog import load_table

    df = load_table(vanilla_spark, SF_DIR, "events")
    assert df.count() > 0
    assert dict(df.dtypes)["ts"].startswith("timestamp")


def _all_queries():
    import __spark_entry__ as entrymod

    return sorted(entrymod.queries().items())


@pytest.mark.parametrize("name,fn", _all_queries(), ids=[n for n, _ in _all_queries()])
def test_query_runs_on_vanilla_session(vanilla_spark, name, fn):
    df = fn(vanilla_spark, SF_DIR)
    # driver smoke contract: runs, has a stable schema, >= 0 rows
    assert df.columns, f"{name} returned no columns"
    assert df.count() >= 0
