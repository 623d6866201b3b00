"""Bucketed co-located join: the 100 TB strategy for repeated fact-fact
joins — bucketBy(key) both tables at write time so the join needs NO
shuffle exchange at read time (SURVEY §4 'hash partitioning').

This is the Spark-native analog of the reference pinning work to
timer_id % BucketsNum buckets (dao/task/cache.go:49): the partitioning
is baked into storage once and every later join/aggregation on the key
reuses it for free.
"""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def bucketed_db(spark, tmp_path_factory):
    from .conftest import SF_DIR

    loc = tmp_path_factory.mktemp("warehouse")
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bucketed_test LOCATION '{loc}'")
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    lineitem = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    (
        orders.write.mode("overwrite")
        .bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .saveAsTable("bucketed_test.orders_b")
    )
    (
        lineitem.write.mode("overwrite")
        .bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .saveAsTable("bucketed_test.lineitem_b")
    )
    yield "bucketed_test"
    spark.sql("DROP DATABASE bucketed_test CASCADE")


def test_bucketed_join_has_no_shuffle(spark, bucketed_db):
    # at test scale Spark would broadcast; disable it so the plan shows
    # the strategy that matters at 100 TB (fact-fact, both sides huge)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.sql(
            """
            SELECT o_orderkey, count(*) AS n, round(sum(l_extendedprice), 4) AS total
            FROM bucketed_test.orders_b o
            JOIN bucketed_test.lineitem_b l ON o.o_orderkey = l.l_orderkey
            GROUP BY o_orderkey
            """
        )
        joined.collect()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # co-located: the join reads bucketed storage directly — no
        # shuffle exchange anywhere in the plan
        assert "Exchange hashpartitioning" not in plan, plan[:2000]
        assert "ShuffleExchange" not in plan, plan[:2000]
        assert "SortMergeJoin" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_results_match_plain_join(spark, bucketed_db):
    from .conftest import SF_DIR

    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    lineitem = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    plain = (
        orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
        .groupBy("o_orderkey")
        .count()
    )
    bucketed = spark.sql(
        """
        SELECT o_orderkey, count(*) AS count
        FROM bucketed_test.orders_b o
        JOIN bucketed_test.lineitem_b l ON o.o_orderkey = l.l_orderkey
        GROUP BY o_orderkey
        """
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, bucketed.collect()))
