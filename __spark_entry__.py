"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  -> flagship query on sf0.001 (smoke).
queries()     -> name -> (spark, sf_dir) -> DataFrame, one per operator
                 implemented from SURVEY.md §2 + training-data extensions.
oracle_sql()  -> name -> DuckDB-ANSI SQL equivalent (same column aliases);
                 omitted for non-SQL-expressible ops (rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from timer_pulsar_spark import registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: TPC-H Q1 pricing summary."""
    from timer_pulsar_spark.operators.relational import tpch_q1

    return tpch_q1(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    return registry.oracle_sql()
