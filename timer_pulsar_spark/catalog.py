"""Table catalog: load the driver's parquet tables as DataFrames.

Replaces the reference's GORM DAO layer (gotimer_web/dao/*) — instead of
closure-composed SQL options against MySQL, every table is a columnar
DataFrame whose filters/projections Catalyst pushes into the parquet scan
(predicate pushdown + column pruning + row-group min/max skipping), which
is the scale path for 100 TB: only the needed columns/row-groups are read.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from .schemas import TABLE_NAMES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one table (self-describing parquet; declared shapes in
    schemas.TESTDATA).

    The driver's `events.ts` is TIMESTAMP(NANOS), which Spark reads only
    as a long (spark.sql.legacy.parquet.nanosAsLong). Truncate to
    microseconds with integer division (ns epochs overflow double
    mantissa, so no float math) — the same precision DuckDB/pandas use,
    keeping oracle comparisons exact."""
    # Runtime-set so the conversion works on ANY session (the driver's
    # correctness gate supplies a vanilla SparkSession that never goes
    # through session.get_spark()). Verified runtime-settable on 4.1.2.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(table_path(sf_dir, name))
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    for field in df.schema.fields:
        if field.name == "ts" and isinstance(field.dataType, T.LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES if os.path.exists(table_path(sf_dir, name))}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every testdata table as a temp view (plain name), so both
    the DataFrame API and spark.sql() can address them — mirroring the
    driver's DuckDB oracle, which pre-registers the same names."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
