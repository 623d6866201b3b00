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

    The driver's `events.ts` is parquet TIMESTAMP(MICROS,
    isAdjustedToUTC=0), which Spark reads as ``TIMESTAMP_NTZ`` — kept
    as-is: NTZ wall-clock semantics are session-timezone-independent and
    match DuckDB's naive timestamps exactly, so every date_trunc /
    date_format / comparison agrees with the oracle on ANY session.
    Epoch extraction over NTZ goes through functions.timeutil
    (``unix_millis``/``unix_micros`` accept only LTZ);
    tests/test_driver_env.py pins the exact dtype so a future testdata
    type flip fails loudly instead of silently shifting semantics."""
    return spark.read.parquet(table_path(sf_dir, name))


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
