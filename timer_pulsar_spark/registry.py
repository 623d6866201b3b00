"""Central query registry: every implemented operator from SURVEY.md §2
(and the training-data-pipeline extensions) as a (spark, sf_dir) ->
DataFrame callable, with its DuckDB oracle SQL where SQL-expressible.

``__spark_entry__.py`` re-exports these for the driver's correctness gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_MODULES = []


def _collect() -> tuple[dict[str, QueryFn], dict[str, str]]:
    from . import metrics
    from .operators import relational, timeseries
    from .streaming import joins, rollup, sessionize

    queries: dict[str, QueryFn] = {}
    oracles: dict[str, str] = {}
    mods = [relational, timeseries, metrics, sessionize, rollup, joins]
    for extra in ("dedup", "similarity", "textops", "timerdomain", "multimodal", "streamops", "analytics", "sampling"):
        try:
            mods.append(__import__(f"timer_pulsar_spark.operators.{extra}", fromlist=[extra]))
        except ImportError:
            pass
    for mod in mods:
        for name, fn in getattr(mod, "QUERIES", {}).items():
            assert name not in queries, f"duplicate query name {name} in {mod.__name__}"
            queries[name] = fn
        for name, sql in getattr(mod, "ORACLES", {}).items():
            oracles[name] = sql
    # every oracle must have a query
    missing = set(oracles) - set(queries)
    assert not missing, f"oracles without queries: {missing}"
    return queries, oracles


def queries() -> dict[str, QueryFn]:
    return _collect()[0]


def oracle_sql() -> dict[str, str]:
    return _collect()[1]
