"""Metrics (S13, A5, A6): counters, gauges, and delay quantiles.

Reference parity (file:line into /root/reference):
- exec counters / enabled-timer gauges ->
  gotimer_web/pkg/promethus/reporter.go:112-126.
- delay summary quantiles {.5,.9,.99,.999,.9999} of (actual-scheduled)
  ms -> reporter.go:74-83; recorded by the executor, woker.go:133-136.

Spark-first: metrics ride the query itself via `df.observe()` — the
aggregates are computed inside the same job (map-side, no extra scan)
and surface through `Observation` (batch) or
`StreamingQueryListener.onQueryProgress` (streaming). The quantile
gauge uses approx_percentile, a mergeable sketch, because buffering
exact per-group values is the one thing that cannot scale to 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

DELAY_QUANTILES = [0.5, 0.9, 0.99, 0.999, 0.9999]  # reporter.go:74-83


def observe_exec_metrics(df: DataFrame, name: str = "exec") -> tuple[DataFrame, Observation]:
    """Attach the executor's counter/gauge set to a status DataFrame
    (columns: status, cost_time). Read obs.get AFTER an action."""
    obs = Observation(name)
    observed = df.observe(
        obs,
        F.count(F.lit(1)).alias("exec_total"),
        F.sum((F.col("status") == 2).cast("long")).alias("exec_success"),
        F.sum((F.col("status") == 3).cast("long")).alias("exec_failed"),
        F.avg("cost_time").alias("cost_ms_avg"),
        F.max("cost_time").alias("cost_ms_max"),
    )
    return observed, obs


def delay_quantiles(df: DataFrame, delay_col: str = "delay_ms") -> DataFrame:
    """The delay SLO summary (p99 <= 1s design point, BASELINE.md):
    approx_percentile sketch over (actual - scheduled) ms."""
    pcts = ", ".join(str(q) for q in DELAY_QUANTILES)
    return df.agg(
        F.expr(f"approx_percentile({delay_col}, array({pcts}))").alias("delay_quantiles"),
        F.count(F.lit(1)).alias("n"),
    )


def q_metrics_summary(spark, sf_dir: str) -> DataFrame:
    """[A5] counter/gauge aggregation surface over events: exec-total
    analog per type plus exact value stats (oracle-checkable; the
    sketch-based quantile twin is q_quantile_approx)."""
    from .catalog import load_table

    e = load_table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.count("*").alias("exec_total"),
        F.round(F.avg("value"), 6).alias("value_avg"),
        F.round(F.max("value"), 4).alias("value_max"),
        F.round(F.min("value"), 4).alias("value_min"),
    )


ORACLES: dict[str, str] = {
    "q_metrics_summary": """
        SELECT event_type, count(*) AS exec_total,
               round(avg(value), 6) AS value_avg,
               round(max(value), 4) AS value_max,
               round(min(value), 4) AS value_min
        FROM events GROUP BY event_type
    """,
}

QUERIES = {"q_metrics_summary": q_metrics_summary}
