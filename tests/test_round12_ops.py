"""Round-12 operators: the live fold-state drift gauge in the
/metrics exposition, the width-aware audio pipeline's companions (in
test_round11_ops.py next to their r11 siblings), the video content
fingerprint, and byte-level exact-substring dedup."""

from __future__ import annotations

import pytest

from .conftest import SF_DIR


# ---------------------------------------- fold-state drift exposition

def test_fold_drift_gauges_in_metrics_exposition(spark, tmp_path):
    """VERDICT r11 #8: the reshard-drift signal must be visible to an
    operator DURING a real run, not only in the bench harness — a fold
    with a wired MetricsRegistry stamps fold_state_* gauges, the
    Prometheus exposition renders them, reshard_due crosses to 1 as
    state outgrows the pinned n_parts, and clears after
    reshard_state + the next fold."""
    import re

    from pyspark.sql import functions as F

    from timer_pulsar_spark.metrics import MetricsRegistry
    from timer_pulsar_spark.streaming.state import (
        partitioned_fold,
        reshard_state,
    )

    root = str(tmp_path / "drift_state")
    reg = MetricsRegistry()
    remerge = lambda df: df.groupBy("k").agg(F.sum("cnt").alias("cnt"))  # noqa: E731

    def batch(b: int, n: int):
        return (
            spark.range(n)
            .select(
                F.concat(F.lit("k"), F.lit(b * 10_000) + F.col("id")).alias("k")
            )
            .groupBy("k")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )

    def gauge(text: str, name: str) -> float:
        m = re.search(rf'^{name}{{state="drift_state"}} (\S+)$', text, re.M)
        assert m, f"{name} gauge missing from exposition:\n{text}"
        return float(m.group(1))

    partitioned_fold(
        spark, root, batch(0, 200), "k", remerge, 0,
        n_parts=2, mode="delta",
        metrics_registry=reg, leaf_target=16 << 10,
    )
    text = reg.render()
    assert "# TYPE fold_state_reshard_due gauge" in text
    assert gauge(text, "fold_state_n_parts") == 2
    assert gauge(text, "fold_state_bytes") > 0
    assert gauge(text, "fold_state_reshard_due") == 0

    for b in (1, 2):
        partitioned_fold(
            spark, root, batch(b, 4_000), "k", remerge, b,
            n_parts=2, mode="delta", compact_every=2,
            metrics_registry=reg, leaf_target=16 << 10,
        )
    grown = reg.render()
    assert gauge(grown, "fold_state_reshard_due") == 1
    suggested = gauge(grown, "fold_state_suggested_n_parts")
    assert suggested > 2

    reshard_state(spark, root, "k", int(suggested) * 2, remerge=remerge)
    partitioned_fold(
        spark, root, batch(3, 10), "k", remerge, 3,
        n_parts=int(suggested) * 2, mode="delta",
        metrics_registry=reg, leaf_target=16 << 10,
    )
    cleared = reg.render()
    assert gauge(cleared, "fold_state_reshard_due") == 0
    assert gauge(cleared, "fold_state_n_parts") == int(suggested) * 2
