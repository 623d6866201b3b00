"""Benchmark harness: time the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE
JSON line:

    {"metric": "headline_total_sec", "value": N, "unit": "sec",
     "queries": {"tpch_q1": sec, ...}, "sf": 0.1}

Each query is materialized through the `noop` sink — full distributed
execution, zero driver-collect cost — so the timing measures the plan,
not toPandas serialization. The JSON line is the LAST stdout line so the
driver's tail-parse always finds it.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time


HEADLINERS = [
    # flagship relational aggregations / joins
    "tpch_q1",
    "tpch_q3",
    # time-series core
    "q_groupby_minute",
    "q_window_bucket",
    "q_sessionize",
    # LLM-pipeline ops (registered from round 2 on; skipped if absent)
    "q_dedup_exact",
    "q_dedup_near",
    "q_ann_topk",
    "q_textstats",
    "q_fanout",
]


def sf_from_dir(sf_dir: str) -> float:
    m = re.search(r"sf([0-9.]+)", sf_dir)
    return float(m.group(1)) if m else -1.0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from timer_pulsar_spark.session import get_spark

    spark = get_spark("bench")
    import __spark_entry__ as entrymod

    qs = entrymod.queries()

    # JVM/codegen warm-up so the first headliner isn't charged startup cost
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    timings: dict[str, float] = {}
    for name in HEADLINERS:
        fn = qs.get(name)
        if fn is None:
            continue
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)
        print(f"# {name}: {timings[name]:.3f}s", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    line = {
        "metric": "headline_total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf_from_dir(sf_dir),
    }
    print(json.dumps(line), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
