"""Dump explain("formatted") for named queries to plans/r13/<q>_<tag>.txt.

Usage: python scripts/r13_plans.py <tag> [query ...]
       (no query list -> every bench.py headliner)

Planning only — nothing is executed, so this is cheap and safe to run
alongside other Spark work. The committed *_before.txt / *_after.txt
pairs are the optimization round's plan evidence.
"""

from __future__ import annotations

import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "plans", "r13")


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    from pyspark.sql import SparkSession

    from timer_pulsar_spark.session import get_spark

    spark = get_spark("r13_plans")
    import __spark_entry__ as entry

    qs = entry.queries()
    if not names:
        import bench

        names = [n for n in bench.HEADLINERS if n in qs]
    os.makedirs(OUT, exist_ok=True)
    for name in names:
        try:
            df = qs[name](spark, SF_DIR)
            buf = io.StringIO()
            stdout, sys.stdout = sys.stdout, buf
            try:
                df.explain("formatted")
            finally:
                sys.stdout = stdout
            path = os.path.join(OUT, f"{name}_{tag}.txt")
            with open(path, "w") as f:
                f.write(f"# {name} @ {SF_DIR} ({tag})\n")
                f.write(buf.getvalue())
            print(f"wrote {path}")
        except Exception as ex:  # noqa: BLE001
            print(f"ERR {name}: {str(ex)[:300]}")
    spark.stop()


if __name__ == "__main__":
    main()
