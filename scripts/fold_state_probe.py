"""Fold-state growth probe (VERDICT r08 #1 done-criterion): per-batch
I/O of the partition-scoped streaming count-fold must track the BATCH
while the accumulated state grows, and version count must stay
vacuum-bounded.

The production sizing rule the probe exercises: n_parts scales with
state size (like shuffle partitions — ~state_bytes / leaf budget), so
leaf size stays constant as the corpus grows. A constant small batch
(24 distinct keys) then touches <= 24 leaves of constant size at ANY
state scale — per-batch rewritten bytes stay flat while state grows
16x. The retired r8 design rewrote the ENTIRE state per batch (bytes
tracking the x16 column) and never vacuumed.

Appends its markdown table to SCALE.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def leaf_bytes(root: str) -> dict[str, int]:
    out: dict[str, int] = {}
    for dirpath, _d, files in os.walk(root):
        for fn in files:
            if fn.endswith(".parquet"):
                fp = os.path.join(dirpath, fn)
                out[os.path.relpath(fp, root)] = os.path.getsize(fp)
    return out


def main() -> None:
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from timer_pulsar_spark.operators.dedup import dedup_exact_fold_batch
    from timer_pulsar_spark.session import get_spark
    from timer_pulsar_spark.streaming.state import partition_versions

    spark = get_spark("fold_state_probe")
    rows = []
    for mult in (1, 4, 16):
        n_seed = 10_000 * mult
        n_parts = 64 * mult  # the production rule: leaf size constant
        work = tempfile.mkdtemp(prefix=f"fold_probe_{mult}_")
        root = os.path.join(work, "state")
        try:
            seed = spark.range(n_seed).select(
                F.col("id").alias("doc_id"),
                F.concat(F.lit("seed text "), F.col("id")).alias("text"),
            )
            dedup_exact_fold_batch(spark, root, seed, 0, n_parts=n_parts)
            state_b = sum(leaf_bytes(root).values())
            walls, touched = [], []
            for b in range(1, 4):
                batch = spark.range(48).select(
                    (F.col("id") + 10_000_000 * b).alias("doc_id"),
                    F.concat(
                        F.lit(f"b{b} text "), (F.col("id") % 24)
                    ).alias("text"),
                )
                before = leaf_bytes(root)
                t0 = time.perf_counter()
                dedup_exact_fold_batch(
                    spark, root, batch, b, n_parts=n_parts
                )
                walls.append(time.perf_counter() - t0)
                after = leaf_bytes(root)
                touched.append(
                    sum(sz for p, sz in after.items() if p not in before)
                )
            maxv = max(len(v) for v in partition_versions(root).values())
            rows.append(
                (
                    mult,
                    n_seed,
                    n_parts,
                    state_b,
                    round(sum(touched) / len(touched)),
                    round(sum(walls) / len(walls), 2),
                    maxv,
                )
            )
            print("probe:", rows[-1], flush=True)
        finally:
            shutil.rmtree(work, ignore_errors=True)
    spark.stop()

    lines = [
        "",
        "## Partition-scoped streaming fold: per-batch I/O tracks the"
        " batch, not the state",
        "",
        "dedup_exact_fold_batch with the production sizing rule",
        "(n_parts grows with the corpus so leaf size stays constant):",
        "a CONSTANT 48-doc/24-key batch folds into a canonical table",
        "that grows 16x. Per-batch rewritten bytes and wall must stay",
        "~flat — the retired r8 design read the full predecessor and",
        "wrote a complete state copy per batch (bytes = the state",
        "column), with versions accumulating one full copy per batch;",
        "vacuum now bounds versions at <= 2 per partition.",
        "",
        "| mult | seed keys | n_parts | state bytes | touched bytes/batch"
        " | fold wall | max versions |",
        "|---|---|---|---|---|---|---|",
    ]
    for m, ns, np_, sb, tb, w, mv in rows:
        lines.append(
            f"| x{m} | {ns:,} | {np_} | {sb:,} | {tb:,} | {w}s | {mv} |"
        )
    with open(
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "SCALE.md"),
        "a",
    ) as f:
        f.write("\n".join(lines) + "\n")
    print("SCALE.md updated")


if __name__ == "__main__":
    main()
