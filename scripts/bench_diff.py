"""Compare two bench.py JSON artifacts round-over-round without
misreading ambient noise as regressions (the r9 lesson: bpe_64 read
+68% from a concurrent pytest run; a clean rerun erased it).

    python scripts/bench_diff.py BENCH_r09.json BENCH_r10.json

Prints per-query deltas for the SHARED headliners (like-for-like
total first — new headliners are listed separately, never folded into
the round-over-round comparison), then the pipeline/delay/side
sections with their rep spreads. A row is flagged REGRESSED only when
it is both slower by more than the noise band (35% for sub-second
rows, 20% above 1 s — sub-second rows swing harder from JIT/IO) AND
slower by more than 150 ms absolute; everything inside the band reads
as noise, matching how the verdict is supposed to grade.
"""

from __future__ import annotations

import json
import sys

SUB_SECOND_BAND = 0.35
SECOND_BAND = 0.20
ABS_FLOOR_SEC = 0.15


def load(path: str) -> dict:
    with open(path) as f:
        return json.load(f)


def main() -> None:
    if len(sys.argv) != 3:
        print(__doc__)
        sys.exit(2)
    a, b = load(sys.argv[1]), load(sys.argv[2])
    qa, qb = a.get("queries", {}), b.get("queries", {})
    shared = sorted(set(qa) & set(qb))
    new = sorted(set(qb) - set(qa))
    gone = sorted(set(qa) - set(qb))

    ta = sum(qa[q] for q in shared)
    tb = sum(qb[q] for q in shared)
    if shared and ta > 0:
        print(f"like-for-like ({len(shared)} shared queries): "
              f"{ta:.2f}s -> {tb:.2f}s ({(tb - ta) / ta * 100:+.1f}%)")
    else:
        # driver-recorded BENCH files sometimes truncate the queries
        # dict (r9 verdict note) — fall back to the headline totals
        print(f"no shared per-query rows (truncated artifact?); "
              f"headline totals: {a.get('value')} -> {b.get('value')} "
              f"{b.get('unit', 's')} (query sets may differ)")
    if new:
        print(f"new headliners (+{sum(qb[q] for q in new):.2f}s, "
              f"excluded from the comparison): "
              + ", ".join(f"{q}={qb[q]:.2f}s" for q in new))
    if gone:
        print("dropped headliners: " + ", ".join(gone))

    flagged = []
    for q in shared:
        va, vb = qa[q], qb[q]
        band = SUB_SECOND_BAND if va < 1.0 else SECOND_BAND
        delta = vb - va
        pct = delta / va if va else 0.0
        mark = ""
        if delta > max(ABS_FLOOR_SEC, va * band):
            mark = "  << REGRESSED (outside noise band)"
            flagged.append(q)
        elif -delta > max(ABS_FLOOR_SEC, va * band):
            mark = "  improved"
        if mark or abs(pct) > 0.10:
            print(f"  {q:36s} {va:6.2f}s -> {vb:6.2f}s ({pct * 100:+6.1f}%){mark}")

    for section in ("pipeline_merge", "pipeline_append_log"):
        sa, sb = a.get(section), b.get(section)
        if sa and sb:
            print(f"{section}: {sa.get('tasks_per_sec')} -> "
                  f"{sb.get('tasks_per_sec')} tasks/s "
                  f"(reps {sb.get('walls_sec_reps')})")
    da, db = a.get("delay_slo"), b.get("delay_slo")
    if da and db:
        print(f"delay p99: {da.get('delay_p99_ms')} -> "
              f"{db.get('delay_p99_ms')} ms (budget 2000)")
    for side in ("bpe_64", "qualclf_train", "ingest_gate"):
        sa, sb = a.get(side), b.get(side)
        if isinstance(sa, dict) and isinstance(sb, dict):
            wa = sa.get("wall_sec") or sa.get("walls_sec_reps")
            wb = sb.get("wall_sec") or sb.get("walls_sec_reps")
            print(f"{side}: {wa} -> {wb} (min-of-reps where present; "
                  "single-run deltas here are ambient noise candidates)")

    print(f"\nflagged regressions: {flagged or 'none'}")
    sys.exit(1 if flagged else 0)


if __name__ == "__main__":
    main()
