"""Driver-style correctness sweep: run every registered query on a vanilla
SparkSession and compare row-count / sorted-column value-hash against the
DuckDB oracle at sf0.01.  Mirrors the per-round gate so mismatches are caught
locally before the driver records them.

Usage: python scripts/verify_oracle.py [sf_dir] [only_query ...]
       python scripts/verify_oracle.py [sf_dir] --changed-since <rev>

--changed-since sweeps only queries whose IMPLEMENTING MODULE changed
between <rev> and the working tree (registry hygiene at 225+ queries:
a full sweep is ~35 min, a per-commit sweep should cost what the
commit touched). Conservative rule: if the diff touches any package
file that is NOT a query module (catalog/session/functions/streaming
helpers feed many queries), it falls back to the FULL sweep.
"""
import hashlib
import json
import os
import subprocess
import sys

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

argv = sys.argv[1:]
CHANGED_SINCE = None
if "--changed-since" in argv:
    i = argv.index("--changed-since")
    CHANGED_SINCE = argv[i + 1]
    argv = argv[:i] + argv[i + 2 :]

SF_DIR = argv[0] if argv else "/root/testdata/sf0.01"
ONLY = set(argv[1:])

# card queries whose global doc_id order is a PHYSICAL contract
# (dedup.spread_sorted source, no trailing Sort in the plan) — the
# sweep asserts their output is monotone in doc_id (ADVICE r12)
ORDERED_CARDS = {
    "q_audio_pipeline",
    "q_audio_fingerprint",
    "q_image_dhash_real",
    "q_video_fingerprint",
}


def _query_module_importers(mod_files):
    """Reverse import edges BETWEEN query modules: sampling.py pulls
    spread/with_shingles from dedup.py, multimodal.py pulls spread —
    a change to the imported module must also re-sweep the importers'
    queries, or the gate green-lights a regression it claims to catch.
    Static scan of `from .X import` / `from ..pkg.X import` lines,
    expanded to the TRANSITIVE closure (ADVICE r10): if sampling.py
    imports dedup.py which imports similarity.py, a similarity change
    re-sweeps all three — one-level edges under-swept exactly the
    indirect-regression class this map exists to catch."""
    import re as _re

    stems = {path: os.path.splitext(os.path.basename(path))[0]
             for path in mod_files}
    importers = {path: set() for path in mod_files}
    for path in mod_files:
        try:
            src = open(os.path.join(REPO, path)).read()
        except OSError:
            continue
        imported = set(_re.findall(
            r"^\s*from\s+\.+[\w.]*?(\w+)\s+import", src, _re.MULTILINE
        ))
        for other, stem in stems.items():
            if other != path and stem in imported:
                importers[other].add(path)
    # fixed point: anything importing an importer re-sweeps too
    changed = True
    while changed:
        changed = False
        for path, deps in importers.items():
            for dep in list(deps):
                extra = importers.get(dep, set()) - deps - {path}
                if extra:
                    deps |= extra
                    changed = True
    return importers


def changed_query_names(rev, queries):
    """Queries whose implementing module (or a query module importing
    it) differs from `rev`. Returns None to request a FULL sweep (a
    shared/non-query module changed, whose blast radius the module
    map can't bound)."""
    diff = subprocess.run(
        ["git", "diff", "--name-only", rev, "--", "timer_pulsar_spark",
         "__spark_entry__.py"],
        cwd=REPO, capture_output=True, text=True, check=True,
    ).stdout.split()
    if not diff:
        return set()
    mod_files = {}  # package-relative path -> query names
    for name, fn in queries.items():
        rel = fn.__module__.replace(".", "/") + ".py"
        mod_files.setdefault(rel, set()).add(name)
    importers = _query_module_importers(mod_files)
    selected = set()
    for path in diff:
        if path in mod_files:
            selected |= mod_files[path]
            for dep in importers.get(path, ()):
                print(f"--changed-since: {dep} imports from {path} -> "
                      "its queries re-sweep too")
                selected |= mod_files[dep]
        else:
            print(f"--changed-since: {path} is not a query module -> "
                  "full sweep (shared-helper blast radius)")
            return None
    return selected

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def df_hash(pdf):
    pdf = pdf[sorted(pdf.columns)]
    pdf = pdf.sort_values(by=list(pdf.columns)).reset_index(drop=True)
    h = hashlib.sha256()
    for col in pdf.columns:
        h.update(col.encode())
        for v in pdf[col]:
            if isinstance(v, float):
                v = round(v, 6)
            h.update(repr(v).encode())
    return h.hexdigest()


def main():
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.driver.memory", "8g")
        .appName("verify")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )

    import __spark_entry__ as entry

    queries = entry.queries()
    oracles = entry.oracle_sql()

    only = set(ONLY)
    if CHANGED_SINCE is not None:
        changed = changed_query_names(CHANGED_SINCE, queries)
        if changed is not None:
            only |= changed or {"__nothing_changed__"}
            print(f"--changed-since {CHANGED_SINCE}: "
                  f"{len(changed)} queries selected")

    results = {}
    fails = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, SF_DIR)
            spdf = sdf.toPandas()
            if name in oracles:
                opdf = con.execute(oracles[name]).df()
                rows = len(spdf) == len(opdf)
                schema = sorted(map(str.lower, spdf.columns)) == sorted(
                    map(str.lower, opdf.columns)
                )
                spdf.columns = [c.lower() for c in spdf.columns]
                opdf.columns = [c.lower() for c in opdf.columns]
                hmatch = df_hash(spdf) == df_hash(opdf) if rows and schema else False
                ok = rows and schema and hmatch
                # physical-order contract of the spread_sorted card
                # queries (ADVICE r12): their global doc_id ordering is
                # PHYSICAL (range partitions concatenated in index order
                # through order-preserving map ops, no trailing Sort in
                # the plan), which the value-hash above cannot see — a
                # future consumer inserting a shuffle/coalesce after the
                # map chain would silently lose the documented ordering.
                # Assert monotonicity explicitly so that regression
                # fails the sweep, not a downstream reader.
                if ok and name in ORDERED_CARDS:
                    ids = spdf["doc_id"].tolist()
                    if ids != sorted(ids):
                        ok = False
                        print(f"FAIL {name}: doc_id output order not "
                              f"monotone (spread_sorted contract broken)")
                results[name] = {
                    "rows": ok and rows, "schema": schema, "hash": hmatch,
                    "spark_rows": len(spdf), "oracle_rows": len(opdf),
                }
                if not ok:
                    fails.append(name)
                    print(f"FAIL {name}: rows={rows} ({len(spdf)} vs {len(opdf)}) "
                          f"schema={schema} hash={hmatch}")
                    if not schema:
                        print(f"  spark cols:  {sorted(spdf.columns)}")
                        print(f"  oracle cols: {sorted(opdf.columns)}")
            else:
                results[name] = {"rows_only": len(spdf)}
                print(f"ROWS {name}: {len(spdf)} rows")
        except Exception as ex:  # noqa: BLE001
            fails.append(name)
            results[name] = {"err": str(ex)[:400]}
            print(f"ERR  {name}: {str(ex)[:300]}")
        finally:
            # reclaim postings caches the query registered (ADVICE r09):
            # a 225-query sweep session must not accumulate cached blocks
            from timer_pulsar_spark.operators.dedup import release_persisted

            release_persisted()

    n = len(results)
    print(f"\n{n - len(fails)}/{n} pass; failures: {fails}")
    # SWEEP_OUT=/root/repo/ORACLE_SWEEP_rN.json commits the full-registry
    # evidence artifact (per-query rows/schema/hash, like CORRECTNESS)
    out = os.environ.get("SWEEP_OUT", "/tmp/verify_oracle.json")
    with open(out, "w") as f:
        json.dump(
            {
                "sf_dir": SF_DIR,
                "checked": n,
                "failures": fails,
                "results": results,
            },
            f,
            indent=1,
            default=str,
        )
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
