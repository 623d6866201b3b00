"""Driver-style correctness sweep: run every registered query on a vanilla
SparkSession and compare row-count / sorted-column value-hash against the
DuckDB oracle at sf0.01.  Mirrors the per-round gate so mismatches are caught
locally before the driver records them.

Usage: python scripts/verify_oracle.py [sf_dir] [only_query ...]
"""
import hashlib
import json
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = set(sys.argv[2:])

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

    results = {}
    fails = []
    for name, fn in queries.items():
        if ONLY and name not in ONLY:
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
