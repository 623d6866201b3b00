"""Shared fixtures: one SparkSession per test run, a DuckDB oracle, and a
canonicalizing compare that mirrors the driver's correctness gate
(row-count + schema + order-insensitive value hash; doubles rounded,
timestamps as UTC ISO strings)."""

from __future__ import annotations

import math
import os

import duckdb
import pandas as pd
import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="session")
def spark():
    from timer_pulsar_spark.session import get_spark

    s = get_spark("tests")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        path = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    yield con
    con.close()


def canonicalize(df: pd.DataFrame) -> pd.DataFrame:
    """Sorted columns, rows sorted by repr, doubles rounded to 9 places,
    timestamps to UTC-naive ISO strings — the driver's comparison rules."""
    out = df.copy()
    out = out[sorted(out.columns)]
    for col in out.columns:
        s = out[col]
        if pd.api.types.is_datetime64_any_dtype(s):
            s = pd.to_datetime(s)
            if getattr(s.dt, "tz", None) is not None:
                s = s.dt.tz_convert("UTC").dt.tz_localize(None)
            out[col] = s.dt.strftime("%Y-%m-%dT%H:%M:%S.%f")
        elif pd.api.types.is_float_dtype(s):
            out[col] = s.map(
                lambda v: None
                if v is None or (isinstance(v, float) and math.isnan(v))
                else round(float(v), 9)
            )
        elif s.dtype == object:
            out[col] = s.map(lambda v: round(float(v), 9) if isinstance(v, float) else v)
    out = out.sort_values(by=list(out.columns), key=lambda c: c.astype(str)).reset_index(drop=True)
    return out


def assert_matches_oracle(spark_df, duck_con, sql: str, *, check_rows: int | None = None):
    got = canonicalize(spark_df.toPandas())
    want = canonicalize(duck_con.execute(sql).fetchdf())
    assert list(got.columns) == list(want.columns), f"columns {list(got.columns)} != {list(want.columns)}"
    assert len(got) == len(want), f"row count {len(got)} != {len(want)}"
    if check_rows is not None:
        assert len(got) >= check_rows
    ga, wa = got.astype(str), want.astype(str)
    mism = (ga != wa).any(axis=1)
    if mism.any():
        idx = mism[mism].index[:5]
        raise AssertionError(
            f"value mismatch on {int(mism.sum())}/{len(got)} rows; first:\n"
            f"spark:\n{got.loc[idx]}\nduck:\n{want.loc[idx]}"
        )


def replay_batch_ids(prefix: str) -> set[int]:
    """Committed micro-batch ids of the NEWEST replay workdir for a
    prefix. Replay scratch dirs moved under the shared self-pruning
    root (streaming.state.replay_workdir) in round 8; tests that
    globbed bare /tmp/<prefix>_* kept passing on stale pre-move dirs
    until a fresh container surfaced the rot (round 10). Newest-dir
    selection keeps concurrent/old replays from vacuously passing."""
    import glob
    import re
    import tempfile

    root = os.path.join(tempfile.gettempdir(), "timerlake_replays")
    dirs = sorted(
        glob.glob(os.path.join(root, f"{prefix}_*")),
        key=os.path.getmtime,
    )
    if not dirs:
        return set()
    # commits/, not offsets/: Structured Streaming writes the offsets
    # file at batch START — a replay stopped mid-batch has an offsets
    # entry with no matching commit, and counting it would re-open the
    # vacuous-pass hole this helper exists to close
    ckpts = glob.glob(os.path.join(dirs[-1], "ckpt", "commits", "*"))
    return {
        int(m.group(1))
        for p in ckpts
        for m in [re.search(r"/commits/(\d+)$", p)]
        if m
    }
