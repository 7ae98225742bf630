"""Local stand-in for the driver's correctness gate.

Runs every queries() entry at the given sf dir, runs the matching
oracle_sql() through DuckDB over the same parquet tables, and compares
row count, column names, and an order-insensitive value hash.

Usage: python scripts/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings".split()
)


def to_pandas(result) -> pd.DataFrame:
    if isinstance(result, pd.DataFrame):
        return result
    if hasattr(result, "to_pandas"):
        return result.to_pandas()
    raise TypeError(type(result))


def canonical(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith(("float", "Float")):
            df[c] = df[c].round(6)
        if str(df[c].dtype).startswith("datetime64[ns"):
            df[c] = df[c].astype("datetime64[us]")
        if str(df[c].dtype) in ("uint64",):
            df[c] = df[c].astype("int64", errors="ignore")
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(name: str, ours: pd.DataFrame, oracle: pd.DataFrame) -> list[str]:
    problems = []
    if len(ours) != len(oracle):
        problems.append(f"rows {len(ours)} != {len(oracle)}")
    if sorted(ours.columns) != sorted(oracle.columns):
        problems.append(f"cols {sorted(ours.columns)} != {sorted(oracle.columns)}")
        return problems
    a, b = canonical(ours), canonical(oracle)
    if len(a) == len(b):
        try:
            pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)
        except AssertionError as exc:
            problems.append(f"values differ: {str(exc).splitlines()[-1]}")
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entrymod

    qs, sqls = entrymod.queries(), entrymod.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            ours = to_pandas(fn(sf_dir))
        except Exception as exc:
            print(f"FAIL  {name}: query raised {type(exc).__name__}: {exc}")
            failures += 1
            continue
        dt = time.time() - t0
        if name not in sqls:
            print(f"ok*   {name}: rows-only ({len(ours)} rows, {dt:.1f}s)")
            continue
        oracle = con.execute(sqls[name]).df()
        problems = compare(name, ours, oracle)
        if problems:
            print(f"FAIL  {name}: {'; '.join(problems)}  ({dt:.1f}s)")
            failures += 1
        else:
            print(f"ok    {name}: {len(ours)} rows match oracle ({dt:.1f}s)")
    print("FAILURES:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
