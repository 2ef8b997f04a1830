"""Local stand-in for the driver's correctness gate: run every
``queries()`` entry at sf0.01 and compare against ``oracle_sql()`` via
DuckDB — row count, schema, and order-insensitive value equality.

Usage: python scripts/check_correctness.py [name ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import numpy as np
import pandas as pd

import os
SF_DIR = os.environ.get("CHECK_SF_DIR", "/root/testdata/sf0.01")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa

    try:
        import ray.data

        if isinstance(res, ray.data.Dataset):
            return res.to_pandas()
    except ImportError:
        pass
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object and len(df) and isinstance(df[c].iloc[0], bytes):
            df[c] = df[c].map(lambda b: b.hex())
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def compare(name: str, mine: pd.DataFrame, theirs: pd.DataFrame) -> list[str]:
    problems = []
    if len(mine) != len(theirs):
        problems.append(f"row count {len(mine)} != {len(theirs)}")
    if sorted(mine.columns) != sorted(theirs.columns):
        problems.append(f"columns {sorted(mine.columns)} != {sorted(theirs.columns)}")
        return problems
    a, b = normalize(mine), normalize(theirs)
    if len(a) == len(b):
        for c in a.columns:
            av, bv = a[c].to_numpy(), b[c].to_numpy()
            # the driver hashes VALUES AND DTYPES: int64 1 vs float64 1.0
            # hash-mismatch even though `==` calls them equal — reproduce
            # that here by failing on differing dtype kinds (int vs float
            # vs datetime vs object), the gap that let the sessionize
            # family pass locally while failing the driver in round 1
            ka, kb = av.dtype.kind, bv.dtype.kind
            if {ka, kb} <= {"i", "u"}:
                ka = kb = "i"
            if ka != kb:
                problems.append(f"col {c}: dtype kind {av.dtype} != {bv.dtype}")
                continue
            if av.dtype.kind == "f" or bv.dtype.kind == "f":
                eq = (av == bv) | (pd.isna(av) & pd.isna(bv))
            else:
                eq = av == bv
            neq = int((~np.asarray(eq)).sum())
            if neq:
                i = int(np.nonzero(~np.asarray(eq))[0][0])
                problems.append(f"col {c}: {neq} mismatches, first at {i}: {av[i]!r} vs {bv[i]!r}")
    return problems


def main(argv):
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as E

    E._SF001 = SF_DIR  # rebind the oracle fixture dir to the swept scale
    qs = E.queries()
    oracles = E.oracle_sql()
    only = set(argv) or set(qs)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")

    failures = 0
    for name, fn in qs.items():
        if name not in only:
            continue
        t0 = time.time()
        try:
            mine = to_pandas(fn(SF_DIR))
        except Exception as e:
            print(f"FAIL {name}: query raised {type(e).__name__}: {e}")
            failures += 1
            continue
        el = time.time() - t0
        if name not in oracles:
            print(f"ok?  {name}: rows-only ({len(mine)} rows, {el:.1f}s) cols={list(mine.columns)}")
            continue
        try:
            theirs = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle raised {type(e).__name__}: {e}")
            failures += 1
            continue
        problems = compare(name, mine, theirs)
        if problems:
            failures += 1
            print(f"FAIL {name} ({len(mine)} vs {len(theirs)} rows, {el:.1f}s):")
            for p in problems:
                print(f"     - {p}")
        else:
            print(f"PASS {name} ({len(mine)} rows, {el:.1f}s)")
    print(f"\n{failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
