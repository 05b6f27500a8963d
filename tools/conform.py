"""Driver-mimic conformance harness: run queries() vs oracle_sql().

Usage: python tools/conform.py [entry ...] [--sf DIR]
Runs each registry entry's Ray pipeline and its DuckDB oracle over the
same Parquet tables, compares row count, schema (column names sorted)
and exact values (column-sorted hash), mirroring the driver's
CORRECTNESS check.
"""
from __future__ import annotations

import argparse
import hashlib
import os
import sys

import duckdb
import pandas as pd
import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _to_pandas(x):
    if isinstance(x, pa.Table):
        return x.to_pandas()
    if isinstance(x, pd.DataFrame):
        return x
    return x.to_pandas()


def _hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)].reset_index(drop=True)
    return hashlib.md5(
        pd.util.hash_pandas_object(df, index=False).values.tobytes()
    ).hexdigest()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("entries", nargs="*")
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    args = ap.parse_args()

    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 log_to_driver=False)
    import __ray_entry__ as e

    qs = e.queries()
    oracles = e.oracle_sql()
    names = args.entries or sorted(qs)

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(args.sf, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    fails = 0
    for name in names:
        try:
            mine = _to_pandas(qs[name](args.sf))
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL {name}: query raised {ex!r}")
            fails += 1
            continue
        if name not in oracles:
            print(f"OK?  {name}: no oracle, rows={len(mine)}")
            continue
        try:
            ref = con.execute(oracles[name]).fetchdf()
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL {name}: oracle raised {ex!r}")
            fails += 1
            continue
        rows = len(mine) == len(ref)
        schema = sorted(mine.columns) == sorted(ref.columns)
        h = _hash(mine) == _hash(ref) if rows and schema else False
        ok = rows and schema and h
        if not ok:
            fails += 1
            print(f"FAIL {name}: rows {len(mine)} vs {len(ref)}, "
                  f"schema {sorted(mine.columns)} vs {sorted(ref.columns)}, "
                  f"hash_match={h}")
        else:
            print(f"PASS {name} ({len(mine)} rows)")
    print(f"\n{len(names) - fails}/{len(names)} pass")
    ray.shutdown()
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
