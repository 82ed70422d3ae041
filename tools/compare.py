#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>

Reads each <outDir>/<name> parquet (Spark result), runs the matching
oracle SQL from <outDir>/oracle_sql.json in DuckDB over the sf tables,
sorts columns by name then rows, and compares values.
"""
import json
import math
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df) and len(df.columns):
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def values_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b  # strict: driver hashes values
    return a == b


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = canon(con.sql(f"SELECT * FROM ('{out_dir}/{name}/*.parquet')").df()
                        if False else
                        duckdb.sql(f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df())
            want = canon(con.sql(sql).df())
        except Exception as e:
            print(f"FAIL {name}: exception {e}")
            n_fail += 1
            continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
            n_fail += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            n_fail += 1
            continue
        bad = 0
        for c in got.columns:
            for i, (x, y) in enumerate(zip(got[c], want[c])):
                # normalize numpy scalars
                x = x.item() if hasattr(x, "item") else x
                y = y.item() if hasattr(y, "item") else y
                if not values_equal(x, y):
                    if bad < 3:
                        print(f"  {name}.{c}[{i}]: spark={x!r} oracle={y!r}")
                    bad += 1
        if bad:
            print(f"FAIL {name}: {bad} mismatched values")
            n_fail += 1
        else:
            print(f"OK   {name}: {len(got)} rows")
    return n_fail


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
