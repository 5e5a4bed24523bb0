#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run graft.Verify
output against the DuckDB oracle and diff. Dev tooling only — the Scala
library never depends on this.

Usage: python3 tools/check.py [sf_dir] [verify_out_dir]
(run `sbt "runMain graft.Verify <sf_dir> <out_dir>"` first)
"""
import glob
import json
import os
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df) and len(df.columns):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df.reset_index(drop=True)


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    names = sorted(d[:-len(".parquet")] for d in os.listdir(out)
                   if d.endswith(".parquet") and os.path.isdir(os.path.join(out, d)))
    n_pass = n_fail = 0
    for name in names:
        files = glob.glob(f"{out}/{name}.parquet/*.parquet")
        if not files:
            print(f"FAIL {name}: no parquet output")
            n_fail += 1
            continue
        mine = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
        if name not in oracle:
            status = "ROWS-ONLY" if len(mine) > 0 else "ROWS-ONLY-EMPTY!"
            print(f"{status:>6} {name}: rows={len(mine)}")
            continue
        try:
            ref = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        a, b = canon(mine), canon(ref)
        if list(a.columns) != list(b.columns):
            print(f"FAIL {name}: columns {list(a.columns)} vs {list(b.columns)}")
            n_fail += 1
            continue
        if len(a) != len(b):
            print(f"FAIL {name}: rows {len(a)} vs {len(b)}")
            n_fail += 1
            continue
        bad = []
        for c in a.columns:
            x, y = a[c], b[c]
            try:
                if x.dtype.kind == "f" or y.dtype.kind == "f":
                    # Driver hashes exact values: float 3.0 vs int 3 is a
                    # mismatch there even though numerically equal here.
                    if x.dtype.kind != y.dtype.kind:
                        bad.append(f"{c} (dtype {x.dtype} vs {y.dtype}: "
                                   "driver hash would differ)")
                        continue
                    import numpy as np
                    xe, ye = x.fillna(1.5e308), y.fillna(1.5e308)
                    if not (xe.values == ye.values).all():
                        d = float(abs(xe.values - ye.values).max())
                        bad.append(f"{c} (float, maxabs={d:.3e})")
                else:
                    if not x.astype(str).equals(y.astype(str)):
                        bad.append(c)
            except Exception as e:
                bad.append(f"{c} ({e})")
        if bad:
            print(f"FAIL {name}: mismatched cols: {bad}")
            n_fail += 1
        else:
            print(f"  PASS {name}: rows={len(a)}")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, "
          f"{len(names) - n_pass - n_fail} rows-only")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
