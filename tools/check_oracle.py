#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/<name>/ (parquet written by graft.Verify) and
<verifyOutDir>/oracle_sql.json, runs each SQL in DuckDB with the sf tables
registered as views, and compares: row count, column names, and exact
values (columns sorted by name, rows sorted by all columns).
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: bytes(v) if isinstance(v, (bytearray, memoryview)) else v)
    if len(df):
        df = df.sort_values(by=list(df.columns), ignore_index=True,
                            na_position="first")
    return df.reset_index(drop=True)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            spark_df = pd.read_parquet(f"{out_dir}/{name}")
            duck_df = con.execute(sql).fetchdf()
            a, b = canon(spark_df), canon(duck_df)
            if list(a.columns) != list(b.columns):
                print(f"FAIL {name}: columns {list(a.columns)} != {list(b.columns)}")
                n_fail += 1
                continue
            if len(a) != len(b):
                print(f"FAIL {name}: rows {len(a)} != {len(b)}")
                n_fail += 1
                continue
            mismatch = None
            for c in a.columns:
                av, bv = a[c], b[c]
                try:
                    eq = (av.values == bv.values) | (av.isna().values & bv.isna().values)
                except Exception:
                    eq = av.astype(str).values == bv.astype(str).values
                if not eq.all():
                    i = int((~eq).argmax())
                    mismatch = (c, i, av.iloc[i], bv.iloc[i])
                    break
            if mismatch:
                c, i, x, y = mismatch
                print(f"FAIL {name}: col {c} row {i}: spark={x!r} duck={y!r}")
                n_fail += 1
            else:
                # dtype report (informational — driver may compare types)
                dt = {c: (str(a[c].dtype), str(b[c].dtype))
                      for c in a.columns if str(a[c].dtype) != str(b[c].dtype)}
                extra = f"  dtype-diff={dt}" if dt else ""
                print(f"PASS {name} ({len(a)} rows){extra}")
                n_pass += 1
        except Exception as e:
            print(f"ERROR {name}: {type(e).__name__}: {e}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
