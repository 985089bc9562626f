#!/usr/bin/env python3
"""Local stand-in for the driver's t2 gate: run graft.Verify output against
DuckDB oracles and compare (sorted columns, sorted rows, exact values).

Usage: python3 tools/check_correctness.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True,
                        key=lambda s: s.astype(str))
    return df


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output");  n_fail += 1;  continue
        spark_df = canon(pd.concat([pd.read_parquet(f) for f in files]))
        try:
            duck_df = canon(con.sql(oracle[name]).df())
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}");  n_fail += 1;  continue
        ok_shape = spark_df.shape == duck_df.shape
        ok_cols = list(spark_df.columns) == list(duck_df.columns)
        if not (ok_shape and ok_cols):
            print(f"FAIL {name}: shape {spark_df.shape} vs {duck_df.shape}, "
                  f"cols {list(spark_df.columns)} vs {list(duck_df.columns)}")
            n_fail += 1;  continue
        # exact compare; report first diff
        diff = None
        for c in spark_df.columns:
            a, b = spark_df[c], duck_df[c]
            neq = ~((a == b) | (a.isna() & b.isna()))
            if neq.any():
                i = neq.idxmax()
                diff = (c, i, a[i], b[i], int(neq.sum()))
                break
        if diff:
            c, i, av, bv, n = diff
            print(f"FAIL {name}: col {c} row {i}: spark={av!r} duck={bv!r} ({n} diffs)")
            n_fail += 1
        else:
            print(f"PASS {name} ({spark_df.shape[0]} rows, {spark_df.shape[1]} cols)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
