#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: check.py <verifyOutDir> <sfDir>

Runs each oracle_sql.json query in DuckDB over the sf parquet tables and
compares with the Spark-written parquet under <verifyOutDir>/<name>/.
Compares: column sets (sorted by name), row counts, and exact values
(stringified) both in produced order and row-sorted order.
"""
import duckdb, json, sys, os

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def norm(df):
    df = df[sorted(df.columns)]
    return df

def values(df):
    return [tuple(str(v) for v in row) for row in df.itertuples(index=False)]

def main(out, sf):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        try:
            got = norm(con.sql(f"SELECT * FROM '{out}/{name}/*.parquet'").df())
            exp = norm(con.sql(oracle[name]).df())
        except Exception as e:
            print(f"FAIL {name}: error {e}")
            n_fail += 1
            continue
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: cols spark={list(got.columns)} oracle={list(exp.columns)}")
            n_fail += 1
            continue
        gv, ev = values(got), values(exp)
        if len(gv) != len(ev):
            print(f"FAIL {name}: rows spark={len(gv)} oracle={len(ev)}")
            n_fail += 1
            continue
        if gv == ev:
            print(f"PASS {name} ({len(gv)} rows, ordered)")
            n_pass += 1
        elif sorted(gv) == sorted(ev):
            print(f"WARN {name}: matches only after row sort")
            n_pass += 1
        else:
            diffs = [(a, b) for a, b in zip(gv, ev) if a != b][:3]
            print(f"FAIL {name}: value mismatch, first diffs: {diffs}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail, {len(oracle)} total ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
