#!/usr/bin/env python3
"""Local replica of the driver's correctness gate — STRICT variant.

Usage: check.py <verifyOutDir> <sfDir>

Key asymmetry replicated from the driver (discovered in round 1): the
Spark-written parquet is read with pandas/pyarrow (decimal columns surface
as decimal.Decimal, KEEPING trailing zeros: '318117.40'), while the oracle
SQL runs in DuckDB whose .df() converts every DECIMAL to float64
('318117.4'). Values are then stringified and compared. So a decimal
output column fails whenever any value ends in a zero digit — final query
outputs must be double/long/int/string, never decimal.

Strictness vs the round-1 version (per ADVICE.md):
  - spark side read via pandas.read_parquet (not duckdb) to mimic driver;
  - dtype lists printed on failure;
  - a row-order-insensitive match is a FAILURE (every query is specified
    to end in a total ORDER BY).
"""
import duckdb, glob, json, os, sys

import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(df):
    return df[sorted(df.columns)]


def values(df):
    return [tuple(str(v) for v in row) for row in df.itertuples(index=False)]


def main(out, sf):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    n_pass = n_fail = n_noracle = 0
    outputs = {n for n in os.listdir(out) if os.path.isdir(f"{out}/{n}")}
    # a query whose Verify run crashed writes NO output dir — that must be
    # a FAIL, not a silent skip, so iterate oracle keys and outputs both
    for name in sorted(outputs | set(oracle)):
        if name not in outputs:
            print(f"FAIL {name}: no Spark output written (query crashed in Verify?)")
            n_fail += 1
            continue
        parts = sorted(glob.glob(f"{out}/{name}/*.parquet"))
        if name not in oracle:
            n = sum(len(pd.read_parquet(p)) for p in parts)
            print(f"INFO {name}: no oracle (rows-only check), {n} rows")
            n_noracle += 1
            continue
        try:
            got = norm(pd.concat([pd.read_parquet(p) for p in parts]))
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
            print(f"PASS {name} ({len(gv)} rows)")
            n_pass += 1
        else:
            diffs = [(a, b) for a, b in zip(gv, ev) if a != b][:3]
            why = "ROW ORDER differs (missing total ORDER BY?)" \
                if sorted(gv) == sorted(ev) else f"first diffs: {diffs}"
            print(f"FAIL {name}: {why}")
            print(f"     spark dtypes={dict(got.dtypes.astype(str))}")
            print(f"     oracle dtypes={dict(exp.dtypes.astype(str))}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail, {n_noracle} rows-only, "
          f"{len(oracle)} with oracle ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
