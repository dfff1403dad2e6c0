#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: for each query output
written by graft.Verify, run the oracle SQL in DuckDB over the same parquet
tables and compare (columns sorted by name, rows sorted, values normalized).

Usage: python3 scripts/compare.py <sfDir> <verifyOutDir>
"""
import json, math, sys, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6g}"
    if isinstance(v, list):
        return "[" + ",".join(norm(x) for x in v) + "]"
    return str(v)

def table_of(con, rel):
    cols = sorted(rel.columns)
    idx = [rel.columns.index(c) for c in cols]
    rows = rel.fetchall()
    out = sorted(tuple(norm(r[i]) for i in idx) for r in rows)
    return cols, out

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        spark_dir = f"{out_dir}/{name}"
        files = glob.glob(f"{spark_dir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            got = table_of(con, con.sql(f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')"))
            want = table_of(con, con.sql(oracle[name]))
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        if got[0] != want[0]:
            print(f"FAIL {name}: columns {got[0]} != {want[0]}")
            n_fail += 1
        elif got[1] != want[1]:
            diff = [(a, b) for a, b in zip(got[1], want[1]) if a != b][:3]
            print(f"FAIL {name}: {len(got[1])} vs {len(want[1])} rows; first diffs {diff}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got[1])} rows)")
            n_pass += 1
    missing = [d for d in os.listdir(out_dir)
               if os.path.isdir(f"{out_dir}/{d}") and d not in oracle]
    for name in missing:
        print(f"NOORACLE {name} (rows-only check)")
    print(f"== {n_pass} pass, {n_fail} fail, {len(missing)} rows-only ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
