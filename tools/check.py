#!/usr/bin/env python3
"""Dev-only local mirror of the driver's correctness gate (not product code).

Usage: python3 tools/check.py [sfdir] [outdir]
  1. expects `sbt "runMain graft.Verify <sfdir> <outdir>"` to have run
  2. for each query parquet in outdir, runs the oracle SQL from
     oracle_sql.json in DuckDB over the same sf tables and compares
     (column names, row count, values both ordered and as multisets).
"""
import json, math, sys
import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))

def norm(v):
    if isinstance(v, float):
        if math.isnan(v): return "NaN"
        return round(v, 9)
    return v

fails = 0
for name, sql in sorted(oracle.items()):
    try:
        mine = con.sql(f"SELECT * FROM '{OUT}/{name}/*.parquet'")
        mcols = sorted(mine.columns)
        mrows = [tuple(norm(v) for v in row) for row in
                 con.sql("SELECT " + ', '.join(f'"{c}"' for c in mcols) + " FROM mine").fetchall()]
        ora = con.sql(sql)
        ocols = sorted(ora.columns)
        orows = [tuple(norm(v) for v in row) for row in
                 con.sql("SELECT " + ', '.join(f'"{c}"' for c in ocols) + " FROM ora").fetchall()]
        if mcols != ocols:
            print(f"FAIL {name}: cols mine={mcols} oracle={ocols}"); fails += 1; continue
        if len(mrows) != len(orows):
            print(f"FAIL {name}: rows mine={len(mrows)} oracle={len(orows)}"); fails += 1; continue
        if mrows == orows:
            print(f"OK   {name} ({len(mrows)} rows)")
        elif sorted(map(repr, mrows)) == sorted(map(repr, orows)):
            print(f"WARN {name}: same multiset, different order ({len(mrows)} rows)")
        else:
            diff = [(a, b) for a, b in zip(mrows, orows) if a != b][:3]
            print(f"FAIL {name}: value mismatch, first diffs: {diff}"); fails += 1
    except Exception as e:
        print(f"ERR  {name}: {e}"); fails += 1
print(f"\n{len(oracle) - fails}/{len(oracle)} queries match")
sys.exit(1 if fails else 0)
