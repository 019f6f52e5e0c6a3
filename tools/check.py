#!/usr/bin/env python3
"""Dev-only local mirror of the driver's correctness gate (not product code).

Mirrors the driver's pandas-based comparer semantics so local green implies
driver green:
  * results load as pandas DataFrames (duckdb .df()), columns sorted by name
  * list/array/struct-typed cells are a hard ERR (the driver's comparer
    raises `unhashable type: numpy.ndarray` when lexsorting/hashing them)
  * cell rendering is dtype-faithful: int64 394 and float64 394.0 hash
    DIFFERENTLY (this is how DuckDB HUGEINT -> pandas float64 drift shows
    up driver-side even when values are numerically equal)

Usage: python3 tools/check.py [sfdir] [outdir]
  1. expects `sbt "runMain graft.Verify <sfdir> <outdir>"` to have run
  2. for each query parquet in outdir, runs the oracle SQL from
     oracle_sql.json in DuckDB over the same sf tables and compares
     (column names, row count, dtype-faithful values ordered + multiset).
"""
import json, sys
import numpy as np
import pandas as pd
import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))

# A SPARK_GRAFT_ONLY subset run filters oracle_sql.json too, so without the
# meta marker a subset would be indistinguishable from a full gate run and
# "N/N match" would overstate coverage. Loud banner + annotated summary.
try:
    verify_meta = json.load(open(f"{OUT}/verify_meta.json"))
except FileNotFoundError:
    verify_meta = {}
SUBSET = bool(verify_meta.get("subset"))
if SUBSET:
    print(f"*** SUBSET RUN: {verify_meta.get('n_selected')}/"
          f"{verify_meta.get('n_registry')} registry queries -- NOT a full "
          f"correctness gate (skipped: {len(verify_meta.get('skipped', []))})")

# Verify records per-query exceptions here; a throwing query writes no
# parquet, and without this check it would silently vanish from the compare
# (r8: 20 broken queries read as "140/140 green").
import os
try:
    verify_errors = json.load(open(f"{OUT}/verify_errors.json"))
except FileNotFoundError:
    verify_errors = {}


def cell(v):
    """Dtype-faithful scalar rendering. Distinct dtypes must render
    distinctly (int64 394 -> 'i:394', float64 394.0 -> 'f:394.0') and
    unhashable cells must raise, mirroring the driver comparer."""
    if isinstance(v, (list, tuple, dict, set, np.ndarray)):
        raise TypeError(
            f"unhashable cell type {type(v).__name__}: the driver comparer "
            "cannot sort/hash array cells -- serialize to a string "
            "(q_inverted_index precedent) or explode to atomic columns")
    if v is None or v is pd.NaT:
        return "<null>"
    if isinstance(v, (bool, np.bool_)):
        return f"b:{bool(v)}"
    if isinstance(v, (float, np.floating)):
        # NaN renders distinctly from None: in float64 columns BOTH engines
        # surface NULL as NaN (parquet null -> pandas NaN, DuckDB NULL ->
        # pandas NaN), so they still match; in object columns a NaN-vs-None
        # divergence is a real engine difference and must fail.
        return "f:nan" if np.isnan(v) else f"f:{float(v)!r}"
    if isinstance(v, (int, np.integer)):
        return f"i:{int(v)}"
    if isinstance(v, str):
        return f"s:{v!r}"
    if isinstance(v, (bytes, bytearray)):
        return f"y:{bytes(v)!r}"
    return f"{type(v).__name__}:{v!r}"


def rows_of(df):
    return [tuple(cell(v) for v in row)
            for row in df.itertuples(index=False, name=None)]


fails = 0
for name, sql in sorted(oracle.items()):
    if not os.path.isdir(f"{OUT}/{name}"):
        why = verify_errors.get(name, "no result dir (query not run?)")
        print(f"FAIL {name}: missing result -- {why}")
        fails += 1
        continue
    try:
        mine = con.sql(f"SELECT * FROM '{OUT}/{name}/*.parquet'").df()
        ora = con.sql(sql).df()
        mine = mine[sorted(mine.columns)]
        ora = ora[sorted(ora.columns)]
        if list(mine.columns) != list(ora.columns):
            print(f"FAIL {name}: cols mine={list(mine.columns)} oracle={list(ora.columns)}")
            fails += 1; continue
        if len(mine) != len(ora):
            print(f"FAIL {name}: rows mine={len(mine)} oracle={len(ora)}")
            fails += 1; continue
        mrows, orows = rows_of(mine), rows_of(ora)
        if mrows == orows:
            print(f"OK   {name} ({len(mrows)} rows)")
        elif sorted(mrows) == sorted(orows):
            print(f"WARN {name}: same multiset, different order ({len(mrows)} rows)")
        else:
            diff = [(a, b) for a, b in zip(sorted(mrows), sorted(orows)) if a != b][:3]
            print(f"FAIL {name}: value/dtype mismatch, first diffs: {diff}")
            fails += 1
    except Exception as e:
        print(f"ERR  {name}: {e}"); fails += 1
tag = " (SUBSET -- not a full gate)" if SUBSET else ""
print(f"\n{len(oracle) - fails}/{len(oracle)} queries match{tag}")
if fails:
    sys.exit(1)
# A subset run must not read as a passed FULL gate to exit-code-only
# consumers: exit 3 unless the caller explicitly acknowledged the subset.
if SUBSET and "--allow-subset" not in sys.argv:
    print("exit 3: subset run passed but is NOT a full gate "
          "(pass --allow-subset to accept)")
    sys.exit(3)
sys.exit(0)
