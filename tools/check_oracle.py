#!/usr/bin/env python3
"""Local oracle cross-check (builder-side iteration aid; the real gate is the
driver's CORRECTNESS_r{N}.json): run each DuckDB oracle from oracle_sql.json
against the parquet dumped by `runMain graft.Verify`, mirroring the driver's
compare — columns sorted by name, rows sorted, values compared exactly.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir> [query ...]
"""
import duckdb, json, sys, os
import pandas as pd

sf, out = sys.argv[1], sys.argv[2]
only = set(sys.argv[3:])
oracle = json.load(open(f"{out}/oracle_sql.json"))
tables = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]
fails = 0
for name, sql in sorted(oracle.items()):
    if only and name not in only:
        continue
    d = f"{out}/{name}"
    if not os.path.isdir(d):
        print(f"{name}: NO RESULT DIR")
        fails += 1
        continue
    con = duckdb.connect()
    for t in tables:
        p = f"{sf}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"create view {t} as select * from '{p}'")
    try:
        o = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"{name}: ORACLE ERR {e}")
        fails += 1
        continue
    s = con.execute(f"select * from '{d}/*.parquet'").fetchdf()
    o = o.reindex(sorted(o.columns), axis=1)
    s = s.reindex(sorted(s.columns), axis=1)
    if list(o.columns) != list(s.columns):
        print(f"{name}: SCHEMA mismatch spark={list(s.columns)} oracle={list(o.columns)}")
        fails += 1
        continue
    if len(o) != len(s):
        print(f"{name}: ROWS spark={len(s)} oracle={len(o)}")
        fails += 1
        continue
    cols = list(o.columns)
    o2 = o.sort_values(by=cols).reset_index(drop=True)
    s2 = s.sort_values(by=cols).reset_index(drop=True)
    try:
        for c in cols:
            if o2[c].dtype != s2[c].dtype:
                s2[c] = s2[c].astype(o2[c].dtype)
    except Exception:
        pass
    eq = o2.equals(s2)
    print(f"{name}: {'OK' if eq else 'VALUE MISMATCH'} ({len(s)} rows)")
    if not eq:
        fails += 1
        diff = (o2 != s2) & ~(o2.isna() & s2.isna())
        idx = diff.any(axis=1)
        print("-- spark:")
        print(s2[idx].head(5))
        print("-- oracle:")
        print(o2[idx].head(5))
sys.exit(1 if fails else 0)
