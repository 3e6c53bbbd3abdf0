#!/usr/bin/env python3
"""r8 local oracle check: replay oracle_sql.json in DuckDB against the sf
parquet tables and diff against the Spark dumps (lexsorted, exact values).
Mirrors the driver's rows+schema+hash gate closely enough to catch any
result change from this round's optimizations."""
import json, sys, glob
import duckdb
import pandas as pd

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None

oracle = json.load(open(f"{out}/oracle_sql.json"))
con = duckdb.connect()
for t in ["documents", "embeddings", "events", "customer", "orders",
          "lineitem", "part", "supplier", "nation", "region"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")

fails, okc, skip = [], 0, 0
for name in sorted(oracle):
    if only and name not in only:
        continue
    files = glob.glob(f"{out}/{name}/*.parquet")
    if not files:
        print(f"{name}: NO SPARK DUMP"); fails.append(name); continue
    try:
        odf = con.execute(oracle[name]).df()
        sdf = pd.concat([pd.read_parquet(f) for f in files])
    except Exception as e:
        print(f"{name}: ERR {e}"); fails.append(name); continue
    if list(odf.columns) != list(sdf.columns):
        print(f"{name}: SCHEMA {list(odf.columns)} vs {list(sdf.columns)}")
        fails.append(name); continue
    if len(odf) != len(sdf):
        print(f"{name}: ROWS {len(odf)} vs {len(sdf)}"); fails.append(name); continue
    cols = list(odf.columns)
    o = odf.astype(str).sort_values(cols, kind="mergesort").reset_index(drop=True)
    s = sdf.astype(str).sort_values(cols, kind="mergesort").reset_index(drop=True)
    if not o.equals(s):
        neq = (o != s).any(axis=1)
        print(f"{name}: VALUE MISMATCH ({neq.sum()} rows), first:")
        print(o[neq].head(2)); print(s[neq].head(2))
        fails.append(name); continue
    okc += 1
print(f"\nOK={okc} FAIL={len(fails)} {'ALL GREEN' if not fails else fails}")
sys.exit(1 if fails else 0)
