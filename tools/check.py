#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: run Verify's parquet
outputs against the DuckDB oracle SQL and compare (cols sorted by name,
rows sorted, exact values). Usage:
    python3 tools/check.py [sfDir] [verifyOutDir] [only_query ...]
"""
import duckdb, json, sys

import numpy as np
import pandas as pd

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
only = set(sys.argv[3:])

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

oracle = json.load(open(f"{out}/oracle_sql.json"))
fails = 0
for name, sql in sorted(oracle.items()):
    if only and name not in only:
        continue
    try:
        sdf = con.sql(f"SELECT * FROM '{out}/{name}/*.parquet'").df()
        odf = con.sql(sql).df()
        scols, ocols = sorted(sdf.columns), sorted(odf.columns)
        if scols != ocols:
            print(f"{name}: SCHEMA spark={scols} oracle={ocols}")
            fails += 1
            continue
        sdf = sdf[scols].sort_values(scols).reset_index(drop=True)
        odf = odf[ocols].sort_values(ocols).reset_index(drop=True)
        if len(sdf) != len(odf):
            print(f"{name}: ROWS spark={len(sdf)} oracle={len(odf)}")
            fails += 1
            continue
        bad_cols = {}
        for c in scols:
            a, b = sdf[c], odf[c]
            if a.dtype.kind in "fc" or b.dtype.kind in "fc":
                av, bv = a.astype(float).values, b.astype(float).values
                neq = ~((av == bv) | (np.isnan(av) & np.isnan(bv)))
            else:
                neq = ~((a.astype(object) == b.astype(object)) | (a.isna() & b.isna())).values
            if neq.any():
                bad_cols[c] = int(neq.sum())
        if bad_cols:
            print(f"{name}: VALUES {bad_cols}")
            mask = pd.Series(False, index=sdf.index)
            for c in bad_cols:
                a, b = sdf[c], odf[c]
                if a.dtype.kind in "fc" or b.dtype.kind in "fc":
                    av, bv = a.astype(float).values, b.astype(float).values
                    mask |= ~((av == bv) | (np.isnan(av) & np.isnan(bv)))
                else:
                    mask |= ~((a.astype(object) == b.astype(object)) | (a.isna() & b.isna())).values
            print("  spark:\n", sdf[mask].head(3).to_string())
            print("  oracle:\n", odf[mask].head(3).to_string())
            fails += 1
        else:
            print(f"{name}: OK ({len(sdf)} rows)")
    except Exception as e:
        print(f"{name}: ERR {type(e).__name__}: {e}")
        fails += 1
print(f"\n{'FAIL ' + str(fails) if fails else 'ALL OK'}")
sys.exit(1 if fails else 0)
