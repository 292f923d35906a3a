#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: for each query output
parquet written by graft.Verify, run the matching oracle SQL in DuckDB over
the same sfDir tables and compare (column names sorted, rows sorted, exact
values). Usage: validate.py <sfDir> <verifyOutDir>"""
import sys, json, glob, os
import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # stringify for stable compare (mimics value hashing)
    df = df.astype(str)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        files = glob.glob(f"{d}/*.parquet")
        got = pd.concat([pd.read_parquet(f) for f in files]) if files else pd.DataFrame()
        if name not in oracle:
            results[name] = f"NO-ORACLE rows={len(got)}"
            continue
        try:
            exp = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            results[name] = f"ORACLE-SQL-ERROR: {e}"
            continue
        g, e = norm(got), norm(exp)
        if list(g.columns) != list(e.columns):
            results[name] = f"COLS-MISMATCH spark={list(g.columns)} duck={list(e.columns)}"
        elif len(g) != len(e):
            results[name] = f"ROWS-MISMATCH spark={len(g)} duck={len(e)}"
        elif not g.equals(e):
            diff = (g != e)
            bad_cols = [c for c in g.columns if diff[c].any()]
            i = diff.any(axis=1).idxmax()
            results[name] = (f"VALUES-MISMATCH cols={bad_cols} first_row={i} "
                             f"spark={g.iloc[i].to_dict()} duck={e.iloc[i].to_dict()}")
        else:
            results[name] = f"OK rows={len(g)}"
    ok = sum(1 for v in results.values() if v.startswith("OK"))
    for k, v in sorted(results.items()):
        print(f"{k:28s} {v}")
    print(f"--- {ok}/{len(results)} OK")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
