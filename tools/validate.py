#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: for each query output
parquet written by graft.Verify, run the matching oracle SQL in DuckDB over
the same sfDir tables and compare (column names sorted, rows sorted, exact
values). Usage: validate.py <sfDir> <verifyOutDir> [--no-cache]

Oracle-result CACHE (round-13 verdict #5): the sf0.1 whole-surface replay
costs 45-90 min of DuckDB compute, so it used to run rarely and late. Each
oracle result is now cached under tools/.oracle_cache keyed by
sha256(oracle SQL + data fingerprint + duckdb version); the fingerprint is
every sfDir table's (name, size, mtime_ns), so a driver data refresh or a
rewritten table invalidates every key while an unchanged query's replay is
ONE parquet read. What is cached is the NORMALIZED expected frame (columns
sorted, values stringified, rows sorted) — the exact object the comparison
consumes — so the roundtrip cannot introduce dtype drift. Invalidation is
spec-covered by tools/test_oracle_cache.py (mutated SQL, mutated data)."""
import sys, json, glob, os, hashlib
import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()
CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".oracle_cache")

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # stringify for stable compare (mimics value hashing)
    df = df.astype(str)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

def data_fingerprint(sf_dir):
    parts = [duckdb.__version__]
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            st = os.stat(p)
            parts.append(f"{t}:{st.st_size}:{st.st_mtime_ns}")
    return "|".join(parts)

def cached_oracle(con, sql, fp, use_cache):
    """Normalized expected frame for `sql`, through the cache."""
    if not use_cache:
        return norm(con.execute(sql).fetchdf()), "live"
    key = hashlib.sha256((sql + "\n" + fp).encode()).hexdigest()[:32]
    path = os.path.join(CACHE_DIR, key + ".parquet")
    if os.path.exists(path):
        return pd.read_parquet(path), "cached"
    exp = norm(con.execute(sql).fetchdf())
    os.makedirs(CACHE_DIR, exist_ok=True)
    tmp = path + f".tmp{os.getpid()}"
    exp.to_parquet(tmp)
    os.replace(tmp, path)
    return exp, "live"

def main(sf_dir, out_dir, use_cache=True):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    fp = data_fingerprint(sf_dir)
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    n_cached = 0
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
            e, src = cached_oracle(con, oracle[name], fp, use_cache)
            n_cached += src == "cached"
        except Exception as ex:
            results[name] = f"ORACLE-SQL-ERROR: {ex}"
            continue
        g = norm(got)
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
    print(f"--- {ok}/{len(results)} OK (oracle cache hits: {n_cached})")
    return results

if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    main(args[0], args[1], use_cache="--no-cache" not in sys.argv)
