#!/usr/bin/env python3
"""Invalidation spec for validate.py's oracle-result cache (round-13
verdict #5): a cached result must be reused only while BOTH the oracle SQL
and the underlying data are byte-identical — a mutated SQL or a rewritten
table must MISS and recompute. Run: python3 tools/test_oracle_cache.py"""
import json, os, shutil, sys, tempfile, time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import validate

def fake_world(root, values):
    """A minimal sfDir (one real table) + verify-out dir for one query."""
    sf = os.path.join(root, "sf"); os.makedirs(sf, exist_ok=True)
    out = os.path.join(root, "out")
    qdir = os.path.join(out, "q"); os.makedirs(qdir, exist_ok=True)
    pd.DataFrame({"r_regionkey": values}).to_parquet(f"{sf}/region.parquet")
    pd.DataFrame({"k": sorted(values)}).to_parquet(f"{qdir}/part-0.parquet")
    with open(f"{out}/oracle_sql.json", "w") as f:
        json.dump({"q": "SELECT r_regionkey AS k FROM region ORDER BY 1"}, f)
    return sf, out

def run(sf, out):
    return validate.main(sf, out, use_cache=True)["q"]

def cache_files():
    d = validate.CACHE_DIR
    return set(os.listdir(d)) if os.path.isdir(d) else set()

root = tempfile.mkdtemp(prefix="oracle-cache-spec")
validate.CACHE_DIR = os.path.join(root, "cache")  # isolated cache
sf, out = fake_world(root, [1, 2, 3])

# miss → compute + store; hit → same verdict from the cache file
assert run(sf, out).startswith("OK")
after_first = cache_files()
assert len(after_first) == 1, after_first
assert run(sf, out).startswith("OK")
assert cache_files() == after_first, "second run must HIT, not re-store"

# mutated SQL → new key (the old entry must not answer for the new SQL)
with open(f"{out}/oracle_sql.json", "w") as f:
    json.dump({"q": "SELECT r_regionkey + 1 AS k FROM region ORDER BY 1"}, f)
assert "MISMATCH" in run(sf, out), "mutated SQL must recompute and now mismatch"
assert len(cache_files()) == 2, "mutated SQL must be a cache MISS"

# mutated data → new fingerprint → miss (the stale cached result for the
# ORIGINAL sql must not be served against the new table)
with open(f"{out}/oracle_sql.json", "w") as f:
    json.dump({"q": "SELECT r_regionkey AS k FROM region ORDER BY 1"}, f)
time.sleep(0.01)  # ensure mtime_ns moves even on coarse filesystems
pd.DataFrame({"r_regionkey": [1, 2, 4]}).to_parquet(f"{sf}/region.parquet")
assert "MISMATCH" in run(sf, out), "rewritten table must recompute (spark out is stale)"
assert len(cache_files()) == 3, "rewritten table must be a cache MISS"

shutil.rmtree(root)
print("oracle-cache invalidation spec: OK")
