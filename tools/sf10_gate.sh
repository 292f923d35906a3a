#!/bin/bash
# Repeatable sf10 (= 100x sf0.1) whole-surface benchmark gate
# (round-13 verdict #5: the 100x sweep was a one-off with a hand-raised
# heap; this script IS the protocol).
#
# - Regenerates the 100x heavy-family tables if absent (documents /
#   embeddings / events via tools/gen_sf10.py; TPC-H tables ride at 1x
#   as symlinks — the stress targets are the doc/embed/event families).
# - Runs the STOCK Bench harness (same code path as the driver's per-round
#   sf0.1 run) over the full query surface with the documented 64 GiB
#   driver heap — the r13 sweep's finding: the 100x artifact cache set
#   does not fit the default 8 GiB JVM.
# - Bench's own min-merge protocol updates the committed sf10 floor file
#   (tools/bench_baseline__root_repo_.localdata_sf10.json) on a full run,
#   so one regression in the heavy family is caught the round it lands,
#   not a round late.
#
# Usage: tools/sf10_gate.sh [out.json] [query-subset...]
#   (a subset run times only the named rows and never advances the floor)
set -eo pipefail
cd /root/repo
OUT="${1:-/tmp/bench_sf10.json}"
shift || true
LOG="${OUT%.json}.log"

SF10=/root/repo/.localdata/sf10
if [ ! -f "$SF10/documents.parquet" ]; then
  echo "[sf10_gate] generating 100x data at $SF10" >&2
  # generate into a temp dir and mv into place: gen_sf10.py writes
  # incrementally to its final paths, so a crash mid-generation would
  # otherwise leave a PARTIAL table behind the existence guard — and a
  # later full run would min-merge artificially fast floors over the
  # truncated data into the committed baseline (floors never ratchet
  # back up)
  TMP="$SF10.tmp.$$"
  rm -rf "$TMP"
  python3 tools/gen_sf10.py "$TMP" 100
  # only the FIXED dimension tables ride at 1x (5/25 rows by TPC-H
  # construction); facts are generated at 10x by gen_sf10.py (r15)
  for t in region nation; do
    [ -e "$TMP/$t.parquet" ] || ln -s "/root/testdata/sf0.1/$t.parquet" "$TMP/$t.parquet"
  done
  rm -rf "$SF10"
  mv "$TMP" "$SF10"
fi

SPARK_GRAFT_SF_DIR="$SF10" \
SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}" \
SPARK_DRIVER_MEM="${SPARK_DRIVER_MEM:-64g}" \
  sbt -batch "runMain graft.Bench $*" 2>>"$LOG" \
  | tee -a "$LOG" | awk '/^\{"metric"/' | tail -1 > "$OUT"
[ -s "$OUT" ] || { echo "[sf10_gate] no bench JSON produced — see $LOG" >&2; exit 1; }
echo "[sf10_gate] wrote $OUT" >&2
python3 - "$OUT" <<'EOF'
import json, sys
d = json.load(open(sys.argv[1]))
print(f"total={d['value']:.1f}s errors={d['errors']} regressions={list(d['regressions'])} window_factor={d['window_factor']:.3f}")
EOF
