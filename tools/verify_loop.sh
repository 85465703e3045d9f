#!/bin/bash
# Repeated-verify loop (VERDICT r14 #1 done-criterion): N full CONCURRENT
# Verify runs at sf0.01, each against the DuckDB oracle — the r14 race
# (session-global partitionOverwriteMode mutation under the Verify pool)
# was probabilistic, so one green run proves little; a loop of full runs
# with zero incremental-family failures is the evidence bar. Exit 0 only
# if EVERY run is all-pass.
set -e
cd "$(dirname "$0")/.."
N="${1:-5}"
fail=0
for i in $(seq 1 "$N"); do
  out="/tmp/graft_verify_loop_$i"
  rm -rf "$out"
  bash tools/run.sh graft.Verify /root/testdata/sf0.01 "$out" \
    2>&1 | grep -E "\[verify\].*failed" || true
  res="$(python3 tools/check_oracle.py /root/testdata/sf0.01 "$out")" || fail=1
  line="$(echo "$res" | tail -1)"
  echo "run $i: $line"
  echo "$res" | grep -E "^FAIL" | sed "s/^/run $i: /" || true
  echo "$line" | grep -q " 0 fail" || fail=1
done
exit $fail
