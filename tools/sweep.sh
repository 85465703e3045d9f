#!/bin/bash
# Round-start correctness sweep (VERDICT r8 #8): ONE command that runs
#   1. the physical-schema pin over /root/testdata (the driver silently
#      regenerates it between rounds — a ts-encoding change broke the
#      events queries mid-round-7),
#   2. the full Verify → DuckDB oracle compare at ALL THREE scales
#      (sf0.001 / sf0.01 / sf0.1 — the driver gates at sf0.01; the
#      flanking scales catch size-dependent accidents), and
#   3. the alternate-partitioning re-verify (7 cores, sf0.01): any
#      query whose result depends on the 32-way layout — a
#      merge-order-sensitive double sum, an unordered limit — fails
#      here even though the 32-core runs agree with the oracle.
# Each rung re-dumps into its own directory (a crashed query must not
# inherit a previous rung's parquet — see .claude/skills/verify).
# Exit code: 0 only if every rung is "N pass / 0 fail".
set -e
cd "$(dirname "$0")/.."
sbt -batch compile >/dev/null

echo "== schema pin =="
python3 tools/schema_check.py

fail=0
for rung in sf0.001:32 sf0.01:32 sf0.1:32 sf0.01:7; do
  sf="${rung%%:*}"; cpus="${rung##*:}"
  out="/tmp/graft_sweep_${sf}_${cpus}"
  echo "== verify $sf @ ${cpus} cores =="
  rm -rf "$out"
  SPARK_GRAFT_CPUS=$cpus bash tools/run.sh graft.Verify "/root/testdata/$sf" "$out" \
    2>&1 | grep -E "\[verify\].*failed" || true
  res="$(python3 tools/check_oracle.py "/root/testdata/$sf" "$out")" || fail=1
  echo "$res" | grep -vE "^PASS " | tail -5
  echo "$res" | grep -q " 0 fail" || fail=1
done

# Probe freshness (VERDICT r11 #2): scale_probe.json is the committed
# scaling evidence of record — it must postdate the last commit that
# touched the probed implementation. Preferred check (round 12): the
# probe embeds the HEAD sha it was measured at ("git_head"); fresh iff
# the newest src/main/scala-touching commit is an ancestor of (or equal
# to) that sha — immune to clone/checkout resetting mtimes, which made
# the mtime check passable for arbitrarily old evidence. Fallback for
# probes predating the field: the original mtime comparison. Either
# way, uncommitted src/main edits are flagged (the probe cannot vouch
# for code that is not in any commit).
echo "== probe freshness =="
if [ -f scale_probe.json ]; then
  probe_sha=$(python3 -c "import json; print(json.load(open('scale_probe.json')).get('git_head',''))" 2>/dev/null)
  src_sha=$(git log -1 --format=%H -- src/main/scala 2>/dev/null || echo "")
  if [ -n "$probe_sha" ] && git cat-file -e "$probe_sha" 2>/dev/null; then
    if git merge-base --is-ancestor "$src_sha" "$probe_sha" 2>/dev/null; then
      echo "fresh by sha (probe @ ${probe_sha:0:10} >= last src commit ${src_sha:0:10})"
    else
      echo "STALE: probe measured @ ${probe_sha:0:10}, but src/main/scala changed at ${src_sha:0:10} — re-run graft.ScaleProbe"
      fail=1
    fi
  else
    probe_mtime=$(stat -c %Y scale_probe.json)
    src_ctime=$(git log -1 --format=%ct -- src/main/scala 2>/dev/null || echo 0)
    if [ "$src_ctime" -gt "$probe_mtime" ]; then
      echo "STALE: scale_probe.json ($(date -d @"$probe_mtime" +%F\ %T)) predates the last src/main/scala commit ($(date -d @"$src_ctime" +%F\ %T)) — re-run graft.ScaleProbe"
      fail=1
    else
      echo "fresh by mtime (no git_head in probe; probe $(date -d @"$probe_mtime" +%F\ %T) >= src commit $(date -d @"$src_ctime" +%F\ %T))"
    fi
  fi
  if [ -n "$(git status --porcelain src/main/scala 2>/dev/null)" ]; then
    echo "WARN: uncommitted src/main/scala edits — the probe cannot vouch for them"
  fi
  # Heap provenance (VERDICT r14 #2): the probe of record runs at
  # SPARK_DRIVER_MEM=24g (bench_notes_r10:50). The r14 artifact was
  # captured at run.sh's 8g default, and its 144.6 GB "spill" was pure
  # heap-config artifact (the SHJ budget correctly demotes the hash
  # build under a small heap) — a fresh reader of BENCH_r14.json would
  # conclude the engine spills. Reject any probe whose embedded heap
  # differs from the record; probes predating the field fail too (they
  # cannot vouch for their config).
  PROBE_HEAP_MB=24576
  probe_mem=$(python3 -c "import json; print(json.load(open('scale_probe.json')).get('driver_mem_mb',0))" 2>/dev/null)
  if [ -z "$probe_mem" ] || [ "$probe_mem" -lt $((PROBE_HEAP_MB * 95 / 100)) ] \
       || [ "$probe_mem" -gt $((PROBE_HEAP_MB * 105 / 100)) ]; then
    echo "BAD HEAP: probe driver_mem_mb='$probe_mem' != record ${PROBE_HEAP_MB} MB — re-run: SPARK_DRIVER_MEM=24g bash tools/run.sh graft.ScaleProbe"
    fail=1
  else
    echo "heap ok (driver_mem_mb=$probe_mem, record=$PROBE_HEAP_MB)"
  fi
else
  echo "MISSING scale_probe.json"; fail=1
fi
exit $fail
