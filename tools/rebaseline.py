#!/usr/bin/env python3
"""Re-commit tools/baseline_bench.json from disciplined runs.

Runs graft.Bench N times (default 3), each in a FRESH JVM, and writes the
per-query MEDIAN of the min-of-2 numbers as the committed baseline. A
fresh JVM per full run removes the two variance sources that poisoned the
r4/r5 baselines: suite-order interference inside one JVM (leaked persisted
blocks, GC pressure) and single-run jitter (codegen/JIT warm-up already
absorbed by Bench's own min-of-2). Median over fresh-JVM runs is the
VERDICT r5 discipline for the per-query 2x gate.

Usage: python3 tools/rebaseline.py [runs] [sf_dir] [--merge-missing]

--merge-missing: instead of REPLACING the baseline (which re-anchors the
gate to today's load window — see tools/bench_reconcile_r8.md on why a
fast window must never become the yardstick), only ADD entries for
queries that have no committed baseline yet (newly built operators run
ungated until they get one). Committed entries are left byte-identical.
"""
import json
import os
import statistics
import subprocess
import sys

merge_missing = "--merge-missing" in sys.argv
args = [a for a in sys.argv[1:] if a != "--merge-missing"]
runs = int(args[0]) if len(args) > 0 else 3
sf_dir = args[1] if len(args) > 1 else "/root/testdata/sf0.1"
repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

per_query = {}
for i in range(runs):
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir)
    env.pop("SPARK_GRAFT_ONLY", None)  # a subset run must never become the baseline
    subprocess.run(["bash", "tools/run.sh", "graft.Bench"], cwd=repo, env=env,
                   check=True, stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    with open(os.path.join(repo, "bench_out.json")) as f:
        out = json.load(f)
    if out.get("failed"):
        sys.exit(f"run {i}: failed queries {out['failed']} — refusing to rebaseline")
    for q, t in out["queries"].items():
        per_query.setdefault(q, []).append(t)
    print(f"run {i + 1}/{runs}: total {out['value']}s", file=sys.stderr)

medians = {q: round(statistics.median(ts), 3) for q, ts in sorted(per_query.items())}
path = os.path.join(repo, "tools", "baseline_bench.json")
if merge_missing:
    with open(path) as f:
        baseline = json.load(f)
    added = {q: t for q, t in medians.items() if q not in baseline["queries"]}
    baseline["queries"].update(added)
    baseline["queries"] = dict(sorted(baseline["queries"].items()))
    # provenance for the merged entries (ADVICE r9): the top-level note
    # describes the ORIGINAL full capture, which tells a later reader
    # nothing about which window/run-count produced entries added here
    if added:
        import datetime
        stamp = datetime.date.today().isoformat()
        baseline.setdefault("merge_history", []).append({
            "date": stamp, "runs": runs, "sf_dir": sf_dir,
            "queries": sorted(added)})
    with open(path, "w") as f:
        json.dump(baseline, f, indent=1)
    print(f"merged {len(added)} new entries ({sorted(added)}); "
          f"{len(baseline['queries']) - len(added)} committed entries untouched",
          file=sys.stderr)
else:
    baseline = {
        "note": f"fresh-JVM median-of-{runs} of Bench min-of-2 at {sf_dir}, local[32]",
        "queries": medians,
    }
    with open(path, "w") as f:
        json.dump(baseline, f, indent=1)
    print(f"wrote tools/baseline_bench.json ({len(per_query)} queries)", file=sys.stderr)
