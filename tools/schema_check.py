#!/usr/bin/env python3
"""Mechanical testdata-drift check (VERDICT r7 #4).

The driver regenerates /root/testdata between (and sometimes during)
rounds; a silent physical-type change (ns-int64 -> naive us for
events.ts mid-round-7) broke every events query until diagnosed by
hand. This makes the check mechanical: compare every table's parquet
schema + row count against the committed snapshot.

Usage:
  python3 tools/schema_check.py            # check all sf dirs, exit 1 on drift
  python3 tools/schema_check.py --update   # rewrite tools/expected_schemas.json

Run it FIRST thing every round, before building anything.
"""
import json
import os
import sys

import pyarrow.parquet as pq

SF_DIRS = ["sf0.001", "sf0.01", "sf0.1"]
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]
ROOT = "/root/testdata"
SNAP = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                    "expected_schemas.json")


def snapshot():
    out = {}
    for sf in SF_DIRS:
        for t in TABLES:
            path = f"{ROOT}/{sf}/{t}.parquet"
            if not os.path.exists(path):
                out[f"{sf}/{t}"] = "MISSING"
                continue
            f = pq.ParquetFile(path)
            s = f.schema_arrow
            out[f"{sf}/{t}"] = {
                "cols": [[n, str(ty)] for n, ty in zip(s.names, s.types)],
                "rows": f.metadata.num_rows,
            }
    return out


def main():
    cur = snapshot()
    if "--update" in sys.argv:
        with open(SNAP, "w") as fh:
            json.dump(cur, fh, indent=1, sort_keys=True)
        print(f"wrote {SNAP} ({len(cur)} tables)")
        return 0
    if not os.path.exists(SNAP):
        sys.exit(f"{SNAP} missing — run with --update once and commit it")
    want = json.load(open(SNAP))
    drift = []
    for key in sorted(set(want) | set(cur)):
        w, c = want.get(key), cur.get(key)
        if w == c:
            continue
        if w is None:
            drift.append(f"NEW   {key}: {c}")
        elif c is None:
            drift.append(f"GONE  {key}")
        else:
            wc = {tuple(x) for x in w["cols"]} if isinstance(w, dict) else set()
            cc = {tuple(x) for x in c["cols"]} if isinstance(c, dict) else set()
            if wc != cc:
                drift.append(f"SCHEMA {key}: -{sorted(wc - cc)} +{sorted(cc - wc)}")
            elif isinstance(w, dict) and isinstance(c, dict) and w["rows"] != c["rows"]:
                drift.append(f"ROWS  {key}: {w['rows']} -> {c['rows']}")
    if drift:
        print("TESTDATA DRIFT — re-verify the whole surface before building:")
        for d in drift:
            print(" ", d)
        return 1
    print(f"schemas OK ({len(cur)} tables match {os.path.basename(SNAP)})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
