#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run graft.Verify
output against DuckDB oracle SQL and diff. Usage:
  tools/run.sh graft.Verify /root/testdata/sf0.01 /tmp/verify_out
  python3 tools/check_oracle.py /root/testdata/sf0.01 /tmp/verify_out
"""
import sys, json, glob, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        spark_files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not spark_files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            duck = con.execute(sql).fetch_arrow_table().to_pandas()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}"); n_fail += 1; continue
        got = con.execute(
            f"SELECT * FROM read_parquet({spark_files!r})").fetch_arrow_table().to_pandas()
        duck = duck.reindex(sorted(duck.columns), axis=1)
        got = got.reindex(sorted(got.columns), axis=1)
        if list(duck.columns) != list(got.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != oracle {list(duck.columns)}")
            n_fail += 1; continue
        if len(duck) != len(got):
            print(f"FAIL {name}: rows {len(got)} != oracle {len(duck)}"); n_fail += 1; continue
        bad = None
        for c in duck.columns:
            a, b = duck[c].tolist(), got[c].tolist()
            for i, (x, y) in enumerate(zip(a, b)):
                eq = (x == y) or (x is None and y is None)
                if not eq and isinstance(x, float) and isinstance(y, float):
                    eq = (math.isnan(x) and math.isnan(y)) or x == y
                if not eq:
                    try:  # pandas NaT / NA (null timestamps etc.)
                        import pandas as pd
                        eq = bool(pd.isna(x)) and bool(pd.isna(y))
                    except (TypeError, ValueError):
                        pass
                if not eq:
                    bad = (c, i, x, y); break
            if bad: break
        if bad:
            c, i, x, y = bad
            print(f"FAIL {name}: col {c} row {i}: oracle={x!r} spark={y!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(duck)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass / {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
