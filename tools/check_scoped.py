#!/usr/bin/env python3
"""check.py, restricted to the queries actually dumped in outDir — the
scoped dev loop for a new query family (same compare semantics)."""
import json, sys, os
sys.path.insert(0, os.path.dirname(__file__))
from check import canon, frame_hash, TABLES
import duckdb, pandas as pd

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        if not os.path.isdir(f"{out_dir}/{name}"):
            continue
        got = canon(pd.read_parquet(f"{out_dir}/{name}"))
        try:
            exp = canon(con.execute(oracle[name]).df())
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}"); n_fail += 1; continue
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: schema {list(got.columns)} vs {list(exp.columns)}"); n_fail += 1
        elif len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} vs {len(exp)}"); n_fail += 1
        elif frame_hash(got) != frame_hash(exp):
            print(f"FAIL {name}: hash mismatch"); n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)"); n_pass += 1
    print(f"{n_pass} pass / {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
