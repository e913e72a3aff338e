#!/usr/bin/env python3
"""Local dev-only parity checker mirroring the driver's DuckDB oracle gate.

NOT part of the engine (the Scala library has zero Python deps); this script
replicates what the driver does with CORRECTNESS_r{N}.json so oracle
mismatches are caught before a round ends: run `graft.Verify <sfDir> <out>`,
then `python3 tools/check.py <sfDir> <out>`.

Compare semantics (assumed from the contract): per query, read the Spark
parquet dump and the DuckDB result of oracle_sql.json, sort columns by name,
and hash row values; report row/schema/hash match.
"""
import json, sys, math
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df


def cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(round(v, 9))
    return repr(v)


def frame_hash(df: pd.DataFrame):
    import hashlib
    h = hashlib.sha256()
    for row in df.itertuples(index=False):
        h.update("|".join(cell(v) for v in row).encode())
    return h.hexdigest()


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        try:
            got = canon(pd.read_parquet(f"{out_dir}/{name}"))
        except Exception as e:
            print(f"FAIL {name}: no spark output ({e})")
            n_fail += 1
            continue
        try:
            exp = canon(con.execute(sql).df())
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            n_fail += 1
            continue
        problems = []
        if list(got.columns) != list(exp.columns):
            problems.append(f"cols spark={list(got.columns)} oracle={list(exp.columns)}")
        if len(got) != len(exp):
            problems.append(f"rows spark={len(got)} oracle={len(exp)}")
        if not problems:
            gd = {c: str(got[c].dtype) for c in got.columns}
            ed = {c: str(exp[c].dtype) for c in exp.columns}
            if gd != ed:
                problems.append(f"dtypes spark={gd} oracle={ed}")
            if frame_hash(got) != frame_hash(exp):
                diff = None
                for i in range(min(len(got), 2000)):
                    for c in got.columns:
                        a, b = got[c].iloc[i], exp[c].iloc[i]
                        if cell(a) != cell(b):
                            diff = f"first diff row {i} col {c}: spark={a!r} oracle={b!r}"
                            break
                    if diff:
                        break
                problems.append(f"hash mismatch ({diff})")
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    missing = set(oracle) - set(oracle)
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
