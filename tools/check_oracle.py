#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate.

Runs graft.Verify output (parquet per query + oracle_sql.json) against
DuckDB on the same sf dir and reports per-query match. Dev tool only —
the shipped Scala library has no Python dependency.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import json, sys, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name in sorted(oracle):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        err_marker = f"{out_dir}/{name}/_ERROR"
        if os.path.exists(err_marker):
            msg = open(err_marker).read().strip().splitlines()[:1]
            print(f"FAIL {name}: spark error: {msg[0] if msg else '?'}")
            failures += 1
            continue
        if not files:
            print(f"FAIL {name}: no spark output")
            failures += 1
            continue
        got = pd.concat([pd.read_parquet(f) for f in sorted(files)])
        try:
            exp = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            failures += 1
            continue
        g, e = normalize(got), normalize(exp)
        if list(g.columns) != list(e.columns):
            print(f"FAIL {name}: columns {list(g.columns)} vs {list(e.columns)}")
            failures += 1
            continue
        if len(g) != len(e):
            print(f"FAIL {name}: rows {len(g)} vs {len(e)}")
            failures += 1
            continue
        # exact compare after string normalization (mimics hash compare)
        gs, es = g.astype(str), e.astype(str)
        if gs.equals(es):
            print(f"OK   {name}: {len(g)} rows")
        else:
            diff = (gs != es).any(axis=1)
            print(f"FAIL {name}: {int(diff.sum())}/{len(g)} rows differ")
            print("  spark:", g[diff].head(3).to_dict("records"))
            print("  duck :", e[diff].head(3).to_dict("records"))
            # show dtypes to catch type-mismatch-only failures
            print("  dtypes spark:", dict(g.dtypes.astype(str)))
            print("  dtypes duck :", dict(e.dtypes.astype(str)))
            failures += 1
    # queries without oracle → rows-only check
    for d in sorted(glob.glob(f"{out_dir}/*/")):
        name = os.path.basename(d.rstrip("/"))
        if name in oracle:
            continue
        files = glob.glob(f"{d}/*.parquet")
        n = sum(len(pd.read_parquet(f)) for f in files) if files else 0
        print(f"INFO {name}: no oracle, {n} rows")
    print("FAILURES:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
