#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/local_check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (Spark output), runs the matching
SQL from oracle_sql.json in DuckDB over <sfDir>'s tables, normalizes both
(columns sorted by name, rows sorted by all columns), and reports exact
equality plus max numeric deviation on mismatch.

Dev-only tooling: the shipped Scala library has no Python dependency.
"""
import json, sys, glob
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df) and len(df.columns):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def main(sf_dir: str, out_dir: str, skip=(), only=()) -> int:
    import os
    con = duckdb.connect()
    # cap oracle threads when sharing the box with a timed run
    # (e.g. DUCKDB_THREADS=2 while ladder rungs execute)
    t = os.environ.get("DUCKDB_THREADS")
    if t:
        con.execute(f"PRAGMA threads={int(t)}")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        if only and not any(name.startswith(p) for p in only):
            continue
        if name in skip:
            print(f"SKIP {name} (oracle-capacity: quadratic SQL infeasible at this sf)")
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            got = normalize(pd.concat([pd.read_parquet(f) for f in sorted(files)]))
            exp = normalize(con.execute(oracle[name]).fetchdf())
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}"); n_fail += 1; continue
        problems = []
        if list(got.columns) != list(exp.columns):
            problems.append(f"columns spark={list(got.columns)} oracle={list(exp.columns)}")
        elif len(got) != len(exp):
            problems.append(f"rows spark={len(got)} oracle={len(exp)}")
        else:
            for c in got.columns:
                a, b = got[c].values, exp[c].values
                if np.issubdtype(got[c].dtype, np.floating) or np.issubdtype(exp[c].dtype, np.floating):
                    af = a.astype(float); bf = b.astype(float)
                    same = (af == bf) | (np.isnan(af) & np.isnan(bf))
                    if not same.all():
                        problems.append(f"col {c}: {int((~same).sum())} diffs, maxabs={np.nanmax(np.abs(af-bf))}")
                else:
                    eq = pd.Series(a).astype(object).eq(pd.Series(b).astype(object))
                    if not eq.all():
                        i = int(eq.idxmin())
                        problems.append(f"col {c} ({got[c].dtype}/{exp[c].dtype}): {int((~eq).sum())} diffs, first@{i}: {a[i]!r} vs {b[i]!r}")
            # dtype drift that a hash-based compare might also catch
            for c in got.columns:
                if str(got[c].dtype) != str(exp[c].dtype):
                    problems.append(f"dtype {c}: spark={got[c].dtype} oracle={exp[c].dtype}")
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems)); n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)"); n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    # optional: --skip name1,name2 (quadratic oracles at large sf)
    #           --only prefix1,prefix2 (pairs with Verify's prefix args)
    skip = ()
    only = ()
    argv = [a for a in sys.argv[1:]]
    if "--skip" in argv:
        i = argv.index("--skip")
        skip = tuple(argv[i + 1].split(","))
        del argv[i:i + 2]
    if "--only" in argv:
        i = argv.index("--only")
        only = tuple(argv[i + 1].split(","))
        del argv[i:i + 2]
    sys.exit(main(argv[0], argv[1], skip, only))
