#!/usr/bin/env python3
"""Local emulation of the driver's correctness gate.

Usage: python3 scripts/check_local.py <verify_out_dir> <sf_dir>

Loads each <out_dir>/<name> parquet dump produced by graft.Verify, runs the
matching oracle SQL from oracle_sql.json in DuckDB over the sf_dir parquet
tables, then compares: schema (column names sorted), row count, and values
(columns sorted by name, rows sorted by all columns, exact match; floats
reported with max abs diff). Exit 1 on any mismatch.
"""
import glob
import json
import os
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df) and len(df.columns):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df.reset_index(drop=True)


def main(out_dir: str, sf_dir: str) -> int:
    con = duckdb.connect()
    con.sql("SET TimeZone='UTC'")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)

    failures = []
    names = sorted(os.path.basename(d) for d in glob.glob(f"{out_dir}/*")
                   if os.path.isdir(d))
    for missing in sorted(set(oracle) - set(names)):
        failures.append((missing, "declared in oracle_sql.json but no "
                                  "parquet dump (query failed in Verify?)"))
    for name in names:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            failures.append((name, "no parquet output"))
            continue
        got = pd.concat([pd.read_parquet(f) for f in sorted(files)])
        if name not in oracle:
            print(f"  {name}: rows-only check — {len(got)} rows "
                  f"{'OK' if len(got) > 0 else 'EMPTY!'}")
            if len(got) == 0:
                failures.append((name, "rows-only query returned 0 rows"))
            continue
        try:
            exp = con.sql(oracle[name]).df()
        except Exception as e:
            failures.append((name, f"oracle SQL failed: {e}"))
            continue
        g, e = norm(got), norm(exp)
        if list(g.columns) != list(e.columns):
            failures.append((name, f"schema: spark={list(g.columns)} "
                                   f"duckdb={list(e.columns)}"))
            continue
        if len(g) != len(e):
            failures.append((name, f"rows: spark={len(g)} duckdb={len(e)}"))
            continue
        bad = []
        for c in g.columns:
            a, b = g[c], e[c]
            if str(a.dtype).startswith("float") or str(b.dtype).startswith("float"):
                import numpy as np
                aa, bb = a.astype(float).values, b.astype(float).values
                nan_ok = (pd.isna(aa) == pd.isna(bb)).all()
                diff = abs(pd.Series(aa).fillna(0) - pd.Series(bb).fillna(0)).max()
                if not nan_ok or diff > 0:
                    bad.append(f"{c} (max|Δ|={diff})")
            else:
                if not a.astype(str).equals(b.astype(str)):
                    n = (a.astype(str) != b.astype(str)).sum()
                    bad.append(f"{c} ({n} diffs)")
        if bad:
            failures.append((name, "value mismatch: " + ", ".join(bad)))
        else:
            print(f"  {name}: OK ({len(g)} rows, {len(g.columns)} cols)")

    print()
    if failures:
        for n, msg in failures:
            print(f"FAIL {n}: {msg}")
        return 1
    print(f"ALL {len(names)} queries PASS")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
