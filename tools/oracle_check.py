#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Runs `graft.Verify` output parquet against the DuckDB oracle SQL from
oracle_sql.json, compares row counts, column names, and exact values
(column-name-sorted, row-sorted), and prints a per-query verdict.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir> [queryName ...]
       (trailing names restrict the check — pairs with graft.Verify's
        trailing-name restriction for single-query iteration)
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return repr(v)


def main(sf_dir, out_dir, only=()):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)

    unknown = set(only) - set(oracles)
    if unknown:
        print(f"ERROR: unknown query name(s): {sorted(unknown)}")
        return 1
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").fetchdf()
            want = con.execute(sql).fetchdf()
            g_cols, w_cols = sorted(got.columns), sorted(want.columns)
            if g_cols != w_cols:
                print(f"FAIL {name}: columns differ spark={g_cols} oracle={w_cols}")
                n_fail += 1
                continue
            if len(got) != len(want):
                print(f"FAIL {name}: rows spark={len(got)} oracle={len(want)}")
                n_fail += 1
                continue
            g = sorted(tuple(canon(v) for v in row)
                       for row in got[g_cols].itertuples(index=False, name=None))
            w = sorted(tuple(canon(v) for v in row)
                       for row in want[w_cols].itertuples(index=False, name=None))
            if g != w:
                diffs = [(a, b) for a, b in zip(g, w) if a != b][:3]
                print(f"FAIL {name}: values differ, first diffs: {diffs}")
                n_fail += 1
                continue
            # dtype check (schema parity)
            g_dt = {c: str(got[c].dtype) for c in g_cols}
            w_dt = {c: str(want[c].dtype) for c in w_cols}
            note = "" if g_dt == w_dt else f"  [dtype diff: {g_dt} vs {w_dt}]"
            print(f"PASS {name} ({len(got)} rows){note}")
            n_pass += 1
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_fail += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], frozenset(sys.argv[3:])))
