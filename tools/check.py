#!/usr/bin/env python3
"""Local emulation of the driver's correctness gate (t2).

Runs after `sbt "runMain graft.Verify <sfDir> <outDir>"`:
for every query with an oracle, executes the oracle SQL in DuckDB against
the same parquet tables and compares the Spark parquet dump row-by-row
(columns sorted by name, exact values; doubles reported with max-abs-diff
on mismatch). Dev tool only — not part of the library.

Usage: python3 tools/check.py <sfDir> <outDir>
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            want = con.sql(sql).df()
            got = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: exec error: {str(e)[:300]}")
            n_fail += 1
            continue
        want = want[sorted(want.columns)].reset_index(drop=True)
        got = got[sorted(got.columns)].reset_index(drop=True)
        if list(want.columns) != list(got.columns):
            print(f"FAIL {name}: columns want={list(want.columns)} got={list(got.columns)}")
            n_fail += 1
            continue
        if len(want) != len(got):
            print(f"FAIL {name}: rows want={len(want)} got={len(got)}")
            n_fail += 1
            continue
        bad = []
        for c in want.columns:
            wc, gc = want[c], got[c]
            try:
                if str(wc.dtype) != str(gc.dtype):
                    bad.append(f"{c}: dtype {wc.dtype} vs {gc.dtype}")
                eq = (wc == gc) | (wc.isna() & gc.isna())
                if not eq.all():
                    detail = ""
                    if pd.api.types.is_float_dtype(wc):
                        detail = f" maxabsdiff={(wc - gc).abs().max()}"
                    i = (~eq).idxmax()
                    detail += f" first@{i}: want={wc[i]!r} got={gc[i]!r}"
                    bad.append(f"{c}: {int((~eq).sum())} mismatches{detail}")
            except Exception as e:
                bad.append(f"{c}: compare error {e}")
        if bad:
            print(f"FAIL {name}: " + "; ".join(bad[:4]))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(want)} rows)")
            n_pass += 1
    # attempted counts (not passing counts): X + Y must equal Z even
    # when entries fail
    print(f"\n{n_pass} pass, {n_fail} fail, "
          f"{len(oracle)} oracled / {len(oracle)} checked")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
