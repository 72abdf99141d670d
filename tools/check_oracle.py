#!/usr/bin/env python3
"""Local pre-validation of SparkEntry.oracleSql vs Verify.scala output.

Mimics the driver's t2 gate: for each query, load the Spark-written
parquet under <outDir>/<name>/, run the oracle SQL in DuckDB over views
named after the fixture tables, sort columns by name and rows by all
columns, then compare cell values (exact for non-floats, tiny epsilon
reported for floats so rounding hazards are visible).

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def main(sf_dir: str, out_dir: str, skip_missing: bool = False) -> int:
    con = duckdb.connect()
    skipped = 0
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)

    failures = 0
    for name in sorted(oracle):
        sql = oracle[name]
        try:
            exp = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            failures += 1
            continue
        try:
            got = con.sql(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df()
        except Exception as e:
            # subset-run convenience: --present skips queries not dumped
            if skip_missing and "No files found" in str(e):
                skipped += 1
                continue
            print(f"FAIL {name}: spark output missing: {e}")
            failures += 1
            continue

        exp = exp.reindex(sorted(exp.columns), axis=1)
        got = got.reindex(sorted(got.columns), axis=1)
        if list(exp.columns) != list(got.columns):
            print(f"FAIL {name}: columns differ: oracle={list(exp.columns)} "
                  f"spark={list(got.columns)}")
            failures += 1
            continue
        if len(exp) != len(got):
            print(f"FAIL {name}: row count differs: oracle={len(exp)} spark={len(got)}")
            failures += 1
            continue
        exp = exp.sort_values(by=list(exp.columns)).reset_index(drop=True)
        got = got.sort_values(by=list(got.columns)).reset_index(drop=True)
        bad = None
        max_float_diff = 0.0
        for c in exp.columns:
            for i, (a, b) in enumerate(zip(exp[c], got[c])):
                a_nan = isinstance(a, float) and math.isnan(a)
                b_nan = isinstance(b, float) and math.isnan(b)
                if a_nan or b_nan:
                    if a_nan != b_nan:
                        bad = (c, i, a, b)
                        break
                    continue
                if isinstance(a, float) and isinstance(b, float):
                    d = abs(a - b)
                    max_float_diff = max(max_float_diff, d)
                    if d > 0:
                        bad = (c, i, a, b) if d > 1e-12 else bad
                        if d > 1e-12:
                            break
                elif a != b:
                    bad = (c, i, a, b)
                    break
            if bad:
                break
        if bad:
            c, i, a, b = bad
            print(f"FAIL {name}: first diff at col={c} row={i}: oracle={a!r} spark={b!r}")
            failures += 1
        else:
            extra = f" (max float diff {max_float_diff:.2e})" if max_float_diff else ""
            print(f"OK   {name}: {len(exp)} rows{extra}")
    checked = len(oracle) - skipped
    note = f" ({skipped} not dumped, skipped)" if skipped else ""
    print(f"\n{checked - failures}/{checked} checked queries match{note}")
    return 1 if failures else 0


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if a != "--present"]
    sys.exit(main(args[0], args[1], skip_missing="--present" in sys.argv))
