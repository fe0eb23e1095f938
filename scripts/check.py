#!/usr/bin/env python3
"""Local dev harness mimicking the driver's correctness gate:
runs each oracle SQL in DuckDB over the sf parquet tables and compares
value-for-value with the Verify.scala parquet dumps.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir>
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name, sql in sorted(oracle.items()):
        try:
            want = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            failures += 1
            continue
        try:
            got = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchdf()
        except Exception as e:
            print(f"FAIL {name}: spark output missing: {e}")
            failures += 1
            continue
        # driver sorts columns by name before hashing values
        want = want[sorted(want.columns)]
        got = got[sorted(got.columns)]
        if list(want.columns) != list(got.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
            failures += 1
            continue
        if len(want) != len(got):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            failures += 1
            continue
        w = want.reset_index(drop=True)
        g = got.reset_index(drop=True)
        # the driver's hash compare is type-sensitive: surface declared-type
        # divergence (e.g. DuckDB HUGEINT vs Spark BIGINT) locally too
        bad_types = [(c, str(g[c].dtype), str(w[c].dtype))
                     for c in w.columns if g[c].dtype != w[c].dtype]
        if bad_types:
            print(f"FAIL {name}: dtype mismatch (spark vs oracle): {bad_types}")
            failures += 1
            continue
        try:
            pd.testing.assert_frame_equal(g, w, check_dtype=True,
                                          check_exact=True)
            print(f"OK   {name} ({len(want)} rows)")
        except AssertionError as e:
            print(f"FAIL {name}: value mismatch\n{str(e)[:600]}")
            failures += 1
    print(f"\n{len(oracle) - failures}/{len(oracle)} queries match")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
