#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate.

Runs each oracle SQL from oracle_sql.json in DuckDB (views over the sf
parquet tables), loads the corresponding Spark result parquet, sorts
columns by name and rows by all columns, and compares values exactly.

Usage: python3 scripts/selfcheck.py <sfDir> <verifyOutDir> [query ...]
(run `sbt "runMain graft.Verify <sfDir> <outDir>"` first)
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
    return str(v)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        try:
            want = con.sql(sql)
            wcols = sorted(want.columns)
            wsel = con.sql(f"SELECT {', '.join(wcols)} FROM want")
            wtypes = [str(t) for t in wsel.types]
            want_rows = sorted(
                tuple(canon(v) for v in row) for row in wsel.fetchall())
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        try:
            got = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            gcols = sorted(got.columns)
            gsel = con.sql(f"SELECT {', '.join(gcols)} FROM got")
            gtypes = [str(t) for t in gsel.types]
            got_rows = sorted(
                tuple(canon(v) for v in row) for row in gsel.fetchall())
        except Exception as e:
            print(f"FAIL {name}: spark result error: {e}")
            n_fail += 1
            continue
        if gcols != wcols:
            print(f"FAIL {name}: columns differ: spark={gcols} oracle={wcols}")
            n_fail += 1
        elif gtypes != wtypes:
            # The driver's hash is type-sensitive (e.g. DuckDB SUM(BIGINT)
            # yields HUGEINT while Spark writes BIGINT) — mirror that here.
            print(f"FAIL {name}: types differ: spark={gtypes} oracle={wtypes} "
                  f"cols={gcols}")
            n_fail += 1
        elif got_rows != want_rows:
            n_fail += 1
            want_set, got_set = set(want_rows), set(got_rows)
            diff_g = [r for r in got_rows if r not in want_set][:3]
            diff_w = [r for r in want_rows if r not in got_set][:3]
            print(f"FAIL {name}: {len(got_rows)} vs {len(want_rows)} rows; "
                  f"spark-only={diff_g} oracle-only={diff_w} cols={gcols}")
        else:
            n_pass += 1
            print(f"PASS {name} ({len(got_rows)} rows)")
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
