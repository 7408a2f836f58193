#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Loads each <name>.parquet that graft.Verify wrote, runs the matching oracle
SQL from oracle_sql.json in DuckDB (with each testdata table registered as a
view), and compares values with columns sorted by name. NOT part of the
shipped library — dev tooling only (driver-side python deps).
"""
import json
import sys

import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = pq.read_table(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: no spark output ({e})")
            failures += 1
            continue
        try:
            exp = con.execute(sql).arrow()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            failures += 1
            continue
        g = got.to_pandas()[sorted(got.column_names)]
        x = exp.to_pandas()[sorted(exp.column_names)]
        if sorted(got.column_names) != sorted(exp.column_names):
            print(f"FAIL {name}: columns differ\n  spark={sorted(got.column_names)}\n  duck ={sorted(exp.column_names)}")
            failures += 1
            continue
        if len(g) != len(x):
            print(f"FAIL {name}: rows {len(g)} vs {len(x)}")
            failures += 1
            continue
        bad = None
        for c in g.columns:
            a, b = g[c], x[c]
            try:
                same = (a.astype(str).values == b.astype(str).values)
            except Exception:
                same = a.values == b.values
            if not same.all():
                i = int((~same).argmax())
                bad = (c, i, a.iloc[i], b.iloc[i])
                break
        if bad:
            c, i, av, bv = bad
            print(f"FAIL {name}: col {c} row {i}: spark={av!r} duck={bv!r}")
            failures += 1
        else:
            print(f"OK   {name} ({len(g)} rows)")
    return failures


if __name__ == "__main__":
    sys.exit(1 if main(sys.argv[1], sys.argv[2]) else 0)
