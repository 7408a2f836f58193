#!/usr/bin/env python3
"""Local correctness check mirroring the driver's gate: for each query
dumped by graft.Verify, run the oracle SQL in DuckDB over the same parquet
tables and compare rows/schema/values (columns sorted by name, exact).

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [query ...]
"""
import json, sys, glob, os
import duckdb

sf_dir, out_dir = sys.argv[1], sys.argv[2]
only = set(sys.argv[3:])

with open(os.path.join(out_dir, "oracle_sql.json")) as f:
    oracles = json.load(f)

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

fails = []
for name in sorted(only - set(oracles)):
    print(f"{name}: NOT IN oracle_sql.json (stale dump or missing oracle)")
    fails.append(name)
for name in sorted(oracles):
    if only and name not in only:
        continue
    spark_glob = glob.glob(os.path.join(out_dir, name, "*.parquet"))
    if not spark_glob:
        print(f"{name}: MISSING spark output"); fails.append(name); continue
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    try:
        odf = con.execute(oracles[name]).fetchdf()
    except Exception as e:
        print(f"{name}: ORACLE ERROR {e}"); fails.append(name); continue
    try:
        sdf = con.execute(
            f"SELECT * FROM read_parquet('{os.path.join(out_dir, name)}/*.parquet')"
        ).fetchdf()
    except Exception as e:
        # a partial/corrupt dump from an interrupted Verify run fails this
        # query only, not the whole gate
        print(f"{name}: SPARK DUMP ERROR {e}"); fails.append(name); continue
    ok = True
    if len(sdf) != len(odf):
        print(f"{name}: rows {len(sdf)} vs {len(odf)}"); ok = False
    scols, ocols = sorted(sdf.columns), sorted(odf.columns)
    if scols != ocols:
        print(f"{name}: cols {scols} vs {ocols}"); ok = False
    if ok and len(sdf):
        # POSITIONAL compare (row i vs row i), columns aligned by name —
        # the driver's gate hashes rows in order, so a broken ORDER BY
        # must fail here too. String render avoids dtype coercion masking
        # real mismatches (int 1 vs float 1.5 must differ).
        s, o = sdf[scols].reset_index(drop=True), odf[scols].reset_index(drop=True)
        for c in scols:
            sv, ov = s[c], o[c]
            same = (sv.astype(str).values == ov.astype(str).values) \
                | (sv.isna() & ov.isna()).values
            if not same.all():
                i = int((~same).argmax())
                print(f"{name}: col {c} mismatch at row {i}: "
                      f"{sv.iloc[i]!r} vs {ov.iloc[i]!r} "
                      f"({int((~same).sum())} rows)")
                ok = False
    print(f"{name}: {'OK' if ok else 'FAIL'}")
    if not ok:
        fails.append(name)
    con.close()

# coverage: a dumped query with no oracle entry gets only the driver's
# weaker rows-only check — surface it so the gap is a decision, not an
# accident (a typo'd oracleSql key would otherwise silently skip checking)
if not only:
    dumped = {d for d in os.listdir(out_dir)
              if os.path.isdir(os.path.join(out_dir, d))}
    for name in sorted(dumped - set(oracles)):
        print(f"{name}: WARNING no oracle SQL — rows-only check at the driver")

print(f"\n{'ALL GREEN' if not fails else 'FAILURES: ' + ', '.join(fails)}")
sys.exit(1 if fails else 0)
