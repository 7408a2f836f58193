#!/usr/bin/env python3
"""Local correctness check mirroring the driver's gate: for each query
dumped by graft.Verify, run the oracle SQL in DuckDB over the same parquet
tables and compare rows/schema/values (columns sorted by name, exact).

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [--json OUT] [query ...]

--json OUT writes the driver-shaped per-query artifact
  {name: {rows_match, schema_match, hash_match, spark_rows, oracle_rows, err}}
and REFUSES to write anything unless every query in the Verify run's
queries.json manifest is present and compared — the r13 lesson, where the
round's CORRECTNESS artifact shipped as `{}` with the code in fact green
and nothing in the pipeline noticed. An artifact that exists is complete.
"""
import argparse, json, sys, glob, os
import duckdb

# argparse, not hand-rolled indexing: `--json` with no value must be a
# usage error, never an IndexError — and never silently consume a query
# name as the output path (the r14 ADVICE finding).
ap = argparse.ArgumentParser(description=__doc__)
ap.add_argument("sf_dir")
ap.add_argument("out_dir")
ap.add_argument("--json", dest="json_out", metavar="OUT", default=None,
                help="write the driver-shaped per-query artifact "
                     "(full runs only; refuses if incomplete)")
ap.add_argument("query", nargs="*", help="optional subset of query names")
args = ap.parse_args()
sf_dir, out_dir, json_out = args.sf_dir, args.out_dir, args.json_out
if json_out is not None and (json_out.startswith("-") or
                             os.path.isdir(json_out)):
    ap.error(f"--json value {json_out!r} looks like a flag/directory, "
             "not an output file")
only = set(args.query)

with open(os.path.join(out_dir, "oracle_sql.json")) as f:
    oracles = json.load(f)

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

fails = []
report = {}


def record(name, rows_match=False, schema_match=False, hash_match=False,
           spark_rows=-1, oracle_rows=-1, err=None):
    report[name] = {"rows_match": rows_match, "schema_match": schema_match,
                    "hash_match": hash_match, "spark_rows": spark_rows,
                    "oracle_rows": oracle_rows, "err": err}


for name in sorted(only - set(oracles)):
    print(f"{name}: NOT IN oracle_sql.json (stale dump or missing oracle)")
    record(name, err="not in oracle_sql.json")
    fails.append(name)
for name in sorted(oracles):
    if only and name not in only:
        continue
    spark_glob = glob.glob(os.path.join(out_dir, name, "*.parquet"))
    if not spark_glob:
        print(f"{name}: MISSING spark output")
        record(name, err="missing spark output")
        fails.append(name)
        continue
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    try:
        odf = con.execute(oracles[name]).fetchdf()
    except Exception as e:
        print(f"{name}: ORACLE ERROR {e}")
        record(name, err=f"oracle error: {e}")
        fails.append(name)
        continue
    try:
        sdf = con.execute(
            f"SELECT * FROM read_parquet('{os.path.join(out_dir, name)}/*.parquet')"
        ).fetchdf()
    except Exception as e:
        # a partial/corrupt dump from an interrupted Verify run fails this
        # query only, not the whole gate
        print(f"{name}: SPARK DUMP ERROR {e}")
        record(name, err=f"spark dump error: {e}")
        fails.append(name)
        continue
    ok = True
    rows_match = len(sdf) == len(odf)
    if not rows_match:
        print(f"{name}: rows {len(sdf)} vs {len(odf)}"); ok = False
    scols, ocols = sorted(sdf.columns), sorted(odf.columns)
    schema_match = scols == ocols
    if not schema_match:
        print(f"{name}: cols {scols} vs {ocols}"); ok = False
    hash_match = ok
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
                hash_match = False
    print(f"{name}: {'OK' if ok else 'FAIL'}")
    record(name, rows_match=rows_match, schema_match=schema_match,
           hash_match=hash_match, spark_rows=len(sdf), oracle_rows=len(odf))
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

if json_out:
    manifest_path = os.path.join(out_dir, "queries.json")
    problems = []
    if only:
        problems.append("--json requires a FULL check (no query subset): "
                        "a partial artifact would read as a partial suite")
    if not os.path.exists(manifest_path):
        problems.append(f"no {manifest_path} — rerun graft.Verify with no "
                        "query subset (it writes the manifest on full runs)")
    else:
        with open(manifest_path) as f:
            manifest = json.load(f)
        if not manifest:
            problems.append("queries.json manifest is EMPTY")
        missing = sorted(set(manifest) - set(report))
        if missing:
            problems.append(f"{len(missing)} manifest queries not compared: "
                            + ", ".join(missing[:10])
                            + ("…" if len(missing) > 10 else ""))
    if problems:
        for p in problems:
            print(f"ARTIFACT REFUSED: {p}")
        sys.exit(2)
    payload = json.dumps(report, indent=None, sort_keys=True) + "\n"
    with open(json_out, "w") as f:
        f.write(payload)
    n_ok = sum(1 for v in report.values()
               if v["rows_match"] and v["schema_match"] and v["hash_match"])
    print(f"artifact written: {json_out} ({n_ok}/{len(report)} green)")
    # Clobber-proof copy under the bench gates' immutability rule: the
    # driver's harness overwrote the committed CORRECTNESS_r14.json with
    # `{}` an hour after HEAD, so the round's record ALSO lands at
    # bench_gates/correctness_<tag>.json — a path the driver never writes
    # — and an existing tag shunts to -rerun, never overwrites (the
    # Bench.scala gate convention). Best-effort: the primary artifact is
    # already on disk.
    try:
        base = os.path.splitext(os.path.basename(json_out))[0].lower()
        gates = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "..", "bench_gates")
        os.makedirs(gates, exist_ok=True)
        i, newest = 0, None
        while True:
            suffix = "" if i == 0 else ("-rerun" if i == 1 else f"-rerun{i}")
            gate = os.path.join(gates, f"{base}{suffix}.json")
            if not os.path.exists(gate):
                break
            newest = gate
            i += 1
        # A byte-identical payload records nothing new — routine local
        # re-runs of a green gate would otherwise pile up duplicate
        # -rerunN artifacts (and git-status noise) every invocation.
        if newest is not None:
            with open(newest) as f:
                if f.read() == payload:
                    print(f"immutable copy skipped: identical to "
                          f"{os.path.normpath(newest)}")
                    gate = None
        if gate is not None:
            with open(gate, "w") as f:
                f.write(payload)
            print(f"immutable copy: {os.path.normpath(gate)}")
    except OSError as e:
        print(f"immutable copy skipped: {e}")

print(f"\n{'ALL GREEN' if not fails else 'FAILURES: ' + ', '.join(fails)}")
sys.exit(1 if fails else 0)
