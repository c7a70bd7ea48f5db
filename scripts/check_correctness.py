#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: run graft.Verify via sbt,
then execute each oracle SQL in DuckDB over the same parquet tables and
compare row-sets (columns sorted by name, rows sorted, values normalized).

Usage: python3 scripts/check_correctness.py [sfDir] [--skip-verify]
"""
import json, subprocess, sys, os, glob

SF = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("--") else "/root/testdata/sf0.01"
OUT = os.environ.get("VERIFY_OUT", "/root/repo/target/verify_out")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

if "--skip-verify" not in sys.argv:
    r = subprocess.run(
        ["sbt", "-batch", f'runMain graft.Verify {SF} {OUT}'],
        cwd="/root/repo", capture_output=True, text=True, timeout=3000)
    sys.stdout.write(r.stdout[-3000:])
    sys.stderr.write(r.stderr[-3000:])

import duckdb
con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))

def norm(v):
    if isinstance(v, float):
        return round(v, 9)
    return v

def rows_of(res):
    cols = res[0]
    data = res[1]
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(cols), sorted(tuple(norm(r[i]) for i in order) for r in data)

ok = fail = 0
results = {}
for name in sorted(glob.glob(f"{OUT}/*/")):
    q = os.path.basename(name.rstrip("/"))
    try:
        spark_res = con.execute(f"SELECT * FROM '{name}/*.parquet'")
        scols = [d[0] for d in spark_res.description]
        sdata = spark_res.fetchall()
    except Exception as e:
        print(f"FAIL {q}: cannot read spark result: {e}")
        fail += 1
        continue
    if q not in oracle:
        status = "ROWS_ONLY" if len(sdata) > 0 else "ROWS_ONLY_EMPTY"
        print(f"{status:>16} {q}: rows={len(sdata)}")
        results[q] = status
        continue
    try:
        ores = con.execute(oracle[q])
        ocols = [d[0] for d in ores.description]
        odata = ores.fetchall()
    except Exception as e:
        print(f"FAIL {q}: oracle error: {e}")
        fail += 1
        continue
    sc, sr = rows_of((scols, sdata))
    oc, orw = rows_of((ocols, odata))
    if sc != oc:
        print(f"FAIL {q}: columns spark={sc} oracle={oc}")
        fail += 1
    elif sr != orw:
        diff1 = [r for r in sr if r not in orw][:3]
        diff2 = [r for r in orw if r not in sr][:3]
        print(f"FAIL {q}: rows spark={len(sr)} oracle={len(orw)}; spark-only={diff1} oracle-only={diff2}")
        fail += 1
    else:
        print(f"{'OK':>16} {q}: rows={len(sr)}")
        ok += 1
missing = set(oracle) - {os.path.basename(p.rstrip('/')) for p in glob.glob(f'{OUT}/*/')}
for q in sorted(missing):
    print(f"FAIL {q}: no spark output")
    fail += 1
print(f"\n== {ok} ok, {fail} fail ==")
sys.exit(1 if fail else 0)
