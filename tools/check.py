#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify, then
execute each oracle SQL in DuckDB against the same parquet tables and diff.

Usage: python3 tools/check.py [sfDir] [outDir] [--skip-verify]
"""
import json, math, subprocess, sys
from pathlib import Path

import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

if "--skip-verify" not in sys.argv:
    r = subprocess.run(
        ["sbt", "-batch", f'runMain graft.Verify {SF} {OUT}'],
        cwd="/root/repo", capture_output=True, text=True)
    tail = (r.stdout + r.stderr).splitlines()[-15:]
    if r.returncode != 0:
        print("VERIFY RUN FAILED"); print("\n".join(tail)); sys.exit(1)
    for line in tail:
        if "[verify]" in line:
            print(line)

con = duckdb.connect()
for t in TABLES:
    p = f"{SF}/{t}.parquet"
    if Path(p).exists():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

oracle = json.loads(Path(f"{OUT}/oracle_sql.json").read_text())

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9g}"
    return str(v)

fails = 0
for name, sql in sorted(oracle.items()):
    spark_dir = Path(OUT) / name
    if not spark_dir.exists():
        print(f"[FAIL] {name}: no spark output"); fails += 1; continue
    try:
        want = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"[FAIL] {name}: duckdb error: {e}"); fails += 1; continue
    got = con.execute(
        f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')").fetchdf()
    wc, gc = sorted(want.columns), sorted(got.columns)
    if wc != gc:
        print(f"[FAIL] {name}: columns {gc} vs oracle {wc}"); fails += 1; continue
    # Dtype-kind strictness: the driver hashes raw values, so an oracle
    # column that fetches as float64 while Spark wrote int64 (e.g. an
    # uncast DuckDB HUGEINT) must fail HERE, not only driver-side.
    def kindcls(k):
        if k in "iu": return "int"
        if k in "OUS": return "str"
        return k
    kind_mismatch = [
        (c, str(want[c].dtype), str(got[c].dtype)) for c in wc
        if kindcls(want[c].dtype.kind) != kindcls(got[c].dtype.kind)]
    if kind_mismatch:
        print(f"[FAIL] {name}: dtype kind mismatch (oracle vs spark): {kind_mismatch}")
        fails += 1; continue
    # Driver parity: the driver compares by df.sort_values(by=all_columns)
    # over the RAW frames — an array/struct/object-of-ndarray column throws
    # "unhashable type" there and scores ERR even when values match
    # (r4: q99/q103/q104). Replay that exact call so the class fails HERE.
    try:
        want[wc].sort_values(by=wc)
        got[gc].sort_values(by=gc)
    except Exception as e:
        print(f"[FAIL] {name}: driver-incomparable output (sort_values): {e}")
        fails += 1; continue
    w = want[wc].values.tolist()
    g = got[wc].values.tolist()
    wn = sorted([tuple(norm(v) for v in row) for row in w])
    gn = sorted([tuple(norm(v) for v in row) for row in g])
    if wn == gn:
        print(f"[ OK ] {name}: {len(gn)} rows")
    else:
        fails += 1
        print(f"[FAIL] {name}: rows spark={len(gn)} oracle={len(wn)}")
        diff_g = [r for r in gn if r not in set(wn)][:3]
        diff_w = [r for r in wn if r not in set(gn)][:3]
        print(f"        spark-only: {diff_g}")
        print(f"        oracle-only: {diff_w}")
print("ALL OK" if fails == 0 else f"{fails} FAILURES")
sys.exit(1 if fails else 0)
