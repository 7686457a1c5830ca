#!/usr/bin/env python3
"""Local pre-flight for the driver's correctness gate: run graft.Verify at a
given SF dir, then execute every oracle SQL in DuckDB over the same parquet
tables and diff values column-by-column (columns sorted by name, rows
compared as sorted tuples — stricter than a hash, and it shows WHERE a
mismatch is). Builder-side tool only; the driver runs its own copy.
Usage: python3 scripts/check_oracles.py <sfdir> <outdir> [--skip-verify]
"""
import json, math, subprocess, sys
from pathlib import Path

import duckdb

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    return v

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    if "--skip-verify" not in sys.argv:
        r = subprocess.run(
            ["sbt", "-batch", f'runMain graft.Verify {sfdir} {outdir}'],
            capture_output=True, text=True, cwd="/root/repo")
        sys.stdout.write(r.stdout[-3000:])
        sys.stderr.write(r.stderr[-3000:])
    oracle = json.loads(Path(f"{outdir}/oracle_sql.json").read_text())
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        pdir = Path(outdir) / name
        if not pdir.exists():
            print(f"FAIL {name}: spark result missing")
            n_bad += 1
            continue
        try:
            want = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_bad += 1
            continue
        got = con.execute(f"SELECT * FROM '{pdir}/*.parquet'").fetchdf()
        wcols, gcols = sorted(want.columns), sorted(got.columns)
        if wcols != gcols:
            print(f"FAIL {name}: schema {gcols} != {wcols}")
            n_bad += 1
            continue
        w = sorted(tuple(norm(v) for v in row) for row in want[wcols].itertuples(index=False))
        g = sorted(tuple(norm(v) for v in row) for row in got[gcols].itertuples(index=False))
        if len(w) != len(g):
            print(f"FAIL {name}: rows {len(g)} != {len(w)}")
            n_bad += 1
        elif w != g:
            diffs = [(a, b) for a, b in zip(g, w) if a != b][:3]
            print(f"FAIL {name}: {sum(1 for a, b in zip(g, w) if a != b)} row diffs, first: {diffs}")
            n_bad += 1
        else:
            print(f"ok   {name}: {len(g)} rows")
            n_ok += 1
    # rows-only queries (no oracle)
    for pdir in sorted(Path(outdir).iterdir()):
        if pdir.is_dir() and pdir.name not in oracle:
            n = con.execute(f"SELECT count(*) FROM '{pdir}/*.parquet'").fetchone()[0]
            print(f"rows {pdir.name}: {n} rows (no oracle)")
    print(f"\n{n_ok} ok, {n_bad} fail")
    sys.exit(1 if n_bad else 0)

main()
