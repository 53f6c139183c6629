#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Usage: python3 tools/check.py [sfDir] [outDir] [query ...]

Reads each parquet result dumped by `graft.Verify` under outDir, runs the
matching SQL from outDir/oracle_sql.json in DuckDB against the base tables
in sfDir, sorts columns by name (mirroring the driver), and compares values
exactly. Prints per-query PASS/FAIL plus the first few diffs.
"""
import json, sys, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    results = {}
    names = sorted(set(oracle) | {d for d in os.listdir(out)
                                  if os.path.isdir(os.path.join(out, d))})
    for name in names:
        if not os.path.isdir(os.path.join(out, name)):
            results[name] = "MISSING-OUTPUT"
            continue
        if only and name not in only:
            continue
        files = glob.glob(f"{out}/{name}/*.parquet")
        if not files:
            results[name] = "NO-OUTPUT"
            continue
        got = con.sql(f"SELECT * FROM read_parquet({files!r})").df()
        got = got[sorted(got.columns)]
        if name not in oracle:
            results[name] = f"ROWS-ONLY({len(got)})"
            continue
        try:
            exp = con.sql(oracle[name]).df()
        except Exception as e:
            results[name] = f"ORACLE-ERR: {e}"
            continue
        exp = exp[sorted(exp.columns)]
        if list(got.columns) != list(exp.columns):
            results[name] = f"COLS got={list(got.columns)} exp={list(exp.columns)}"
            continue
        if len(got) != len(exp):
            results[name] = f"ROWS got={len(got)} exp={len(exp)}"
            continue
        # exact value compare, row order as produced
        diffs = []
        for c in got.columns:
            g, e = got[c], exp[c]
            try:
                neq = ~((g == e) | (g.isna() & e.isna()))
            except Exception:
                neq = g.astype(str) != e.astype(str)
            if neq.any():
                i = int(neq.idxmax())
                diffs.append(f"{c}[row {i}]: got={g[i]!r} exp={e[i]!r} (n={int(neq.sum())})")
        results[name] = "PASS" if not diffs else "DIFF " + "; ".join(diffs[:3])
    width = max((len(n) for n in results), default=10)
    npass = 0
    for n in sorted(results):
        r = results[n]
        ok = r == "PASS" or r.startswith("ROWS-ONLY")
        npass += ok
        print(f"{'✓' if ok else '✗'} {n:<{width}}  {r}")
    print(f"-- {npass}/{len(results)} ok")
    sys.exit(0 if npass == len(results) else 1)

if __name__ == "__main__":
    main()
