#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Usage: python3 tools/check.py [sfDir] [outDir] [query ...]

Reads each parquet result dumped by `graft.Verify` under outDir, runs the
matching SQL from outDir/oracle_sql.json in DuckDB against the base tables
in sfDir, sorts columns by name (mirroring the driver), and compares
dtype-exactly: a DuckDB HUGEINT/float column against a Spark int64 column
is a FAIL even when the values coerce equal (the driver hash-compares, so
the local gate must be at least as strict — round-1 shipped 4 hash FAILs
as local PASSes through pandas' silent dtype coercion).
"""
import hashlib, json, sys, glob, os, time
import duckdb
import numpy as np
import pandas as pd


def corpus_fp(sf):
    """Cheap corpus fingerprint: (name, size, head+tail bytes) of every
    parquet in sfDir. Size alone is not enough — a regenerated corpus
    with size-preserving content changes (plausible for fixed-width
    deterministic generators) must MISS the cache, not serve a stale
    oracle (round-14 ADVICE #2) — so the first and last 64 KiB of each
    file (covering the parquet footer metadata) join the key. mtime is
    deliberately excluded: byte-identical regeneration should still
    hit."""
    h = hashlib.sha256()
    for f in sorted(glob.glob(f"{sf}/*.parquet")):
        size = os.path.getsize(f)
        h.update(f"{os.path.basename(f)}:{size};".encode())
        with open(f, "rb") as fh:
            h.update(fh.read(65536))
            if size > 65536:
                fh.seek(max(65536, size - 65536))
                h.update(fh.read(65536))
    return h.hexdigest()[:16]


def isnull(x):
    """None/NaN/NaT are all null; arrays are never null."""
    r = pd.isna(x)
    return bool(r) if isinstance(r, (bool, np.bool_)) else False


def veq(a, b):
    """Exact python-value compare incl. type (no str coercion); numpy
    scalars normalized so np.str_ vs str is not a mismatch."""
    if isnull(a) or isnull(b):
        return isnull(a) and isnull(b)
    if isinstance(a, np.generic):
        a = a.item()
    if isinstance(b, np.generic):
        b = b.item()
    if type(a) is not type(b) and not (
            isinstance(a, np.ndarray) or isinstance(b, np.ndarray)):
        return False
    try:
        r = a == b
        return bool(r.all()) if hasattr(r, "all") else bool(r)
    except Exception:
        return repr(a) == repr(b)

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"
    only = set(sys.argv[3:])
    con = duckdb.connect()
    # large-SF oracle runs: bound DuckDB's footprint and let it spill
    # instead of tripping the kernel OOM killer (an unbounded connect()
    # defaults to 80% of RAM with no temp_directory, which at sf10
    # killed the whole check run on a single heavy join oracle).
    # CHECK_MEM=0 restores the unbounded default. The default derives
    # from detected RAM (min(40GB, 60%)) — a fixed 40GB on a <48GB host
    # would be LOOSER than DuckDB's own 80%-of-RAM default and
    # reintroduce the OOM kill this bound exists to prevent.
    ram_gb = os.sysconf("SC_PAGE_SIZE") * os.sysconf("SC_PHYS_PAGES") / 1e9
    mem = os.environ.get("CHECK_MEM", f"{min(40, int(ram_gb * 0.6))}GB")
    if mem != "0":
        spill = os.environ.get("CHECK_SPILL", "/tmp/duck_spill")
        os.makedirs(spill, exist_ok=True)
        con.execute(f"SET memory_limit='{mem}'")
        con.execute(f"SET temp_directory='{spill}'")
    # CHECK_THREADS caps DuckDB's parallelism so an oracle run can
    # share the host with a live Spark gate (default: all cores)
    thr = os.environ.get("CHECK_THREADS")
    if thr:
        con.execute(f"SET threads={int(thr)}")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    # CHECK_CACHE=<dir>: memoize ORACLE-side results (the expensive half
    # of an sf10 gate — a1 25 min, dd_dup_clusters 58 min in round 13)
    # as pandas pickles keyed by (query, sha of the oracle SQL, corpus
    # fingerprint). Pickle, not parquet: the compare below is dtype-kind
    # exact, and only pickle round-trips pandas dtypes bit-for-bit.
    # The engine side is never cached — it changes with every build.
    cache_dir = os.environ.get("CHECK_CACHE", "")
    fp = corpus_fp(sf) if cache_dir else ""
    if cache_dir:
        os.makedirs(cache_dir, exist_ok=True)
    # CHECK_ORACLE_ONLY=1: compute + cache oracle results without
    # requiring engine outputs (pre-seeds the cache while a gate or a
    # build is still running; the oracle depends only on SQL + corpus)
    oracle_only = os.environ.get("CHECK_ORACLE_ONLY") == "1"

    def oracle_df(name):
        """DuckDB oracle result, served from CHECK_CACHE when the
        (query, sql, corpus) triple was already computed."""
        key = hashlib.sha256(oracle[name].encode()).hexdigest()[:16]
        path = os.path.join(cache_dir, f"{name}.{key}.{fp}.pkl") \
            if cache_dir else None
        if path and os.path.exists(path):
            return pd.read_pickle(path), True
        exp = con.sql(oracle[name]).df()
        if path:
            pd.to_pickle(exp, path + ".tmp")
            os.replace(path + ".tmp", path)
        return exp, False

    results = {}
    names = sorted(set(oracle) | {d for d in os.listdir(out)
                                  if os.path.isdir(os.path.join(out, d))})
    def one(name):
        if oracle_only:
            if name not in oracle:
                return "SKIPPED(no-oracle)"
            try:
                exp, hit = oracle_df(name)
            except Exception as e:
                return f"ORACLE-ERR: {e}"
            return f"SEEDED({len(exp)}{', cache-hit' if hit else ''})"
        if not os.path.isdir(os.path.join(out, name)):
            return "MISSING-OUTPUT"
        files = glob.glob(f"{out}/{name}/*.parquet")
        if not files:
            return "NO-OUTPUT"
        got = con.sql(f"SELECT * FROM read_parquet({files!r})").df()
        got = got[sorted(got.columns)]
        if name not in oracle:
            return f"ROWS-ONLY({len(got)})"
        try:
            exp, cache_hit = oracle_df(name)
        except Exception as e:
            return f"ORACLE-ERR: {e}"
        exp = exp[sorted(exp.columns)]
        if list(got.columns) != list(exp.columns):
            return f"COLS got={list(got.columns)} exp={list(exp.columns)}"
        if len(got) != len(exp):
            return f"ROWS got={len(got)} exp={len(exp)}"
        # dtype-kind-exact: HUGEINT->float/object vs int64 must FAIL, like
        # the driver's value-format hash would; int32 vs int64 is fine
        # (round-1 evidence: rk int32 vs BIGINT oracle hash-passed).
        def kind(d):
            k = d.kind if hasattr(d, "kind") else "O"
            return "i" if k in "iu" else k
        dt = [(c, str(got[c].dtype), str(exp[c].dtype)) for c in got.columns
              if kind(got[c].dtype) != kind(exp[c].dtype)]
        if dt:
            return "DTYPE " + "; ".join(
                f"{c}: got={g} exp={e}" for c, g, e in dt[:3])
        diffs = []
        for c in got.columns:
            g, e = got[c], exp[c]
            if str(g.dtype) == "object":
                neq = pd.Series([not veq(a, b) for a, b in zip(g, e)],
                                index=g.index)
            else:
                neq = ~((g == e) | (g.isna() & e.isna()))
            if neq.any():
                i = int(neq.idxmax())
                diffs.append(f"{c}[row {i}]: got={g[i]!r} exp={e[i]!r} (n={int(neq.sum())})")
        # the cache-hit marker is deliberately IN the result string so a
        # gate artifact shows which oracles were served from cache
        return ("PASS (oracle-cached)" if cache_hit else "PASS") \
            if not diffs else "DIFF " + "; ".join(diffs[:3])

    skip = {s for s in os.environ.get("CHECK_SKIP", "").split(",") if s}
    for name in names:
        if only and name not in only:
            continue
        if name in skip:
            # record the skip IN results so the summary denominator shows
            # it — a forgotten CHECK_SKIP in CI must not silently narrow
            # the gate (the n/m count now carries a "k skipped" tail)
            results[name] = "SKIPPED(CHECK_SKIP)"
            print(f"~ {name}  SKIPPED (CHECK_SKIP)", flush=True)
            continue
        t0 = time.time()
        results[name] = one(name)
        # incremental line per query (flushed): long oracle runs must be
        # observable mid-flight, and per-oracle cost is itself a signal
        print(f". {name}  {results[name][:120]}  [{time.time()-t0:.1f}s]",
              flush=True)
    width = max((len(n) for n in results), default=10)
    npass = nskip = 0
    for n in sorted(results):
        r = results[n]
        skipped = r.startswith("SKIPPED")
        ok = (r.startswith("PASS") or r.startswith("ROWS-ONLY")
              or r.startswith("SEEDED"))
        npass += ok
        nskip += skipped
        print(f"{'~' if skipped else '✓' if ok else '✗'} {n:<{width}}  {r}")
    tail = f", {nskip} SKIPPED" if nskip else ""
    print(f"-- {npass}/{len(results)} ok{tail}")
    sys.exit(0 if npass + nskip == len(results) else 1)

if __name__ == "__main__":
    main()
