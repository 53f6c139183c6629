#!/usr/bin/env python3
"""Per-query scaling report: sf1 time / sf0.1 time from BENCH_local.json.

Usage: python3 tools/scaling.py [benchFile]

Picks the LATEST line per scale factor (the file is append-only JSONL;
see Bench.scala) and prints every query's time ratio, sorted descending.
The data grows 10x between the two lines, so for a linearly-scaling
operator the ratio's ceiling is ~10; fixed per-query machinery (stream
start/stop, planning, small-stage scheduling) pulls ratios BELOW 10, so
most healthy queries land well under it. Ratios meaningfully above 10
are the superlinearity signal the scale gate exists to catch — each one
must be named and either fixed or explained (see SURVEY.md round 7).

Queries whose SCALED time stays under FLOOR seconds are exempt from the
flag: a 0.05 s -> 1 s move is scheduling noise on 32 cores, not a
complexity signal. (A 0.2 s -> 3 s move IS flagged — 3 s at the scaled
SF is real wall-clock, so a 15x ratio there deserves a look.)
"""
import json, signal, sys

# head-friendly: a closed stdout pipe is how this report is normally
# consumed, not an error
signal.signal(signal.SIGPIPE, signal.SIG_DFL)

FLOOR = 2.0     # scaled-line seconds below which ratios are noise
FLAG = 12.0     # ratio above which we call it superlinear (10x data + margin)

def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_local.json"
    by_sf = {}
    for line in open(path):
        line = line.strip()
        if not line:
            continue
        d = json.loads(line)
        by_sf[str(d.get("sf", "?"))] = d  # latest line per sf wins
    # sf values are dir-path strings; sort by trailing number when
    # present so /tmp/graft_sf10 orders after /tmp/graft_sf1 (plain
    # lexicographic would interleave, and mixed str/float keys from
    # hand-edited lines would TypeError)
    import re
    def sf_key(s):
        m = re.search(r"(\d+(?:\.\d+)?)\s*$", s.rstrip("/"))
        return (float(m.group(1)) if m else float("inf"), s)
    sfs = sorted(by_sf, key=sf_key)
    if len(sfs) < 2:
        sys.exit(f"need lines for 2 scale factors, have {sfs}")
    small, big = by_sf[sfs[-2]], by_sf[sfs[-1]]
    print(f"base: sf={small['sf']} total={small['value']:.1f}s "
          f"(round {small.get('round')}, {small.get('sha')})")
    print(f"scaled: sf={big['sf']} total={big['value']:.1f}s "
          f"(round {big.get('round')}, {big.get('sha')})")
    qs = sorted(set(small["queries"]) & set(big["queries"]),
                key=lambda q: -(big["queries"][q] / max(small["queries"][q], 1e-9)))
    flagged = []
    for q in qs:
        a, b = small["queries"][q], big["queries"][q]
        r = b / max(a, 1e-9)
        mark = ""
        if r > FLAG and b >= FLOOR:
            mark = "  <-- SUPERLINEAR?"
            flagged.append(q)
        print(f"{r:7.1f}x  {a:7.2f}s -> {b:8.2f}s  {q}{mark}")
    print(f"\n{len(flagged)} flagged (ratio > {FLAG} and scaled time >= {FLOOR}s): "
          f"{flagged or 'none'}")

if __name__ == "__main__":
    main()
