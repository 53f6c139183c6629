#!/bin/bash
# One-artifact sf10 gate (the round-12 recipe, scripted): run the FULL
# query registry through ONE graft.Verify JVM with file-spill stream
# sinks, check the handful of slow oracles as their outputs land, then
# drain the remainder with 4 parallel check.py workers.
#
# Usage: tools/gate_sf10.sh <sfDir> <outDir> <seedOracleJson> <resultLog>
#   sfDir          e.g. /tmp/graft_sf10p  (gen_sf.py output)
#   outDir         scratch dir for Verify parquet dumps
#   seedOracleJson oracle_sql.json from ANY prior Verify run — Verify
#                  only writes its own at the very END, and the overlap
#                  watcher needs the SQL before that
#   resultLog      where check.py lines accumulate (one line per query)
#
# Optional: $5 = comma-separated query subset (resume after a crash —
# pass the not-yet-dumped names and keep OUT in place); GATE_HEAP
# overrides the engine heap (default 48g: 96g left no headroom for the
# overlapped DuckDB oracle workers and the OOM killer took the engine
# mid-gate in round 13's first attempt).
set -u
SF=${1:?sfDir}
OUT=${2:?outDir}
SEED=${3:?seed oracle_sql.json}
LOG=${4:?result log}
ONLY=${5:-}
HEAP=${GATE_HEAP:-48g}
REPO="$(cd "$(dirname "$0")/.." && pwd)"
cd "$REPO"
mkdir -p "$OUT"
cp "$SEED" "$OUT/oracle_sql.json"
: > "$LOG"

# oracles that take minutes at sf10 — checked as soon as each parquet
# dump's _SUCCESS lands so DuckDB overlaps the still-running engine
SLOW="dd_dup_clusters dd_ngram_jaccard dd_minhash_lsh tx_decontaminate j7_spatial_join sim_semantic_dedup a1_sliding_window s1_stream_window_agg"

SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32} \
SPARK_GRAFT_STREAM_SINK=files \
  java -Xmx"$HEAP" -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
  graft.Verify "$SF" "$OUT" $ONLY >> "$OUT/verify.log" 2>&1 &
ENGINE=$!

declare -A started
while kill -0 $ENGINE 2>/dev/null; do
  for q in $SLOW; do
    if [[ -z "${started[$q]:-}" && -f "$OUT/$q/_SUCCESS" ]]; then
      started[$q]=1
      python3 tools/check.py "$SF" "$OUT" "$q" >> "$LOG" 2>&1 &
    fi
  done
  sleep 20
done
wait $ENGINE
ENGINE_EXIT=$?
# make sure every slow oracle was started even if it landed last
for q in $SLOW; do
  if [[ -z "${started[$q]:-}" && -f "$OUT/$q/_SUCCESS" ]]; then
    started[$q]=1
    python3 tools/check.py "$SF" "$OUT" "$q" >> "$LOG" 2>&1 &
  fi
done

# drain the remaining oracles 4-way (serial is ~1.5 queries/min at sf10)
REST=$(python3 - "$OUT" "$SLOW" <<'PY'
import json, sys, os
out = sys.argv[1]
slow = set(sys.argv[2].split())
qs = sorted(json.load(open(f"{out}/oracle_sql.json")))
qs = [q for q in qs if q not in slow and os.path.isdir(f"{out}/{q}")]
print("\n".join(qs))
PY
)
i=0
for chunk in $(echo "$REST" | paste -sd' ' - | tr ' ' '\n' | awk '{print $0}' | xargs -n 60 echo | tr ' ' ','); do
  python3 tools/check.py "$SF" "$OUT" $(echo "$chunk" | tr ',' ' ') >> "$LOG" 2>&1 &
  i=$((i+1))
done
wait
echo "engine_exit=$ENGINE_EXIT" >> "$LOG"
grep -c " PASS " "$LOG"
