#!/bin/bash
# Concurrent two-level pair for RankBench (VERDICT r4 task #3): run the same
# pageRank job at local[1] and local[4] SIMULTANEOUSLY in two JVMs so both
# levels sample the same machine phase (the run_pair.sh stance — sequential
# single-run pairs were phase-noise-dominated, see BENCH/BASELINE.md r4
# "Follow-up").
#
#   tools/run_rank_pair.sh <pairName> [outDir nEdges nVerts iters]
set -euo pipefail
cd "$(dirname "$0")/.."

P=${1:?pair name}
OUT=${2:-BENCH/r5}
EDGES=${3:-40000000}
VERTS=${4:-8000000}
ITERS=${5:-10}
mkdir -p "$OUT"

export SPARK_DRIVER_MEM=${SPARK_DRIVER_MEM:-45g}

echo "=== rankpair $P start $(date +%T) edges=$EDGES verts=$VERTS iters=$ITERS ===" | tee -a "$OUT/rankpairs.log"
tools/run_bench.sh graft.datapipe.tools.RankBench "$EDGES" "$VERTS" "$ITERS" 1 \
  > "$OUT/rankpair${P}_c1.json" 2> "$OUT/rankpair${P}_c1.err" &
PID1=$!
tools/run_bench.sh graft.datapipe.tools.RankBench "$EDGES" "$VERTS" "$ITERS" 4 \
  > "$OUT/rankpair${P}_c4.json" 2> "$OUT/rankpair${P}_c4.err" &
PID4=$!
RC=0
wait $PID1 || RC=$?
wait $PID4 || RC=$?
echo "=== rankpair $P done $(date +%T) rc=$RC ===" | tee -a "$OUT/rankpairs.log"

python3 - "$OUT" "$P" <<'EOF'
import json, sys
out, p = sys.argv[1], sys.argv[2]
def last_json(path):
    rows = [l for l in open(path) if l.startswith('{')]
    return json.loads(rows[-1])
try:
    c1 = last_json(f"{out}/rankpair{p}_c1.json")
    c4 = last_json(f"{out}/rankpair{p}_c4.json")
    eff = c4["edge_traversals_per_sec"] / (4 * c1["edge_traversals_per_sec"])
    same = (c1["verts"] == c4["verts"]
            and abs(c1["rank_sum"] - c4["rank_sum"]) < 1e-6
            and abs(c1["top_rank"] - c4["top_rank"]) < 1e-9)
    print(f"rankpair {p}: T(1)={c1['secs']:.1f}s T(4)={c4['secs']:.1f}s "
          f"eff={eff:.2f} outputs_level_identical={same}")
except Exception as e:
    print(f"rankpair {p}: incomplete ({e})")
EOF
