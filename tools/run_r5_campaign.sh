#!/bin/bash
# Round-5 measurement campaign (VERDICT r4 tasks #3, #5, #6), sequential so
# no two measurements share the box:
#   1. SkewBench       — AQE skewJoin vs manual salting (J4), measured spread
#   2. rank pairs ×2   — pageRank 40M edges, concurrent local[1]/local[4]
#   3. cluster pairs ×N — standalone master + worker JVMs, spark-submit at
#                         1 vs 4 executors (4 vs 16 cores), concurrent
# Usage: tools/run_r5_campaign.sh [outDir nClusterPairs]
set -uo pipefail
cd "$(dirname "$0")/.."

OUT=${1:-BENCH/r5}
NPAIRS=${2:-5}
mkdir -p "$OUT"
export GRAFT_CLASSES=${GRAFT_CLASSES:-/dev/shm/graft-frozen-r5/classes}
export GRAFT_JAR=${GRAFT_JAR:-/dev/shm/graft-frozen-r5/ecspiderspark_2.13-0.1.0.jar}

echo "=== r5 campaign start $(date +%T) ==="

echo "--- 1. SkewBench (20M rows, 90% hostA, salt 16, 4 cpus) ---"
SPARK_DRIVER_MEM=40g tools/run_bench.sh graft.spider.tools.SkewBench \
  20000000 200 0.9 16 4 > "$OUT/skewbench.json" 2> "$OUT/skewbench.err"
cat "$OUT/skewbench.json"

for P in A B; do
  echo "--- 2. rank pair $P (40M edges / 8M verts / 10 iters) ---"
  tools/run_rank_pair.sh "$P" "$OUT" 40000000 8000000 10
done

for i in $(seq 1 "$NPAIRS"); do
  echo "--- 3. cluster pair C$i (rep=100, 4 rounds, 17 KB pages) ---"
  tools/run_cluster_pair.sh "C$i" "$OUT" /root/testdata/sf0.1 100 4 17000 400
done

echo "=== r5 campaign done $(date +%T) ==="
