#!/bin/bash
# Concurrent scaling pair: run ScalingBench at local[1] and local[4]
# SIMULTANEOUSLY in two JVMs (5 threads on a 32-core box — no contention).
# The sandbox's machine speed fluctuates 2-3x between runs (BENCH/BASELINE.md
# "environment findings"), which dominated sequential pairs; concurrent runs
# sample the SAME machine phase at both levels, so the efficiency ratio is
# meaningful per pair instead of only in aggregate.
#
#   tools/run_pair.sh <pairName> [outDir sfDir replicate rounds noise seedsPerReplica]
set -euo pipefail
cd "$(dirname "$0")/.."

P=${1:?pair name}
OUT=${2:-BENCH/r2}
SF=${3:-/root/testdata/sf0.1}
REP=${4:-200}
R=${5:-4}
NOISE=${6:-17000}
SEEDS=${7:-400}
mkdir -p "$OUT"

# Two JVMs share 125 GiB: cap each heap so corpus caches (~17 GB each) +
# tmpfs shuffle state never push the box into the OOM killer.
export SPARK_DRIVER_MEM=${SPARK_DRIVER_MEM:-45g}

# Barrier: both JVMs finish warmup + corpus synthesis first, then start
# their TIMED crawls together (aligned timed regions = same machine phase).
BARRIER_DIR=$(mktemp -d /tmp/graft-barrier-XXXX)
export GRAFT_BARRIER="$BARRIER_DIR/pair$P,2"

echo "=== cpair $P start $(date +%T) rep=$REP rounds=$R noise=$NOISE seeds=$SEEDS ===" | tee -a "$OUT/cpairs.log"
tools/run_bench.sh graft.spider.tools.ScalingBench "$SF" "$REP" "$R" 1 "$NOISE" "$SEEDS" \
  > "$OUT/cpair${P}_c1.json" 2> "$OUT/cpair${P}_c1.err" &
PID1=$!
tools/run_bench.sh graft.spider.tools.ScalingBench "$SF" "$REP" "$R" 4 "$NOISE" "$SEEDS" \
  > "$OUT/cpair${P}_c4.json" 2> "$OUT/cpair${P}_c4.err" &
PID4=$!
RC=0
wait $PID1 || RC=$?
wait $PID4 || RC=$?
rm -rf "$BARRIER_DIR"
echo "=== cpair $P done $(date +%T) rc=$RC ===" | tee -a "$OUT/cpairs.log"

python3 - "$OUT" "$P" <<'EOF'
import json, sys
out, p = sys.argv[1], sys.argv[2]
try:
    c1 = json.load(open(f"{out}/cpair{p}_c1.json"))["local[1]"]
    c4 = json.load(open(f"{out}/cpair{p}_c4.json"))["local[4]"]
    eff = c4["urls_per_sec"] / (4 * c1["urls_per_sec"])
    print(f"cpair {p}: T(1)={c1['secs']:.1f}s T(4)={c4['secs']:.1f}s "
          f"tput {c1['urls_per_sec']:.0f}/{c4['urls_per_sec']:.0f} eff={eff:.2f}")
except Exception as e:
    print(f"cpair {p}: incomplete ({e})")
EOF
