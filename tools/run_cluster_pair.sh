#!/bin/bash
# Standalone-CLUSTER scaling pair (round 5): the closest sandbox realization
# of the north rule's "spark-submit at N and 4N executors". A real Spark
# standalone master + 5 worker JVMs run on this box; the two levels are
# spark-submit'ted CONCURRENTLY (same machine phase, as in run_pair.sh):
#
#   level N : spark.cores.max=4,  executor.cores=4 → 1 executor JVM
#   level 4N: spark.cores.max=16, executor.cores=4 → 4 executor JVMs
#
# Unlike local[n], every path is the distributed one: closure/task
# serialization, netty shuffle transport, broadcast over the block manager,
# and a real driver/executor process boundary.
#
#   tools/run_cluster_pair.sh <pairName> [outDir sfDir replicate rounds noise seeds]
set -uo pipefail
cd "$(dirname "$0")/.."

P=${1:?pair name}
OUT=${2:-BENCH/r5}
SF=${3:-/root/testdata/sf0.1}
REP=${4:-200}
R=${5:-4}
NOISE=${6:-17000}
SEEDS=${7:-400}
mkdir -p "$OUT"

export SPARK_HOME=/opt/spark
# GRAFT_JAR: frozen jar snapshot for long campaigns (same reason as
# run_bench.sh's GRAFT_CLASSES — concurrent sbt builds must not swap the
# jar under a running campaign)
JAR=${GRAFT_JAR:-target/scala-2.13/ecspiderspark_2.13-0.1.0.jar}
[ -f "$JAR" ] || { echo "missing $JAR — run: sbt package" >&2; exit 1; }

MASTER_URL=spark://127.0.0.1:7077

# Shared bucketed corpus, as in the interleaved protocol
export GRAFT_CORPUS_DIR=${GRAFT_CORPUS_DIR:-/dev/shm/graft-corpus-$(basename "$SF")-r${REP}-n${NOISE}}
if [ ! -f "$GRAFT_CORPUS_DIR/_graft_corpus.json" ]; then
  echo "=== building shared corpus at $GRAFT_CORPUS_DIR $(date +%T) ===" | tee -a "$OUT/cluster.log"
  tools/run_bench.sh graft.spider.tools.CorpusBuild "$GRAFT_CORPUS_DIR" "$SF" "$REP" "$NOISE" \
    2>> "$OUT/cluster.log" | tee -a "$OUT/cluster.log"
fi
export GRAFT_STATE_DIR=${GRAFT_STATE_DIR:-/dev/shm/graft-cluster-state}
export GRAFT_LOCAL_DIR=${GRAFT_LOCAL_DIR:-/dev/shm/graft-cluster-local}
mkdir -p "$GRAFT_STATE_DIR" "$GRAFT_LOCAL_DIR"

CLUSTER_LOG_DIR=$(mktemp -d /tmp/graft-cluster-XXXX)
PIDS=()
cleanup() {
  for pid in "${PIDS[@]:-}"; do kill "$pid" 2>/dev/null || true; done
  sleep 1
  for pid in "${PIDS[@]:-}"; do kill -9 "$pid" 2>/dev/null || true; done
}
trap cleanup EXIT

echo "=== cluster pair $P: starting master + 5 workers $(date +%T) ===" | tee -a "$OUT/cluster.log"
"$SPARK_HOME"/bin/spark-class org.apache.spark.deploy.master.Master \
  --host 127.0.0.1 --port 7077 --webui-port 8081 \
  > "$CLUSTER_LOG_DIR/master.log" 2>&1 &
PIDS+=($!)
sleep 3
# Memory budget (125 GiB box): the corpus ALSO lives in RAM (tmpfs), so
# 5 executors × 12g + 2 drivers × 12g + 17 GiB corpus (rep=100) + tmpfs
# shuffle ≈ 105 GiB peak. The r5 trial's 18g/16g sizing with a 34 GiB
# corpus could OOM-kill mid-campaign.
EXEC_MEM=${GRAFT_EXEC_MEM:-12g}
DRIVER_MEM=${GRAFT_SUBMIT_DRIVER_MEM:-12g}
for i in 1 2 3 4 5; do
  SPARK_WORKER_DIR="$CLUSTER_LOG_DIR/worker$i" \
  "$SPARK_HOME"/bin/spark-class org.apache.spark.deploy.worker.Worker \
    --host 127.0.0.1 --port $((40100 + i)) --webui-port $((40200 + i)) \
    --cores 4 --memory "$EXEC_MEM" "$MASTER_URL" \
    > "$CLUSTER_LOG_DIR/worker$i.log" 2>&1 &
  PIDS+=($!)
done
sleep 5

# Barrier: both drivers finish warmup/setup, then start timed crawls together
BARRIER_DIR=$(mktemp -d /tmp/graft-barrier-XXXX)
export GRAFT_BARRIER="$BARRIER_DIR/clpair$P,2"
export GRAFT_MASTER=submit
# the bandwidth probe must fit the submit driver's heap: 16 threads × 256 MiB
export GRAFT_PROBE_MIB=${GRAFT_PROBE_MIB:-256}

submit() { # $1=cores.max $2=label
  "$SPARK_HOME"/bin/spark-submit \
    --master "$MASTER_URL" --deploy-mode client \
    --class graft.spider.tools.ScalingBench \
    --driver-memory "$DRIVER_MEM" \
    --conf spark.executor.cores=4 \
    --conf "spark.executor.memory=$EXEC_MEM" \
    --conf "spark.cores.max=$1" \
    --conf spark.ui.enabled=false \
    --conf spark.local.dir="$GRAFT_LOCAL_DIR" \
    "$JAR" "$SF" "$REP" "$R" "$2" "$NOISE" "$SEEDS"
}

echo "=== cluster pair $P submit $(date +%T) rep=$REP rounds=$R ===" | tee -a "$OUT/cluster.log"
submit 4 4 > "$OUT/clpair${P}_n1.json" 2> "$OUT/clpair${P}_n1.err" &
S1=$!
submit 16 16 > "$OUT/clpair${P}_n4.json" 2> "$OUT/clpair${P}_n4.err" &
S4=$!
RC=0
wait $S1 || RC=$?
wait $S4 || RC=$?
rm -rf "$BARRIER_DIR"
echo "=== cluster pair $P done $(date +%T) rc=$RC ===" | tee -a "$OUT/cluster.log"

python3 - "$OUT" "$P" <<'EOF'
import json, sys
out, p = sys.argv[1], sys.argv[2]
def last_json(path):
    rows = [l for l in open(path) if l.startswith('{')]
    return json.loads(rows[-1])
try:
    n1 = last_json(f"{out}/clpair{p}_n1.json")["local[4]"]
    n4 = last_json(f"{out}/clpair{p}_n4.json")["local[16]"]
    eff = n4["urls_per_sec"] / (4 * n1["urls_per_sec"])
    print(f"cluster pair {p}: T(1x4c)={n1['secs']:.1f}s T(4x4c)={n4['secs']:.1f}s "
          f"tput {n1['urls_per_sec']:.0f}/{n4['urls_per_sec']:.0f} eff={eff:.2f}")
except Exception as e:
    print(f"cluster pair {p}: incomplete ({e})")
EOF
