#!/bin/bash
# Scaling-efficiency evidence (BASELINE.md): run the identical north-star
# job (index build over the same synthesized corpus + BM25 workload) at
# local[8] (N) and local[32] (4N) and report throughput at both plus
# efficiency = (throughput_4N / throughput_N) / 4.
set -e
cd /root/repo
# 320k files ≈ 77M tokens: large enough that tokenize/shuffle/encode
# dominate the fixed per-job overhead and the N-vs-4N comparison measures
# compute scaling, not scheduler constants.
N=${SPARK_GRAFT_BUILD_N:-320000}
OUT=target/scaling
mkdir -p $OUT
# Two runs per leg, keep the faster: the sandbox VM's hosting noise is
# large (same-config builds vary ~1.5x); min-of-2 approximates the
# un-throttled capability at each parallelism level.
for CPUS in 8 32; do
  for REP in 1 2; do
    rm -rf /tmp/graft-bench-build-$CPUS /dev/shm/graft-bench-build-$CPUS /dev/shm/graft-spark-local
    echo "== local[$CPUS], N=$N files, rep $REP =="
    SPARK_DRIVER_MEM=${SPARK_DRIVER_MEM:-48g} \
      SPARK_GRAFT_SCALING_MODE=1 SPARK_GRAFT_BUILD_N=$N SPARK_GRAFT_CPUS=$CPUS \
      SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
      ./scripts/bench_java.sh 2>/dev/null | grep -o '{"metric".*}' \
      > $OUT/bench_cpus${CPUS}_r$REP.json
    cat $OUT/bench_cpus${CPUS}_r$REP.json
  done
  python3 - "$OUT" "$CPUS" << 'PYEOF'
import json, sys
out, cpus = sys.argv[1], sys.argv[2]
runs = [json.load(open(f"{out}/bench_cpus{cpus}_r{r}.json")) for r in (1, 2)]
best = max(runs, key=lambda j: j["build"]["files_per_sec"])
json.dump(best, open(f"{out}/bench_cpus{cpus}.json", "w"))
PYEOF
done
python3 scripts/scaling_report.py $OUT/bench_cpus8.json $OUT/bench_cpus32.json
