#!/bin/bash
# Two-parallelism scaling evidence (BASELINE.json north rule: N vs 4N
# executors, evidenced as local[8] vs local[32] on the same input).
# The host is a shared VM with visible noise between runs, so we run
# ALTERNATING repetitions and report medians (BENCH/summarize.py).
set -e
cd /root/repo
REPS=${REPS:-3}
for i in $(seq 1 $REPS); do
  for CPUS in ${LEVELS:-"16 4"}; do
    SPARK_GRAFT_SF_DIR=${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1} \
    SPARK_GRAFT_CPUS=$CPUS BENCH_TURNS=${BENCH_TURNS:-1000000} BENCH_SKIP_SF=1 \
    python bench.py 2>/dev/null | tail -1 > BENCH/scaling_local${CPUS}_run$i.json
    echo "run $i local[$CPUS] done"
  done
done
python BENCH/summarize.py
