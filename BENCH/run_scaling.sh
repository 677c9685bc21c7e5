#!/bin/bash
# Two-parallelism scaling evidence (BASELINE.json north rule: N vs 4N
# executors, evidenced as local[LO] vs local[HI]=4xLO on the same
# input). The host is a shared VM with visible noise between runs, so
# we run ALTERNATING repetitions and report medians (BENCH/summarize.py).
# HI/LO are explicit env vars (no reliance on shell word splitting —
# some wrapper shells don't split unquoted expansions).
#
# Each run is CPU-PINNED to exactly CPUS cores (taskset -c 0-(CPUS-1)).
# Without pinning, a local[4] JVM still spreads its GC threads, netty
# I/O, parquet writer threads and Python workers over all 32 host
# cores, inflating the low-parallelism baseline — a real 4-core
# executor has no such free ride. Pinning makes local[N] faithful to
# an N-core executor budget.
set -e
cd /root/repo
REPS=${REPS:-3}
HI=${HI:-16}
LO=${LO:-4}
PREFIX=${PREFIX:-scaling}
i=1
while [ "$i" -le "$REPS" ]; do
  for CPUS in "$HI" "$LO"; do
    SPARK_GRAFT_SF_DIR=${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1} \
    SPARK_GRAFT_CPUS=$CPUS BENCH_TURNS=${BENCH_TURNS:-1000000} BENCH_SKIP_SF=1 \
    taskset -c 0-$((CPUS - 1)) \
    python bench.py 2>/dev/null | tail -1 > "BENCH/${PREFIX}_local${CPUS}_run${i}.json"
    echo "run $i local[$CPUS] done"
  done
  i=$((i + 1))
done
LEVELS="$HI $LO" PREFIX="$PREFIX" python BENCH/summarize.py
