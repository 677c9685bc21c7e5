#!/bin/bash
# one interleaved A/B round: baseline tree then HEAD tree
set -u
tag=$1
export SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32
(cd /tmp/base505 && python bench.py > /root/repo/BENCH/r06/ab_base_$tag.json 2>/root/repo/BENCH/r06/ab_base_$tag.err)
(python bench.py > /root/repo/BENCH/r06/ab_head_$tag.json 2>/root/repo/BENCH/r06/ab_head_$tag.err)
echo "round $tag done"
