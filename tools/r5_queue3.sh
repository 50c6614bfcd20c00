#!/bin/bash
# Round-5 queue #3 (fresh session — /tmp wiped, XLA cache persistent).
# Serial A/Bs, pre-registered rules:
#   1. baseline refresher (LADDER_DIV=16 default, 3.16 expected)
#   2. any-hit CT=16 split: flip default on >=5% net dragon win at
#      identical mean radiance.
#   3. depth-capped TOP_SEED=2 (HEAD 3cf5cee): flip default on >=4% net
#      win at identical mean radiance.
set -x
cd /root/repo
mkdir -p /tmp/tpu_results

timeout 2400 env RPT_TPU_BENCH_EXTRA_BUDGET=0 python bench.py \
  2>&1 | tee /tmp/tpu_results/bench_r5q3_base.txt | tail -2

timeout 2400 env RPT_TPU_AH_CT=16 RPT_TPU_BENCH_EXTRA_BUDGET=0 python bench.py \
  2>&1 | tee /tmp/tpu_results/bench_r5q3_ahsplit.txt | tail -2

timeout 2400 env RPT_TPU_TOP_SEED=2 RPT_TPU_BENCH_EXTRA_BUDGET=0 python bench.py \
  2>&1 | tee /tmp/tpu_results/bench_r5q3_topseed2.txt | tail -2

echo QUEUE3_DONE
