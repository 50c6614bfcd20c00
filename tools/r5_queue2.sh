#!/bin/bash
# Round-5 queue #2: ladder-divisor A/B under the TOP_SEED=0 default.
# machinery_bisect (round 5, TOP_SEED=0): zero-active deferred call floor
# 56.3 ms -> 45.4 ms at LADDER_DIV=64, all-active ~flat (109.7 vs 112.5).
# ~6 deferred calls/sample on the bench => potential ~+10%.
# Pre-registered rule: flip the default only on a >=4% net bench win at
# identical mean radiance.
set -x
cd /root/repo
mkdir -p /tmp/tpu_results

timeout 2400 env RPT_TPU_LADDER_DIV=64 RPT_TPU_BENCH_EXTRA_BUDGET=0 python bench.py \
  2>&1 | tee /tmp/tpu_results/bench_r5_ld64.txt | tail -2

# intermediate value in case 64 overshoots
timeout 2400 env RPT_TPU_LADDER_DIV=16 RPT_TPU_BENCH_EXTRA_BUDGET=0 python bench.py \
  2>&1 | tee /tmp/tpu_results/bench_r5_ld16.txt | tail -2
