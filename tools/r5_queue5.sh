#!/bin/bash
# Round-5 queue #5: packed-block-width A/B. CAND_SLOTS 16 -> 12 removes
# 8 columns (4 f32 + 4 i32) from the block every ladder rung boundary
# gathers and scatters — the same mechanism that made TOP_SEED the
# round-5 regression. Dragon candidate occupancy is mean 2.2 / p99 10 /
# max 15 (descent_first_sim.py), so 12 slots stall <1% of lanes into
# the (exactness-tested) cleanup fixpoint. Pre-registered rule: flip
# the default only on a >=3% net win at identical mean radiance
# (3.2181). Second leg: MIN_STAGE 4096 -> 16384 drops one rung
# boundary; run only if the session has time.
set -x
cd /root/repo
mkdir -p /tmp/tpu_results

timeout 1800 env RPT_TPU_BACKEND_TIMEOUT=480 RPT_TPU_CAND_SLOTS=12 \
  RPT_TPU_BENCH_EXTRA_BUDGET=0 python bench.py \
  2>&1 | tee /tmp/tpu_results/bench_r5q5_cs12.txt | tail -2

timeout 1800 env RPT_TPU_BACKEND_TIMEOUT=480 RPT_TPU_MIN_STAGE=16384 \
  RPT_TPU_BENCH_EXTRA_BUDGET=0 python bench.py \
  2>&1 | tee /tmp/tpu_results/bench_r5q5_ms16k.txt | tail -2

echo QUEUE5_DONE
