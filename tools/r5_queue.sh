#!/bin/bash
# Round-5 TPU measurement queue (serial — single-tenant chip).
# 1. any-hit CT=16 split A/B (pre-registered rule: flip the default only
#    on a >=5% net dragon-bench win at identical mean radiance).
# 2. retry the star configs that failed/timed out.
set -x
cd /root/repo
mkdir -p /tmp/tpu_results

# 1a. baseline refresher (same session conditions as the A/B)
timeout 1800 env RPT_TPU_BENCH_EXTRA_BUDGET=0 python bench.py \
  2>&1 | tee /tmp/tpu_results/bench_r5_base.txt | tail -2

# 1b. any-hit split
timeout 2400 env RPT_TPU_AH_CT=16 RPT_TPU_BENCH_EXTRA_BUDGET=0 python bench.py \
  2>&1 | tee /tmp/tpu_results/bench_r5_ahsplit.txt | tail -2

# 2. star retries
timeout 4000 python tools/star_renders.py --only lampshade \
  2>&1 | tee -a /tmp/tpu_results/star_renders.txt | tail -2
timeout 5400 python tools/star_renders.py --only photon_map \
  2>&1 | tee -a /tmp/tpu_results/star_renders.txt | tail -2
