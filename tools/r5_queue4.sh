#!/bin/bash
# Round-5 queue #4 (replaces queue #3: the AH_CT=16 A/B there was
# already measured last session — PERF.md "Any-hit CT=16 table split",
# net -8.2% — and is not re-run).
#   1. default-config baseline WITH extras: fresh-session baseline for
#      the A/B below + warms the persistent XLA cache for the driver's
#      end-of-round bench.py (this machine's cache started empty).
#   2. depth-capped TOP_SEED=2 (commit 3cf5cee), pre-registered rule:
#      flip the default only on a >=4% net dragon win at identical mean
#      radiance.
# Probe timeout raised to 480 s: the tunnel re-init right after another
# TPU process exits measured >240 s once this session.
set -x
cd /root/repo
mkdir -p /tmp/tpu_results

timeout 3000 env RPT_TPU_BACKEND_TIMEOUT=480 python bench.py \
  2>&1 | tee /tmp/tpu_results/bench_r5q4_base.txt | tail -3

timeout 2400 env RPT_TPU_BACKEND_TIMEOUT=480 RPT_TPU_TOP_SEED=2 \
  RPT_TPU_BENCH_EXTRA_BUDGET=0 python bench.py \
  2>&1 | tee /tmp/tpu_results/bench_r5q4_topseed2.txt | tail -2

echo QUEUE4_DONE
