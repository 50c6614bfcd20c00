#!/bin/bash
# Measurement queue for when the TPU returns. Run serially — the chip is
# single-tenant; overlapping runs hang each other (CLAUDE.md).
# Order = expected value: green BENCH artifact first, then the queued
# round-3/4 claims (top-seed, device-resident photon, CLUSTER_TRIS
# sweep), then the full gallery re-render with wall times.
set -x
cd /root/repo
mkdir -p /tmp/tpu_results

# 1. the headline bench (validates the 2.72 claim + top-seed + packed rungs)
timeout 1800 python bench.py 2>&1 | tee /tmp/tpu_results/bench.txt | tail -2

# 2. dragon closest-hit segment timing (top-seed on/off). Decision rule:
#    keep TOP_SEED=1 unless OFF is faster by >2% (it removes ~2 gathers/ray
#    of the 13.2 for ~2 ms of dense slab math per wavefront).
timeout 900 python experiments/defer_time.py 2>&1 | tee /tmp/tpu_results/defer_topseed.txt | tail -3
timeout 900 env RPT_TPU_TOP_SEED=0 python experiments/defer_time.py 2>&1 | tee /tmp/tpu_results/defer_notopseed.txt | tail -3

# 3. lampshade photon wall (device-resident shoot/build; VERDICT r2 #4 target <=60 s)
timeout 1800 python -c "
import sys, json; sys.path.insert(0, '/root/repo')
import bench_extra; print(json.dumps(bench_extra.photon_metric()))" 2>&1 | tee /tmp/tpu_results/photon.txt | tail -3

# 4. CLUSTER_TRIS sweep. Decision rule (host model, experiments/ct_sweep.py):
#    CT=16 predicted ~18% faster mean (219 vs 266 modelled ns/ray) but with
#    a 33% larger p99 descent tail — flip the default to 16 only if the
#    measured closest-hit segment beats CT=32 by >=10% (below that the
#    doubled tree/table memory and longer compiles aren't worth it).
#    CT=16 is already CPU-exactness-validated (test_tiled/test_deferred_ladder
#    pass under RPT_TPU_CLUSTER_TRIS=16), so a win can ship immediately.
timeout 900 env RPT_TPU_CLUSTER_TRIS=16 python experiments/defer_time.py 2>&1 | tee /tmp/tpu_results/defer_ct16.txt | tail -3
# 4b. CT=16 end-to-end: the tiled (coherent) path sees doubled cull width
#     and halved fat rows too — the flip decision needs the NET bench
#     number, not just the bounce segment. Fresh compile (~15 min first
#     time): run only if 4 showed a >=10% closest-segment win (decision
#     rule above), or force with RPT_TPU_QUEUE_FORCE_CT16=1.
ct16_win=$(python - <<'EOF'
import re
def seg(path):
    try:
        txt = open(path).read()
    except OSError:
        return None
    m = re.findall(r"closest[^\n]*?([0-9.]+)\s*ms", txt)
    return float(m[-1]) if m else None
base = seg("/tmp/tpu_results/defer_topseed.txt")
ct16 = seg("/tmp/tpu_results/defer_ct16.txt")
print(1 if base and ct16 and ct16 <= 0.9 * base else 0)
EOF
)
if [ "$ct16_win" = "1" ] || [ "${RPT_TPU_QUEUE_FORCE_CT16:-0}" = "1" ]; then
  timeout 1800 env RPT_TPU_CLUSTER_TRIS=16 python bench.py 2>&1 | tee /tmp/tpu_results/bench_ct16.txt | tail -2
else
  echo "CT=16 segment win <10% (or unmeasured): skipping the full CT=16 bench" | tee /tmp/tpu_results/bench_ct16.txt
fi

# 5. phase splits
timeout 900 python experiments/two_phase_split.py 2>&1 | tee /tmp/tpu_results/two_phase.txt | tail -6
timeout 1800 python experiments/trace_split.py 2>&1 | tee /tmp/tpu_results/trace_split.txt | tail -8

# 6. full 29-driver gallery re-render with wall times (VERDICT r3 #7)
timeout 14400 python tools/gallery.py 2>&1 | tee /tmp/tpu_results/gallery.txt | tail -31
