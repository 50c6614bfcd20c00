"""Host A/B for RPT_TPU_CLUSTER_TRIS (fat-leaf width) ahead of the TPU
measurement queued in tools/tpu_queue.sh.

Builds the dragon scene under the env's CLUSTER_TRIS, replays the
descent-first traversal arithmetic (experiments/descent_first_sim.run)
on the real L1 bounce wavefront, and applies PERF.md's measured TPU cost
model:

  node/wide-row gather  ~12 ns/lane  (<=128-float rows all cost the same)
  fat-row test round     ~(12 ns wide-row refetch + fat-row fetch)
     fat row = 10*CT floats: CT=32 -> 2.5 KB ~50 ns (measured),
               CT=16 -> 1.25 KB ~25 ns (bandwidth-pro-rated estimate)

Run once per config:
  python experiments/ct_sweep.py                         # CT=32
  RPT_TPU_CLUSTER_TRIS=16 python experiments/ct_sweep.py # CT=16
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/experiments")

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

import bench
from batch_scaling import get_l1
from descent_first_sim import run


FAT_NS = {16: 25.0, 32: 50.0, 64: 100.0}  # bandwidth-bound fat-row cost


def main():
    ct_width = int(os.environ.get("RPT_TPU_CLUSTER_TRIS", "32"))
    scene = bench.build_scene().compile()
    tables = scene.tables
    ct = tables["clusters"]
    tree = np.asarray(ct.tree, np.float64)
    fat = np.asarray(ct.fat, np.float64)
    f3 = fat.reshape(fat.shape[0], 10, -1)
    print(f"CT={ct_width}: clusters {ct.n_clusters}, tree rows {len(tree)}",
          flush=True)

    o, d, ok = get_l1(scene, tables, 0)
    rng = np.random.default_rng(0)
    live = np.nonzero(ok)[0]
    sel = rng.choice(live, 2000, replace=False)
    o = o[sel].astype(np.float64)
    d = d[sel].astype(np.float64)
    d /= np.linalg.norm(d, axis=1, keepdims=True)

    t0 = time.time()
    visits, tests, mg = run(tree, f3, o, d, "descent_first")
    fat_ns = FAT_NS.get(ct_width, 50.0 * ct_width / 32)
    cost = visits * 12.0 + tests * (12.0 + fat_ns)
    print(
        f"CT={ct_width}: visits mean {visits.mean():.1f} p99 "
        f"{np.percentile(visits, 99):.0f} max {visits.max()}; tests mean "
        f"{tests.mean():.2f} p99 {np.percentile(tests, 99):.0f} max "
        f"{tests.max()}; modelled ns/ray mean {cost.mean():.0f} p99 "
        f"{np.percentile(cost, 99):.0f}  [{time.time()-t0:.0f}s]",
        flush=True,
    )


if __name__ == "__main__":
    main()
