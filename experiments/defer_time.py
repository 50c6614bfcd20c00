"""Time the deferred traversal (closest + any-hit) on the real 262k-lane
L1 bounce wavefront, for cluster-size A/B sweeps:

    python experiments/defer_time.py
    RPT_TPU_CLUSTER_TRIS=32 python experiments/defer_time.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/experiments")

import jax
import jax.numpy as jnp
import numpy as np

from batch_scaling import get_l1
from rpt_tpu.accel.clusters import CLUSTER_TRIS
from rpt_tpu.deferred import deferred_traverse
from rpt_tpu.dtypes import DTYPE, INF
from rpt_tpu.ray import Ray
from rpt_tpu.vec import Vec3
import bench


def sync(x):
    return float(np.asarray(jax.tree_util.tree_leaves(x)[0]).reshape(-1)[0])


def timed(fn, *args, reps=3):
    sync(fn(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        sync(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    scene = bench.build_scene().compile()
    tables = scene.tables
    ct = tables["clusters"]
    o, d, ok = get_l1(scene, tables, 0)
    n = o.shape[0]
    ray = Ray(
        Vec3(jnp.asarray(o[:, 0]), jnp.asarray(o[:, 1]), jnp.asarray(o[:, 2])),
        Vec3(jnp.asarray(d[:, 0]), jnp.asarray(d[:, 1]), jnp.asarray(d[:, 2])),
    )
    print(f"CLUSTER_TRIS={CLUSTER_TRIS} tree_rows={ct.tree.shape} "
          f"fat={ct.fat.shape} live_lanes={ok.sum()}")

    @jax.jit
    def f_closest(ct, ray):
        t, tri, u, v, w = deferred_traverse(
            ct, ray, scene.t_min, INF, jnp.full((n,), INF, DTYPE), any_hit=False
        )
        return t

    @jax.jit
    def f_anyhit(ct, ray):
        t, *_ = deferred_traverse(
            ct, ray, scene.t_min, jnp.full((n,), 3.0, DTYPE),
            jnp.full((n,), INF, DTYPE), any_hit=True
        )
        return t

    t = timed(f_closest, ct, ray)
    print(f"closest-hit deferred: {t*1e3:.1f} ms")
    t = timed(f_anyhit, ct, ray)
    print(f"any-hit deferred:     {t*1e3:.1f} ms")


if __name__ == "__main__":
    main()
