"""A/B the round-4 _origin_on_plane guard's cost inside the deferred
traversal on the real 262k-lane L1 bounce wavefront (regression suspect:
dragon segment 260.5 ms round 3 -> 339.8 ms round 5).

    python experiments/onplane_ab.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/experiments")

import jax
import jax.numpy as jnp
import numpy as np

from batch_scaling import get_l1
from rpt_tpu import intersect
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

    def make(tag):
        @jax.jit
        def f_closest(ct, ray):
            t, tri, u, v, w = deferred_traverse(
                ct, ray, scene.t_min, INF, jnp.full((n,), INF, DTYPE), any_hit=False
            )
            return t
        return f_closest

    real_guard = intersect._origin_on_plane
    t_on = timed(make("on"), ct, ray)
    print(f"guard ON : closest {t_on*1e3:8.1f} ms")

    intersect._origin_on_plane = lambda num, pn, v1, o: jnp.zeros(
        jnp.shape(num), bool
    )
    try:
        t_off = timed(make("off"), ct, ray)
    finally:
        intersect._origin_on_plane = real_guard
    print(f"guard OFF: closest {t_off*1e3:8.1f} ms  (delta {100*(t_on-t_off)/t_off:+.1f}%)")


if __name__ == "__main__":
    main()
