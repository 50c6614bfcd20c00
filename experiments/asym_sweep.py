"""Sweep the asymmetric deferred traversal's capacity constants
(DESCENT_STEPS, TEST_ROUNDS, TEST_DIV, LADDER_DIV) on the real L1
bounce wavefront. Test capacity per phase = (n/TEST_DIV) * TEST_ROUNDS
must cover demand (~3.5 rounds/lane over ~4 phases) or descent stalls."""

import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/experiments")

import jax
import jax.numpy as jnp
import numpy as np

from batch_scaling import get_l1, timed
from rpt_tpu.dtypes import DTYPE, INF
from rpt_tpu.ray import Ray
from rpt_tpu.vec import Vec3
import rpt_tpu.deferred as dmod
import bench


def main():
    scene = bench.build_scene().compile()
    tables = scene.tables
    o, d, ok = get_l1(scene, tables, 0)
    n = o.shape[0]
    ray = Ray(
        Vec3(jnp.asarray(o[:, 0]), jnp.asarray(o[:, 1]), jnp.asarray(o[:, 2])),
        Vec3(jnp.asarray(d[:, 0]), jnp.asarray(d[:, 1]), jnp.asarray(d[:, 2])),
    )

    configs = [
        # (D, T, TEST_DIV, LADDER_DIV) — round 2: gradient from D6/T3/TD4
        (6, 3, 4, 4),
        (4, 2, 4, 8),
        (4, 3, 4, 8),
        (6, 2, 4, 8),
        (3, 2, 4, 8),
        (4, 2, 2, 8),
        (6, 3, 2, 8),
        (2, 1, 4, 8),
    ]
    for D, T, TD, LD in configs:
        dmod.DESCENT_STEPS = D
        dmod.TEST_ROUNDS = T
        dmod.TEST_DIV = TD
        dmod.LADDER_DIV = LD

        @jax.jit
        def f(tables, ray):
            t, tri, u, v, w = dmod.deferred_traverse(
                tables["clusters"], ray, scene.t_min, INF,
                jnp.full(n, INF, DTYPE), any_hit=False,
            )
            return t

        t = timed(f, tables, ray)
        print(f"D={D:2d} T={T} TEST_DIV={TD:2d} LADDER={LD}: {t*1e3:7.1f} ms",
              flush=True)


if __name__ == "__main__":
    main()
