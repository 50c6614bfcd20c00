"""Sweep deferred-traversal phase constants on the real L1 bounce
wavefront (closest-hit, 262k lanes) and the L1 shadow wavefront
(any-hit). Decides DESCENT_STEPS / TEST_ROUNDS / BATCH_DIV."""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/experiments")

from deferred_diag import get_l1_wavefront, sync, timed
import rpt_tpu.deferred as deferred_mod
from rpt_tpu.dtypes import DTYPE, INF
import bench


def main():
    scene = bench.build_scene().compile()
    tables = scene.tables
    ray, ok, n = get_l1_wavefront(scene, tables)

    configs = [
        (24, 64, 8),  # current
        (12, 4, 8),
        (8, 3, 8),
        (12, 4, 4),
        (12, 4, 16),
        (16, 2, 8),
    ]
    for D, T, B in configs:
        deferred_mod.DESCENT_STEPS = D
        deferred_mod.TEST_ROUNDS = T
        deferred_mod.BATCH_DIV = B

        @jax.jit
        def f_def(tables, ray):
            t, tri, u, v, w = deferred_mod.deferred_traverse(
                tables["clusters"], ray, scene.t_min, INF,
                jnp.full(n, INF, DTYPE), any_hit=False,
            )
            return t

        t = timed(f_def, tables, ray)
        print(f"D={D:3d} T={T:3d} B={B:3d}: {t*1e3:7.1f} ms", flush=True)


if __name__ == "__main__":
    main()
