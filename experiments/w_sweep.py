"""Sweep deferred phase-batch width and burst lengths on the real L1
bounce wavefront (16-ary tree). Hypothesis from phase_diag + wide16: the
per-phase cost is dominated by fixed op-dispatch overhead (~5 ms at any
width), so fewer, wider phases should win until gather waste bites."""

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
        # (D, T, B, SLOTS)
        (12, 4, 16, 6),   # current
        (12, 4, 8, 6),
        (12, 4, 4, 6),
        (12, 4, 2, 6),
        (16, 4, 4, 6),
        (8, 3, 4, 6),
        (12, 2, 4, 6),
        (16, 6, 2, 8),
    ]
    for D, T, B, S in configs:
        dmod.DESCENT_STEPS = D
        dmod.TEST_ROUNDS = T
        dmod.BATCH_DIV = B
        dmod.CAND_SLOTS = S

        @jax.jit
        def f(tables, ray):
            t, tri, u, v, w = dmod.deferred_traverse(
                tables["clusters"], ray, scene.t_min, INF,
                jnp.full(n, INF, DTYPE), any_hit=False,
            )
            return t

        t = timed(f, tables, ray)
        print(f"D={D:2d} T={T} B={B:2d} S={S} (W={max(4096, n//B):6d}): "
              f"{t*1e3:7.1f} ms", flush=True)


if __name__ == "__main__":
    main()
