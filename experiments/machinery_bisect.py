"""Bisect the 257 ms zero-active deferred machinery (round 5: was ~60 ms
round 3) by toggling its pieces. Solo + scalar pulls. Variants via env:
run once per configuration (jit caches are per-process anyway).

    python experiments/machinery_bisect.py            # baseline
    RPT_TPU_TOP_SEED=0 python ...                     # no top-seed
    RPT_TPU_LADDER_DIV=64 python ...                  # 1 rung per ladder
"""

import math
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

import rpt_tpu as rpt
from rpt_tpu import sampling
from rpt_tpu.deferred import deferred_traverse, LADDER_DIV, TOP_SEED, UNROLL_K
from rpt_tpu.dtypes import DTYPE, INF
from rpt_tpu.ray import Ray
from rpt_tpu.renderer import _pixel_grid
import bench


def timed_scalar(fn, *args, reps=3):
    float(fn(*args))
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    scene = bench.build_scene().compile()
    tables = scene.tables
    ct = tables["clusters"]
    camera = rpt.Camera.look_at((-2.5, 4.0, 6.5), (0, 0, 0), (0, 1, 0), math.pi / 6)
    n = 512 * 512
    xn_np, yn_np, pixel_ids, _ = _pixel_grid(512, 512)
    key = jax.random.key(0)
    pix_keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(
        jnp.asarray(pixel_ids, jnp.int32)
    )
    keys = sampling.fold(pix_keys, 0)
    ray0 = camera.cast_ray(
        jnp.asarray(xn_np, DTYPE), jnp.asarray(yn_np, DTYPE), sampling.fold(keys, 3)
    )

    @jax.jit
    def f_zero(ct, ray):
        t, *_ = deferred_traverse(
            ct, ray, scene.t_min, INF, jnp.full((n,), INF, DTYPE),
            any_hit=False, active=jnp.zeros((n,), bool),
        )
        return jnp.sum(jnp.where(jnp.isfinite(t), t, 0.0))

    @jax.jit
    def f_full(ct, ray):
        t, *_ = deferred_traverse(
            ct, ray, scene.t_min, INF, jnp.full((n,), INF, DTYPE),
            any_hit=False,
        )
        return jnp.sum(jnp.where(jnp.isfinite(t), t, 0.0))

    tag = f"TOP_SEED={int(TOP_SEED)} LADDER_DIV={LADDER_DIV} UNROLL_K={UNROLL_K}"
    t_z = timed_scalar(f_zero, ct, ray0)
    print(f"[{tag}] zero-active: {t_z*1e3:7.1f} ms")
    t_f = timed_scalar(f_full, ct, ray0)
    print(f"[{tag}] L0-as-deferred (all active): {t_f*1e3:7.1f} ms")


if __name__ == "__main__":
    main()
