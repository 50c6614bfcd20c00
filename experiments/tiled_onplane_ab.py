"""A/B the round-4 _origin_on_plane guard inside the TILED (coherent)
engine on the real L0 camera wavefront, plus a clean zero-active
machinery re-measure — all solo + scalar pulls (the earlier round-5
numbers were polluted by concurrent TPU processes and 1 MB D2H syncs).
"""

import math
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

import rpt_tpu as rpt
from rpt_tpu import intersect, sampling
from rpt_tpu.deferred import deferred_traverse
from rpt_tpu.dtypes import DTYPE, INF
from rpt_tpu.tiled import tiled_traverse
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
    W = H = 512
    n = W * H
    xn_np, yn_np, pixel_ids, _ = _pixel_grid(W, H)
    key = jax.random.key(0)
    pix_keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(
        jnp.asarray(pixel_ids, jnp.int32)
    )
    keys = sampling.fold(pix_keys, 0)
    ray0 = camera.cast_ray(
        jnp.asarray(xn_np, DTYPE), jnp.asarray(yn_np, DTYPE), sampling.fold(keys, 3)
    )

    def make_tiled():
        @jax.jit
        def f(ct, ray):
            t, tri, u, v, w, cert = tiled_traverse(
                ct, ray, scene.t_min, INF, jnp.full((n,), INF, DTYPE),
                any_hit=False,
            )
            return jnp.sum(jnp.where(jnp.isfinite(t), t, 0.0)) + jnp.sum(cert)
        return f

    @jax.jit
    def f_cert(ct, ray):
        t, tri, u, v, w, cert = tiled_traverse(
            ct, ray, scene.t_min, INF, jnp.full((n,), INF, DTYPE), any_hit=False,
        )
        return jnp.sum(cert)

    real_guard = intersect._origin_on_plane
    t_on = timed_scalar(make_tiled(), ct, ray0)
    cert = int(f_cert(ct, ray0))
    print(f"tiled L0 guard ON : {t_on*1e3:7.1f} ms (cert {cert}/{n})")

    intersect._origin_on_plane = lambda num, pn, v1, o: jnp.zeros(jnp.shape(num), bool)
    try:
        t_off = timed_scalar(make_tiled(), ct, ray0)
    finally:
        intersect._origin_on_plane = real_guard
    print(f"tiled L0 guard OFF: {t_off*1e3:7.1f} ms (delta {100*(t_on-t_off)/max(t_off,1e-9):+.1f}%)")

    # zero-active deferred machinery, clean
    @jax.jit
    def f_zero(ct, ray):
        t, *_ = deferred_traverse(
            ct, ray, scene.t_min, INF, jnp.full((n,), INF, DTYPE),
            any_hit=False, active=jnp.zeros((n,), bool),
        )
        return jnp.sum(jnp.where(jnp.isfinite(t), t, 0.0))

    t_z = timed_scalar(f_zero, ct, ray0)
    print(f"deferred zero-active machinery: {t_z*1e3:7.1f} ms")


if __name__ == "__main__":
    main()
