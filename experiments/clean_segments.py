"""Round-5 regression triage: SOLO, sequential, scalar-pull timings of
each dragon-bench phase, so neither tunnel D2H nor concurrent processes
can pollute the numbers (both burned earlier round-5 measurements).

Measures: D2H bandwidth (fresh buffers), tiled L0 closest, deferred L1
closest, batched shadow occlusion, and the full bench launch.
"""

import math
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/experiments")

import jax
import jax.numpy as jnp
import numpy as np

import rpt_tpu as rpt
from rpt_tpu import sampling
from rpt_tpu.dtypes import DTYPE, INF
from rpt_tpu.deferred import deferred_traverse
from rpt_tpu.tiled import tiled_traverse
from rpt_tpu.intersect import closest_hit, occluded
from rpt_tpu.ray import Ray
from rpt_tpu.vec import Vec3
from rpt_tpu.renderer import _pixel_grid
import bench


def timed_scalar(fn, *args, reps=3):
    """fn must return a SCALAR jax array."""
    float(fn(*args))
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    # --- D2H with FRESH buffers (same-buffer asarray reads back a cache)
    for nbytes in (1 << 20, 8 << 20):
        n = nbytes // 4
        best = 1e9
        for i in range(4):
            x = jax.device_put(np.full((n,), float(i), np.float32))
            x.block_until_ready()
            t0 = time.perf_counter()
            _ = np.asarray(x)
            best = min(best, time.perf_counter() - t0)
        print(f"D2H fresh {nbytes/1e6:6.2f} MB: {best*1e3:7.1f} ms ({nbytes/best/1e6:.1f} MB/s)")

    scene = bench.build_scene().compile()
    tables = scene.tables
    ct = tables["clusters"]
    camera = rpt.Camera.look_at((-2.5, 4.0, 6.5), (0, 0, 0), (0, 1, 0), math.pi / 6)
    W = H = 512
    n = W * H
    xn_np, yn_np, pixel_ids, _ = _pixel_grid(W, H)
    xn = jnp.asarray(xn_np, DTYPE)
    yn = jnp.asarray(yn_np, DTYPE)
    key = jax.random.key(0)
    pix_keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(
        jnp.asarray(pixel_ids, jnp.int32)
    )
    keys = sampling.fold(pix_keys, 0)
    ray0 = camera.cast_ray(xn, yn, sampling.fold(keys, 3))

    @jax.jit
    def f_l0_tiled(tables, ray):
        t, tri, u, v, w, cert = tiled_traverse(
            tables["clusters"], ray, scene.t_min, INF,
            jnp.full((n,), INF, DTYPE), any_hit=False,
        )
        return jnp.sum(t * 0.0) + jnp.sum(jnp.where(jnp.isfinite(t), t, 0.0)) * 1e-9 + cert.sum()

    @jax.jit
    def f_l0_closest(tables, ray):
        h = closest_hit(scene, tables, ray, coherent=True)
        return jnp.sum(jnp.where(jnp.isfinite(h.time), h.time, 0.0))

    @jax.jit
    def f_l1_deferred(ct, o, d):
        ray = Ray(Vec3(o[:, 0], o[:, 1], o[:, 2]), Vec3(d[:, 0], d[:, 1], d[:, 2]))
        t, tri, u, v, w = deferred_traverse(
            ct, ray, scene.t_min, INF, jnp.full((n,), INF, DTYPE), any_hit=False
        )
        return jnp.sum(jnp.where(jnp.isfinite(t), t, 0.0))

    t = timed_scalar(f_l0_closest, tables, ray0)
    print(f"L0 closest (tiled path, scalar pull): {t*1e3:7.1f} ms")

    from batch_scaling import get_l1
    o, d, ok = get_l1(scene, tables, 0)
    oj, dj = jnp.asarray(o), jnp.asarray(d)
    t = timed_scalar(f_l1_deferred, ct, oj, dj)
    print(f"L1 closest (deferred, scalar pull):   {t*1e3:7.1f} ms")

    # batched shadow occlusion from L0 hits (2 lights -> 524k lanes)
    @jax.jit
    def f_shadow(tables, ray):
        h = closest_hit(scene, tables, ray, coherent=True)
        hitmask = h.valid
        from rpt_tpu.integrators.path import _sanitize, sample_lights
        from rpt_tpu.materials import bsdf
        mat = tables["materials"].lookup(h.material)
        pos = _sanitize(ray.at(h.time), hitmask)
        wo = -ray.dir.normalize()
        nee = sample_lights(scene, tables, mat, pos, h.normal, wo,
                            sampling.fold(keys, 2), mask=hitmask, coherent=True)
        return jnp.sum(nee.x)

    t = timed_scalar(f_shadow, tables, ray0)
    print(f"L0 closest+NEE (tiled+shadow batch):  {t*1e3:7.1f} ms")

    print("done")


if __name__ == "__main__":
    main()
