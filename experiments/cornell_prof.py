"""Profile the cornell wavefront (VERDICT r2 Weak #3: 8 Mrays/s on a
dense-path scene the cost model says should run far faster).

Times each piece of one 262k-lane sample in isolation with K in-kernel
iterations per dispatch (axon methodology, PERF.md):
  camera gen | closest_hit | occlusion (NEE shadow) | sample_f+bsdf |
  full trace_surface level | full 3-level sample.

Usage: python experiments/cornell_prof.py
"""

import math
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "examples")

import jax
import jax.numpy as jnp
import numpy as np

import rpt_tpu as rpt
from rpt_tpu import sampling
from rpt_tpu.dtypes import DTYPE
from rpt_tpu.integrators.path import sample_lights, trace_surface
from rpt_tpu.intersect import closest_hit, occluded
from rpt_tpu.materials import bsdf, sample_f
from rpt_tpu.ray import Ray
from rpt_tpu.renderer import _pixel_grid

from cornell import build_scene, camera

K = 8  # in-kernel repeats per dispatch


def timed(fn, *args, reps=3):
    out = jax.block_until_ready(fn(*args))
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(np.asarray(leaf).reshape(-1)[0])  # true host sync
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(np.asarray(leaf).reshape(-1)[0])
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    scene = build_scene().compile()
    cam = camera()
    W = H = 512
    n = W * H
    dim = float(max(W, H))
    xn_np, yn_np, pixel_ids, _ = _pixel_grid(W, H)
    xn = jnp.asarray(xn_np, DTYPE)
    yn = jnp.asarray(yn_np, DTYPE)
    key = jax.random.key(0)

    def gen(tables, key):
        pix_keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(
            jnp.asarray(pixel_ids, jnp.int32)
        )
        keys = sampling.fold(pix_keys, 0)
        jx = sampling.uniform(sampling.fold(keys, 1), -1.0 / dim, 1.0 / dim)
        jy = sampling.uniform(sampling.fold(keys, 2), -1.0 / dim, 1.0 / dim)
        ray = cam.cast_ray(xn + jx, yn + jy, sampling.fold(keys, 3))
        return ray, sampling.fold(keys, 4)

    @jax.jit
    def f_gen(tables, key):
        ray, keys = gen(tables, key)
        return ray.origin.x + ray.dir.y

    @jax.jit
    def f_closest(tables, key):
        ray, keys = gen(tables, key)
        acc = jnp.zeros(n, DTYPE)
        def body(acc, i):
            h = closest_hit(scene, tables, Ray(ray.origin, ray.dir), coherent=True)
            return acc + h.time * (i + 1), None
        acc, _ = jax.lax.scan(body, acc, jnp.arange(K))
        return acc

    @jax.jit
    def f_closest_inc(tables, key):
        ray, keys = gen(tables, key)
        acc = jnp.zeros(n, DTYPE)
        def body(acc, i):
            h = closest_hit(scene, tables, Ray(ray.origin, ray.dir), coherent=False)
            return acc + h.time * (i + 1), None
        acc, _ = jax.lax.scan(body, acc, jnp.arange(K))
        return acc

    @jax.jit
    def f_occl(tables, key):
        ray, keys = gen(tables, key)
        h = closest_hit(scene, tables, ray, coherent=True)
        pos = ray.at(h.time)
        from rpt_tpu.vec import Vec3, where as vwhere
        up = Vec3(jnp.zeros(n, DTYPE), jnp.ones(n, DTYPE), jnp.zeros(n, DTYPE))
        acc = jnp.zeros(n, DTYPE)
        def body(acc, i):
            occ = occluded(scene, tables, Ray(pos, up), jnp.full(n, 500.0, DTYPE))
            return acc + occ * (i + 1), None
        acc, _ = jax.lax.scan(body, acc, jnp.arange(K))
        return acc

    @jax.jit
    def f_nee(tables, key):
        ray, keys = gen(tables, key)
        h = closest_hit(scene, tables, ray, coherent=True)
        mat = tables["materials"].lookup(h.material)
        pos = ray.at(h.time)
        wo = -ray.dir.normalize()
        acc = jnp.zeros(n, DTYPE)
        def body(acc, i):
            c = sample_lights(scene, tables, mat, pos, h.normal, wo,
                              sampling.fold(keys, i), mask=h.valid)
            return acc + c.x, None
        acc, _ = jax.lax.scan(body, acc, jnp.arange(K))
        return acc

    @jax.jit
    def f_full(tables, key):
        ray, keys = gen(tables, key)
        c = trace_surface(scene, tables, ray, keys, 2)
        return c.x

    print(f"cornell 512^2 = {n} lanes; n_tris={scene.n_tris} "
          f"spheres={scene.n_spheres} cubes={scene.n_cubes}")
    t = timed(f_gen, scene.tables, key)
    print(f"camera gen: {t*1e3:.2f} ms")
    t = timed(f_closest, scene.tables, key)
    print(f"closest_hit coherent: {t/K*1e3:.2f} ms/wavefront (K={K})")
    t = timed(f_closest_inc, scene.tables, key)
    print(f"closest_hit incoherent-flag: {t/K*1e3:.2f} ms/wavefront")
    t = timed(f_occl, scene.tables, key)
    print(f"occluded (up shadow): {t/K*1e3:.2f} ms/wavefront")
    t = timed(f_nee, scene.tables, key)
    print(f"sample_lights (NEE incl. shadow): {t/K*1e3:.2f} ms/wavefront")
    t = timed(f_full, scene.tables, key)
    print(f"full 3-level sample: {t*1e3:.2f} ms "
          f"(~{3*n*2/t/1e6:.1f} Mrays/s at 2 segs/level-pair accounting)")


if __name__ == "__main__":
    main()
