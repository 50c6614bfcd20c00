"""Where does the bench sample's time actually go? The two-phase rewrite
cut deferred closest-hit 278 -> 164 ms yet bench.py is bit-identical at
7.237 s — so the wall is elsewhere. Time every traversal the integrator
issues for one sample: L0 tiled closest, L1/L2 deferred closest, and the
6 shadow occlusion wavefronts (tiled any-hit + deferred finish), plus
the full trace_surface for reference.
"""

import math
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/experiments")

import jax
import jax.numpy as jnp
import numpy as np

from batch_scaling import get_l1
import rpt_tpu as rpt
from rpt_tpu import sampling
from rpt_tpu.dtypes import DTYPE, INF
from rpt_tpu.integrators.path import trace_surface, sample_lights, _sanitize
from rpt_tpu.intersect import bvh_any_hit, closest_hit, occluded
from rpt_tpu.lights import illuminate
from rpt_tpu.ray import Ray
from rpt_tpu.renderer import _pixel_grid
from rpt_tpu.vec import Vec3, where as vwhere
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
    camera = rpt.Camera.look_at((-2.5, 4.0, 6.5), (0, 0, 0), (0, 1, 0), math.pi / 6)
    W = H = 512
    n = W * H
    dim = float(max(W, H))
    xn_np, yn_np, pixel_ids, _ = _pixel_grid(W, H)
    key = jax.random.key(0)
    pix_keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(
        jnp.asarray(pixel_ids, jnp.int32)
    )
    keys = sampling.fold(pix_keys, 0)
    ray0 = camera.cast_ray(
        jnp.asarray(xn_np, DTYPE), jnp.asarray(yn_np, DTYPE), sampling.fold(keys, 3)
    )

    # L0 camera pass
    @jax.jit
    def f_l0(tables):
        h = closest_hit(scene, tables, ray0, coherent=True)
        return h.time

    t = timed(f_l0, tables)
    print(f"L0 closest (tiled+finish): {t*1e3:7.1f} ms")

    h0 = jax.jit(lambda t_: closest_hit(scene, t_, ray0, coherent=True))(tables)
    hitmask = h0.valid
    pos = _sanitize(ray0.at(h0.time), hitmask)
    wo = -ray0.dir.normalize()

    # L0 NEE shadow rays, per light
    for li, (lstat, ltab) in enumerate(zip(scene.lights, tables["lights"])):
        if lstat.kind == "ambient":
            continue
        lkeys = sampling.fold(sampling.fold(keys, 2), 0x1100 + li)
        intensity, wi, dist = illuminate(lstat, ltab, pos, lkeys)
        limit = jnp.where(hitmask, dist * (1.0 - scene.shadow_eps), -1.0)

        @jax.jit
        def f_occ(tables, pos=pos, wi=wi, limit=limit):
            return occluded(scene, tables, Ray(pos, wi), limit)

        t = timed(f_occ, tables)
        nlive = int(jnp.sum(limit > 0))
        print(f"L0 shadow light{li} occluded(): {t*1e3:7.1f} ms  (live {nlive})")

    # L1 bounce closest
    o, d, ok = get_l1(scene, tables, 0)
    ray1 = Ray(
        Vec3(jnp.asarray(o[:, 0]), jnp.asarray(o[:, 1]), jnp.asarray(o[:, 2])),
        Vec3(jnp.asarray(d[:, 0]), jnp.asarray(d[:, 1]), jnp.asarray(d[:, 2])),
    )

    @jax.jit
    def f_l1(tables):
        h = closest_hit(scene, tables, ray1, coherent=False)
        return h.time

    t = timed(f_l1, tables)
    print(f"L1 closest (deferred):     {t*1e3:7.1f} ms  (live {int(ok.sum())})")

    # L1 NEE shadows
    h1 = jax.jit(lambda t_: closest_hit(scene, t_, ray1, coherent=False))(tables)
    hm1 = h1.valid & jnp.asarray(ok)
    pos1 = _sanitize(ray1.at(h1.time), hm1)
    for li, (lstat, ltab) in enumerate(zip(scene.lights, tables["lights"])):
        if lstat.kind == "ambient":
            continue
        lkeys = sampling.fold(sampling.fold(keys, 2), 0x1100 + li)
        intensity, wi, dist = illuminate(lstat, ltab, pos1, lkeys)
        limit = jnp.where(hm1, dist * (1.0 - scene.shadow_eps), -1.0)

        @jax.jit
        def f_occ1(tables, pos=pos1, wi=wi, limit=limit):
            return occluded(scene, tables, Ray(pos, wi), limit)

        t = timed(f_occ1, tables)
        nlive = int(jnp.sum(limit > 0))
        print(f"L1 shadow light{li} occluded(): {t*1e3:7.1f} ms  (live {nlive})")

    # full sample
    @jax.jit
    def f_full(tables):
        c = trace_surface(scene, tables, ray0, sampling.fold(keys, 4), 2)
        return c.x

    t = timed(f_full, tables)
    print(f"full 3-level sample:       {t*1e3:7.1f} ms")


if __name__ == "__main__":
    main()
