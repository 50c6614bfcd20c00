"""Split one shadow occluded() call into its components on the real
bench wavefronts: analytic prims, coherence sort, tiled any-hit pass,
deferred finish — plus cert/occ rates, to find where the ~110 ms goes.
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
from rpt_tpu.integrators.path import _sanitize
from rpt_tpu.intersect import closest_hit, intersect_planes, Hit
from rpt_tpu.lights import illuminate
from rpt_tpu.ray import Ray
from rpt_tpu.renderer import _pixel_grid
from rpt_tpu.tiled import coherence_key, tiled_traverse
from rpt_tpu.deferred import deferred_traverse
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


def profile_shadow(tag, scene, tables, pos, wi, limit):
    ct = tables["clusters"]
    t_min = scene.t_min
    n = pos.x.shape[0]
    ray = Ray(pos, wi)
    limit = jnp.asarray(limit, DTYPE)

    # 1. analytic prims (bench scene: 1 plane)
    @jax.jit
    def f_prims(tables):
        best = Hit.none((n,))
        best = intersect_planes(tables["planes"], ray, t_min, best)
        return best.time < limit

    t = timed(f_prims, tables)
    print(f"[{tag}] prims(plane):        {t*1e3:7.1f} ms")

    # 2. sort
    @jax.jit
    def f_sort(tables):
        live = limit > t_min
        key = jnp.where(
            live, coherence_key(ray.origin, ray.dir, mask=live),
            jnp.int32(0x7FFFFFFF),
        )
        order = jnp.argsort(key)
        return order

    t = timed(f_sort, tables)
    print(f"[{tag}] key+argsort:         {t*1e3:7.1f} ms")
    order = jax.jit(f_sort)(tables)

    def take3(v, idx):
        return Vec3(v.x[idx], v.y[idx], v.z[idx])

    s_ray = Ray(take3(ray.origin, order), take3(ray.dir, order))
    s_limit = limit[order]

    # 3. tiled any-hit on sorted rays
    @jax.jit
    def f_tiled(tables):
        time_s, _, _, _, _, cert_s = tiled_traverse(
            tables["clusters"], s_ray, t_min, s_limit,
            jnp.full(n, INF, DTYPE), any_hit=True,
        )
        return time_s, cert_s

    t = timed(f_tiled, tables)
    time_s, cert_s = jax.jit(f_tiled)(tables)
    occ = jnp.zeros(n, bool).at[order].set(time_s < s_limit)
    cert = jnp.zeros(n, bool).at[order].set(cert_s)
    live = limit > t_min
    n_live = int(live.sum())
    n_unresolved = int((~cert & ~occ & live).sum())
    print(
        f"[{tag}] tiled any-hit:       {t*1e3:7.1f} ms   "
        f"live {n_live}  cert {int((cert&live).sum())}  occ {int((occ&live).sum())}  "
        f"unresolved {n_unresolved}"
    )

    # 4. deferred finish
    @jax.jit
    def f_def(tables):
        t2, _, _, _, _ = deferred_traverse(
            tables["clusters"], ray, t_min, limit, jnp.full(n, INF, DTYPE),
            any_hit=True, active=~cert & ~occ,
        )
        return t2

    t = timed(f_def, tables)
    print(f"[{tag}] deferred finish:     {t*1e3:7.1f} ms")


def main():
    scene = bench.build_scene().compile()
    tables = scene.tables
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
    h0 = jax.jit(lambda t_: closest_hit(scene, t_, ray0, coherent=True))(tables)
    pos = _sanitize(ray0.at(h0.time), h0.valid)

    for li, (lstat, ltab) in enumerate(zip(scene.lights, tables["lights"])):
        if lstat.kind == "ambient":
            continue
        lkeys = sampling.fold(sampling.fold(keys, 2), 0x1100 + li)
        intensity, wi, dist = illuminate(lstat, ltab, pos, lkeys)
        limit = jnp.where(h0.valid, dist * (1.0 - scene.shadow_eps), -1.0)
        profile_shadow(f"L0/light{li}", scene, tables, pos, wi, limit)

    # L1 (bounce) shadow
    o, d, ok = get_l1(scene, tables, 0)
    ray1 = Ray(
        Vec3(jnp.asarray(o[:, 0]), jnp.asarray(o[:, 1]), jnp.asarray(o[:, 2])),
        Vec3(jnp.asarray(d[:, 0]), jnp.asarray(d[:, 1]), jnp.asarray(d[:, 2])),
    )
    h1 = jax.jit(lambda t_: closest_hit(scene, t_, ray1, coherent=False))(tables)
    hm1 = h1.valid & jnp.asarray(ok)
    pos1 = _sanitize(ray1.at(h1.time), hm1)
    for li, (lstat, ltab) in enumerate(zip(scene.lights, tables["lights"])):
        if lstat.kind == "ambient":
            continue
        lkeys = sampling.fold(sampling.fold(keys, 2), 0x1100 + li)
        intensity, wi, dist = illuminate(lstat, ltab, pos1, lkeys)
        limit = jnp.where(hm1, dist * (1.0 - scene.shadow_eps), -1.0)
        profile_shadow(f"L1/light{li}", scene, tables, pos1, wi, limit)


if __name__ == "__main__":
    main()
