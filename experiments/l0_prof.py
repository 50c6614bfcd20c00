"""Decompose the L0 (camera) closest-hit and shadow walls: tiled pass
alone, deferred finisher alone, analytic prims, _finish_hit, and the
argsort/coherence machinery — to find where the 110 ms goes when the
isolated tile traversal was measured at ~14 ms (round 2, CT=64).

    python experiments/l0_prof.py
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
from rpt_tpu.intersect import Hit, closest_hit, occluded, intersect_planes
from rpt_tpu.integrators.path import _sanitize
from rpt_tpu.lights import illuminate
from rpt_tpu.ray import Ray
from rpt_tpu.renderer import _pixel_grid
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
    clusters = tables["clusters"]
    bvh = tables["bvh"]
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

    from rpt_tpu.tiled import tiled_traverse, coherence_key
    from rpt_tpu.deferred import deferred_traverse

    # 1. tiled pass alone (closest)
    @jax.jit
    def f_tiled(tables):
        t, tri, u, v, w, cert = tiled_traverse(
            tables["clusters"], ray0, scene.t_min, INF,
            jnp.full(n, INF, DTYPE), any_hit=False,
        )
        return t, cert

    t = timed(f_tiled, tables)
    _, cert = f_tiled(tables)
    print(f"L0 tiled pass alone:       {t*1e3:7.1f} ms  (certified {float(jnp.mean(cert)):.4f})")

    tt, _ = jax.jit(lambda tb: f_tiled(tb))(tables)

    # 2. deferred finisher on the uncertified rest
    @jax.jit
    def f_fin(tables, tt=tt, cert=cert):
        return deferred_traverse(
            tables["clusters"], ray0, scene.t_min, INF, tt,
            any_hit=False, active=~cert,
        )[0]

    t = timed(f_fin, tables)
    print(f"L0 deferred finisher:      {t*1e3:7.1f} ms  (active {int(jnp.sum(~cert))})")

    # 3. analytic prims (plane)
    @jax.jit
    def f_prims(tables):
        return intersect_planes(tables["planes"], ray0, scene.t_min,
                                Hit.none(ray0.origin.shape)).time

    t = timed(f_prims, tables)
    print(f"L0 analytic prims:         {t*1e3:7.1f} ms")

    # 4. full closest_hit (prims + tiled + finisher + finish_hit)
    @jax.jit
    def f_l0(tables):
        return closest_hit(scene, tables, ray0, coherent=True).time

    t = timed(f_l0, tables)
    print(f"L0 closest_hit full:       {t*1e3:7.1f} ms")

    # ---- shadow side -----------------------------------------------------
    h0 = jax.jit(lambda t_: closest_hit(scene, t_, ray0, coherent=True))(tables)
    hitmask = h0.valid
    pos = _sanitize(ray0.at(h0.time), hitmask)
    lstat, ltab = next(
        (ls, lt) for ls, lt in zip(scene.lights, tables["lights"])
        if ls.kind != "ambient"
    )
    lkeys = sampling.fold(sampling.fold(keys, 2), 0x1101)
    intensity, wi, dist = illuminate(lstat, ltab, pos, lkeys)
    limit = jnp.where(hitmask, dist * (1.0 - scene.shadow_eps), -1.0)
    sray = Ray(pos, wi)

    # 5. shadow coherence sort alone
    @jax.jit
    def f_sort(limit):
        live = limit > scene.t_min
        key = jnp.where(
            live, coherence_key(sray.origin, sray.dir, mask=live),
            jnp.int32(0x7FFFFFFF),
        )
        order = jnp.argsort(key)
        return order

    t = timed(f_sort, limit)
    print(f"L0 shadow coherence sort:  {t*1e3:7.1f} ms")

    # 6. tiled any-hit on the sorted shadow wavefront
    order = f_sort(limit)
    from rpt_tpu.intersect import take
    s_ray = Ray(take(sray.origin, order), take(sray.dir, order))
    live = limit > scene.t_min
    s_limit = jnp.where(live, limit, -1.0)[order]

    @jax.jit
    def f_tanyhit(tables, s_limit=s_limit):
        time_s, _, _, _, _, cert_s = tiled_traverse(
            tables["clusters"], s_ray, scene.t_min, s_limit,
            jnp.full(n, INF, DTYPE), any_hit=True,
        )
        return time_s, cert_s

    t = timed(f_tanyhit, tables)
    time_s, cert_s = f_tanyhit(tables)
    occ_frac = float(jnp.mean((time_s < s_limit) & (s_limit > 0)))
    print(f"L0 shadow tiled any-hit:   {t*1e3:7.1f} ms  (certified {float(jnp.mean(cert_s)):.4f}, occluded {occ_frac:.4f})")

    # 7. deferred any-hit finisher on the rest
    occ0 = jnp.zeros(n, bool).at[order].set(time_s < s_limit)
    cert = jnp.zeros(n, bool).at[order].set(cert_s)
    active = live & ~cert & ~occ0

    @jax.jit
    def f_fin2(tables, active=active, limit=limit):
        la = jnp.broadcast_to(limit, (n,)).astype(DTYPE)
        return deferred_traverse(
            tables["clusters"], sray, scene.t_min, la,
            jnp.full(n, INF, DTYPE), any_hit=True, active=active,
        )[0]

    t = timed(f_fin2, tables)
    print(f"L0 shadow deferred finish: {t*1e3:7.1f} ms  (active {int(jnp.sum(active))})")

    # 8. full occluded()
    @jax.jit
    def f_occ(tables):
        return occluded(scene, tables, sray, limit)

    t = timed(f_occ, tables)
    print(f"L0 occluded() full:        {t*1e3:7.1f} ms")


if __name__ == "__main__":
    main()
