"""Per-wavefront timing breakdown of the dragon bench workload.

Reconstructs the exact wavefronts the bench's trace_surface scan emits
(L0/L1/L2 closest-hit + per-light shadow queries at each level) and times
each one separately on the real TPU, then measures candidate
reformulations for the incoherent ones:

* reversed + direction-sorted shadow tiles: a shadow segment [p, light)
  is occluded iff the reversed segment [light, p) is — and reversed rays
  all start AT the light sample (origin sphere ~ the light's radius), so
  sorting them by direction Morton key yields tiles with tight cones that
  the tile-binned traversal can certify.
"""

import math
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

import rpt_tpu as rpt
from rpt_tpu import sampling
from rpt_tpu.dtypes import DTYPE, INF
from rpt_tpu.integrators.path import _dead_ray_fields, _sanitize
from rpt_tpu.intersect import bvh_any_hit, closest_hit, occluded
from rpt_tpu.lights import illuminate
from rpt_tpu.materials import sample_f
from rpt_tpu.ray import Ray
from rpt_tpu.renderer import _pixel_grid
from rpt_tpu.tiled import tiled_traverse
from rpt_tpu.vec import Vec3
import bench


def sync(out):
    leaves = jax.tree_util.tree_leaves(out)
    return float(np.asarray(leaves[0]).reshape(-1)[0])


def timed(fn, *args, reps=3):
    sync(fn(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        sync(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


# --------------------------------------------------------------- sorting
def _part1by1(x):
    x = x & 0xFFFF
    x = (x | (x << 8)) & 0x00FF00FF
    x = (x | (x << 4)) & 0x0F0F0F0F
    x = (x | (x << 2)) & 0x33333333
    x = (x | (x << 1)) & 0x55555555
    return x


def dir_morton(d: Vec3):
    """Morton key of the octahedral direction mapping (16x16 bit grid)."""
    s = jnp.abs(d.x) + jnp.abs(d.y) + jnp.abs(d.z)
    s = jnp.maximum(s, 1e-20)
    u = d.x / s
    v = d.y / s
    uu = jnp.where(d.z >= 0, u, (1.0 - jnp.abs(v)) * jnp.sign(u))
    vv = jnp.where(d.z >= 0, v, (1.0 - jnp.abs(u)) * jnp.sign(v))
    qa = jnp.clip((uu + 1.0) * 0.5 * 4095.0, 0, 4095).astype(jnp.int32)
    qb = jnp.clip((vv + 1.0) * 0.5 * 4095.0, 0, 4095).astype(jnp.int32)
    return _part1by1(qa) | (_part1by1(qb) << 1)


def main():
    scene = bench.build_scene().compile()
    tables = scene.tables
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
    lights = [
        (li, ls, lt)
        for li, (ls, lt) in enumerate(zip(scene.lights, tables["lights"]))
        if ls.kind != "ambient"
    ]

    @jax.jit
    def f_closest(tables, ray):
        h = closest_hit(scene, tables, ray)
        return h.time, h.normal, h.material

    @jax.jit
    def f_occ(tables, ray, limit):
        return occluded(scene, tables, ray, limit)

    # one level's derived wavefronts (no traversal timing inside)
    @partial(jax.jit, static_argnums=(5,))
    def f_derive(tables, ray, htime, hnormal, hmat, b, alive):
        hitmask = alive & (htime < INF)
        kb = sampling.fold(keys, b)
        mat = tables["materials"].lookup(hmat)
        pos = _sanitize(ray.at(htime), hitmask)
        wo = -ray.dir.normalize()
        shadows = []
        for li, lstat, ltab in lights:
            lkeys = sampling.fold(sampling.fold(kb, 2), 0x1100 + li)
            _int, wi, dist = illuminate(lstat, ltab, pos, lkeys)
            limit = jnp.where(hitmask, dist * (1.0 - scene.shadow_eps), -1.0)
            shadows.append((pos, wi, limit))
        wi_b, pdf, valid = sample_f(mat, hnormal, wo, sampling.fold(kb, 3))
        bounce_ok = hitmask & valid
        dead_pos, dead_dir = _dead_ray_fields(n)
        from rpt_tpu.vec import where as vwhere

        new_ray = Ray(
            vwhere(bounce_ok, pos, dead_pos), vwhere(bounce_ok, wi_b, dead_dir)
        )
        return shadows, new_ray, bounce_ok, hitmask

    # reversed + direction-sorted shadow occlusion (BVH part only; the
    # analytic prims are cheap and stay forward)
    @jax.jit
    def f_occ_rev(tables, pos, wi, limit):
        mask = limit > 0.0
        ro = pos + wi * jnp.maximum(limit, 0.0)
        rd = -wi
        keyv = jnp.where(mask, dir_morton(rd), jnp.int32(0x7FFFFFFF))
        order = jnp.argsort(keyv)
        s_ray = Ray(
            Vec3(ro.x[order], ro.y[order], ro.z[order]),
            Vec3(rd.x[order], rd.y[order], rd.z[order]),
        )
        s_limit = limit[order]
        ct = tables["clusters"]
        t_, tri, u, v, w, cert = tiled_traverse(
            ct, s_ray, scene.t_min, s_limit, jnp.full(n, INF, DTYPE), any_hit=True
        )
        occ_bvh_s = t_ < s_limit
        # report certification; finish uncertified via the deferred tree
        from rpt_tpu.deferred import deferred_traverse

        t2, _, _, _, _ = deferred_traverse(
            ct, s_ray, scene.t_min, s_limit, t_, any_hit=True,
            active=~cert & ~occ_bvh_s,
        )
        occ_bvh_s = occ_bvh_s | (t2 < s_limit)
        occ_bvh = jnp.zeros(n, bool).at[order].set(occ_bvh_s)
        # forward analytic prims
        best = None
        occ_a = jnp.zeros(n, bool)
        from rpt_tpu.intersect import intersect_planes, intersect_spheres
        from rpt_tpu.ray import Hit

        fwd = Ray(pos, wi)
        best = Hit.none((n,))
        if scene.n_spheres:
            best = intersect_spheres(tables["spheres"], fwd, scene.t_min, best)
        if scene.n_planes:
            best = intersect_planes(tables["planes"], fwd, scene.t_min, best)
        occ_a = best.time < limit
        return occ_bvh | occ_a, jnp.sum(cert)

    # ------------------------------------------------------------------
    ray = ray0
    alive = jnp.ones(n, bool)
    for b in range(3):
        t = timed(f_closest, tables, ray)
        htime, hnormal, hmat = f_closest(tables, ray)
        n_alive = int(jnp.sum(alive))
        print(f"L{b} closest: {t*1e3:7.1f} ms  ({n_alive} alive lanes)")
        shadows, new_ray, bounce_ok, hitmask = f_derive(
            tables, ray, htime, hnormal, hmat, b, alive
        )
        for si, (pos, wi, limit) in enumerate(shadows):
            t = timed(f_occ, tables, Ray(pos, wi), limit)
            n_act = int(jnp.sum(limit > 0))
            print(f"L{b} shadow[{si}] fwd: {t*1e3:7.1f} ms  ({n_act} active)")
            t = timed(f_occ_rev, tables, pos, wi, limit)
            occ_r, cert = f_occ_rev(tables, pos, wi, limit)
            occ_f = f_occ(tables, Ray(pos, wi), limit)
            agree = int(jnp.sum((occ_r == occ_f) | (limit <= 0)))
            print(
                f"L{b} shadow[{si}] rev: {t*1e3:7.1f} ms  "
                f"(cert {int(cert)}/{n}, agree {agree}/{n})"
            )
        ray, alive = new_ray, bounce_ok

    print("done")


if __name__ == "__main__":
    main()
