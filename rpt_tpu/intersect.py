"""Vectorized ray-primitive intersection and scene closest-hit.

Ports the per-shape `intersect` methods of `/root/reference/src/shape/*.rs`
to wavefront kernels: every function takes a batch of N rays and tests them
against one primitive (analytic prims, looped/merged per prim — scenes have
few) or the whole triangle BVH (stackless rope traversal, all rays in
lock-step inside one ``lax.while_loop``).

Scene-level closest hit mirrors the reference's *deliberate* linear scan
over objects (`renderer.rs:411-425` — planes have infinite extent and don't
fit an acceleration structure); here the "scan" is a masked min over
per-type batches, plus the BVH for all mesh triangles.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from .dtypes import DTYPE, INF
from .ray import Hit, Ray, closer
from .vec import Affine, Mat3, Vec3, take, where


# ---------------------------------------------------------------------------
# Compiled geometry tables (built by rpt_tpu.scene)


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class PrimSet:
    """A batch of one analytic primitive type, each with its own transform.

    Mirrors ``Transformed<T>`` (shape.rs:102-126): rays are inverse-
    transformed into object space; normals map by M^-T.
    """

    world_to_obj: Affine  # (P,)
    normal_mat: Mat3  # (P,) = inverse-transpose of the linear part
    obj_to_world: Affine  # (P,)
    det: jax.Array  # (P,) determinant of the linear part
    material: jax.Array  # (P,) int32
    param: jax.Array  # (P,) extra parameter (monomial height)

    @property
    def n(self) -> int:
        return int(self.material.shape[0])


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class PlaneSet:
    normal: Vec3  # (P,)
    value: jax.Array  # (P,)
    material: jax.Array  # (P,) int32

    @property
    def n(self) -> int:
        return int(self.material.shape[0])


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class TriangleSoA:
    """World-space-baked triangles in BVH (Morton) order."""

    v1: Vec3
    v2: Vec3
    v3: Vec3
    n1: Vec3
    n2: Vec3
    n3: Vec3
    material: jax.Array  # (T,) int32

    @property
    def n(self) -> int:
        return int(self.material.shape[0])


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class BVHTables:
    bb_min: Vec3  # (K,)
    bb_max: Vec3  # (K,)
    left: jax.Array  # (K,) i32
    first: jax.Array  # (K,) i32
    count: jax.Array  # (K,) i32
    rope: jax.Array  # (K,) i32


# ---------------------------------------------------------------------------
# Per-type intersectors. Convention: return a Hit (time=inf on miss); the
# caller merges with `closer`.


def _local_hit_to_world(prims: PrimSet, i: int, local_n: Vec3, t, ok) -> Hit:
    nmat = prims.normal_mat[i]
    world_n = nmat.apply(local_n).normalize()
    time = jnp.where(ok, t, INF)
    return Hit(time, world_n, jnp.full(jnp.shape(t), prims.material[i], jnp.int32))


def intersect_spheres(prims: PrimSet, ray: Ray, t_min, best: Hit) -> Hit:
    """Unit sphere quadratic (shape/sphere.rs:14-46), per transformed prim."""
    for i in range(prims.n):
        local = ray.transform(prims.world_to_obj[i])
        a = local.dir.length_squared()
        b = local.dir.dot(local.origin)
        c = local.origin.length_squared() - 1.0
        disc = b * b - a * c
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        t_minus = (-b - sq) / a
        t_plus = (-b + sq) / a
        t = jnp.where(t_minus < t_min, t_plus, t_minus)
        ok = (disc >= 0.0) & (t >= t_min)
        local_n = local.at(t)  # = normal of the unit sphere
        best = closer(best, _local_hit_to_world(prims, i, local_n.normalize(), t, ok))
    return best


def intersect_cubes(prims: PrimSet, ray: Ray, t_min, best: Hit) -> Hit:
    """Unit-cube slab test with per-axis entry/exit normals
    (shape/cube.rs:22-74)."""
    for i in range(prims.n):
        local = ray.transform(prims.world_to_obj[i])

        def interval(o, d):
            x1 = (-0.5 - o) / d
            x2 = (0.5 - o) / d
            return jnp.minimum(x1, x2), jnp.maximum(x1, x2), jnp.where(x1 > x2, 1.0, -1.0)

        x1, x2, sx = interval(local.origin.x, local.dir.x)
        y1, y2, sy = interval(local.origin.y, local.dir.y)
        z1, z2, sz = interval(local.origin.z, local.dir.z)
        # entry: the largest near-plane; reference tie-breaking
        # (cube.rs:40-48): x wins if strictly greater than both, else y
        # if strictly greater than z, else z.
        x_first = (x1 > y1) & (x1 > z1)
        y_first = (~x_first) & (y1 > z1)
        z_first = ~(x_first | y_first)
        start = jnp.where(x_first, x1, jnp.where(y_first, y1, z1))
        zero = jnp.zeros_like(x1)
        start_n = Vec3(
            jnp.where(x_first, sx, zero),
            jnp.where(y_first, sy, zero),
            jnp.where(z_first, sz, zero),
        )
        x_last = (x2 < y2) & (x2 < z2)
        y_last = (~x_last) & (y2 < z2)
        z_last = ~(x_last | y_last)
        end = jnp.where(x_last, x2, jnp.where(y_last, y2, z2))
        end_n = Vec3(
            jnp.where(x_last, -sx, zero),
            jnp.where(y_last, -sy, zero),
            jnp.where(z_last, -sz, zero),
        )
        ok = (start <= end) & (end >= t_min)
        inside = start < t_min
        t = jnp.where(inside, end, start)
        local_n = where(inside, end_n, start_n)
        best = closer(best, _local_hit_to_world(prims, i, local_n, t, ok))
    return best


def intersect_planes(planes: PlaneSet, ray: Ray, t_min, best: Hit) -> Hit:
    """x . normal = value (shape/plane.rs:17-32); normal flipped against the
    ray."""
    for i in range(planes.n):
        n = planes.normal[i].broadcast_to(ray.origin.shape)
        cosine = n.dot(ray.dir)
        t = (planes.value[i] - n.dot(ray.origin)) / cosine
        ok = (jnp.abs(cosine) >= 1e-8) & (t >= t_min)
        normal = -n.normalize() * jnp.sign(cosine)
        best = closer(
            best,
            Hit(
                jnp.where(ok, t, INF),
                normal,
                jnp.full(jnp.shape(t), planes.material[i], jnp.int32),
            ),
        )
    return best


def intersect_monomials(prims: PrimSet, ray: Ray, t_min, best: Hit) -> Hit:
    """Newton + 60-step bisection for y = h (x^2+z^2)^2
    (shape/monomial_surface.rs:22-107) — already fixed-iteration, so it maps
    to TPU directly; vectorized with masks."""
    for i in range(prims.n):
        local = ray.transform(prims.world_to_obj[i])
        h = prims.param[i]
        o, d = local.origin, local.dir

        def dist(t):
            x = o.x + t * d.x
            y = o.y + t * d.y
            z = o.z + t * d.z
            return y - h * (x * x + z * z) ** 2

        coef0 = o.x * o.x + o.z * o.z
        coef1 = 2.0 * (o.x * d.x + o.z * d.z)
        coef2 = d.x * d.x + d.z * d.z

        def deriv(t):
            dy = (
                2.0 * coef0 * coef1
                + 2.0 * t * (coef1 * coef1 + 2.0 * coef0 * coef2)
                + 3.0 * t * t * 2.0 * coef1 * coef2
                + 4.0 * t * t * t * coef2 * coef2
            )
            return d.y - h * dy

        def deriv2(t):
            dy = (
                2.0 * (coef1 * coef1 + 2.0 * coef0 * coef2)
                + 6.0 * t * 2.0 * coef1 * coef2
                + 12.0 * t * t * coef2 * coef2
            )
            return -h * dy

        # local bbox [-1,0,-1] .. [1,h,1] slab test
        b_min, b_max = _aabb_interval(
            local, Vec3.of(-1.0, 0.0, -1.0), Vec3(jnp.ones_like(h), h, jnp.ones_like(h))
        )
        feasible = jnp.maximum(b_min, t_min) <= jnp.minimum(b_max, best.time)

        maximize = dist(t_min) < 0.0
        # Newton ascent toward the maximum of dist(t) (10 iterations)
        cur = (b_min + b_max) / 2.0
        stop = jnp.zeros_like(maximize)
        for _ in range(10):
            f = dist(cur)
            stop = stop | (f > 0.0)
            step = deriv(cur) / deriv2(cur)
            cur = jnp.where(stop | ~maximize, cur, cur - step)
        t_max = jnp.where(maximize, cur, 10000.0)
        feasible &= ~(maximize & (t_max < t_min))
        feasible &= (dist(t_min) < 0.0) != (dist(t_max) < 0.0)

        l = jnp.full_like(t_max, t_min)
        r = t_max
        for _ in range(60):
            m = (l + r) / 2.0
            go_right = (dist(m) >= 0.0) == maximize
            r = jnp.where(go_right, m, r)
            l = jnp.where(go_right, l, m)

        pos = local.at(r)
        rad2 = pos.x * pos.x + pos.z * pos.z
        ok = feasible & (rad2 <= 1.0)
        local_n = Vec3(h * 4.0 * pos.x * rad2, -jnp.ones_like(rad2), h * 4.0 * pos.z * rad2)
        local_n = local_n.normalize()
        flip = local_n.dot(local.dir) > 0.0
        local_n = where(flip, -local_n, local_n)
        best = closer(best, _local_hit_to_world(prims, i, local_n, r, ok))
    return best


def _slab_interval(o: Vec3, inv: Vec3, p_min: Vec3, p_max: Vec3):
    """NaN-safe slab intersection interval (kdtree.rs:57-71).

    When a ray direction component is 0 and the origin lies exactly on a
    slab plane, 0*inf produces NaN; treat that axis as non-constraining
    (the reference's f64 arithmetic yields +-inf there and axis-aligned
    Cornell geometry makes this case common)."""
    t1 = (p_min - o) * inv
    t2 = (p_max - o) * inv
    lo = t1.minimum(t2).map(lambda c: jnp.where(jnp.isnan(c), -INF, c))
    hi = t1.maximum(t2).map(lambda c: jnp.where(jnp.isnan(c), INF, c))
    return lo.max_component(), hi.min_component()


def _aabb_interval(ray: Ray, p_min: Vec3, p_max: Vec3):
    inv = Vec3.ones(ray.dir.shape) / ray.dir
    return _slab_interval(ray.origin, inv, p_min, p_max)


# ---------------------------------------------------------------------------
# Triangle BVH traversal


def _intersect_tri_slot(tris: TriangleSoA, idx, ray: Ray, t_min, best_t):
    """Moller-style triangle test matching mesh.rs:50-83 (plane hit +
    barycentric). Returns (t, normal, mat, ok)."""
    v1 = take(tris.v1, idx)
    v2 = take(tris.v2, idx)
    v3 = take(tris.v3, idx)
    d0 = v2 - v1
    d1 = v3 - v1
    pn = d0.cross(d1).normalize()
    cosine = pn.dot(ray.dir)
    t = pn.dot(v1 - ray.origin) / cosine
    ok = (jnp.abs(cosine) >= 1e-8) & (t >= t_min) & (t < best_t)
    d2 = ray.at(t) - v1
    d00 = d0.dot(d0)
    d01 = d0.dot(d1)
    d11 = d1.dot(d1)
    d20 = d2.dot(d0)
    d21 = d2.dot(d1)
    denom = d00 * d11 - d01 * d01
    v = (d11 * d20 - d01 * d21) / denom
    w = (d00 * d21 - d01 * d20) / denom
    u = 1.0 - v - w
    ok &= (u >= 0.0) & (v >= 0.0) & (w >= 0.0)
    normal = (take(tris.n1, idx) * u + take(tris.n2, idx) * v + take(tris.n3, idx) * w).normalize()
    mat = jnp.take(tris.material, idx)
    return t, normal, mat, ok


def bvh_closest_hit(
    bvh: BVHTables, tris: TriangleSoA, ray: Ray, t_min, best: Hit, leaf_size: int = 4
) -> Hit:
    """Stackless rope traversal: every ray carries a single node cursor.

    AABB hit on an internal node -> descend to the left child; miss, or a
    finished leaf -> follow the rope (miss link). Replaces the recursive
    front-to-back kd descent of kdtree.rs:154-226 with a fixed-state loop
    that the whole wavefront executes in lock-step.
    """
    n = ray.origin.shape[0] if ray.origin.shape else ()
    inv_dir = Vec3.ones(ray.dir.shape) / ray.dir

    def cond(state):
        cur, _ = state
        return jnp.any(cur >= 0)

    def body(state):
        cur, best = state
        active = cur >= 0
        node = jnp.maximum(cur, 0)
        bmin = take(bvh.bb_min, node)
        bmax = take(bvh.bb_max, node)
        enter, exit_ = _slab_interval(ray.origin, inv_dir, bmin, bmax)
        box_hit = (enter <= exit_) & (exit_ >= t_min) & (enter <= best.time)

        count = jnp.take(bvh.count, node)
        first = jnp.take(bvh.first, node)
        is_leaf = count > 0
        do_leaf = active & box_hit & is_leaf

        time, normal, mat = best.time, best.normal, best.material
        for slot in range(leaf_size):
            idx = jnp.minimum(first + slot, tris.n - 1)
            t, nrm, m, ok = _intersect_tri_slot(tris, idx, ray, t_min, time)
            upd = do_leaf & (slot < count) & ok
            time = jnp.where(upd, t, time)
            normal = where(upd, nrm, normal)
            mat = jnp.where(upd, m, mat)
        new_best = Hit(time, normal, mat)

        descend = active & box_hit & ~is_leaf
        nxt = jnp.where(descend, jnp.take(bvh.left, node), jnp.take(bvh.rope, node))
        nxt = jnp.where(active, nxt, cur)
        return nxt, new_best

    if tris.n == 0:
        return best
    cur0 = jnp.zeros(n, jnp.int32)
    _, best = jax.lax.while_loop(cond, body, (cur0, best))
    return best


# ---------------------------------------------------------------------------
# Scene-level closest hit


def closest_hit(scene, tables, ray: Ray, t_min=None) -> Hit:
    """Masked-min over all primitive batches + the triangle BVH — the
    wavefront analog of `Renderer::get_closest_hit` (renderer.rs:416-425).

    ``scene`` is the static CompiledScene (structure), ``tables`` its device
    arrays (pytree).
    """
    if t_min is None:
        t_min = scene.t_min
    best = Hit.none(ray.origin.shape)
    if scene.n_spheres:
        best = intersect_spheres(tables["spheres"], ray, t_min, best)
    if scene.n_cubes:
        best = intersect_cubes(tables["cubes"], ray, t_min, best)
    if scene.n_planes:
        best = intersect_planes(tables["planes"], ray, t_min, best)
    if scene.n_monomials:
        best = intersect_monomials(tables["monomials"], ray, t_min, best)
    if scene.n_tris:
        best = bvh_closest_hit(tables["bvh"], tables["tris"], ray, t_min, best)
    return best
