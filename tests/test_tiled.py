"""Tile-binned fat-cluster traversal (rpt_tpu.tiled) vs the exact
short-stack traversal: same hits, same occlusion, on a mesh big enough to
trigger the cluster tables (> CLUSTERS_MIN_TRIS)."""

import functools

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import rpt_tpu as rpt
from rpt_tpu.intersect import Hit, _traverse, bvh_any_hit, bvh_closest_hit
from rpt_tpu.deferred import deferred_traverse
from rpt_tpu.ray import Ray
from rpt_tpu.vec import Vec3
from rpt_tpu.meshes import displaced_blob


# All traversal invocations below go through jit WITH THE TABLES AS
# ARGUMENTS - exactly how production calls them (inside the megabatch
# launch the tables are tracers). Calling them eagerly embedded the 20k-tri
# tables as HLO constants, producing giant one-off modules that XLA:CPU's
# LLVM sporadically segfaulted on deep into full-suite runs (round 4), and
# that the persistent cache could never reuse across processes.

@functools.partial(jax.jit, static_argnames=("any_hit",))
def _jit_traverse(bvh, ray, limit, best, any_hit):
    return _traverse(bvh, ray, 1e-4, limit, best, any_hit=any_hit)


@functools.partial(jax.jit, static_argnames=("any_hit",))
def _jit_deferred(ct, ray, limit, best, any_hit, active=None):
    return deferred_traverse(ct, ray, 1e-4, limit, best, any_hit, active=active)


@jax.jit
def _jit_bvh_closest(bvh, ray, best, clusters=None):
    return bvh_closest_hit(bvh, ray, 1e-4, best, clusters=clusters)


@functools.partial(jax.jit, static_argnames=())
def _jit_bvh_any(bvh, ray, limit, clusters=None):
    return bvh_any_hit(bvh, ray, 1e-4, limit, clusters=clusters)


@pytest.fixture(scope="module")
def big_scene():
    mesh = displaced_blob(101, 102, amplitude=0.35, seed=7)  # ~20k tris
    scene = rpt.Scene()
    scene.add(rpt.Object(mesh))
    cs = scene.compile()
    assert "clusters" in cs.tables, "mesh should be big enough for clusters"
    return cs


def camera_rays(n_side=97):  # 9409 rays: NOT a multiple of TILE=256 (pad path)
    # a grid of rays from a ring of origins: three quarters roughly toward
    # the blob, one quarter aimed at the sky (miss lanes MUST be covered —
    # an early version of this test had none and shipped a blind spot)
    ys, xs = np.mgrid[0:n_side, 0:n_side]
    u = (xs.ravel() + 0.5) / n_side * 2.0 - 1.0
    v = (ys.ravel() + 0.5) / n_side * 2.0 - 1.0
    origin = np.stack([3.0 * np.ones_like(u), 0.4 * v, 3.0 * u], 1)
    target = np.stack([0.35 * u, 0.35 * v, np.zeros_like(u)], 1)
    target[::4] += np.array([0.0, 60.0, 0.0])
    d = target - origin
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    n = len(d)
    return Ray(
        Vec3(*(jnp.asarray(origin[:, i]) for i in range(3))),
        Vec3(*(jnp.asarray(d[:, i]) for i in range(3))),
    ), n


def test_closest_hit_matches_reference_traversal(big_scene):
    bvh = big_scene.tables["bvh"]
    clusters = big_scene.tables["clusters"]
    ray, n = camera_rays()
    assert n >= 4096  # wide enough for the tile path

    best = Hit.none((n,))
    h_old = _jit_bvh_closest(bvh, ray, best)
    h_new = _jit_bvh_closest(bvh, ray, best, clusters=clusters)

    t_old = np.asarray(h_old.time)
    t_new = np.asarray(h_new.time)
    hit_old = np.isfinite(t_old)
    hit_new = np.isfinite(t_new)
    assert hit_old.sum() > n // 4, "scene setup should produce plenty of hits"
    # exact edge hits (barycentric ~1e-15 in f64) legitimately flip either
    # way between f32 kernels with different fusion; tolerate a sliver
    # (verified against f64 brute force in round 2 — see PERF.md)
    mask_agree = hit_old == hit_new
    assert mask_agree.mean() > 0.9997, f"hit masks differ on {(~mask_agree).sum()} lanes"
    both = hit_old & hit_new
    close = np.abs(t_old[both] - t_new[both]) <= 1e-5 + 1e-5 * t_old[both]
    assert close.mean() > 0.9997, f"{(~close).sum()} hit times differ"
    # shading must agree too (same winning triangle => same normal)
    n_old = np.stack([np.asarray(c)[both] for c in
                      (h_old.normal.x, h_old.normal.y, h_old.normal.z)], 1)
    n_new = np.stack([np.asarray(c)[both] for c in
                      (h_new.normal.x, h_new.normal.y, h_new.normal.z)], 1)
    agree = (np.abs(n_old - n_new) < 1e-4).all(1)
    assert agree.mean() > 0.999, f"normals disagree on {100*(1-agree.mean()):.2f}% of hits"


def test_any_hit_matches_reference_traversal(big_scene):
    bvh = big_scene.tables["bvh"]
    clusters = big_scene.tables["clusters"]
    ray, n = camera_rays()
    limit = jnp.full((n,), 3.2, jnp.float32)

    occ_old = np.asarray(_jit_bvh_any(bvh, ray, limit))
    occ_new = np.asarray(_jit_bvh_any(bvh, ray, limit, clusters=clusters))
    assert occ_old.sum() > 0 and (~occ_old).sum() > 0
    np.testing.assert_array_equal(occ_old, occ_new)


def test_cluster_cut_covers_every_triangle():
    from rpt_tpu.accel.bvh import build_bvh
    from rpt_tpu.accel.clusters import cut_clusters

    rng = np.random.default_rng(3)
    v = rng.normal(size=(5000, 3, 3)).astype(np.float64)
    bvh = build_bvh(v.min(1), v.max(1))
    clusters = cut_clusters(bvh)
    allslots = np.concatenate(clusters)
    assert len(allslots) == 5000
    assert len(np.unique(allslots)) == 5000
    assert max(len(c) for c in clusters) <= 64


def test_deferred_matches_reference_traversal(big_scene):
    bvh = big_scene.tables["bvh"]
    clusters = big_scene.tables["clusters"]
    ray, n = camera_rays()

    inf = jnp.full((n,), np.inf, jnp.float32)
    t_old, tri_old, *_ = _jit_traverse(bvh, ray, inf, inf, any_hit=False)
    t_new, tri, u, v, w = _jit_deferred(clusters, ray, inf, inf, any_hit=False)
    t_old = np.asarray(t_old)
    t_new = np.asarray(t_new)
    # deferred_traverse is exact by design: hit masks must agree on EVERY
    # lane; only hit TIMES get an FP-reassociation tolerance (the fat-row
    # tri test sums in a different order than the leaf-row test)
    mask_agree = np.isfinite(t_old) == np.isfinite(t_new)
    assert mask_agree.all(), f"hit masks differ on {(~mask_agree).sum()} lanes"
    both = np.isfinite(t_old) & np.isfinite(t_new)
    np.testing.assert_allclose(t_new[both], t_old[both], rtol=1e-5, atol=1e-5)


def test_deferred_any_hit_and_active_mask(big_scene):
    bvh = big_scene.tables["bvh"]
    clusters = big_scene.tables["clusters"]
    ray, n = camera_rays()
    limit = jnp.full((n,), 3.2, jnp.float32)

    inf = jnp.full((n,), np.inf, jnp.float32)
    t_old, *_ = _jit_traverse(bvh, ray, limit, inf, any_hit=True)
    occ_old = np.asarray(t_old) < 3.2
    t_new, *_ = _jit_deferred(clusters, ray, limit, inf, any_hit=True)
    occ_new = np.asarray(t_new) < 3.2
    np.testing.assert_array_equal(occ_old, occ_new)

    # masked lanes must return their input best untouched
    active = jnp.asarray(np.arange(n) % 3 != 0)
    best_in = jnp.full((n,), 7.5, jnp.float32)
    t_m, tri_m, *_ = _jit_deferred(
        clusters, ray, jnp.full((n,), np.inf, jnp.float32), best_in,
        any_hit=False, active=active,
    )
    t_m = np.asarray(t_m)
    inactive = ~np.asarray(active)
    np.testing.assert_array_equal(t_m[inactive], 7.5)
    assert (np.asarray(tri_m)[inactive] == -1).all()


def test_deferred_grazing_rays_exact(big_scene):
    """Grazing wavefront: rays sweep edge-on past the blob so every lane
    opens MANY leaf groups at similar t — maximal candidate-buffer churn.
    This is the torture case for the descent-append/test-drain interplay
    (the round-2 slot-overwrite bug dropped live groups exactly here)."""
    bvh = big_scene.tables["bvh"]
    clusters = big_scene.tables["clusters"]
    side = 72
    ys, zs = np.mgrid[0:side, 0:side]
    y = (ys.ravel() + 0.5) / side * 2.8 - 1.4
    z = (zs.ravel() + 0.5) / side * 2.8 - 1.4
    n = side * side
    origin = np.stack([-4.0 * np.ones(n), y, z], 1)
    d = np.tile([[1.0, 0.0, 0.0]], (n, 1))
    # tilt half the rays slightly so they graze rather than pierce
    d[::2] += np.stack([np.zeros(n // 2), 0.08 * y[::2], 0.08 * z[::2]], 1)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    ray = Ray(
        Vec3(*(jnp.asarray(origin[:, i]) for i in range(3))),
        Vec3(*(jnp.asarray(d[:, i]) for i in range(3))),
    )

    inf = jnp.full((n,), np.inf, jnp.float32)
    t_old, *_ = _jit_traverse(bvh, ray, inf, inf, any_hit=False)
    t_new, *_ = _jit_deferred(clusters, ray, inf, inf, any_hit=False)
    t_old, t_new = np.asarray(t_old), np.asarray(t_new)
    mask_agree = np.isfinite(t_old) == np.isfinite(t_new)
    assert mask_agree.all(), f"hit masks differ on {(~mask_agree).sum()} lanes"
    both = np.isfinite(t_old) & np.isfinite(t_new)
    assert both.sum() > n // 3
    np.testing.assert_allclose(t_new[both], t_old[both], rtol=1e-5, atol=1e-5)


def test_perray_matches_reference_traversal(big_scene):
    from rpt_tpu.tiled import perray_traverse

    bvh = big_scene.tables["bvh"]
    clusters = big_scene.tables["clusters"]
    ray, n = camera_rays()

    inf = jnp.full((n,), np.inf, jnp.float32)
    t_old, tri_old, *_ = _jit_traverse(bvh, ray, inf, inf, any_hit=False)
    t_new, tri, u, v, w, done = jax.jit(
        lambda ct, r, lim, b: perray_traverse(ct, r, 1e-4, lim, b, any_hit=False)
    )(clusters, ray, inf, inf)
    done = np.asarray(done)
    assert done.all(), "per-ray rounds should finish every lane here"
    t_old = np.asarray(t_old)
    t_new = np.asarray(t_new)
    mask_agree = np.isfinite(t_old) == np.isfinite(t_new)
    assert mask_agree.mean() > 0.9997, f"hit masks differ on {(~mask_agree).sum()} lanes"
    both = np.isfinite(t_old) & np.isfinite(t_new)
    close = np.abs(t_old[both] - t_new[both]) <= 1e-5 + 1e-5 * t_old[both]
    assert close.mean() > 0.9997, f"{(~close).sum()} hit times differ"
