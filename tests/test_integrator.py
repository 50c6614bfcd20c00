"""Integrator physics tests: furnace energy conservation, NEE behavior,
volumetric transport — the quantitative safety net the reference lacks
(SURVEY.md §4)."""

import math

import jax
import numpy as np

import rpt_tpu as rpt
from rpt_tpu.integrators.path import trace_surface, trace_volumetric
from rpt_tpu.ray import Ray
from rpt_tpu.sampling import fold, keys_for
from rpt_tpu.vec import Vec3


def _rays_at_sphere(n, seed=0):
    rng = np.random.default_rng(seed)
    o = np.tile([[0.0, 0.0, 5.0]], (n, 1))
    target = rng.uniform(-0.5, 0.5, (n, 3))
    d = target - o
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return Ray(Vec3.from_array(o), Vec3.from_array(d))


def test_furnace_lambertian():
    """A convex lambertian sphere in a uniform unit environment: every
    camera ray that hits reflects once (cosine importance sampling makes
    the MC weight EXACTLY the albedo) and escapes -> radiance == albedo."""
    albedo = 0.6
    scene = rpt.Scene()
    scene.add(rpt.Object(rpt.sphere()).material(rpt.Material.diffuse((albedo,) * 3)))
    scene.add(rpt.ColorEnvironment((1.0, 1.0, 1.0)))
    cs = scene.compile()

    n = 2048
    ray = _rays_at_sphere(n)
    keys = keys_for(jax.random.key(1), n)
    out = trace_surface(cs, cs.tables, ray, keys, max_bounces=4)
    vals = out.to_numpy()
    # all these rays hit the sphere; one bounce then escape
    assert np.allclose(vals, albedo, atol=1e-4), (vals.min(), vals.max())


def test_furnace_mirror_quirk():
    """Mirror furnace: the reference weights mirror bounces by f * |wi.n|
    (renderer.rs:308-310 with f=1, pdf=1), so each bounce multiplies by
    cos(theta) — NOT energy-preserving. Verify we reproduce that exactly."""
    scene = rpt.Scene()
    scene.add(rpt.Object(rpt.sphere()).material(rpt.Material.mirror()))
    scene.add(rpt.ColorEnvironment((1.0, 1.0, 1.0)))
    cs = scene.compile()
    n = 512
    o = np.tile([[0.0, 0.0, 5.0]], (n, 1))
    d = np.tile([[0.0, 0.0, -1.0]], (n, 1))
    ray = Ray(Vec3.from_array(o), Vec3.from_array(d))
    keys = keys_for(jax.random.key(1), n)
    out = trace_surface(cs, cs.tables, ray, keys, max_bounces=4)
    # head-on: cos = 1 -> full env reflected
    assert np.allclose(out.to_numpy(), 1.0, atol=1e-4)


def test_volumetric_pure_scattering_conserves():
    """Pure-scattering medium in a unit environment: every interaction
    multiplies by (sigma_s/sigma_t) * phase/ph_p / RR = 1/0.8 with survival
    0.8 -> unbiased; radiance == env up to MC noise and the depth cap."""
    scene = rpt.Scene()
    # a dummy far-away object so the scene isn't empty
    scene.add(
        rpt.Object(rpt.sphere().translate((0.0, 0.0, 10000.0))).material(
            rpt.Material.diffuse((0.0, 0.0, 0.0))
        )
    )
    scene.add(rpt.ColorEnvironment((1.0, 1.0, 1.0)))
    # NB: the reference's homogeneous_isotropic preset is TAN-colored
    # (medium.rs:85), which attenuates every scatter — use a white medium
    # to test pure transport
    scene.add(rpt.Medium.henyey_greenstein(0.0, 0.002, g=0.0, color=Vec3.of(1.0, 1.0, 1.0)))
    cs = scene.compile()
    n = 8192
    rng = np.random.default_rng(0)
    o = np.zeros((n, 3))
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    ray = Ray(Vec3.from_array(o), Vec3.from_array(d))
    keys = keys_for(jax.random.key(3), n)
    out = trace_volumetric(cs, cs.tables, ray, keys, max_depth=48)
    mean = out.to_numpy().mean()
    # sigma_t * background(400) = 0.8 mean events; truncation negligible
    assert abs(mean - 1.0) < 0.05, mean


def test_nee_matches_brute_force_on_sphere_light():
    """Direct lighting from a spherical area light via NEE equals a
    high-sample numerical integration of the same estimator."""
    scene = rpt.Scene()
    scene.add(
        rpt.Object(rpt.plane((0.0, 1.0, 0.0), 0.0)).material(
            rpt.Material.diffuse((1.0, 1.0, 1.0))
        )
    )
    scene.add(
        rpt.Light.Object(
            rpt.Object(rpt.sphere().translate((0.0, 5.0, 0.0))).material(
                rpt.Material.light((1.0, 1.0, 1.0), 10.0)
            )
        )
    )
    cs = scene.compile()
    n = 4096
    # camera rays hitting the plane at the origin from above
    o = np.tile([[0.0, 3.0, 3.0]], (n, 1))
    d = np.tile([[0.0, -3.0, -3.0]], (n, 1))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    ray = Ray(Vec3.from_array(o), Vec3.from_array(d))
    keys = keys_for(jax.random.key(5), n)
    out = trace_surface(cs, cs.tables, ray, keys, max_bounces=0).to_numpy()
    mc = out.mean(0)

    # brute-force estimator of the same quantity (light.rs:34-45 sampling):
    # E[(albedo/pi) * emit * cos_max(-(v-p).n_l,0)/|v-p| * cos/|v-p|^2 / pdf]
    rng = np.random.default_rng(9)
    m = 400000
    # sphere light sample: cosine hemisphere toward target (origin)
    nrm = np.array([0.0, -1.0, 0.0])  # normalize(target - center) in local
    # local frame around nrm
    xy = rng.uniform(size=(m, 2))
    r = np.sqrt(xy[:, 0])
    phi = 2 * np.pi * xy[:, 1]
    x, y = r * np.cos(phi), r * np.sin(phi)
    z = np.sqrt(np.maximum(0, 1 - x * x - y * y))
    t1 = np.array([1.0, 0.0, 0.0])
    t2 = np.cross(nrm, t1)
    p_local = x[:, None] * t1 + y[:, None] * t2 + z[:, None] * nrm
    v = p_local + [0.0, 5.0, 0.0]
    pdf = z / np.pi
    disp = v - 0.0
    dist = np.linalg.norm(disp, axis=1)
    cos_l = np.maximum(-(disp * p_local).sum(1), 0.0) / dist
    intensity = 10.0 * np.maximum(cos_l, 0) / dist**2 / pdf
    wi = disp / dist[:, None]
    cos_s = wi[:, 1]
    f = 1.0 / np.pi
    ref = (f * intensity * cos_s).mean()
    assert abs(mc[0] - ref) / ref < 0.05, (mc, ref)


def test_colored_glowing_fog_runs():
    """Heterogeneous (position-dependent) medium callables trace into the
    kernel (medium.rs:99-121: two-color emissive fog, pi/4 phase sic)."""
    scene = rpt.Scene()
    scene.add(
        rpt.Object(rpt.plane((0.0, 1.0, 0.0), -500.0)).material(
            rpt.Material.diffuse((0.5, 0.5, 0.5))
        )
    )
    scene.add(rpt.Medium.colored_glowing_fog(1e-3, 1e-3))
    cs = scene.compile()
    n = 256
    o = np.tile([[0.0, 300.0, 0.0]], (n, 1))
    rng = np.random.default_rng(2)
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    ray = Ray(Vec3.from_array(o), Vec3.from_array(d))
    out = trace_volumetric(cs, cs.tables, ray, keys_for(jax.random.key(1), n), max_depth=8)
    vals = out.to_numpy()
    assert np.isfinite(vals).all()
    # emissive fog: bounce-0 medium events emit 10 * color -> nonzero image
    assert vals.mean() > 0.1


def test_pooled_schedule_bit_identical():
    """The opt-in pooled schedule (shadows of level b + closest of level
    b+1 in ONE mixed traversal — integrators.path.POOLED_SCHEDULE) must
    produce BIT-identical radiance to the default schedule: it reorders
    scheduling, not math. Uses a mesh scene so the mixed deferred
    traversal (any_hit="mixed") and the L0 tile prepass are exercised."""
    from rpt_tpu.integrators import path as P
    from rpt_tpu.meshes import displaced_blob

    scene = rpt.Scene()
    scene.add(rpt.Object(displaced_blob(101, 102, amplitude=0.3, seed=3))
              .material(rpt.Material.specular((0.8, 0.7, 0.5), 0.4)))
    scene.add(rpt.Object(rpt.plane((0, 1, 0), -1.0))
              .material(rpt.Material.diffuse((0.6, 0.6, 0.6))))
    scene.add(rpt.Light.Point((30.0, 30.0, 30.0), (3.0, 4.0, 2.0)))
    scene.add(rpt.Light.Object(
        rpt.Object(rpt.sphere().scale((0.3, 0.3, 0.3)).translate((-2.0, 2.5, 1.0)))
        .material(rpt.Material.light((1.0, 0.9, 0.8), 20.0))))
    cs = scene.compile()
    assert "clusters" in cs.tables  # big enough for the cluster engines

    n = 8192  # >= TILED_MIN_RAYS so the deferred/tiled paths engage
    ray = _rays_at_sphere(n, seed=5)
    keys = keys_for(jax.random.key(7), n)

    default = trace_surface(cs, cs.tables, ray, keys, max_bounces=2)
    old = P.POOLED_SCHEDULE
    P.POOLED_SCHEDULE = True
    try:
        pooled = trace_surface(cs, cs.tables, ray, keys, max_bounces=2)
    finally:
        P.POOLED_SCHEDULE = old

    for c in "xyz":
        np.testing.assert_array_equal(
            np.asarray(getattr(default, c)), np.asarray(getattr(pooled, c))
        )
