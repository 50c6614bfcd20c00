"""Wavefront integrator vs the independent f64 oracle (tests/_oracle.py).

The golden-image tests catch regressions but were rendered BY this
framework — a systematic factor (e.g. in NEE) would survive them. Here
the same two scenes are rendered by the wavefront machinery and by a
scalar-recursive numpy transcription of renderer.rs that shares no code
with rpt_tpu, and the converged means must agree within MC tolerance.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import rpt_tpu as rpt
from rpt_tpu.renderer import build_launch

import _oracle as oracle


SPP = 200
W = H = 24


def _wavefront_image(scene, camera, spp, max_bounces):
    cs = scene.compile()
    fn = jax.jit(build_launch(cs, camera, W, H, max_bounces, 8, spp))
    out = fn(cs.tables, jax.random.key(0), jnp.asarray(0, jnp.int32))
    return np.asarray(out, np.float64) / spp


def _compare(img_wf, img_or, mean_tol=0.02, rmse_tol=0.10):
    # any inf/NaN reaching a compared lane is a bug, never tolerance slack
    assert np.isfinite(img_wf).all(), "wavefront image has non-finite lanes"
    assert np.isfinite(img_or).all(), "oracle image has non-finite lanes"
    m_wf, m_or = img_wf.mean(), img_or.mean()
    rel = abs(m_wf - m_or) / m_or
    assert rel < mean_tol, f"image means differ {rel:.2%} (wf {m_wf}, oracle {m_or})"
    # per-pixel agreement bounded by MC noise of both estimates. Pixels
    # partially covering a direct emitter (value ~ emittance >> scene
    # mean) have coverage-fraction noise ~ emittance/sqrt(spp) that
    # legitimately dwarfs the tolerance — exclude them, but only a
    # sliver may be excluded.
    bright = np.maximum(img_wf, img_or).max(-1) > 4.0 * m_or
    assert bright.mean() < 0.05, f"{bright.mean():.1%} pixels excluded as emitters"
    d = (img_wf - img_or)[~bright]
    rmse = np.sqrt((d**2).mean()) / m_or
    assert rmse < rmse_tol, f"relative RMSE {rmse:.2%}"


def test_oracle_sphere_scene():
    """examples/sphere.rs geometry: diffuse sphere + plane + sphere light."""
    grey = (0.5, 0.5, 0.5)
    scene = rpt.Scene()
    scene.add(rpt.Object(rpt.sphere()).material(rpt.Material.diffuse(grey)))
    scene.add(
        rpt.Object(rpt.plane((0.0, 1.0, 0.0), -1.0)).material(
            rpt.Material.diffuse(rpt.hex_color(0xAAAAAA))
        )
    )
    scene.add(
        rpt.Light.Object(
            rpt.Object(
                rpt.sphere().scale((2.0, 2.0, 2.0)).translate((0.0, 12.0, 0.0))
            ).material(rpt.Material.light((1.0, 1.0, 1.0), 40.0))
        )
    )
    camera = dict(
        eye=(-2.5, 4.0, 6.5), target=(0.0, -0.25, 0.0), up=(0.0, 1.0, 0.0),
        fov=math.pi / 4,
    )
    cam = rpt.Camera.look_at(camera["eye"], camera["target"], camera["up"], camera["fov"])
    img_wf = _wavefront_image(scene, cam, SPP, 2)

    aaa = (0xAA / 255.0) ** 2.2
    o_scene = oracle.OScene(
        objects=[
            oracle.OSphere((0.0, 0.0, 0.0), 1.0, oracle.OMat(grey)),
            oracle.OPlane((0.0, 1.0, 0.0), -1.0, oracle.OMat((aaa,) * 3)),
        ],
        lights=[oracle.OSphere((0.0, 12.0, 0.0), 2.0, oracle.OMat((1.0,) * 3, 40.0))],
    )
    img_or = oracle.render(o_scene, camera["eye"], camera["target"], camera["up"],
                           camera["fov"], W, H, SPP, 2, seed=3)
    _compare(img_wf, img_or)


def _quad(a, b, c, d):
    return [[a, b, c], [a, c, d]]


def test_oracle_cornell_box():
    """Cornell-style box (triangle walls, colored sides, sphere, dual-added
    rect light): exercises NEE with mesh area lights + multi-bounce color
    bleeding through the backward clamp fold."""
    white = (0.73, 0.73, 0.73)
    red = (0.65, 0.05, 0.05)
    green = (0.12, 0.45, 0.15)
    L = 10.0
    # wind every wall so the flat normal faces INTO the box — the BSDF's
    # above-surface gate makes a back-facing wall render black
    fl = _quad((0, 0, 0), (0, 0, L), (L, 0, L), (L, 0, 0))
    ce = _quad((0, L, 0), (L, L, 0), (L, L, L), (0, L, L))
    bk = _quad((0, 0, 0), (L, 0, 0), (L, L, 0), (0, L, 0))
    lf = _quad((0, 0, 0), (0, L, 0), (0, L, L), (0, 0, L))
    rt = _quad((L, 0, 0), (L, 0, L), (L, L, L), (L, L, 0))
    lr = _quad((4, 9.99, 4), (6, 9.99, 4), (6, 9.99, 6), (4, 9.99, 6))

    scene = rpt.Scene()
    scene.add(
        rpt.Object(rpt.Mesh(np.array(fl + ce + bk, float))).material(
            rpt.Material.diffuse(white)
        )
    )
    scene.add(rpt.Object(rpt.Mesh(np.array(lf, float))).material(rpt.Material.diffuse(red)))
    scene.add(rpt.Object(rpt.Mesh(np.array(rt, float))).material(rpt.Material.diffuse(green)))
    scene.add(
        rpt.Object(rpt.sphere().scale((2.0,) * 3).translate((3.5, 2.0, 3.0))).material(
            rpt.Material.diffuse(white)
        )
    )
    scene.add((rpt.Mesh(np.array(lr, float)), rpt.Material.light((1.0, 1.0, 1.0), 40.0)))
    eye, target, up, fov = (5.0, 5.0, 24.0), (5.0, 5.0, 0.0), (0.0, 1.0, 0.0), math.pi / 6
    cam = rpt.Camera.look_at(eye, target, up, fov)
    img_wf = _wavefront_image(scene, cam, SPP, 2)

    lmat = oracle.OMat((1.0, 1.0, 1.0), 40.0)
    light_tris = oracle.OTris(np.array(lr), lmat)
    o_scene = oracle.OScene(
        objects=[
            oracle.OTris(np.array(fl + ce + bk), oracle.OMat(white)),
            oracle.OTris(np.array(lf), oracle.OMat(red)),
            oracle.OTris(np.array(rt), oracle.OMat(green)),
            oracle.OSphere((3.5, 2.0, 3.0), 2.0, oracle.OMat(white)),
            oracle.OTris(np.array(lr), lmat),  # dual add: object too
        ],
        lights=[light_tris],
    )
    img_or = oracle.render(o_scene, eye, target, up, fov, W, H, SPP, 2, seed=5)
    _compare(img_wf, img_or)


def test_oracle_volumetric_fog():
    """Volumetric branch (renderer.rs:188-285) vs the independent f64
    oracle: uniform fog + diffuse sphere + floor + sphere light. Exercises
    free-flight/hit competition, medium NEE (sample_lights_for_media),
    bounce-0-only emission, and RR p=0.8 continuation on both event kinds.
    Depth is capped identically on both sides (relative truncation
    ~(albedo*rr)^12, far below tolerance)."""
    DEPTH = 12
    VSPP = 400
    VW = VH = 16
    grey = (0.5, 0.5, 0.5)
    absorption, scattering = 0.02, 0.06

    scene = rpt.Scene()
    scene.add(rpt.Object(rpt.sphere()).material(rpt.Material.diffuse(grey)))
    scene.add(
        rpt.Object(rpt.plane((0.0, 1.0, 0.0), -1.0)).material(
            rpt.Material.diffuse(rpt.hex_color(0xAAAAAA))
        )
    )
    scene.add(
        rpt.Light.Object(
            rpt.Object(
                rpt.sphere().scale((2.0, 2.0, 2.0)).translate((0.0, 12.0, 0.0))
            ).material(rpt.Material.light((1.0, 1.0, 1.0), 40.0))
        )
    )
    scene.add(rpt.Medium.homogeneous_isotropic(absorption, scattering))
    eye, target, up = (-2.5, 4.0, 6.5), (0.0, -0.25, 0.0), (0.0, 1.0, 0.0)
    fov = math.pi / 4
    cam = rpt.Camera.look_at(eye, target, up, fov)

    cs = scene.compile()
    from rpt_tpu.renderer import build_launch

    fn = jax.jit(build_launch(cs, cam, VW, VH, 2, DEPTH, VSPP))
    img_wf = (
        np.asarray(fn(cs.tables, jax.random.key(0), jnp.asarray(0, jnp.int32)), np.float64)
        / VSPP
    )

    aaa = (0xAA / 255.0) ** 2.2
    o_scene = oracle.OScene(
        objects=[
            oracle.OSphere((0.0, 0.0, 0.0), 1.0, oracle.OMat(grey)),
            oracle.OPlane((0.0, 1.0, 0.0), -1.0, oracle.OMat((aaa,) * 3)),
        ],
        lights=[oracle.OSphere((0.0, 12.0, 0.0), 2.0, oracle.OMat((1.0,) * 3, 40.0))],
    )
    medium = oracle.OMedium(absorption, scattering)
    img_or = oracle.render_volumetric(
        o_scene, medium, eye, target, up, fov, VW, VH, VSPP, seed=11
    )
    # volumetric RR paths are noisier than the 2-bounce surface tests:
    # slightly wider per-pixel band, same 2% mean contract
    _compare(img_wf, img_or, mean_tol=0.02, rmse_tol=0.15)


def _photon_scene():
    """Diffuse sphere + floor + sphere light (examples/sphere.rs geometry) —
    shared by the photon-estimate oracle tests."""
    grey = (0.5, 0.5, 0.5)
    scene = rpt.Scene()
    scene.add(rpt.Object(rpt.sphere()).material(rpt.Material.diffuse(grey)))
    scene.add(
        rpt.Object(rpt.plane((0.0, 1.0, 0.0), -1.0)).material(
            rpt.Material.diffuse(rpt.hex_color(0xAAAAAA))
        )
    )
    scene.add(
        rpt.Light.Object(
            rpt.Object(
                rpt.sphere().scale((2.0, 2.0, 2.0)).translate((0.0, 12.0, 0.0))
            ).material(rpt.Material.light((1.0, 1.0, 1.0), 40.0))
        )
    )
    aaa = (0xAA / 255.0) ** 2.2
    o_scene = oracle.OScene(
        objects=[
            oracle.OSphere((0.0, 0.0, 0.0), 1.0, oracle.OMat(grey)),
            oracle.OPlane((0.0, 1.0, 0.0), -1.0, oracle.OMat((aaa,) * 3)),
        ],
        lights=[oracle.OSphere((0.0, 12.0, 0.0), 2.0, oracle.OMat((1.0,) * 3, 40.0))],
    )
    return scene, o_scene


def _camera_rays_np(eye, target, up, fov, width, height, jx, jy):
    """Oracle-side camera ray construction (camera.rs:44-82), f64."""
    eye = np.asarray(eye, np.float64)
    direction = oracle._norm(np.asarray(target, np.float64) - eye)
    upv = np.asarray(up, np.float64)
    right = oracle._norm(np.cross(direction, upv))
    upv = oracle._norm(np.cross(right, direction))
    dpl = 1.0 / np.tan(fov / 2.0)
    xs = np.arange(width * height)
    px = (xs % width).astype(np.float64)
    py = (xs // width).astype(np.float64)
    xn = (2.0 * px + 1.0 - width) / float(max(width, height))
    yn = (2.0 * (height - py) - 1.0 - height) / float(max(width, height))
    d = (
        dpl * direction[None, :]
        + (xn + jx)[:, None] * right[None, :]
        + (yn + jy)[:, None] * upv[None, :]
    )
    return np.tile(eye, (len(xs), 1)), oracle._norm(d)


def test_oracle_photon_surface_estimate():
    """Photon-map camera pass (no medium) vs the oracle's transcription of
    the disk estimate (photon.rs:327-375, dispatch :600-608): SAME photons
    (shot by rpt_tpu once), exact brute-force k-NN + per-photon occlusion
    on the oracle side vs the calibrated-grid wavefront estimate."""
    from rpt_tpu.integrators.photon import (
        build_photon_map, estimate_indirect, shoot_photons,
    )
    from rpt_tpu.ray import Ray
    from rpt_tpu.vec import Vec3
    from rpt_tpu import sampling

    K = 32
    W2 = H2 = 24
    scene, o_scene = _photon_scene()
    cs = scene.compile()
    surface, volume = shoot_photons(cs, cs.tables, jax.random.key(7), 6000, 100.0,
                                    "photon_map")
    assert len(surface) > 500
    pmap = build_photon_map(cs, cs.tables, surface, volume, "photon_map", K, 16,
                            np.random.default_rng(3))

    eye, target, up = (-2.5, 4.0, 6.5), (0.0, -0.25, 0.0), (0.0, 1.0, 0.0)
    fov = math.pi / 4
    cam = rpt.Camera.look_at(eye, target, up, fov)

    # fixed pixel-center rays (no jitter): the estimate is deterministic
    # given the photons, so one sample compares exactly-converged images
    o_np, d_np = _camera_rays_np(eye, target, up, fov, W2, H2, 0.0, 0.0)

    ray = Ray(
        Vec3(*(jnp.asarray(o_np[:, i], jnp.float32) for i in range(3))),
        Vec3(*(jnp.asarray(d_np[:, i], jnp.float32) for i in range(3))),
    )
    img_wf = np.asarray(
        jax.jit(
            lambda tabs, r: estimate_indirect(
                cs, tabs, pmap, r,
                jax.vmap(lambda i: jax.random.fold_in(jax.random.key(1), i))(
                    jnp.arange(W2 * H2)
                ), K, 16,
            ).to_array()
        )(cs.tables, ray),
        np.float64,
    )

    ph = np.asarray(surface, np.float64)
    img_or = oracle.photon_surface_estimate(o_scene, ph, o_np, d_np, K)

    m_wf, m_or = img_wf.mean(), img_or.mean()
    assert abs(m_wf - m_or) / m_or < 0.02, f"means differ: wf {m_wf} oracle {m_or}"


def _fog_scene_rays(w=16, h=16):
    absorption, scattering = 0.02, 0.06
    scene, o_scene = _photon_scene()
    scene.add(rpt.Medium.homogeneous_isotropic(absorption, scattering))
    eye, target, up = (-2.5, 4.0, 6.5), (0.0, -0.25, 0.0), (0.0, 1.0, 0.0)
    fov = math.pi / 4
    o_np, d_np = _camera_rays_np(eye, target, up, fov, w, h, 0.0, 0.0)
    from rpt_tpu.ray import Ray
    from rpt_tpu.vec import Vec3

    ray = Ray(
        Vec3(*(jnp.asarray(o_np[:, i], jnp.float32) for i in range(3))),
        Vec3(*(jnp.asarray(d_np[:, i], jnp.float32) for i in range(3))),
    )
    medium = oracle.OMedium(absorption, scattering)
    return scene, o_scene, o_np, d_np, ray, medium


def test_oracle_photon_beam_sphere_estimate():
    """Beam x photon-sphere estimate (photon.rs:439-501) vs the oracle:
    SAME spheres (positions, adaptive radii, powers extracted from the
    built map), exact f64 disk test on the oracle side. The estimate is
    deterministic given the spheres, so this is a direct comparison."""
    from rpt_tpu.integrators.photon import (
        build_photon_map, shoot_photons, volume_estimate_spheres,
    )
    from rpt_tpu.intersect import closest_hit

    scene, o_scene, o_np, d_np, ray, medium = _fog_scene_rays()
    cs = scene.compile()
    surface, volume = shoot_photons(cs, cs.tables, jax.random.key(9), 4000,
                                    100.0, "point_beam")
    pmap = build_photon_map(cs, cs.tables, surface, volume, "point_beam",
                            16, 16, np.random.default_rng(4))
    assert pmap.n_spheres > 500
    med = cs.media[0]
    hit = closest_hit(cs, cs.tables, ray)
    img_wf = np.asarray(
        jax.jit(lambda: volume_estimate_spheres(pmap, med, ray, hit).to_array())(),
        np.float64,
    )

    nv = pmap.n_spheres
    pos = np.asarray(pmap.spheres["pos4"], np.float64)[:nv, :3]
    rad = np.asarray(pmap.spheres["radius"], np.float64)[:nv]
    dirs = np.stack(
        [np.asarray(getattr(pmap.spheres["dir"], c), np.float64)[:nv] for c in "xyz"], 1
    )
    pows = np.stack(
        [np.asarray(getattr(pmap.spheres["power"], c), np.float64)[:nv] for c in "xyz"], 1
    )
    img_or = oracle.photon_beam_sphere_estimate(
        o_scene, medium, pos, dirs, pows, rad, o_np, d_np
    )
    m_wf, m_or = img_wf.mean(), img_or.mean()
    assert m_or > 0
    assert abs(m_wf - m_or) / m_or < 0.01, f"means differ: wf {m_wf} oracle {m_or}"
    rmse = np.sqrt(((img_wf - img_or) ** 2).mean()) / m_or
    assert rmse < 0.05, f"per-pixel rmse {rmse:.2%}"


def test_oracle_photon_beam_beam_estimate():
    """Beam x beam estimate, eq. 38 (photon.rs:503-593) vs the oracle:
    SAME thinned beams both sides; t>0 per rpt_tpu's documented deviation
    (PARITY.md — the reference accepts behind-origin intersections)."""
    from rpt_tpu.integrators.photon import (
        build_photon_map, shoot_photons, volume_estimate_beams,
    )
    from rpt_tpu.intersect import closest_hit

    scene, o_scene, o_np, d_np, ray, medium = _fog_scene_rays()
    cs = scene.compile()
    surface, volume = shoot_photons(cs, cs.tables, jax.random.key(9), 4000,
                                    100.0, "beam_beam")
    pmap = build_photon_map(cs, cs.tables, surface, volume, "beam_beam",
                            16, 16, np.random.default_rng(4))
    assert pmap.n_beams > 3
    med = cs.media[0]
    hit = closest_hit(cs, cs.tables, ray)
    img_wf = np.asarray(
        jax.jit(lambda: volume_estimate_beams(pmap, med, ray, hit).to_array())(),
        np.float64,
    )

    nb = pmap.n_beams
    b = pmap.beams
    start = np.stack([np.asarray(getattr(b["start"], c), np.float64)[:nb] for c in "xyz"], 1)
    bdir = np.stack([np.asarray(getattr(b["dir"], c), np.float64)[:nb] for c in "xyz"], 1)
    bpow = np.stack([np.asarray(getattr(b["power"], c), np.float64)[:nb] for c in "xyz"], 1)
    blen = np.asarray(b["length"], np.float64)[:nb]
    brad = np.asarray(b["radius"], np.float64)[:nb]
    img_or = oracle.photon_beam_beam_estimate(
        o_scene, medium, start, bdir, blen, brad, bpow, o_np, d_np,
        t_positive=True,
    )
    m_wf, m_or = img_wf.mean(), img_or.mean()
    assert m_or > 0
    assert abs(m_wf - m_or) / m_or < 0.01, f"means differ: wf {m_wf} oracle {m_or}"


def test_oracle_photon_volume_point_estimate():
    """Point-map point estimate in fog (photon.rs:384-437, dispatch
    :600-613) vs the oracle transcription, same photons both sides."""
    from rpt_tpu.integrators.photon import (
        build_photon_map, estimate_indirect, shoot_photons,
    )
    from rpt_tpu.ray import Ray
    from rpt_tpu.vec import Vec3
    from rpt_tpu import sampling

    K, KV = 16, 16
    W2 = H2 = 16
    SPP2 = 64
    absorption, scattering = 0.02, 0.06
    scene, o_scene = _photon_scene()
    scene.add(rpt.Medium.homogeneous_isotropic(absorption, scattering))
    cs = scene.compile()
    surface, volume = shoot_photons(cs, cs.tables, jax.random.key(9), 4000, 100.0,
                                    "photon_map")
    assert len(volume) > 500
    pmap = build_photon_map(cs, cs.tables, surface, volume, "photon_map", K, KV,
                            np.random.default_rng(4))

    eye, target, up = (-2.5, 4.0, 6.5), (0.0, -0.25, 0.0), (0.0, 1.0, 0.0)
    fov = math.pi / 4
    cam = rpt.Camera.look_at(eye, target, up, fov)
    o_np, d_np = _camera_rays_np(eye, target, up, fov, W2, H2, 0.0, 0.0)
    ray = Ray(
        Vec3(*(jnp.asarray(o_np[:, i], jnp.float32) for i in range(3))),
        Vec3(*(jnp.asarray(d_np[:, i], jnp.float32) for i in range(3))),
    )

    @jax.jit
    def wf(tabs, key):
        def one(acc, s):
            keys = jax.vmap(lambda i: jax.random.fold_in(jax.random.fold_in(key, s), i))(
                jnp.arange(W2 * H2)
            )
            c = estimate_indirect(cs, tabs, pmap, ray, keys, K, KV)
            return acc + c.to_array(), None

        out, _ = jax.lax.scan(one, jnp.zeros((W2 * H2, 3), jnp.float32),
                              jnp.arange(SPP2))
        return out / SPP2

    img_wf = np.asarray(wf(cs.tables, jax.random.key(2)), np.float64)

    # Replicate the wavefront's own free-flight distances (same key folds as
    # volume_estimate_point -> Medium.sample_d) and hand them to the oracle:
    # the surface branch's 1/(1-cdf(d)) weight has INFINITE expectation (see
    # _oracle.photon_volume_point_estimate docstring), so only a per-sample
    # paired comparison is statistically meaningful.
    key = jax.random.key(2)
    ext = absorption + scattering

    @jax.jit
    def sampled_dists():
        def one(_, s):
            keys = jax.vmap(
                lambda i: jax.random.fold_in(jax.random.fold_in(key, s), i)
            )(jnp.arange(W2 * H2))
            u = sampling.uniform(
                sampling.fold(sampling.fold(keys, 0x7), 0x5D), 0.0, 1.0
            )
            return None, -jnp.log(jnp.maximum(u, 1e-38)) / ext

        _, ds = jax.lax.scan(one, None, jnp.arange(SPP2))
        return ds

    dists = np.asarray(sampled_dists(), np.float64)  # (SPP2, n)

    s_ph = np.asarray(surface, np.float64)
    v_ph = np.asarray(volume, np.float64)
    medium = oracle.OMedium(absorption, scattering)
    surf_img = oracle.photon_surface_estimate(o_scene, s_ph, o_np, d_np, K)
    acc = np.zeros((W2 * H2, 3))
    for s in range(SPP2):
        acc += oracle.photon_volume_point_estimate(
            o_scene, medium, s_ph, v_ph, o_np, d_np, K, KV,
            dist=dists[s], surf=surf_img,
        )
    img_or = acc / SPP2

    m_wf, m_or = img_wf.mean(), img_or.mean()
    assert abs(m_wf - m_or) / m_or < 0.02, f"means differ: wf {m_wf} oracle {m_or}"
