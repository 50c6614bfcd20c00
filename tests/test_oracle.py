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
