"""Procedural stand-in meshes: normal orientation + shading parity.

Round-2 shipped `displaced_blob` with INVERTED normals (cross(dv, du)),
which the BSDF's above-surface gate (material.rs:267-273 parity) turned
into an all-black mesh — geometry tests passed while shading was broken.
These tests pin the orientation and prove a uv_sphere Mesh shades the
same as the analytic sphere in an identical scene.
"""

import jax
import numpy as np

import rpt_tpu as rpt
from rpt_tpu.meshes import displaced_blob, uv_sphere
from rpt_tpu.integrators.path import trace_surface
from rpt_tpu.ray import Ray
from rpt_tpu.sampling import keys_for
from rpt_tpu.vec import Vec3


def test_uv_sphere_normals_point_outward():
    m = uv_sphere(48, 24)
    v = np.asarray(m.vertices)  # (T, 3, 3)
    n = np.asarray(m.normals)
    r = v / np.linalg.norm(v, axis=-1, keepdims=True)
    d = (n * r).sum(-1)
    assert d.min() > 0.99, f"vertex normal dot radial min {d.min()}"
    # flat winding normal must agree with the smooth normals
    fn = np.cross(v[:, 1] - v[:, 0], v[:, 2] - v[:, 0])
    fn /= np.linalg.norm(fn, axis=-1, keepdims=True)
    cen = v.mean(1)
    cen /= np.linalg.norm(cen, axis=-1, keepdims=True)
    fd = (fn * cen).sum(-1)
    assert fd.min() > 0.9, f"flat winding dot radial min {fd.min()}"


def test_displaced_blob_normals_outward_on_average():
    m = displaced_blob(64, 48, amplitude=0.25, seed=0)
    v = np.asarray(m.vertices)
    n = np.asarray(m.normals)
    assert np.isfinite(n).all()
    r = v / np.linalg.norm(v, axis=-1, keepdims=True)
    d = (n * r).sum(-1)
    # displacement tilts normals (and the degenerate pole fans are messy,
    # ~1% of slots) but a star-shaped blob keeps them outward in bulk —
    # the round-2 inversion had d == -1 EVERYWHERE
    assert d.mean() > 0.85, d.mean()
    assert (d > 0.0).mean() > 0.98, (d <= 0.0).mean()


def _one_light_scene(shape):
    scene = rpt.Scene()
    scene.add(rpt.Object(shape).material(rpt.Material.diffuse((0.7, 0.6, 0.5))))
    scene.add(
        rpt.Light.Object(
            rpt.Object(
                rpt.sphere().scale((0.5, 0.5, 0.5)).translate((2.0, 4.0, 3.0))
            ).material(rpt.Material.light((1.0, 1.0, 1.0), 40.0))
        )
    )
    return scene.compile()


def test_mesh_sphere_shades_like_analytic_sphere():
    """A uv_sphere Mesh and the analytic sphere() in the same 1-light
    scene must agree ray-by-ray within the mesh's faceting error — this
    exercises normals THROUGH the BSDF gate, which pure geometry tests
    never did."""
    cs_mesh = _one_light_scene(uv_sphere(96, 48))
    cs_ana = _one_light_scene(rpt.sphere())

    n = 4096
    rng = np.random.default_rng(4)
    o = np.tile([[0.0, 1.5, 5.0]], (n, 1))
    target = rng.uniform(-0.55, 0.55, (n, 3))
    d = target - o
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    ray = Ray(Vec3.from_array(o), Vec3.from_array(d))
    keys = keys_for(jax.random.key(11), n)

    out_m = trace_surface(cs_mesh, cs_mesh.tables, ray, keys, max_bounces=0).to_numpy()
    out_a = trace_surface(cs_ana, cs_ana.tables, ray, keys, max_bounces=0).to_numpy()

    # identical keys -> identical light samples; the only differences are
    # facet sag in hit position/normal. The lit side must be BRIGHT (the
    # round-2 bug made it exactly 0) and means must match closely.
    assert out_m.mean() > 0.05, "mesh renders black — normals inverted?"
    lit = out_a.max(1) > 1e-3
    assert lit.mean() > 0.2
    rel = abs(out_m[lit].mean() - out_a[lit].mean()) / out_a[lit].mean()
    assert rel < 0.03, f"mesh vs analytic mean radiance differ {rel:.1%}"
    # per-ray: most lanes agree tightly (shadow-terminator lanes may not)
    pr = np.abs(out_m[lit] - out_a[lit]).max(1) / (out_a[lit].max(1) + 1e-3)
    assert np.quantile(pr, 0.9) < 0.1, np.quantile(pr, 0.9)
