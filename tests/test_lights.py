"""Light sampling tests: transformed-shape pdf corrections vs Monte Carlo
integration (shape.rs:140-151, sphere.rs:53-65, cube.rs:76-89)."""

import jax
import numpy as np

import rpt_tpu as rpt
from rpt_tpu.lights import compile_light, illuminate, sample_shape
from rpt_tpu.sampling import keys_for
from rpt_tpu.vec import Vec3


def _keys(n, seed=0):
    return keys_for(jax.random.key(seed), n)


def test_cube_light_area_integral():
    """Uniform face sampling of a scaled cube: E[1/pdf] = surface area."""
    light = rpt.Light.Object(
        rpt.Object(rpt.cube().scale((2.0, 3.0, 4.0))).material(
            rpt.Material.light((1.0, 1.0, 1.0), 1.0)
        )
    )
    st, tabs = compile_light(light)
    n = 200000
    target = Vec3.zeros(n)
    v, nrm, pdf = sample_shape(st, tabs, target, _keys(n))
    est_area = float(np.mean(1.0 / np.asarray(pdf)))
    # faces: 2*(2*3 + 3*4 + 2*4) = 52
    assert abs(est_area - 52.0) / 52.0 < 0.02, est_area
    # sample points lie on the box surface
    p = v.to_numpy()
    on = (
        np.isclose(np.abs(p[:, 0]), 1.0, atol=1e-4)
        | np.isclose(np.abs(p[:, 1]), 1.5, atol=1e-4)
        | np.isclose(np.abs(p[:, 2]), 2.0, atol=1e-4)
    )
    assert on.mean() > 0.999
    # normals are unit and axis-aligned
    nn = nrm.to_numpy()
    assert np.allclose(np.linalg.norm(nn, axis=1), 1.0, atol=1e-5)


def test_mesh_light_pdf():
    """KdTree::sample semantics: uniform triangle pick, pdf = 1/(area*n)."""
    mesh = rpt.polygon([(0, 0, 0), (2, 0, 0), (2, 1, 0), (0, 1, 0)])  # 2 tris, areas 1,1
    light = rpt.Light.Object(rpt.Object(mesh).material(rpt.Material.light((1, 1, 1), 1.0)))
    st, tabs = compile_light(light)
    n = 100000
    v, nrm, pdf = sample_shape(st, tabs, Vec3.zeros(n), _keys(n, 1))
    assert np.allclose(np.asarray(pdf), 0.5, atol=1e-5)  # (1/1)/2
    p = v.to_numpy()
    assert (p[:, 0] >= -1e-5).all() and (p[:, 0] <= 2 + 1e-5).all()
    assert np.allclose(p[:, 2], 0.0, atol=1e-5)
    # uniform coverage of both halves
    assert abs((p[:, 0] < 1.0).mean() - 0.5) < 0.02


def test_point_light_falloff():
    light = rpt.Light.Point((8.0, 8.0, 8.0), (0.0, 2.0, 0.0))
    st, tabs = compile_light(light)
    pos = Vec3.from_array(np.array([[0.0, 0.0, 0.0]]))
    intensity, wi, dist = illuminate(st, tabs, pos, _keys(1))
    assert np.isclose(float(dist[0]), 2.0)
    assert np.isclose(float(intensity.x[0]), 8.0 / 4.0)
    assert np.allclose(wi.to_numpy()[0], [0, 1, 0], atol=1e-6)


def test_sphere_light_transformed_pdf_units():
    """Scaled sphere light: E[1/pdf] over hemisphere samples equals the
    visible-hemisphere cosine-weighted area measure; sanity: scaling by s
    multiplies areas by s^2."""
    def mean_inv_pdf(s):
        light = rpt.Light.Object(
            rpt.Object(rpt.sphere().scale((s, s, s)).translate((0.0, 10.0, 0.0))).material(
                rpt.Material.light((1, 1, 1), 1.0)
            )
        )
        st, tabs = compile_light(light)
        n = 100000
        target = Vec3.from_array(np.tile([0.0, 0.0, 0.0], (n, 1)))
        _, _, pdf = sample_shape(st, tabs, target, _keys(n, 2))
        return float(np.mean(1.0 / np.asarray(pdf)))

    a1 = mean_inv_pdf(1.0)
    a2 = mean_inv_pdf(2.0)
    assert abs(a2 / a1 - 4.0) < 0.1, (a1, a2)
