"""HDRI environment sampling tests (environment.rs:25-52)."""

import numpy as np

import rpt_tpu as rpt
from rpt_tpu.vec import Vec3


def test_color_environment():
    env = rpt.ColorEnvironment((0.25, 0.5, 0.75))
    t = env.tables()
    d = Vec3.from_array(np.array([[0.0, 1.0, 0.0], [1.0, 0.0, 0.0]]))
    c = env.get_color(t, d).to_numpy()
    assert np.allclose(c, [[0.25, 0.5, 0.75]] * 2)


def test_hdri_poles_and_bilinear():
    h, w = 8, 16
    buf = np.zeros((h, w, 3))
    buf[:, :, 0] = np.linspace(0, 1, h)[:, None]  # red ramps with polar angle
    hdri = rpt.Hdri(buf)
    t = hdri.tables()
    up = Vec3.from_array(np.array([[0.0, 1.0, 0.0]]))  # polar 0 -> row 0
    down = Vec3.from_array(np.array([[0.0, -1.0, 0.0]]))  # polar pi -> last row
    c_up = hdri.get_color(t, up).to_numpy()[0]
    c_down = hdri.get_color(t, down).to_numpy()[0]
    assert c_up[0] < 0.05
    assert c_down[0] > 0.95
    # horizontal direction lands mid-ramp
    side = Vec3.from_array(np.array([[1.0, 0.0, 0.0]]))
    c_side = hdri.get_color(t, side).to_numpy()[0]
    assert 0.3 < c_side[0] < 0.7


def test_hdri_azimuth_wrap():
    h, w = 4, 8
    buf = np.zeros((h, w, 3))
    buf[:, :, 1] = np.linspace(0, 1, w)[None, :]  # green ramps with azimuth
    hdri = rpt.Hdri(buf)
    t = hdri.tables()
    # atan2(z,x)+pi: dir (-1,0,-eps) -> azimuth ~0; dir (1,0,0) -> pi (mid)
    minus_x = Vec3.from_array(np.array([[-1.0, 0.0, -1e-8]]))
    plus_x = Vec3.from_array(np.array([[1.0, 0.0, 0.0]]))
    g0 = hdri.get_color(t, minus_x).to_numpy()[0][1]
    g_mid = hdri.get_color(t, plus_x).to_numpy()[0][1]
    assert g0 < 0.1
    assert 0.4 < g_mid < 0.6
