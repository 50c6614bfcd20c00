"""Port of the reference's color tests (color.rs:26-39) plus round-trips."""

import numpy as np

from rpt_tpu import color_bytes, hex_color


def test_colors_work():
    # colors_work (color.rs:31-38)
    black = hex_color(0x000000).to_numpy()
    white = hex_color(0xFFFFFF).to_numpy()
    red = hex_color(0xFF0000).to_numpy()
    assert (color_bytes(black) == [0, 0, 0]).all()
    assert (color_bytes(white) == [255, 255, 255]).all()
    assert (color_bytes(red) == [255, 0, 0]).all()


def test_gamma_decode():
    c = hex_color(0x808080).to_numpy()
    assert np.allclose(c, (128 / 255.0) ** 2.2, atol=1e-6)


def test_clamping():
    over = np.array([2.0, -1.0, 1.0])
    assert (color_bytes(over) == [255, 0, 255]).all()
