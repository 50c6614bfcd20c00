"""Buffer moment-accumulator tests (buffer.rs semantics)."""

import numpy as np

from rpt_tpu.buffer import Buffer, Filter


def test_mean_and_variance():
    rng = np.random.default_rng(0)
    buf = Buffer(4, 3)
    samples = rng.uniform(0, 1, (10, 3, 4, 3))
    for s in samples:
        buf.add_samples(s)
    mean = buf.raw()
    assert np.allclose(mean, samples.mean(0))
    # reference variance: per-pixel sum |s - mean|^2 / (n-1), averaged
    ref = 0.0
    for y in range(3):
        for x in range(4):
            pix = samples[:, y, x, :]
            m = pix.mean(0)
            ref += ((pix - m) ** 2).sum() / (len(pix) - 1)
    ref /= 12
    assert np.isclose(buf.variance(), ref, rtol=1e-10)


def test_box_filter_edges():
    buf = Buffer(3, 3, Filter.Box(1))
    img = np.zeros((3, 3, 3))
    img[1, 1] = 9.0
    buf.add_samples(img)
    out = buf.raw()
    # center pixel: mean over full 3x3 neighborhood = 1.0
    assert np.allclose(out[1, 1], 1.0)
    # corner: 2x2 neighborhood, includes the bright center = 9/4
    assert np.allclose(out[0, 0], 9.0 / 4.0)


def test_checkpoint_roundtrip(tmp_path):
    buf = Buffer(2, 2)
    buf.add_samples(np.ones((2, 2, 3)))
    buf.add_samples(np.full((2, 2, 3), 3.0))
    p = str(tmp_path / "ckpt.npz")
    buf.save(p)
    loaded = Buffer.load(p)
    assert loaded.num_samples == 2
    assert np.allclose(loaded.raw(), 2.0)
    assert np.isclose(loaded.variance(), buf.variance(), equal_nan=True)
