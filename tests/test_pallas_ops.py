"""Pallas kernel tests (interpret mode on the CPU test mesh)."""

import math

import jax.numpy as jnp
import numpy as np

from rpt_tpu.ops.sphere_sweep import (
    RAY_BLOCK,
    SPHERE_CHUNK,
    pack_spheres_transposed,
    sphere_sweep,
)


def test_sphere_sweep_matches_numpy():
    rng = np.random.default_rng(0)
    p = SPHERE_CHUNK * 2
    pos = rng.uniform(0, 100, (p, 3)).astype(np.float32)
    radius = rng.uniform(5.0, 10.0, p).astype(np.float32)
    direction = rng.normal(size=(p, 3)).astype(np.float32)
    power = rng.uniform(0, 1, (p, 3)).astype(np.float32)
    n = RAY_BLOCK + 17  # force ray padding
    o = rng.uniform(0, 100, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    hit_t = np.where(rng.random(n) < 0.5, rng.uniform(20, 200, n), np.inf).astype(np.float32)
    ext = 1e-3
    phase_const = 1 / (4 * math.pi)

    sph_t = pack_spheres_transposed(pos, radius, direction, power)
    out = np.asarray(
        sphere_sweep(
            jnp.asarray(o), jnp.asarray(d), jnp.asarray(hit_t), jnp.asarray(sph_t),
            jnp.float32(ext), jnp.asarray(np.full(3, 0.5, np.float32)),
            n_spheres=p, phase_const=phase_const, interpret=True,
        )
    )

    oc = pos[None, :, :] - o[:, None, :]
    oc2 = (oc * oc).sum(-1)
    dd = (oc * d[:, None, :]).sum(-1)
    dist2 = np.maximum(oc2 - dd * dd, 0)
    r2 = radius[None, :] ** 2
    ok = (dd > 0) & (dist2 < r2) & (np.sqrt(oc2) <= hit_t[:, None])
    x = dist2 / r2
    w = np.where(ok, (3 / np.pi) * (1 - x) ** 2 / r2 * np.exp(-ext * dd) * phase_const, 0)
    ref = (w @ power) * 0.5
    assert np.allclose(out, ref, rtol=1e-4, atol=1e-7)
