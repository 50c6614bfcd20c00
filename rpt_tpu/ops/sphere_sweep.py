"""Pallas kernel: beam-query x point-photon sweep.

The reference answers "which photon spheres does this camera ray pierce?"
with a BVH traversal per ray (photon.rs:440-450). The TPU-native shape of
this op is the opposite: photon spheres are a dense table; every (ray,
sphere) pair test is a handful of VPU flops; random access is the only
expensive thing on this hardware (see PERF.md). So we SWEEP: blocks of
rays sit in VMEM while the sphere table streams through, with the
(ray, sphere) pair math evaluated densely and reduced on the fly into
per-ray color sums via the MXU (pair-weight matrix @ sphere-power matrix).

Grid: (ray_blocks, sphere_chunks); the output block revisits across the
sphere-chunk axis and accumulates (standard Pallas reduction pattern).
Sphere data is stored transposed (field-major, (FIELDS, P)) so each field
is a contiguous lane slice of the streamed chunk.

Supports constant-phase media (the reference's presets; medium.rs:86,111).
The integrator falls back to the XLA sweep for anything else.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

RAY_BLOCK = 512
SPHERE_CHUNK = 512
# transposed sphere table rows: px py pz radius dirx diry dirz powx powy powz
FIELDS = 10


def sphere_sweep_available() -> bool:
    try:
        from jax.experimental import pallas as pl  # noqa: F401
        from jax.experimental.pallas import tpu as pltpu  # noqa: F401

        return jax.default_backend() in ("tpu",)
    except Exception:  # pragma: no cover
        return False


@functools.partial(
    jax.jit, static_argnames=("n_spheres", "phase_const", "interpret")
)
def sphere_sweep(ray_o, ray_d, hit_time, spheres_t, ext, med_color,
                 n_spheres: int, phase_const: float, interpret: bool = False):
    """Accumulate the sphere-map volume estimate for every ray.

    ``ray_o``/``ray_d``: (N, 3) f32. ``hit_time``: (N,) f32 (inf = miss).
    ``spheres_t``: (FIELDS, P) f32, P padded to SPHERE_CHUNK.
    ``ext``: scalar extinction; ``med_color``: (3,) medium color.
    Returns (N, 3) f32 of sum_s T(dd) * power * color * phase * k2/r^2.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = ray_o.shape[0]
    n_pad = -(-n // RAY_BLOCK) * RAY_BLOCK
    p = spheres_t.shape[1]
    assert p % SPHERE_CHUNK == 0

    ray_o = jnp.pad(ray_o, ((0, n_pad - n), (0, 0)))
    ray_d = jnp.pad(ray_d, ((0, n_pad - n), (0, 0)))
    hit_time = jnp.pad(hit_time, (0, n_pad - n))

    grid = (n_pad // RAY_BLOCK, p // SPHERE_CHUNK)
    scale = float(phase_const) * 3.0 / math.pi

    def kernel(ext_ref, o_ref, d_ref, t_ref, sph_ref, out_ref):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _init():
            out_ref[:] = jnp.zeros_like(out_ref)

        ext = ext_ref[0, 0]
        o = o_ref[:]  # (R, 3)
        d = d_ref[:]
        t_hit = t_ref[:]  # (R, 1)
        sph = sph_ref[:]  # (FIELDS, C)

        px, py, pz = sph[0][None, :], sph[1][None, :], sph[2][None, :]
        rad = sph[3][None, :]
        powx, powy, powz = sph[7], sph[8], sph[9]

        ocx = px - o[:, 0:1]
        ocy = py - o[:, 1:2]
        ocz = pz - o[:, 2:3]
        oc2 = ocx * ocx + ocy * ocy + ocz * ocz
        dd = ocx * d[:, 0:1] + ocy * d[:, 1:2] + ocz * d[:, 2:3]
        dist2 = jnp.maximum(oc2 - dd * dd, 0.0)
        r2 = jnp.maximum(rad * rad, 1e-30)
        ok = (dd > 0.0) & (dist2 < r2) & (jnp.sqrt(oc2) <= t_hit) & (rad > 0.0)
        x = dist2 / r2
        k2 = (1.0 - x) * (1.0 - x)  # times 3/pi folded into `scale`
        w = jnp.where(ok, k2 / r2 * jnp.exp(-ext * dd) * scale, 0.0)  # (R, C)

        # per-ray channel sums via one MXU matmul: (R, C) @ (C, 3).
        # HIGHEST precision: default f32 matmul runs bf16 passes (=0.4%
        # error vs the VPU sweep)
        pw = jnp.stack([powx, powy, powz], axis=1)  # (C, 3)
        out_ref[:] += jax.lax.dot(
            w, pw, precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((RAY_BLOCK, 3), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((RAY_BLOCK, 3), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((RAY_BLOCK, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((FIELDS, SPHERE_CHUNK), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((RAY_BLOCK, 3), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, 3), jnp.float32),
        interpret=interpret,
    )(
        jnp.asarray(ext, jnp.float32).reshape(1, 1),
        ray_o,
        ray_d,
        hit_time[:, None],
        spheres_t,
    )

    return out[:n] * med_color[None, :]


def pack_spheres_transposed(pos: np.ndarray, radius: np.ndarray, direction: np.ndarray,
                            power: np.ndarray) -> np.ndarray:
    """Host-side packer -> (FIELDS, P) f32, P padded to SPHERE_CHUNK with
    zero-radius (inert) spheres."""
    n = len(radius)
    p = max(SPHERE_CHUNK, -(-n // SPHERE_CHUNK) * SPHERE_CHUNK)
    out = np.zeros((FIELDS, p), np.float32)
    out[0:3, :n] = np.asarray(pos, np.float32).T
    out[3, :n] = radius
    out[4:7, :n] = np.asarray(direction, np.float32).T
    out[7:10, :n] = np.asarray(power, np.float32).T
    return out
