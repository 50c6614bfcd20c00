"""Environment lighting: solid color or HDRI equirectangular map.

Parity: `/root/reference/src/environment.rs`. ``get_color`` is vectorized
over a direction wavefront; HDRI bilinear sampling uses XLA gathers.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from .dtypes import DTYPE
from .vec import Vec3, lerp


@dataclass(frozen=True)
class ColorEnvironment:
    """Solid-color environment (environment.rs:56-58); default black."""

    color: tuple = (0.0, 0.0, 0.0)

    def tables(self):
        return Vec3.of(*self.color)

    def get_color(self, tables, direction: Vec3) -> Vec3:
        return tables.broadcast_to(direction.shape)


class Hdri:
    """Equirectangular HDR environment (environment.rs:5-52)."""

    def __init__(self, buf: np.ndarray):
        buf = np.asarray(buf, np.float64)
        assert buf.ndim == 3 and buf.shape[2] == 3 and buf.shape[0] > 0 and buf.shape[1] > 0
        self.height, self.width = buf.shape[:2]
        self._buf = buf

    def tables(self):
        return Vec3.from_array(jnp.asarray(self._buf, DTYPE))

    def get_color(self, tables: Vec3, direction: Vec3) -> Vec3:
        """direction -> (azimuth, polar) -> bilinear sample
        (environment.rs:25-52)."""
        d = direction.normalize()
        azimuth = jnp.arctan2(d.z, d.x) + math.pi
        polar = jnp.arccos(jnp.clip(d.y, -1.0, 1.0))
        x = azimuth / (2.0 * math.pi) * (self.width - 1)
        y = polar / math.pi * (self.height - 1)
        # bilinear_sample (environment.rs:34-52): x0 truncated and clamped;
        # the reference indexes x0+1 / y0+1 unclamped (relying on the pole
        # rows); we clamp to stay in bounds.
        x0 = jnp.clip(x.astype(jnp.int32), 0, self.width - 1)
        y0 = jnp.clip(y.astype(jnp.int32), 0, self.height - 1)
        x1 = jnp.minimum(x0 + 1, self.width - 1)
        y1 = jnp.minimum(y0 + 1, self.height - 1)
        ax = x - x0.astype(DTYPE)
        ay = y - y0.astype(DTYPE)

        def fetch(yy, xx):
            from .vec import take

            return take(tables.reshape(-1), yy * self.width + xx)

        top = lerp(fetch(y0, x0), fetch(y0, x1), ax)
        bot = lerp(fetch(y1, x0), fetch(y1, x1), ax)
        return lerp(top, bot, ay)


Environment = ColorEnvironment | Hdri
