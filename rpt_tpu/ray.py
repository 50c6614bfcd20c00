"""Rays and hit records (SoA batches).

Parity: `/root/reference/src/shape.rs:48-98`. A ``Ray`` is an origin plus a
unit direction; a ``HitRecord`` starts at time=inf and is only improved by
closer hits. Here both are batched SoA pytrees: one wavefront of N rays is a
single ``Ray`` whose components are (N,) arrays.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from .dtypes import DTYPE, INF
from .vec import Affine, Vec3


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class Ray:
    origin: Vec3
    dir: Vec3

    def at(self, t) -> Vec3:
        """Evaluate the ray at parameter t (shape.rs:60-62)."""
        return self.origin + self.dir * t

    def transform(self, a: Affine) -> "Ray":
        """Apply an affine transform, *not* normalizing the direction
        (shape.rs:65-72) — this preserves the ray parameter t across
        object/world space."""
        return Ray(a.apply_point(self.origin), a.apply_dir(self.dir))


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class Hit:
    """Batched hit record: time (inf = miss), shading normal, material id.

    ``material`` is an int32 index into the scene's material table;
    -1 where there is no hit.
    """

    time: jax.Array
    normal: Vec3
    material: jax.Array

    @staticmethod
    def none(shape) -> "Hit":
        return Hit(
            jnp.full(shape, INF, DTYPE),
            Vec3.zeros(shape),
            jnp.full(shape, -1, jnp.int32),
        )

    @property
    def valid(self) -> jax.Array:
        return jnp.isfinite(self.time)


def closer(a: Hit, b: Hit) -> Hit:
    """Merge two hit records, keeping the closer hit per lane (the batched
    analog of the reference's mutate-if-closer contract, shape.rs:20-22)."""
    take_b = b.time < a.time
    from .vec import where  # local import to avoid cycle at module load

    return Hit(
        jnp.where(take_b, b.time, a.time),
        where(take_b, b.normal, a.normal),
        jnp.where(take_b, b.material, a.material),
    )
