"""Axis-aligned bounding box math (vectorized over ray batches).

Behavioral spec: reference bounding_box.cuh (slab-test `ray_intersect`,
`contains`, `relative_pos`).  Functions are jnp-traceable and broadcast over
leading batch dimensions.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class BoundingBox:
    """Static (non-traced) AABB; min/max are length-3 numpy arrays."""

    min: np.ndarray
    max: np.ndarray

    @staticmethod
    def unit() -> "BoundingBox":
        return BoundingBox(np.zeros(3, np.float32), np.ones(3, np.float32))

    @staticmethod
    def from_scale(aabb_scale: float) -> "BoundingBox":
        """NGP convention: box of side `aabb_scale` centered at (0.5,0.5,0.5)."""
        c = np.full(3, 0.5, np.float32)
        h = np.full(3, 0.5 * aabb_scale, np.float32)
        return BoundingBox(c - h, c + h)

    @property
    def center(self) -> np.ndarray:
        return 0.5 * (self.min + self.max)

    @property
    def diag(self) -> np.ndarray:
        return self.max - self.min

    def enlarged(self, other: "BoundingBox") -> "BoundingBox":
        return BoundingBox(np.minimum(self.min, other.min), np.maximum(self.max, other.max))

    def inflated(self, amount: float) -> "BoundingBox":
        return BoundingBox(self.min - amount, self.max + amount)

    # --- traced ops (work on jnp arrays, broadcast over [..., 3]) ---

    def contains(self, pos):
        return jnp.all((pos >= self.min) & (pos <= self.max), axis=-1)

    def relative_pos(self, pos):
        return (pos - self.min) / self.diag

    def ray_intersect(self, origin, direction, eps: float = 1e-12):
        """Slab test. Returns (tmin, tmax); miss iff tmin > tmax.

        Matches bounding_box.cuh semantics: tmin clamped to >= 0 is NOT done
        here (callers clamp); degenerate directions get +/-inf via safe
        reciprocal.
        """
        inv_d = 1.0 / jnp.where(jnp.abs(direction) < eps, jnp.where(direction < 0, -eps, eps), direction)
        t0 = (self.min - origin) * inv_d
        t1 = (self.max - origin) * inv_d
        tmin = jnp.max(jnp.minimum(t0, t1), axis=-1)
        tmax = jnp.min(jnp.maximum(t0, t1), axis=-1)
        return tmin, tmax


def ray_intersect_aabb(origin, direction, box_min, box_max, eps: float = 1e-12):
    """Slab test with traced box bounds (for per-object BVH boxes)."""
    inv_d = 1.0 / jnp.where(jnp.abs(direction) < eps, jnp.where(direction < 0, -eps, eps), direction)
    t0 = (box_min - origin) * inv_d
    t1 = (box_max - origin) * inv_d
    tmin = jnp.max(jnp.minimum(t0, t1), axis=-1)
    tmax = jnp.min(jnp.maximum(t0, t1), axis=-1)
    return tmin, tmax
