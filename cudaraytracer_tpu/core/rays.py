"""Ray batches as SoA arrays.

Replaces the per-thread ``Ray`` value class (CudaTest/src/core/ray.h) with a
NamedTuple of batched arrays — a pytree that flows through jit/scan/shard_map.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

Array = jnp.ndarray


class Rays(NamedTuple):
    """origin f32[N,3], direction f32[N,3], time f32[N] (ray.h:7-21)."""

    origin: Array
    direction: Array
    time: Array

    @property
    def batch_shape(self):
        return self.origin.shape[:-1]

    def point_at(self, t: Array) -> Array:
        """ray.h:18 point_at_t — origin + t * direction."""
        return self.origin + t[..., None] * self.direction


def make_rays(origin: Array, direction: Array, time: Array | None = None) -> Rays:
    origin = jnp.asarray(origin, jnp.float32)
    direction = jnp.asarray(direction, jnp.float32)
    if time is None:
        time = jnp.zeros(origin.shape[:-1], jnp.float32)
    return Rays(origin, direction, jnp.asarray(time, jnp.float32))
