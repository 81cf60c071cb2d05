"""Counter-based RNG replacing per-pixel curand state.

The reference seeds one ``curandState`` per pixel (deviceManage.h:120-128, seed 0,
sequence = pixel index) and draws sequentially inside each thread.  On TPU we use
JAX's counter-based threefry generator: keys are *derived* from
(base_seed, pixel, sample, bounce) so any ray's stream is reproducible without
carrying mutable state — the idiomatic TPU replacement for a curand state array.

Samplers avoid the reference's rejection loops (camera.h:6-13, material.h
random_in_unit_sphere) because data-dependent loops serialize on TPU; we draw
from the same *distributions* analytically.  Streams therefore differ from
curand (they must — see SURVEY.md §7 hard part 3); deterministic comparisons
inject the sample sequence instead.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jnp.ndarray


def pixel_keys(key: jax.Array, n: int) -> jax.Array:
    """One key per ray/pixel; shape (n, 2) key array."""
    return jax.random.split(key, n)


def fold(key: jax.Array, *data: int) -> jax.Array:
    for d in data:
        key = jax.random.fold_in(key, d)
    return key


def uniform(key: jax.Array, shape=()) -> Array:
    """U[0,1) like curand_uniform (curand is (0,1]; distributional match)."""
    return jax.random.uniform(key, shape, dtype=jnp.float32)


def random_in_unit_sphere(key: jax.Array, shape=()) -> Array:
    """Uniform in the unit ball (material.h random_in_unit_sphere distribution).

    Analytic: direction from an isotropic gaussian, radius = u^(1/3).
    """
    kd, kr = jax.random.split(key)
    d = jax.random.normal(kd, shape + (3,), dtype=jnp.float32)
    d = d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-12)
    r = jax.random.uniform(kr, shape + (1,), dtype=jnp.float32) ** (1.0 / 3.0)
    return d * r


def random_in_unit_disk(key: jax.Array, shape=()) -> Array:
    """Uniform in the unit disk, z=0 (camera.h:6-13 distribution)."""
    ka, kr = jax.random.split(key)
    theta = jax.random.uniform(ka, shape + (1,), dtype=jnp.float32) * (2.0 * jnp.pi)
    r = jnp.sqrt(jax.random.uniform(kr, shape + (1,), dtype=jnp.float32))
    x = r * jnp.cos(theta)
    y = r * jnp.sin(theta)
    return jnp.concatenate([x, y, jnp.zeros_like(x)], axis=-1)


def unit_vector_sample(key: jax.Array, shape=()) -> Array:
    """Uniform direction on the unit sphere."""
    d = jax.random.normal(key, shape + (3,), dtype=jnp.float32)
    return d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-12)
