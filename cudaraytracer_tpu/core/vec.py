"""Batched 3-vector math on ``f32[..., 3]`` arrays.

TPU-native replacement for the reference's ``vec3`` class
(CudaTest/src/core/vec3.h).  Where the reference carries one ``vec3`` per CUDA
thread, here every function maps over arbitrary leading batch axes, so the same
code path serves one ray or a million.  All functions are jit/vmap/grad
compatible.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

Array = jnp.ndarray


def vec3(x, y, z, dtype=jnp.float32) -> Array:
    """Build an f32[..., 3] from components (broadcasting)."""
    return jnp.stack(jnp.broadcast_arrays(
        jnp.asarray(x, dtype), jnp.asarray(y, dtype), jnp.asarray(z, dtype)), axis=-1)


def dot(a: Array, b: Array) -> Array:
    """vec3.h:109 — returns f32[...] (no keepdims)."""
    return jnp.sum(a * b, axis=-1)


def vdot(a: Array, b: Array) -> Array:
    """dot with keepdims, convenient for throughput math."""
    return jnp.sum(a * b, axis=-1, keepdims=True)


def cross(a: Array, b: Array) -> Array:
    """vec3.h:113."""
    return jnp.cross(a, b)


def length(v: Array) -> Array:
    return jnp.sqrt(dot(v, v))


def squared_length(v: Array) -> Array:
    return dot(v, v)


def unit_vector(v: Array) -> Array:
    """vec3.h:191 — v / |v| (no epsilon, like the reference)."""
    return v / length(v)[..., None]


def normalize_safe(v: Array, eps: float = 1e-20) -> Array:
    """Gradient-safe normalize (avoids NaN at |v|=0 in backward passes)."""
    n2 = jnp.maximum(dot(v, v), eps)
    return v * jnp.sqrt(1.0 / n2)[..., None]


def lerp(t, a: Array, b: Array) -> Array:
    """vec3.h:196 — from + t*(to-from); a scalar-per-vector t broadcasts
    over the component axis.  Trailing axes are added until t aligns with
    a's BATCH axes — a single [..., None] would right-align a deep-batched
    t against the wrong (inner) axis."""
    t = jnp.asarray(t)
    a = jnp.asarray(a)
    while t.ndim < a.ndim:
        t = t[..., None]
    return a + t * (b - a)


def clip01(v: Array) -> Array:
    """vec3.h:119-131 clip to [0,1]."""
    return jnp.clip(v, 0.0, 1.0)


def minvec(a: Array, b: Array) -> Array:
    return jnp.minimum(a, b)


def maxvec(a: Array, b: Array) -> Array:
    return jnp.maximum(a, b)


def rotation_matrix_euler_deg(rotation: Array) -> Array:
    """The exact rotation of vec3.h:200-217 as a row matrix ``R[..., 3, 3]``.

    The reference rotates a vector as out[i] = dot(v, R_row_i); note the
    negated Z angle (vec3.h:206) is reproduced verbatim.
    """
    rotation = jnp.asarray(rotation, jnp.float32)
    k = math.pi / 180.0
    rx = k * rotation[..., 0]
    ry = k * rotation[..., 1]
    rz = -k * rotation[..., 2]
    sx, cx = jnp.sin(rx), jnp.cos(rx)
    sy, cy = jnp.sin(ry), jnp.cos(ry)
    sz, cz = jnp.sin(rz), jnp.cos(rz)
    row0 = jnp.stack([cy * cz, -cy * sz, sy], axis=-1)
    row1 = jnp.stack([sx * sy * cz + cx * sz, -sx * sy * sz + cx * cz, -sx * cy], axis=-1)
    row2 = jnp.stack([-cx * sy * cz + sx * sz, cx * sy * sz + sx * cz, cx * cy], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def rotate(v: Array, rotation: Array) -> Array:
    """Euler rotate matching vec3.h:200-217 (degrees, negated-Z quirk)."""
    R = rotation_matrix_euler_deg(rotation)
    return jnp.einsum("...ij,...j->...i", R, v)


def slerp(a: Array, b: Array, t) -> Array:
    """vec3.h:219-232 — spherical lerp with magnitude lerp."""
    na = unit_vector(a)
    nb = unit_vector(b)
    theta = jnp.arccos(jnp.clip(dot(na, nb), -1.0, 1.0))
    sin_theta = jnp.sin(theta)
    t = jnp.asarray(t, jnp.float32)
    sin_from = jnp.sin((1.0 - t) * theta)
    sin_to = jnp.sin(t * theta)
    mag = (length(b) - length(a)) * t + length(a)
    direction = (sin_from[..., None] * na + sin_to[..., None] * nb) / sin_theta[..., None]
    return mag[..., None] * direction


def reflect(v: Array, n: Array) -> Array:
    """material.h reflect — v - 2 dot(v,n) n."""
    return v - 2.0 * vdot(v, n) * n


def refract(v: Array, n: Array, ni_over_nt: Array):
    """material.h refract — returns (ok_mask, refracted).

    refracted = ni/nt (uv - n dt) - n sqrt(disc) where uv = unit(v),
    dt = dot(uv, n), disc = 1 - (ni/nt)^2 (1 - dt^2); ok iff disc > 0.
    """
    uv = unit_vector(v)
    dt = vdot(uv, n)
    ni_over_nt = jnp.asarray(ni_over_nt)
    if ni_over_nt.ndim < uv.ndim:
        ni_over_nt = ni_over_nt[..., None]
    disc = 1.0 - ni_over_nt * ni_over_nt * (1.0 - dt * dt)
    ok = disc[..., 0] > 0.0
    # double-where keeps the backward pass NaN-free when disc <= 0
    disc_safe = jnp.where(disc > 0.0, disc, 1.0)
    sq = jnp.where(disc > 0.0, jnp.sqrt(disc_safe), 0.0)
    refracted = ni_over_nt * (uv - n * dt) - n * sq
    return ok, refracted


def schlick(cosine: Array, ref_idx: Array) -> Array:
    """material.h schlick approximation."""
    r0 = (1.0 - ref_idx) / (1.0 + ref_idx)
    r0 = r0 * r0
    return r0 + (1.0 - r0) * jnp.power(jnp.maximum(1.0 - cosine, 0.0), 5.0)
