"""TRS transforms with the reference's exact ray/AABB semantics.

CudaTest/src/hitable/transform.h stores position, Euler rotation (degrees), and
scale as three vec3 and transforms the *ray* into object space:
``TransformRay = Translate(Rotate(Scale(ray)))`` (transform.h:11-14) where

  ScaleRay   (transform.h:50-54): dir' = unit(dir / scale); time' = time * |dir/scale|
             — the origin is NOT scaled (a reference quirk, kept verbatim).
  RotateRay  (transform.h:45-49): rotate origin and dir by the Euler angles
             (vec3.h:200-217 matrix, including its negated-Z quirk).
  TranslateRay (transform.h:40-43): origin' = origin - position.

``transform_aabb`` mirrors TransformAABB (transform.h:22-31): rotate min/max
corners, re-sort, translate (no scale — another reference quirk).

The active pipeline uses identity transforms everywhere (createScene.h:183), so
scene builders bake transforms into primitives on the host; these functions
exist for rectangle intersection (object-space unit rect) and for full parity.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ..core import vec as v3
from ..core.rays import Rays

Array = jnp.ndarray


class TRS(NamedTuple):
    position: Array  # f32[...,3]
    rotation: Array  # f32[...,3] Euler degrees
    scale: Array     # f32[...,3]


def identity(batch_shape=()) -> TRS:
    z = jnp.zeros(batch_shape + (3,), jnp.float32)
    return TRS(z, z, jnp.ones(batch_shape + (3,), jnp.float32))


def transform_ray(t: TRS, rays: Rays) -> Rays:
    """transform.h:11-14 — Scale then Rotate then Translate."""
    # ScaleRay (transform.h:50-54)
    d = rays.direction / t.scale
    dlen = v3.length(d)
    d = d / dlen[..., None]
    time = rays.time * dlen
    # RotateRay (transform.h:45-49)
    o = v3.rotate(rays.origin, t.rotation)
    d = v3.rotate(d, t.rotation)
    # TranslateRay (transform.h:40-43)
    o = o - t.position
    return Rays(o, d, time)


def rotate_normal(t: TRS, normal: Array) -> Array:
    """hitable.h:36 — the returned normal is rotated by the object rotation."""
    return v3.rotate(normal, t.rotation)


def transform_aabb(t: TRS, box_min: Array, box_max: Array):
    """transform.h:22-31 — rotate both corners, min/max-sort, translate."""
    rmin = v3.rotate(box_min, t.rotation)
    rmax = v3.rotate(box_max, t.rotation)
    lo = jnp.minimum(rmin, rmax) + t.position
    hi = jnp.maximum(rmin, rmax) + t.position
    return lo, hi


def bake_points(t_position, t_rotation, t_scale, points: np.ndarray) -> np.ndarray:
    """Host-side forward TRS applied to points: scale, rotate^-1, translate.

    Used by scene builders to bake mesh/sphere transforms so the hot path stays
    transform-free.  The reference's ray rotation maps world->object with
    R(rotation); the forward point map is its transpose.

    NOTE — deliberately STANDARD TRS semantics (x = R^T @ (s*y) + pos:
    translation in WORLD space, geometry truly scaled), which is what a
    builder user expects.  The runtime-TRS primitives instead reproduce the
    reference TransformRay chain verbatim (o' = R@o - pos: translation in
    the ROTATED frame, and ScaleRay never scales the origin — transform.h
    quirks, oracle-pinned).  The two agree for rotation-only or
    translation-only transforms; a combined rotation+translation (or any
    scale) places the object differently by construction.  Pick baked for
    intuitive placement, runtime-TRS for reference parity.
    """
    pts = np.asarray(points, np.float32) * np.asarray(t_scale, np.float32)
    R = np.asarray(v3.rotation_matrix_euler_deg(jnp.asarray(t_rotation, jnp.float32)))
    pts = pts @ R  # x_world = R^T @ x_obj  ==  x_obj @ R (row-vector form)
    return pts + np.asarray(t_position, np.float32)
