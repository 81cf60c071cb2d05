"""Thin-lens camera — vectorized port of the reference semantics.

Reproduces CudaTest/src/core/camera.h exactly: basis construction from
lookfrom/lookat/vup/vfov/aspect/aperture/focus_dist (camera.h:18-38) and
``get_ray(s, t)`` with defocus-disk sampling (camera.h:40-44).  Directions are
deliberately NOT normalized, matching the reference (several downstream quirks —
e.g. LambertShade's dot at render.h:80 — depend on that).

The camera is a frozen pytree so it can be passed straight into jit'ed render
functions; ``generate_rays`` maps over whole pixel/sample batches at once
instead of one thread per pixel.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import rng as _rng
from .rays import Rays

Array = jnp.ndarray


class Camera(NamedTuple):
    origin: Array            # lookfrom
    lower_left_corner: Array
    horizontal: Array
    vertical: Array
    x: Array                 # camera basis (camera.h:29-31)
    y: Array
    z: Array
    lens_radius: Array       # aperture / 2
    time0: Array             # MotionCamera shutter interval (camera.h:56-89);
    time1: Array             # time0 == time1 == 0 for the plain Camera


def make_camera(lookfrom, lookat, vup=(0.0, 1.0, 0.0), vfov: float = 40.0,
                aspect: float = 2.0, aperture: float = 0.0,
                focus_dist: float = 10.0, time0: float = 0.0,
                time1: float = 0.0) -> Camera:
    """camera.h:18-38. Defaults mirror the active scene config
    (createScene.h:160: lookfrom=(0,100,1000) lookat=(0,150,0) vfov=40 aperture=0)."""
    lookfrom = jnp.asarray(lookfrom, jnp.float32)
    lookat = jnp.asarray(lookat, jnp.float32)
    vup = jnp.asarray(vup, jnp.float32)

    lens_radius = jnp.float32(aperture / 2.0)
    theta = vfov * math.pi / 180.0
    half_height = math.tan(theta / 2.0)
    half_width = half_height * aspect

    origin = lookfrom
    z = (lookfrom - lookat) / jnp.linalg.norm(lookfrom - lookat)
    x = jnp.cross(vup, z)
    x = x / jnp.linalg.norm(x)
    y = jnp.cross(z, x)

    lower_left = (origin - half_width * focus_dist * x
                  - half_height * focus_dist * y - focus_dist * z)
    horizontal = 2.0 * half_width * focus_dist * x
    vertical = 2.0 * half_height * focus_dist * y
    return Camera(origin, lower_left, horizontal, vertical, x, y, z,
                  lens_radius, jnp.float32(time0), jnp.float32(time1))


def get_rays(camera: Camera, s: Array, t: Array, key: jax.Array) -> Rays:
    """camera.h:40-44 get_ray for batched (s, t) in [0,1].

    With aperture 0 (the active config) the defocus offset vanishes; we still
    draw the disk sample unconditionally to keep the computation branch-free.
    """
    kd, kt = jax.random.split(key)
    n = s.shape[0]
    rd = camera.lens_radius * _rng.random_in_unit_disk(kd, (n,))
    offset = camera.x * rd[..., 0:1] + camera.y * rd[..., 1:2]
    origin = camera.origin + offset
    direction = (camera.lower_left_corner
                 + s[..., None] * camera.horizontal
                 + t[..., None] * camera.vertical
                 - camera.origin - offset)
    # MotionCamera shutter sampling (camera.h:80-83); zero interval => time 0.
    time = camera.time0 + _rng.uniform(kt, (n,)) * (camera.time1 - camera.time0)
    return Rays(origin, direction, time)


def generate_pixel_rays(camera: Camera, width: int, height: int, samples: int,
                        key: jax.Array, pixel_index: Array | None = None) -> Rays:
    """Rays for `samples` jittered AA samples of each requested pixel.

    Mirrors render.h:115-117: u = (px + U())/nx, v = (py + U())/ny, with pixel
    (px, py) counted from the bottom-left (the PNG writer flips rows,
    render.h:135-147).  Returns a flat Rays batch of length n_pixels * samples,
    sample-major per pixel.

    pixel_index: optional int32[N] of flat pixel ids (y * width + x); defaults
    to all pixels.  Sharded renderers pass their tile's indices.
    """
    if pixel_index is None:
        pixel_index = jnp.arange(width * height, dtype=jnp.int32)
    px = (pixel_index % width).astype(jnp.float32)
    py = (pixel_index // width).astype(jnp.float32)
    px = jnp.repeat(px, samples)
    py = jnp.repeat(py, samples)
    n = px.shape[0]
    ku, kv, kr = jax.random.split(key, 3)
    u = (px + _rng.uniform(ku, (n,))) / float(width)
    v = (py + _rng.uniform(kv, (n,))) / float(height)
    return get_rays(camera, u, v, kr)
