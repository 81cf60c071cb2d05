"""Texture table + vectorized evaluation.

Replaces the virtual ``Texture`` hierarchy (CudaTest/src/material/texture.h) with
a SoA table and a branch-free select.  Texture kinds:

  CONSTANT (texture.h:12-21): returns color0.
  CHECKER  (texture.h:25-42): sines = sin(10x) sin(10y) sin(10z) on the hit
           point; sines < 0 -> odd color (color1) else even color (color0).
           The reference's checker children are Texture*; in every usage they
           are ConstantTextures, so the table stores the two colors directly.
  IMAGE    (texture.h:54-76): nearest-texel fetch, i = u*nx,
           j = (1-v)*ny - 0.001, clamped; bytes / 255.

All images are packed into one ``uint8[n_images, max_h, max_w, 3]`` array with a
per-image (h, w) so lookups are static-shape gathers.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray

CONSTANT = 0
CHECKER = 1
IMAGE = 2


class TextureTable(NamedTuple):
    kind: Array      # int32[K]
    color0: Array    # f32[K,3]   constant color / checker 'even'
    color1: Array    # f32[K,3]   checker 'odd'
    image_id: Array  # int32[K]
    images: Array    # uint8[I, H, W, 3] (I >= 1; row 0 is a dummy)
    image_wh: Array  # int32[I, 2] = (w, h)


def eval_texture(tex: TextureTable, tex_id: Array, u: Array, v: Array,
                 p: Array) -> Array:
    """value(u, v, p) for a batch of texture ids -> f32[N,3]."""
    kind = tex.kind[tex_id]
    c0 = tex.color0[tex_id]
    c1 = tex.color1[tex_id]

    # CHECKER (texture.h:30-38)
    sines = jnp.sin(10.0 * p[..., 0]) * jnp.sin(10.0 * p[..., 1]) * jnp.sin(10.0 * p[..., 2])
    checker = jnp.where((sines < 0.0)[..., None], c1, c0)
    out = jnp.where((kind == CHECKER)[..., None], checker, c0)

    if tex.images.shape[0] == 1:
        # no image textures registered (row 0 is the builder's dummy, so
        # IMAGE kind cannot occur) — statically skip the per-lane texel
        # gather, which costs per INDEX even into the (1,1,1,3) dummy
        return out

    # IMAGE (texture.h:65-76)
    img = tex.image_id[tex_id]
    wh = tex.image_wh[img]
    nx = wh[..., 0].astype(jnp.float32)
    ny = wh[..., 1].astype(jnp.float32)
    i = (u * nx).astype(jnp.int32)
    j = ((1.0 - v) * ny - 0.001).astype(jnp.int32)
    i = jnp.clip(i, 0, wh[..., 0] - 1)
    j = jnp.clip(j, 0, wh[..., 1] - 1)
    texel = tex.images[img, j, i].astype(jnp.float32) / 255.0
    return jnp.where((kind == IMAGE)[..., None], texel, out)


def image_texel(tex: TextureTable, tex_id: Array, u: Array, v: Array) -> Array:
    """The IMAGE branch of eval_texture alone (texture.h:65-76): nearest
    texel at (u, v), bytes / 255 — used by the megakernel's deferred-
    texturing pass, which needs only the image factor (constant/checker are
    already evaluated in-kernel).  Must stay line-identical to the IMAGE
    part of eval_texture."""
    img = tex.image_id[tex_id]
    wh = tex.image_wh[img]
    nx = wh[..., 0].astype(jnp.float32)
    ny = wh[..., 1].astype(jnp.float32)
    i = (u * nx).astype(jnp.int32)
    j = ((1.0 - v) * ny - 0.001).astype(jnp.int32)
    i = jnp.clip(i, 0, wh[..., 0] - 1)
    j = jnp.clip(j, 0, wh[..., 1] - 1)
    return tex.images[img, j, i].astype(jnp.float32) / 255.0


class TextureBuilder:
    """Host-side accumulation of textures into a TextureTable."""

    def __init__(self):
        self._kind = []
        self._c0 = []
        self._c1 = []
        self._img = []
        self._images = []

    def constant(self, color) -> int:
        self._kind.append(CONSTANT)
        self._c0.append(np.asarray(color, np.float32))
        self._c1.append(np.zeros(3, np.float32))
        self._img.append(0)
        return len(self._kind) - 1

    def checker(self, even, odd) -> int:
        self._kind.append(CHECKER)
        self._c0.append(np.asarray(even, np.float32))
        self._c1.append(np.asarray(odd, np.float32))
        self._img.append(0)
        return len(self._kind) - 1

    def image(self, pixels: np.ndarray) -> int:
        """pixels: uint8[H, W, 3]."""
        pixels = np.asarray(pixels, np.uint8)
        assert pixels.ndim == 3 and pixels.shape[-1] == 3
        self._kind.append(IMAGE)
        self._c0.append(np.zeros(3, np.float32))
        self._c1.append(np.zeros(3, np.float32))
        self._images.append(pixels)
        self._img.append(len(self._images))  # slot 0 is the dummy
        return len(self._kind) - 1

    def image_from_png(self, path: str) -> int:
        """ImageTexture from a PNG file (stb_image analog for our writer's
        output; 8-bit RGB/RGBA, alpha dropped)."""
        from ..utils.image import read_png
        return self.image(read_png(path)[..., :3])

    def build(self) -> TextureTable:
        k = max(len(self._kind), 1)
        kind = np.zeros(k, np.int32)
        c0 = np.zeros((k, 3), np.float32)
        c1 = np.zeros((k, 3), np.float32)
        img = np.zeros(k, np.int32)
        if self._kind:
            kind[:] = self._kind
            c0[:] = np.stack(self._c0)
            c1[:] = np.stack(self._c1)
            img[:] = self._img
        max_h = max([1] + [im.shape[0] for im in self._images])
        max_w = max([1] + [im.shape[1] for im in self._images])
        images = np.zeros((1 + len(self._images), max_h, max_w, 3), np.uint8)
        image_wh = np.ones((1 + len(self._images), 2), np.int32)
        for n, im in enumerate(self._images):
            images[n + 1, :im.shape[0], :im.shape[1]] = im
            image_wh[n + 1] = (im.shape[1], im.shape[0])
        return TextureTable(jnp.asarray(kind), jnp.asarray(c0), jnp.asarray(c1),
                            jnp.asarray(img), jnp.asarray(images),
                            jnp.asarray(image_wh))
