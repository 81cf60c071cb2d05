"""Render driver — the ``render`` megakernel (render.h:105-129) as a jitted,
chunked wavefront pass.

Where the reference assigns one CUDA thread per pixel and loops samples
sequentially (render.h:115-122), here all pixel×sample rays form one flat batch
processed in fixed-size chunks via ``lax.map`` (sequential over chunks to bound
memory, fully vectorized within a chunk).  Per-pixel RNG comes from a
counter-based key (core/rng.py) instead of a curandState array.

Postprocess parity: col /= samples; sqrt gamma; clip to [0,1]
(render.h:123-128, vec3.h:119-131).

Acceleration is pluggable via (intersect_fn, aux): ``bvh_intersector`` swaps
the brute-force closest-hit for FlatBVH traversal, with the BVH flowing as a
traced pytree so per-frame refits reuse the compiled executable.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..config import RenderConfig
from ..core import camera as _cam
from ..models.scene import Scene
from . import intersect as _isect
from .integrators import integrate

Array = jnp.ndarray


def _bvh_intersect(cfg: RenderConfig):
    def fn(scene, rays, bvh):
        return _isect.intersect_scene_bvh(scene, rays, bvh, cfg.t_min,
                                          cfg.t_max, cfg.quirks)
    return fn


_BVH_FN_CACHE = {}


def bvh_intersector(cfg: RenderConfig):
    """Stable (per-config) intersect_fn using FlatBVH traversal; pass the
    FlatBVH as ``aux``.  Cached by config so jit sees the same callable across
    frames."""
    if cfg not in _BVH_FN_CACHE:
        _BVH_FN_CACHE[cfg] = _bvh_intersect(cfg)
    return _BVH_FN_CACHE[cfg]


_PALLAS_FN_CACHE = {}


def pallas_intersector(cfg: RenderConfig, coherent: bool = False):
    """Stable intersect_fn using the fused Pallas sweep kernels (TPU fast
    path; runs interpreted on CPU).  coherent=True additionally culls the
    sphere sweep with chunk boxes (use for primary-ray-only work)."""
    k = (cfg, coherent)
    if k not in _PALLAS_FN_CACHE:
        # cfg.wavefront_sphere_cull='morton': the intersector itself uses
        # the plain 'all' culling policy and ADVERTISES morton_spheres —
        # trace_path sees the flag and permutes the scene's sphere block
        # into Morton order ONCE per trace, which is what makes the
        # every-bounce chunk culling fire (and costs no per-ray id remap).
        mode = cfg.wavefront_sphere_cull
        if mode not in ("morton", "primary", "off"):
            raise ValueError(
                f"wavefront_sphere_cull={mode!r}: expected 'morton', "
                "'primary', or 'off'")
        policy = {"morton": "all"}.get(mode, mode)

        def fn(scene, rays, aux, alive=None, _cfg=cfg, _coh=coherent,
               _policy=policy):
            # alive: dead-tile early-out mask threaded by the path
            # integrator's scan (see intersect_scene_pallas)
            return _isect.intersect_scene_pallas(
                scene, rays, _cfg.t_min, _cfg.t_max, _cfg.quirks, _coh,
                alive, sphere_cull=_policy,
                kernel_attrs=_cfg.wavefront_kernel_attrs,
                # the 'normal' debug integrator never reads materials —
                # skip the dec-column folding so its winner rows stay
                # narrow (finalize_hits fold_dec)
                fold_dec=_cfg.integrator != "normal")
        fn.morton_spheres = mode == "morton"
        _PALLAS_FN_CACHE[k] = fn
    return _PALLAS_FN_CACHE[k]


def pallas_intersector_pair(cfg: RenderConfig):
    """(primary_fn, bounce_fn): culled sweeps for the coherent camera pass,
    uncull'd sphere sweep for incoherent bounces.  Pass the pair as
    `intersect_fn` — the path integrator unrolls the first bounce with
    primary_fn and scans the rest with bounce_fn."""
    return (pallas_intersector(cfg, coherent=True),
            pallas_intersector(cfg, coherent=False))


def _swizzled_pixels(width: int, height: int, block_w: int = 32,
                     block_h: int = 16):
    """Pixel indices reordered into (block_h x block_w) screen tiles.

    Consecutive rays then form compact screen-space frustums, which is what
    makes the Pallas kernels' tiled AABB culling effective (a row-major order
    would give each 4096-ray tile a frustum spanning the whole image width).
    Returns int32[width*height] (a permutation)."""
    import numpy as np
    ys, xs = np.mgrid[0:height, 0:width]
    order = np.lexsort((xs.ravel() % block_w, ys.ravel() % block_h,
                        xs.ravel() // block_w, ys.ravel() // block_h))
    return jnp.asarray((ys.ravel()[order] * width + xs.ravel()[order])
                       .astype(np.int32))


@partial(jax.jit, static_argnames=("cfg", "intersect_fn"))
def render_image(scene: Scene, camera: _cam.Camera, key: jax.Array,
                 cfg: RenderConfig, intersect_fn=None, aux=None) -> Array:
    """Render the full frame -> f32[height, width, 3] (row 0 = BOTTOM row,
    matching colorBuffer layout; the PNG writer flips, render.h:135-147).

    Pixels are processed in swizzled screen blocks (see _swizzled_pixels) and
    scattered back to row-major order."""
    pix = _swizzled_pixels(cfg.width, cfg.height)
    colors = render_pixels(scene, camera, key, cfg, pix, intersect_fn, aux)
    out = jnp.zeros((cfg.width * cfg.height, 3), colors.dtype)
    out = out.at[pix].set(colors)
    return out.reshape(cfg.height, cfg.width, 3)


def render_pixels(scene: Scene, camera: _cam.Camera, key: jax.Array,
                  cfg: RenderConfig, pixel_index: Array | None = None,
                  intersect_fn=None, aux=None) -> Array:
    """Render a set of pixels (default: all) -> f32[n_pixels, 3].

    Sharded/tiled renderers call this with their tile's flat pixel indices.
    """
    if pixel_index is None:
        pixel_index = jnp.arange(cfg.width * cfg.height, dtype=jnp.int32)
    n_pix = pixel_index.shape[0]
    pix_chunk = max(1, min(cfg.ray_chunk // max(cfg.samples, 1), n_pix))
    n_chunks = -(-n_pix // pix_chunk)
    pad = n_chunks * pix_chunk - n_pix
    padded = jnp.concatenate([pixel_index, jnp.zeros((pad,), jnp.int32)]) if pad \
        else pixel_index
    chunked = padded.reshape(n_chunks, pix_chunk)

    def do_chunk(args):
        chunk_id, pix = args
        ckey = jax.random.fold_in(key, chunk_id)
        kray, kshade = jax.random.split(ckey)
        rays = _cam.generate_pixel_rays(camera, cfg.width, cfg.height,
                                        cfg.samples, kray, pix)
        cols = integrate(scene, rays, kshade, cfg, intersect_fn, aux)
        cols = cols.reshape(pix_chunk, cfg.samples, 3)
        return jnp.mean(cols, axis=1)          # render.h:123 col /= ns

    if n_chunks == 1:
        out = do_chunk((jnp.int32(0), chunked[0]))
    else:
        out = jax.lax.map(do_chunk,
                          (jnp.arange(n_chunks, dtype=jnp.int32), chunked))
        out = out.reshape(n_chunks * pix_chunk, 3)
    out = out[:n_pix] if pad else out.reshape(-1, 3)

    if cfg.gamma:
        # render.h:124-126 sqrt gamma (radiance clamped at 0 first so the
        # 'normal' debug integrator can't produce NaN; clip follows anyway).
        # Double-where keeps d(sqrt)/du finite at exactly-zero pixels (fully
        # absorbed paths under Quirks.fixed()) for the differentiable path.
        pos = out > 0.0
        out = jnp.where(pos, jnp.sqrt(jnp.where(pos, out, 1.0)), 0.0)
    if not cfg.clip:        # sample-sharding: members return linear radiance
        return out
    return jnp.clip(out, 0.0, 1.0)             # render.h:128 clip()
