"""Sharded rendering over a ('dp', 'tp') device mesh via shard_map.

The TPU-native replacement for "one GPU renders everything": pixels are tiled
over 'dp', primitive tables are sharded over 'tp' (parallel/intersect.py), the
scene's small tables are replicated, and the framebuffer comes back as one
addressable array (XLA gathers shards — the multi-chip analog of the D2H copy
at render.h:226).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..config import RenderConfig
from ..core.camera import Camera
from ..models.scene import Scene, Spheres, Triangles
from ..ops.render import render_pixels
from . import intersect as tp_isect
from .mesh import pad_to_multiple

Array = jnp.ndarray


def _pad_rows_traced(x: Array, mult: int) -> Array:
    """pad_to_multiple's replicate-row-0 padding in traceable jnp ops
    (np.asarray on a tracer raises under jit; shapes are static anyway)."""
    n = x.shape[0]
    rem = (-n) % mult
    if rem == 0:
        return x
    return jnp.concatenate(
        [x, jnp.broadcast_to(x[:1], (rem,) + x.shape[1:])])


def shard_scene(scene: Scene, tp: int):
    """Pad sphere/triangle tables to a 'tp' multiple.  Returns the padded
    scene + true global counts (padding rows are masked by global index)."""
    n_s, n_t = scene.n_spheres, scene.n_triangles
    if tp == 1:
        return scene, n_s, n_t
    sph = scene.spheres
    tri = scene.triangles
    if n_s:
        sph = Spheres(*(_pad_rows_traced(x, tp) for x in sph))
    if n_t:
        tri = Triangles(*(_pad_rows_traced(x, tp) for x in tri))
    return scene._replace(spheres=sph, triangles=tri), n_s, n_t


def _strip_big_tables(padded_scene: Scene) -> Scene:
    """The replicated 'rest of the scene' operand must not carry a full copy
    of the (tp-sharded) sphere/triangle tables to every device — at the
    1M-triangle scale that replication alone defeats the HBM savings tp
    sharding exists for.  local() re-installs the real shards."""
    return padded_scene._replace(
        spheres=Spheres(*(x[:0] for x in padded_scene.spheres)),
        triangles=Triangles(*(x[:0] for x in padded_scene.triangles)))


def render_image_sharded(scene: Scene, camera: Camera, key: jax.Array,
                         cfg: RenderConfig, mesh: Mesh) -> Array:
    """Full-frame render with pixels over 'dp' and primitives over 'tp'.
    Returns f32[height, width, 3] (row 0 = bottom, as render_image).

    The mega-family engines do NOT tp-shard the primitive tables: the fused
    kernel runs its own closest-hit over whatever tables it sees and never
    calls the tp intersect combine, so a tp shard would silently render a
    1/tp slice of the scene (caught by the round-5 dryrun equality assert —
    each tp member returned a DIFFERENT half-scene image and out_specs
    picked one unchecked).  For 'mega'/'mega_diff' the tables are replicated
    and tp members render the same pixels redundantly — exact, and the
    engine's HBM answer at scale is its in-kernel streaming, not tp."""
    dp = mesh.shape["dp"]
    tp = 1 if cfg.engine in ("mega", "mega_diff") else mesh.shape["tp"]
    n_pix = cfg.width * cfg.height
    pixel_index = jnp.asarray(
        pad_to_multiple(np.arange(n_pix, dtype=np.int32), dp, fill=0))
    padded_scene, n_s_g, n_t_g = shard_scene(scene, tp)

    quirks = cfg.quirks

    def local(pixel_slice, sph, tri, rest_scene):
        scene_local = rest_scene._replace(spheres=sph, triangles=tri)
        tp_i = jax.lax.axis_index("tp")
        sphere_off = tp_i * sph.radius.shape[0]
        tri_off = tp_i * tri.mat.shape[0]

        def intersect_fn(s, rays, aux):
            return tp_isect.intersect_scene_tp(
                s, rays, "tp", sphere_off, tri_off, cfg.t_min, cfg.t_max,
                quirks, n_s_g, n_t_g)

        dp_i = jax.lax.axis_index("dp")
        lkey = jax.random.fold_in(key, dp_i)
        return render_pixels(scene_local, camera, lkey, cfg, pixel_slice,
                             intersect_fn if tp > 1 else None, None)

    rest = _strip_big_tables(padded_scene)
    scene_spec = jax.tree.map(lambda _: P(), rest)
    prim_spec = P("tp") if tp > 1 else P()
    sph_spec = jax.tree.map(lambda _: prim_spec, padded_scene.spheres)
    tri_spec = jax.tree.map(lambda _: prim_spec, padded_scene.triangles)

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P("dp"), sph_spec, tri_spec, scene_spec),
        out_specs=P("dp"),
        check_vma=False)
    out = fn(pixel_index, padded_scene.spheres, padded_scene.triangles, rest)
    return out[:n_pix].reshape(cfg.height, cfg.width, 3)


def render_image_sample_sharded(scene: Scene, camera: Camera, key: jax.Array,
                                cfg: RenderConfig, mesh: Mesh) -> Array:
    """Sample-parallel rendering: every 'dp' member renders ALL pixels with its
    own sample draws and the framebuffers are averaged with pmean — total
    effective spp = dp * cfg.samples.  This is how spp scales across chips
    without re-tiling the image; combine with 'tp' for primitive sharding.

    Gamma is applied AFTER the cross-member average (sqrt of the mean, not the
    mean of sqrts — matching a single-device render at the combined spp).

    As in render_image_sharded, the mega-family engines replicate the
    primitive tables instead of tp-sharding them (the fused kernel bypasses
    the tp intersect combine); tp members then compute identical
    framebuffers and the dp-pmean is unchanged.
    """
    import dataclasses
    dp = mesh.shape["dp"]
    tp = 1 if cfg.engine in ("mega", "mega_diff") else mesh.shape["tp"]
    # members must return UNCLIPPED linear radiance: clip-then-average loses
    # energy wherever a member's partial mean exceeds 1 (bright emitters);
    # gamma AND clip are applied once, after the pmean.
    cfg_lin = dataclasses.replace(cfg, gamma=False, clip=False)
    padded_scene, n_s_g, n_t_g = shard_scene(scene, tp)
    quirks = cfg.quirks

    def local(sph, tri, rest_scene):
        scene_local = rest_scene._replace(spheres=sph, triangles=tri)
        tp_i = jax.lax.axis_index("tp")
        sphere_off = tp_i * sph.radius.shape[0]
        tri_off = tp_i * tri.mat.shape[0]

        def intersect_fn(s, rays, aux):
            return tp_isect.intersect_scene_tp(
                s, rays, "tp", sphere_off, tri_off, cfg.t_min, cfg.t_max,
                quirks, n_s_g, n_t_g)

        member = jax.lax.axis_index("dp")
        lkey = jax.random.fold_in(key, member)
        cols = render_pixels(scene_local, camera, lkey, cfg_lin, None,
                             intersect_fn if tp > 1 else None, None)
        return jax.lax.pmean(cols, "dp")

    rest = _strip_big_tables(padded_scene)
    prim_spec = P("tp") if tp > 1 else P()
    sph_spec = jax.tree.map(lambda _: prim_spec, padded_scene.spheres)
    tri_spec = jax.tree.map(lambda _: prim_spec, padded_scene.triangles)
    scene_spec = jax.tree.map(lambda _: P(), rest)
    fn = shard_map(local, mesh=mesh,
                   in_specs=(sph_spec, tri_spec, scene_spec),
                   out_specs=P(), check_vma=False)
    out = fn(padded_scene.spheres, padded_scene.triangles, rest)
    if cfg.gamma:
        out = jnp.sqrt(jnp.maximum(out, 0.0))
    out = jnp.clip(out, 0.0, 1.0)
    return out.reshape(cfg.height, cfg.width, 3)


def render_image_sharded_jit(scene, camera, key, cfg, mesh):
    """jit-wrapped sharded render (compiles once per (cfg, mesh))."""
    fn = _cached_sharded(cfg, mesh)
    return fn(scene, camera, key)


_CACHE = {}


def _cached_sharded(cfg: RenderConfig, mesh: Mesh):
    k = (cfg, mesh)
    if k not in _CACHE:
        @jax.jit
        def fn(scene, camera, key):
            return render_image_sharded(scene, camera, key, cfg, mesh)
        _CACHE[k] = fn
    return _CACHE[k]
