"""Primitive-sharded ("tensor parallel") intersection.

Each 'tp' mesh member holds a shard of the sphere/triangle tables (rects and
material/texture tables are replicated — they are tiny).  Locally each member
runs the same brute-force candidate tests as ops/intersect.py on its shard,
then the closest hit is combined across the axis with min-reductions over ICI:

    t_min   = pmin(t_local)                      # nearest hit anywhere
    winner  = pmin(global_idx | t==t_min)        # first-prim tie-break,
                                                 # matching hitable_list.h:84
    attrs   = psum(local_attrs * is_winner)      # winner broadcasts its record

This is the scene-geometry analog of a sharded-matmul + all-reduce: compute on
the local shard, one collective to combine.  Every member returns the same
globally-consistent Hits, so shading runs replicated along 'tp'.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Quirks
from ..core.rays import Rays
from ..models.scene import Scene
from ..ops import intersect as _isect

Array = jnp.ndarray
# numpy scalar, NOT jnp: module-level device arrays route through the
# TPU tunnel at import time (CLAUDE.md)
_IDX_MISS = np.int32(2**31 - 1)


def intersect_scene_tp(scene_local: Scene, rays: Rays, axis_name: str,
                       sphere_offset: Array, tri_offset: Array,
                       t_min: float = 1e-3, t_max: float = float(_isect.BIG),
                       quirks: Quirks = Quirks(),
                       n_spheres_global: int = 0,
                       n_triangles_global: int = 0) -> _isect.Hits:
    """Closest hit over the full (sharded) scene, called inside shard_map.

    scene_local: Scene whose sphere/triangle tables are THIS member's shard
    (padding rows allowed — pad with duplicates of row 0 and give them global
    index >= n_*_global to mark invalid... padding duplicates row 0 of the
    LOCAL shard; they produce identical-t duplicate candidates that lose the
    first-wins tie-break, so results are unaffected).
    sphere_offset/tri_offset: scalar global index of this shard's first row.
    """
    n = rays.origin.shape[0]
    t_min_f = jnp.float32(t_min)
    t_max_f = jnp.float32(t_max)
    best_t = jnp.full((n,), _isect.BIG)
    best_gidx = jnp.full((n,), _IDX_MISS)
    best_lidx = jnp.zeros((n,), jnp.int32)   # local row of our best candidate

    n_s = scene_local.n_spheres
    n_t = scene_local.n_triangles
    n_r = scene_local.n_rects

    def reduce_local(best, cand_t, cand_valid, local_idx, global_idx):
        bt, bg, bl = best
        c = jnp.argmin(jnp.where(cand_valid, cand_t, _isect.BIG), axis=1)
        rows = jnp.arange(cand_t.shape[0])
        ct = cand_t[rows, c]
        cv = cand_valid[rows, c]
        cg = global_idx[c]
        cl = local_idx[c]
        take = cv & (ct < bt)
        return (jnp.where(take, ct, bt), jnp.where(take, cg, bg),
                jnp.where(take, cl, bl))

    if n_s:
        valid, t = _isect.sphere_candidates(
            rays.origin, rays.direction, scene_local.spheres.center,
            scene_local.spheres.radius, t_min_f, t_max_f)
        lidx = jnp.arange(n_s, dtype=jnp.int32)
        gidx = lidx + sphere_offset
        valid &= (gidx < n_spheres_global)[None, :]
        best_t, best_gidx, best_lidx = reduce_local(
            (best_t, best_gidx, best_lidx), t, valid,
            lidx, gidx)

    if n_t:
        tr = scene_local.triangles
        valid, t, _, _ = _isect.triangle_candidates(
            rays.origin, rays.direction, tr.v0, tr.v1, tr.v2, tr.normal,
            t_min_f, t_max_f, quirks)
        lidx = jnp.arange(n_t, dtype=jnp.int32)
        gidx = lidx + tri_offset + n_spheres_global
        valid &= ((lidx + tri_offset) < n_triangles_global)[None, :]
        best_t, best_gidx, best_lidx = reduce_local(
            (best_t, best_gidx, best_lidx), t, valid,
            lidx, gidx)

    member = jax.lax.axis_index(axis_name)
    if n_r:  # replicated rects: only tp member 0 contributes them
        valid, t, _, _, _, _ = _isect.rect_candidates(
            rays, scene_local.rects, t_min_f, t_max_f)
        valid &= (member == 0)
        lidx = jnp.arange(n_r, dtype=jnp.int32)
        gidx = lidx + n_spheres_global + n_triangles_global
        best_t, best_gidx, best_lidx = reduce_local(
            (best_t, best_gidx, best_lidx), t, valid,
            lidx, gidx)

    # replicated runtime-TRS tables (small, like rects): member 0 only
    n_ts = scene_local.n_t_spheres
    n_tt = scene_local.n_t_triangles
    base_t = n_spheres_global + n_triangles_global + n_r
    if n_ts:
        valid, t, _, _ = _isect.t_sphere_candidates(
            rays, scene_local.t_spheres, t_min_f, t_max_f)
        valid &= (member == 0)
        lidx = jnp.arange(n_ts, dtype=jnp.int32)
        gidx = lidx + base_t
        best_t, best_gidx, best_lidx = reduce_local(
            (best_t, best_gidx, best_lidx), t, valid,
            lidx, gidx)
    if n_tt:
        valid, t, _, _, _, _ = _isect.t_triangle_candidates(
            rays, scene_local.t_triangles, t_min_f, t_max_f, quirks)
        valid &= (member == 0)
        lidx = jnp.arange(n_tt, dtype=jnp.int32)
        gidx = lidx + base_t + n_ts
        best_t, best_gidx, best_lidx = reduce_local(
            (best_t, best_gidx, best_lidx), t, valid,
            lidx, gidx)

    # --- combine across the tp axis ---
    t_glob = jax.lax.pmin(best_t, axis_name)
    idx_cand = jnp.where(best_t == t_glob, best_gidx, _IDX_MISS)
    gidx_glob = jax.lax.pmin(idx_cand, axis_name)
    hit = gidx_glob != _IDX_MISS
    i_win = (best_gidx == gidx_glob) & hit

    # local record for our best candidate (only meaningful where i_win)
    # fold_dec=False: the psum combine below rebuilds Hits from explicit
    # fields and drops dec (mat ids are global; the bounce body re-decodes)
    local_hits = _isect.finalize_hits(
        scene_local, rays, best_t,
        _local_typed_index(best_gidx, best_lidx, scene_local,
                           n_spheres_global, n_triangles_global),
        t_min, t_max, quirks, fold_dec=False)

    def combine(x):
        masked = jnp.where(i_win[(...,) + (None,) * (x.ndim - 1)],
                           x, jnp.zeros_like(x))
        return jax.lax.psum(masked, axis_name)

    p = combine(local_hits.p)
    normal = combine(local_hits.normal)
    u = combine(local_hits.u)
    v = combine(local_hits.v)
    mat = combine(local_hits.mat.astype(jnp.int32))
    t_out = jnp.where(hit, t_glob, _isect.BIG)
    prim = jnp.where(hit, gidx_glob, -1)
    return _isect.Hits(hit, t_out, p, normal, u, v, mat, prim)


def _local_typed_index(best_gidx: Array, best_lidx: Array, scene_local: Scene,
                       n_sph_g: int, n_tri_g: int) -> Array:
    """Map our winning candidate to the LOCAL combined index space that
    finalize_hits expects ([0,S_local) spheres, [S_local, S+T) triangles,
    then rects, t_spheres, t_triangles), preserving the type implied by the
    global index (rect/t-tables are replicated, so local == global there)."""
    n_s = scene_local.n_spheres
    n_t = scene_local.n_triangles
    n_r = scene_local.n_rects
    n_ts = scene_local.n_t_spheres
    base_r = n_sph_g + n_tri_g
    is_sphere = best_gidx < n_sph_g
    is_tri = (best_gidx >= n_sph_g) & (best_gidx < base_r)
    is_rect = (best_gidx >= base_r) & (best_gidx < base_r + n_r)
    is_ts = (best_gidx >= base_r + n_r) & (best_gidx < base_r + n_r + n_ts)
    is_tt = (best_gidx >= base_r + n_r + n_ts) & (best_gidx != _IDX_MISS)
    idx = jnp.where(is_sphere, best_lidx, 0)
    idx = jnp.where(is_tri, best_lidx + n_s, idx)
    idx = jnp.where(is_rect, best_lidx + n_s + n_t, idx)
    idx = jnp.where(is_ts, best_lidx + n_s + n_t + n_r, idx)
    idx = jnp.where(is_tt, best_lidx + n_s + n_t + n_r + n_ts, idx)
    return jnp.where(best_gidx == _IDX_MISS, -1, idx)
