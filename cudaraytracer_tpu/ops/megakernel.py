"""Fused path-tracing megakernel — the whole bounce loop in ONE Pallas call.

The reference's entire hot path is a single CUDA kernel per frame
(render.h:105-129: per-thread sample loop -> recursive shade -> BVH/list
intersection -> material scatter, all in registers).  Round 1 decomposed that
into per-bounce Pallas sweeps plus XLA glue (RNG, material scatter, winner
gathers), and measured ~84% of frame time in the glue.  This module restores
the reference's structure TPU-natively: one ``pallas_call`` runs intersection
AND shading AND the full bounce loop for a (32 x 128)-ray tile entirely in
VMEM/registers — HBM traffic is one read of the camera rays and one write of
the radiance.

Design notes (see also ops/pallas_intersect.py, whose sweep math this reuses):

  * Primitive tables are laid out (prims, 128) with COMPONENTS ON LANES —
    component k of a PRIM_CHUNK-sized chunk is the static-lane slice
    ``tbl[pl.ds(base, P), k:k+1]`` reshaped to (P,1,1) and broadcast against
    the (1, R, L) ray tile.  Static lane indices are Mosaic-legal (dynamic
    ones are not) and the layout costs 512 B/prim of VMEM vs. the 10.7 KB/prim
    of a (comp, prims, 1) table, lifting the in-VMEM ceiling to ~8k prims per
    type.
  * Because shading happens in-kernel, the sweep cannot defer winner-attribute
    lookup to a host-side gather (dynamic per-lane gathers are impossible on
    the VPU).  Instead each chunk merge carries the winner's attributes
    (geometry + material parameters) via an exclusive winner mask — and the
    attribute extraction only runs when the chunk actually improved some lane
    (``lax.cond`` on ``any(take)``), which for coherent tiles is rare after
    the first chunks.
  * Per-chunk AABB culling (one slab test per chunk x tile) skips whole
    chunks, exactly as in the round-1 culled sweeps.
  * RNG: ``pltpu.prng_seed``/``prng_random_bits`` per tile (seeded from
    (base_seed, program_id)); the unit-ball sample uses Box-Muller + cbrt
    radius, the same distribution as core/rng.random_in_unit_sphere.  On CPU
    (interpret mode) the TPU PRNG doesn't lower, so the wrapper falls back to
    INJECTED samples drawn outside with the exact threefry stream of the jnp
    integrator — which makes megakernel-vs-trace_path a deterministic golden
    test, and doubles as the sample-sequence-injection parity mode
    (SURVEY.md §7 hard part 3).
  * Bounce recursion is a ``fori_loop`` of max_depth+1 steps (render.h:48-67
    semantics: emitted + attenuation * recurse; ambient 0.1 on absorption;
    sky on miss), with a tile-level early-out once every lane has terminated.
  * Scope: spheres + triangles, all four materials, constant/checker
    textures, and all THREE integrators — the path tracer's full bounce loop,
    plus the single-intersect LambertShade (the reference's active
    integrator, render.h:70-87) and shade_normal.  Rects AND runtime-TRS
    spheres/triangles run in-kernel too (chunked table sweeps through the
    reference TransformRay chain — trs_ray_chunk / _trs_table_sweep; up to
    MAX_TRS_PRIMS per class since round 5).  Scenes
    with image textures render fused through DEFERRED texturing
    (trace_path_mega_tex: the kernel dumps per-bounce winner/term/hit-point
    planes — want_tex — and a light XLA pass multiplies the texel factors
    back in).  The kernel is
    forward-only but can RECORD each bounce's winning primitive id
    (want_winners); engine='mega_diff' differentiates by replaying those
    winners through ops/integrators.trace_path — see trace_path_mega_diff.

Material/texture/shade math mirrors models/materials.py and
ops/integrators.py line for line (same reference citations apply).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import RenderConfig
from ..core.rays import Rays
from ..models import materials as _mat
from ..models import textures as _tex
from ..models.scene import Scene
from .intersect import BIG, TRI_EPSILON
from .pallas_intersect import (LANES, PRIM_CHUNK, TILE_ROWS, _interpret,
                               _pad_rays, _ray_rows, morton_order)

Array = jnp.ndarray

IDX_BIG = 2 ** 30
# t >= this => miss.  Documented divergence: with the default t_max=FLT_MAX
# a pathological ray (|d| ~< 1e-33) can carry a "valid" hit with t in
# [1e37, t_max) — the wavefront path counts it, the kernel calls it sky.
# The margin below the BIG sentinel is deliberate (fp headroom).
BIG_CUT = 1e37
# In-VMEM table ceiling per primitive type: (prims, 128) f32 = 512 B/prim.
MAX_VMEM_PRIMS = 8192
# Above the VMEM ceiling, TRIANGLE tables stay in HBM and stream through a
# VMEM scratch segment by in-kernel DMA; a per-SEGMENT AABB test (the
# top-level structure) skips the DMA *and* the math for unreachable segments.
SEG_T = 2048              # triangles per streamed segment (1 MB scratch)
SUPER_T = 256             # middle cull level: one box per 16 chunks
# spheres switch to the two-level cull only above this count: at the
# headline scale (~500) the super layer measured a ~2% net LOSS on v5e
# (the chunk-slab floor is not the bottleneck there and SUPER_T padding
# adds chunks); at thousands of spheres the slab floor dominates.
SPH_SUPER_MIN = 1024
MAX_STREAM_PRIMS = 1 << 20
# Rect / runtime-TRS prims per class in the fused engine (round 5: the
# r1-r4 cap was 64, set by the then-unrolled per-row sweeps' compile
# cost; the chunked table sweeps lift it to a VMEM budget — 1024 rows x
# 512 B = 0.5 MB per class on top of the sphere/tri tables).  The
# wavefront engine still serves any count beyond this.
MAX_TRS_PRIMS = 1024
# Scenes at least this many triangles (HBM-streamed, far above the VMEM
# ceiling) default to inter-phase octant compaction in integrate() when
# cfg.compact_auto: measured 1.67x at 124k tris, a loss below ~VMEM scale.
AUTO_COMPACT_TRIS = 1 << 16
# Octant-compaction key layout (trace_path_mega_phased): Morton bits above
# this shift form the coarse origin cell (18 -> 4 bits/axis, a 16^3 grid),
# then 3 direction-octant bits, then fine Morton.  Module-level so
# experiments can sweep the cell granularity.
_OCT_COARSE_SHIFT = 18
# Lane-chunk size of _deferred_texture_radiance's lax.map pass (a per-lane
# row gather materializes (8,128)-tiled — ~19 GB unchunked at full-frame
# scale).  Round-5 re-sweep UNDER the dead-chunk skip (docs/experiments/
# tex_compact.py, tex bunny 1280x720x8): 2^13 0.485s / 2^14 0.551 /
# 2^15 0.452 / 2^16 0.628 / 2^17 0.916 / 2^18 0.943 — finer chunks win
# once sky chunks skip cheaply (the r4 sweep that picked 2^18 never
# measured below it and predates the skip).  Under the round-5 PER-STEP
# skip the optimum moves finer still (docs/experiments/tex_step_skip.py:
# 2^13 0.375 / 2^14 0.440 / 2^15 0.434 — smaller cells = more all-dead
# (step, chunk) cells, 61% skippable at 2^13 vs 49% at 2^15).
# Module-level so tests can shrink it to exercise the pad + reassembly
# path on CPU.
_TEX_CHUNK = 1 << 13

# Sphere table lanes: geometry 0..4, material 5..13.
S_CX, S_CY, S_CZ, S_R2, S_INVR = 0, 1, 2, 3, 4
S_MAT = 5
# Triangle table lanes: geometry 0..11 (v0, e1, e2, n), material 12..20.
T_V0, T_E1, T_E2, T_N = 0, 3, 6, 9
T_MAT = 12
# Material lane block (offset from S_MAT / T_MAT / R_MAT):
#   +0 kind, +1 tex kind, +2 aux (metal fuzz | dielectric ref_idx),
#   +3..5 color0 (albedo / emit), +6..8 color1 (checker odd)
N_MAT_COMPS = 9
# Rect table lanes: normal sign, position, scale, row-major rotation matrix,
# pre-rotated world normal, material block.
R_SGN, R_POS, R_SCL, R_ROT, R_NRM, R_MAT = 0, 1, 4, 7, 16, 19
# Runtime-TRS sphere table lanes (sphere.h on the TransformRay'd ray —
# origin-centered object-space sphere whose Transform position is the
# center): position, scale, row-major rotation, r^2, 1/r, material block.
TS_POS, TS_SCL, TS_ROT, TS_R2, TS_INVR, TS_MAT = 0, 3, 6, 15, 16, 17
# Runtime-TRS triangle table lanes: object-space v0/e1/e2, object-space
# stored normal (backface quirk operand), pre-rotated world normal,
# position, scale, row-major rotation, material block.
TT_V0, TT_E1, TT_E2, TT_NOBJ, TT_NW, TT_POS, TT_SCL, TT_ROT, TT_MAT = (
    0, 3, 6, 9, 12, 15, 18, 21, 30)

# --- MXU triangle sweep (cfg.mega_mxu, streamed scenes) ---
# Every Moller-Trumbore quantity is bilinear in 10 per-ray features
# Phi = [d, o, c = d x o, 1] (lanes 0..9 of the feature planes), so one
# (N_Q*SUPER_T, 10) @ (10, 128) matmul per sublane row computes all
# candidates of a super against the row's rays on the MXU (measured 1.85x
# the VPU sweep incl. epilogue — docs/experiments/mxu_determinants.py).
# tri_coef row layout: per super u, N_Q blocks of SUPER_T rows
# [a | t_num | u_num | v_num | d.n], lanes 0..9 = coefficients:
#   a     = -d.n2            (n2 = e1 x e2)
#   t_num =  o.n2 - v0.n2
#   u_num =  d.(v0 x e2) - c.e2
#   v_num = -d.(v0 x e1) + c.e1
#   d.n   =  d.n_stored      (backface quirk; sliced off under fixed quirks)
N_FEAT = 10
N_Q = 5


class MegaTables(NamedTuple):
    """Device-side packed tables; built per frame inside jit (cheap gathers),
    so skinned vertex updates flow without recompilation.  Array-only pytree
    (prim counts come from the Scene's static shapes) so it can flow through
    jit as an operand."""

    sph: Array       # f32[S_pad, 128]
    sph_box: Array   # f32[S_chunks_pad, 128] lanes 0..5 = lo.xyz, hi.xyz
    sph_super: Array  # f32[S_supers_pad, 128] per-SUPER_T middle-level boxes
    sph_seg: Array   # f32[S_segs_pad, 128] per-SEG_T segment boxes (streaming)
    tri: Array       # f32[T_pad, 128]
    tri_box: Array   # f32[T_chunks_pad, 128]
    tri_super: Array  # f32[T_supers_pad, 128] per-SUPER_T middle-level boxes
    tri_seg: Array   # f32[T_segs_pad, 128] per-SEG_T segment boxes (streaming)
    rect: Array      # f32[R_pad, 128] runtime rects (see R_* lane layout)
    tsph: Array      # f32[K_pad, 128] runtime-TRS spheres (TS_* lane layout)
    ttri: Array      # f32[K_pad, 128] runtime-TRS triangles (TT_* lanes)
    tri_coef: Array  # f32[N_Q * T_pad, 128] MXU determinant coefficients
    #                  (built only with mxu=True; (8,128) zeros otherwise)
    sph_map: Array   # i32[S_pad] table row -> SCENE sphere index (inverts
    #                  sph_order + padding; pad rows map to their source prim)
    tri_map: Array   # i32[T_pad] table row -> scene triangle index


def megakernel_supported(scene: Scene) -> bool:
    """Scenes the fused path handles: spheres/triangles plus up to
    MAX_TRS_PRIMS each of rects and runtime-TRS spheres/triangles (chunked
    table sweeps through the reference TransformRay chain — round 5; the
    r1-r4 unrolled form capped these at 64), constant/
    checker textures (no image gathers in-kernel), and tables small enough
    for VMEM residence / HBM streaming.  Uses only STATIC shape information
    so it can gate the engine choice inside jit (a TextureBuilder with no
    images packs a (1,1,1,3) dummy image array).

    Image-texture scenes fail THIS gate (the kernel cannot gather texels —
    per-lane dynamic VMEM indexing does not exist on TPU) but still render
    fused through DEFERRED texturing when mega_tex_supported() passes:
    integrators.integrate routes them to trace_path_mega_tex."""
    if scene.n_t_spheres > MAX_TRS_PRIMS or \
            scene.n_t_triangles > MAX_TRS_PRIMS:
        return False   # chunked TRS table sweeps, VMEM-budget cap
    if scene.n_rects > MAX_TRS_PRIMS:
        return False
    if scene.n_spheres > MAX_STREAM_PRIMS:   # HBM streaming above 8k
        return False
    if scene.n_triangles > MAX_STREAM_PRIMS:   # HBM streaming above 8k
        return False
    if scene.textures.images.shape[0] > 1:   # image textures registered
        return False
    return True


def mega_tex_supported(scene: Scene) -> bool:
    """Scenes trace_path_mega_tex (fused want_tex kernel + deferred-texture
    pass) can serve: everything megakernel_supported allows PLUS image
    textures (the winner/plane recording — and replay_hits for the
    mega_diff backward — cover the full [spheres | triangles | rects |
    t_spheres | t_triangles] index space).  Static-shape information only,
    like megakernel_supported."""
    if scene.n_t_spheres > MAX_TRS_PRIMS or \
            scene.n_t_triangles > MAX_TRS_PRIMS:
        return False
    if scene.n_rects > MAX_TRS_PRIMS:
        return False
    if scene.n_spheres > MAX_STREAM_PRIMS:
        return False
    if scene.n_triangles > MAX_STREAM_PRIMS:
        return False
    return True


def mega_sphere_order(centers) -> np.ndarray:
    """Host-side Morton permutation of sphere centers for build_mega_tables'
    sph_order (spatially compact chunk boxes -> live per-chunk culling)."""
    c = np.asarray(centers)
    return morton_order(c, c, c)


def _pad_rows(x: Array, mult: int, repeat_last: bool) -> Array:
    n = x.shape[0]
    pad = -(-max(n, 1) // mult) * mult - n
    if pad == 0:
        return x
    filler = (jnp.broadcast_to(x[-1:], (pad,) + x.shape[1:]) if repeat_last and n
              else jnp.zeros((pad,) + x.shape[1:], x.dtype))
    return jnp.concatenate([x, filler])


def _mat_lanes(scene: Scene, mat_id: Array) -> Array:
    """(N, 9) per-primitive material block (see lane layout above)."""
    m = scene.materials
    t = scene.textures
    kind = m.kind[mat_id]
    tex_id = m.tex_id[mat_id]
    tex_kind = t.kind[tex_id]
    # metal attenuation is the material's albedo color, not a texture
    # (material.h:87); fold it into color0 with a constant tex kind.
    is_metal = kind == _mat.METAL
    c0 = jnp.where(is_metal[:, None], m.albedo[mat_id], t.color0[tex_id])
    # IMAGE textures can't gather in-kernel: their in-kernel value is the
    # PLACEHOLDER 1 (mat_decode treats non-checker kinds as constant c0),
    # and the deferred-texturing pass (trace_path_mega_tex) multiplies the
    # real texel back in outside the kernel.  Scenes with image textures
    # never use the plain-mega radiance directly (megakernel_supported
    # gates them), so the placeholder is invisible elsewhere.  Gated on
    # ~is_metal: metals don't read textures (their DEFAULT tex_id 0 may
    # coincidentally point at an image) and c0 just became their albedo.
    c0 = jnp.where(((tex_kind == _tex.IMAGE) & ~is_metal)[:, None], 1.0, c0)
    tex_kind = jnp.where(is_metal, _tex.CONSTANT, tex_kind)
    aux = jnp.where(is_metal, m.fuzz[mat_id], m.ref_idx[mat_id])
    return jnp.concatenate([
        kind.astype(jnp.float32)[:, None],
        tex_kind.astype(jnp.float32)[:, None],
        aux[:, None],
        c0,
        t.color1[tex_id],
    ], axis=1)


def build_mega_tables(scene: Scene, tri_order: Optional[np.ndarray] = None,
                      sph_order: Optional[np.ndarray] = None,
                      mxu: bool = False) -> MegaTables:
    """Pack the scene into the megakernel's (prims, 128) lane tables.

    tri_order / sph_order: optional static Morton permutations
    (ops/pallas_intersect.morton_order, mega_sphere_order) making each
    chunk's AABB spatially compact so the slab culling can prune.  Without
    an order the chunks inherit BUILDER order — for scatter-built scenes
    (random_spheres) every 8-prim chunk then spans the whole scene and the
    per-chunk cull never fires.  Must be host arrays computed once (from
    the bind pose, for animated meshes) so jit caches survive updates.

    mxu: also build the tri_coef determinant-coefficient table consumed by
    cfg.mega_mxu (HBM-streamed triangle scenes; N_Q * 512 B per triangle).
    """
    n_s, n_t = scene.n_spheres, scene.n_triangles
    stream_tri = n_t > MAX_VMEM_PRIMS
    # pad to a SUPER_T multiple so every superchunk owns a full run of chunks
    tri_mult = SEG_T if stream_tri else SUPER_T

    def pack(cols: Array, mult: int) -> Array:
        # cols (N, k<=128) -> (N_pad, 128); pad rows repeat the last prim
        # (duplicates lose the first-wins tie-break, boxes stay tight).
        cols = _pad_rows(cols, mult, repeat_last=True)
        lanes = jnp.zeros((cols.shape[0], LANES - cols.shape[1]), jnp.float32)
        return jnp.concatenate([cols, lanes], axis=1)

    def boxes_of(lo: Array, hi: Array, group: int, prim_mult: int) -> Array:
        lo = _pad_rows(lo, prim_mult, repeat_last=True)
        hi = _pad_rows(hi, prim_mult, repeat_last=True)
        k = lo.shape[0] // group
        b = jnp.concatenate([
            lo.reshape(k, group, 3).min(axis=1),
            hi.reshape(k, group, 3).max(axis=1)], axis=1)   # (k, 6)
        b = _pad_rows(b, 8, repeat_last=True)  # sublane multiple
        return jnp.concatenate(
            [b, jnp.zeros((b.shape[0], LANES - 6), jnp.float32)], axis=1)

    def chunk_boxes(lo, hi, prim_mult=PRIM_CHUNK):
        return boxes_of(lo, hi, PRIM_CHUNK, prim_mult)

    # spheres get the same two-level cull as VMEM-resident triangles once
    # big enough (SPH_SUPER_MIN); pad to SUPER_T then (repeat-last rows keep
    # chunk boxes tight and lose first-wins only on exact-t duplicates).
    # Above MAX_VMEM_PRIMS the sphere table streams from HBM through a
    # per-SEG_T segment DMA exactly like triangles (round 4 — the 8,192
    # ceiling VERDICT r3 flagged; the reference's sphere scenes are bounded
    # only by device heap, createScene.h:31-38 + kernel.cu:65).
    stream_sph = n_s > MAX_VMEM_PRIMS
    sph_two_level = n_s > SPH_SUPER_MIN or stream_sph
    sph_mult = (SEG_T if stream_sph
                else SUPER_T if sph_two_level else PRIM_CHUNK)
    if n_s:
        sp = scene.spheres
        center, radius, smat = sp.center, sp.radius, sp.mat
        sph_map = jnp.arange(n_s, dtype=jnp.int32)
        if sph_order is not None:
            order = jnp.asarray(sph_order)
            center, radius, smat = center[order], radius[order], smat[order]
            sph_map = order.astype(jnp.int32)
        sph_map = _pad_rows(sph_map, sph_mult, repeat_last=True)
        cols = jnp.concatenate([
            center,
            (radius * radius)[:, None],
            (1.0 / radius)[:, None],
            _mat_lanes(scene, smat),
        ], axis=1)
        sph = pack(cols, sph_mult)
        sph_box = chunk_boxes(center - radius[:, None],
                              center + radius[:, None], sph_mult)
        sph_super = (boxes_of(center - radius[:, None],
                              center + radius[:, None], SUPER_T, sph_mult)
                     if sph_two_level
                     else jnp.zeros((8, LANES), jnp.float32))
        sph_seg = (boxes_of(center - radius[:, None],
                            center + radius[:, None], SEG_T, sph_mult)
                   if stream_sph else jnp.zeros((8, LANES), jnp.float32))
    else:
        sph = jnp.zeros((PRIM_CHUNK, LANES), jnp.float32)
        sph_box = jnp.zeros((8, LANES), jnp.float32)
        sph_super = jnp.zeros((8, LANES), jnp.float32)
        sph_seg = jnp.zeros((8, LANES), jnp.float32)
        sph_map = jnp.zeros((PRIM_CHUNK,), jnp.int32)

    if n_t:
        tr = scene.triangles
        v0, v1, v2, nrm, mid = tr.v0, tr.v1, tr.v2, tr.normal, tr.mat
        tri_map = jnp.arange(n_t, dtype=jnp.int32)
        if tri_order is not None:
            order = jnp.asarray(tri_order)
            v0, v1, v2 = v0[order], v1[order], v2[order]
            nrm, mid = nrm[order], mid[order]
            tri_map = order.astype(jnp.int32)
        tri_map = _pad_rows(tri_map, tri_mult, repeat_last=True)
        cols = jnp.concatenate([
            v0, v1 - v0, v2 - v0, nrm, _mat_lanes(scene, mid)], axis=1)
        tri = pack(cols, tri_mult)
        lo = jnp.minimum(jnp.minimum(v0, v1), v2)
        hi = jnp.maximum(jnp.maximum(v0, v1), v2)
        tri_box = chunk_boxes(lo, hi, tri_mult)
        tri_super = boxes_of(lo, hi, SUPER_T, tri_mult)
        tri_seg = (boxes_of(lo, hi, SEG_T, tri_mult) if stream_tri
                   else jnp.zeros((8, LANES), jnp.float32))
        if mxu:
            e1, e2 = v1 - v0, v2 - v0
            n2 = jnp.cross(e1, e2)
            z1 = jnp.zeros((v0.shape[0], 1), jnp.float32)
            z3 = jnp.zeros_like(v0)
            # lanes: [d(0..2) | o(3..5) | c = d x o (6..8) | const(9)]
            q_a = jnp.concatenate([-n2, z3, z3, z1], axis=1)
            q_t = jnp.concatenate(
                [z3, n2, z3, -jnp.sum(v0 * n2, axis=1, keepdims=True)],
                axis=1)
            q_u = jnp.concatenate([jnp.cross(v0, e2), z3, -e2, z1], axis=1)
            q_v = jnp.concatenate([-jnp.cross(v0, e1), z3, e1, z1], axis=1)
            q_n = jnp.concatenate([nrm, z3, z3, z1], axis=1)
            coefs = jnp.stack([_pad_rows(q, tri_mult, repeat_last=True)
                               for q in (q_a, q_t, q_u, q_v, q_n)], axis=1)
            n_pad = coefs.shape[0]
            # per-SUPER_T blocks, quantity-major within each super
            coefs = (coefs.reshape(n_pad // SUPER_T, SUPER_T, N_Q,
                                   N_FEAT).transpose(0, 2, 1, 3)
                     .reshape(n_pad * N_Q, N_FEAT))
            tri_coef = jnp.concatenate(
                [coefs, jnp.zeros((coefs.shape[0], LANES - N_FEAT),
                                  jnp.float32)], axis=1)
        else:
            tri_coef = jnp.zeros((8, LANES), jnp.float32)
    else:
        tri = jnp.zeros((SUPER_T, LANES), jnp.float32)
        tri_box = jnp.zeros((SUPER_T // PRIM_CHUNK, LANES), jnp.float32)
        tri_super = jnp.zeros((8, LANES), jnp.float32)
        tri_seg = jnp.zeros((8, LANES), jnp.float32)
        tri_coef = jnp.zeros((8, LANES), jnp.float32)
        tri_map = jnp.zeros((SUPER_T,), jnp.int32)

    from ..core import vec as _v3

    if scene.n_rects:
        rc = scene.rects
        R = _v3.rotation_matrix_euler_deg(rc.trs.rotation)      # (n,3,3)
        sgn = jnp.where(rc.flip, -1.0, 1.0).astype(jnp.float32)
        # world normal = rotate((0,0,sgn)): out_i = R[i,2] * sgn
        nrm = sgn[:, None] * R[:, :, 2]
        cols = jnp.concatenate([
            sgn[:, None], rc.trs.position, rc.trs.scale,
            R.reshape(-1, 9), nrm, _mat_lanes(scene, rc.mat)], axis=1)
        rect = pack(cols, PRIM_CHUNK)
    else:
        rect = jnp.zeros((PRIM_CHUNK, LANES), jnp.float32)

    if scene.n_t_spheres:
        tsp = scene.t_spheres
        R = _v3.rotation_matrix_euler_deg(tsp.trs.rotation)     # (k,3,3)
        cols = jnp.concatenate([
            tsp.trs.position, tsp.trs.scale, R.reshape(-1, 9),
            (tsp.radius * tsp.radius)[:, None],
            (1.0 / tsp.radius)[:, None],
            _mat_lanes(scene, tsp.mat)], axis=1)
        tsph = pack(cols, PRIM_CHUNK)
    else:
        tsph = jnp.zeros((PRIM_CHUNK, LANES), jnp.float32)

    if scene.n_t_triangles:
        ttr = scene.t_triangles
        R = _v3.rotation_matrix_euler_deg(ttr.trs.rotation)     # (k,3,3)
        # world normal = rotate(n_obj) by the object rotation (hitable.h:36)
        n_w = jnp.einsum("nij,nj->ni", R, ttr.normal)
        cols = jnp.concatenate([
            ttr.v0, ttr.v1 - ttr.v0, ttr.v2 - ttr.v0, ttr.normal, n_w,
            ttr.trs.position, ttr.trs.scale, R.reshape(-1, 9),
            _mat_lanes(scene, ttr.mat)], axis=1)
        ttri = pack(cols, PRIM_CHUNK)
    else:
        ttri = jnp.zeros((PRIM_CHUNK, LANES), jnp.float32)

    return MegaTables(sph, sph_box, sph_super, sph_seg, tri, tri_box,
                      tri_super, tri_seg, rect, tsph, ttri, tri_coef,
                      sph_map, tri_map)


# ---------------------------------------------------------------------------
# The kernel
# ---------------------------------------------------------------------------

def _mega_kernel(sph_ref, sph_box_ref, sph_super_ref, tri_ref, tri_box_ref,
                 tri_super_ref, rect_ref, tsph_ref, ttri_ref, o_ref, d_ref,
                 *rest, n_sph_chunks: int, n_sph_supers: int = 0,
                 n_tri_chunks: int, has_sph: bool,
                 has_tri: bool, n_rects: int = 0,
                 n_tsph: int = 0, n_ttri: int = 0,
                 max_depth: int = 8, t_min: float = 1e-3, t_max: float = 3.4e38,
                 ambient: float, backface_only: bool, no_t_clip: bool,
                 back_culling: bool, die_ref_cosine: bool, injected: bool,
                 stream_tri: bool = False, n_tri_segs: int = 0,
                 stream_sph: bool = False, n_sph_segs: int = 0,
                 integrator: str = "path", lambert_unnorm: bool = True,
                 resume: bool = False, dump_state: bool = False,
                 n_steps: int = 0, f2b: int = 0, mxu: bool = False,
                 want_winners: bool = False, want_tex: bool = False,
                 tri_off: int = 0,
                 rect_off: int = 0, tsph_off: int = 0, ttri_off: int = 0):
    rest = list(rest)
    tri_seg_ref = rest.pop(0) if stream_tri else None
    sph_seg_ref = rest.pop(0) if stream_sph else None
    tri_coef_ref = rest.pop(0) if mxu else None   # HBM (N_Q*T_pad, 128)
    st_ref = rest.pop(0) if resume else None    # (4,R,L): thr rgb + alive
    uni_ref = rest.pop(0) if injected else None
    seed_ref = rest.pop(0)                      # SMEM i32[2]: [seed, step_lo]
    out_ref = rest.pop(0)
    # streaming scratch: triangle segment + its CHUNK BOXES (the full chunk-
    # box table is 512 B per PRIM_CHUNK=16 prims — ~32 MB at the 1M-tri
    # ceiling, far over VMEM — so boxes ride the same per-segment DMA
    # pattern as the data).
    # MXU mode swaps the chunk boxes for the determinant-coefficient block
    # (no chunk culling there) and adds feature + sweep-state scratch.
    box_scratch = box_sem = coef_scratch = coef_sem = None
    feat_scratch = sweep_scratch = None
    sph_scratch = sph_box_scratch = sph_dma_sem = sph_box_sem = None
    if stream_sph:    # sphere streaming scratch rides at the tail
        (sph_scratch, sph_box_scratch, sph_dma_sem, sph_box_sem) = rest[-4:]
        rest = rest[:-4]
    if mxu:
        (tri_scratch, coef_scratch, dma_sem, coef_sem, feat_scratch,
         sweep_scratch) = rest
    elif stream_tri:
        (tri_scratch, box_scratch, dma_sem, box_sem) = rest
    else:
        tri_scratch = dma_sem = None
    # step_lo (global bounce offset of this call's step 0) is a RUNTIME
    # scalar so multi-phase drivers (trace_path_mega_phased) reuse ONE
    # compiled kernel for every mid-phase instead of one per bounce window.
    step_lo = seed_ref[1]
    if not injected and integrator == "path":   # lambert/normal draw nothing
        pltpu.prng_seed(seed_ref[0] + step_lo, pl.program_id(0))

    shape = (TILE_ROWS, LANES)
    piota = jax.lax.broadcasted_iota(jnp.int32, (PRIM_CHUNK, 1, 1), 0)

    def comp(tbl_ref, base, k):
        return tbl_ref[pl.ds(base, PRIM_CHUNK), k:k + 1][:, :, None]  # (P,1,1)

    def mat_decode(m, px, py, pz):
        """Shared texture-select + material decode (texture.h checker sin
        products; per-material attenuation/emission rules) — used by BOTH
        the path bounce loop and the lambert epilogue so they cannot
        drift.  Returns (kind, aux, attenuation rgb, emitted rgb,
        is_met, is_die, is_light)."""
        kind, texk, aux = m[0], m[1], m[2]
        c0r, c0g, c0b, c1r, c1g, c1b = m[3], m[4], m[5], m[6], m[7], m[8]
        sines = jnp.sin(10.0 * px) * jnp.sin(10.0 * py) * jnp.sin(10.0 * pz)
        odd_chk = (texk == float(_tex.CHECKER)) & (sines < 0.0)
        texr = jnp.where(odd_chk, c1r, c0r)
        texg = jnp.where(odd_chk, c1g, c0g)
        texb = jnp.where(odd_chk, c1b, c0b)
        is_met = kind == float(_mat.METAL)
        is_die = kind == float(_mat.DIELECTRIC)
        is_light = kind == float(_mat.DIFFUSE_LIGHT)
        atr = jnp.where(is_die, 1.0, jnp.where(is_met, c0r, texr))
        atg = jnp.where(is_die, 1.0, jnp.where(is_met, c0g, texg))
        atb = jnp.where(is_die, 1.0, jnp.where(is_met, c0b, texb))
        emr = jnp.where(is_light, texr, 0.0)
        emg = jnp.where(is_light, texg, 0.0)
        emb = jnp.where(is_light, texb, 0.0)
        return (kind, aux, (atr, atg, atb), (emr, emg, emb),
                is_met, is_die, is_light)

    def box_scalar(box_ref, j, k):
        return box_ref[pl.ds(j, 1), k:k + 1][0, 0]

    def slab(box_ref, j, ox, oy, oz, inv_dx, inv_dy, inv_dz, best_t, lo_cut):
        tx0 = (box_scalar(box_ref, j, 0) - ox) * inv_dx
        tx1 = (box_scalar(box_ref, j, 3) - ox) * inv_dx
        ty0 = (box_scalar(box_ref, j, 1) - oy) * inv_dy
        ty1 = (box_scalar(box_ref, j, 4) - oy) * inv_dy
        tz0 = (box_scalar(box_ref, j, 2) - oz) * inv_dz
        tz1 = (box_scalar(box_ref, j, 5) - oz) * inv_dz
        near = jnp.maximum(jnp.maximum(jnp.minimum(tx0, tx1),
                                       jnp.minimum(ty0, ty1)),
                           jnp.minimum(tz0, tz1))
        far = jnp.minimum(jnp.minimum(jnp.maximum(tx0, tx1),
                                      jnp.maximum(ty0, ty1)),
                          jnp.maximum(tz0, tz1))
        # negated form: a ray with d_axis = 0 (inv = inf) whose origin sits
        # exactly on a box plane yields 0 * inf = NaN; NaN comparisons are
        # False, so this shape keeps NaN lanes conservatively REACHABLE
        # instead of silently culling a chunk that may hold the winner.
        return ~((far < near) | (far < lo_cut) | (near >= best_t))

    def merge(best_t, t3, base):
        """Chunk reduce: (tmin, exclusive winner mask, take mask)."""
        tmin = jnp.min(t3, axis=0)
        idxc = jnp.where(t3 <= tmin[None], piota + base, IDX_BIG)
        imin = jnp.min(idxc, axis=0)
        wmask = (piota + base) == imin[None]
        take = tmin < best_t
        return tmin, wmask, take

    def pick_attrs(wmask, take, reads, cur):
        # f32 masks: bool (i1) vectors may not cross the lax.cond boundary as
        # closed-over operands (Mosaic "unsupported target bitwidth" trunci)
        wf = jnp.where(wmask, 1.0, 0.0)
        tf = jnp.where(take, 1.0, 0.0)

        def upd(cur):
            out = []
            for val, c in zip(reads, cur):
                w = jnp.sum(val() * wf, axis=0)
                out.append(w * tf + c * (1.0 - tf))
            return tuple(out)
        return jax.lax.cond(jnp.any(take), upd, lambda c: c, cur)

    def sphere_sweep(ox, oy, oz, dx, dy, dz, alive_f=None):
        """alive_f (f32 0/1 or None): dead lanes are excluded from the chunk
        reachability vote — a dead ray's last direction can still cross
        scene boxes, and without the mask one such lane forces the whole
        tile through the chunk math at every remaining bounce.  The mask
        stays f32 and is compared LOCALLY (a closed-over i1 vector would
        become a lax.cond operand — unsupported Mosaic trunci)."""
        a = dx * dx + dy * dy + dz * dz
        inv_dx, inv_dy, inv_dz = 1.0 / dx, 1.0 / dy, 1.0 / dz
        o3x, o3y, o3z = ox[None], oy[None], oz[None]
        d3x, d3y, d3z = dx[None], dy[None], dz[None]
        a3 = a[None]

        best_t = jnp.full(shape, BIG, jnp.float32)
        attrs = tuple(jnp.zeros(shape, jnp.float32)
                      for _ in range(4 + N_MAT_COMPS + want_winners))

        def s_chunk_math(src_ref, base_local, idx_base, carry):
            """Sphere quadratic over one PRIM_CHUNK chunk read from src_ref
            at sublane base_local, merged with global prim index idx_base
            (src_ref is the VMEM table, or the streaming scratch)."""
            best_t, attrs = carry
            cx = comp(src_ref, base_local, S_CX)
            cy = comp(src_ref, base_local, S_CY)
            cz = comp(src_ref, base_local, S_CZ)
            r2 = comp(src_ref, base_local, S_R2)
            ocx = o3x - cx
            ocy = o3y - cy
            ocz = o3z - cz
            b = ocx * d3x + ocy * d3y + ocz * d3z
            c = ocx * ocx + ocy * ocy + ocz * ocz - r2
            disc = b * b - a3 * c
            hit = disc > 0.0
            sq = jnp.sqrt(jnp.where(hit, disc, 0.0))
            t0 = (-b - sq) * (1.0 / a3)
            t1 = (-b + sq) * (1.0 / a3)
            ok0 = hit & (t0 < t_max) & (t0 > t_min)
            ok1 = hit & (t1 < t_max) & (t1 > t_min)
            t3 = jnp.where(ok0, t0, jnp.where(ok1, t1, BIG))
            tmin, wmask, take = merge(best_t, t3, idx_base)
            reads = ([lambda v=cx: v, lambda v=cy: v, lambda v=cz: v,
                      lambda: comp(src_ref, base_local, S_INVR)]
                     + [functools.partial(comp, src_ref, base_local,
                                          S_MAT + k)
                        for k in range(N_MAT_COMPS)])
            if want_winners:   # winner TABLE row as one more carried attr
                reads.append(
                    lambda: (piota + idx_base).astype(jnp.float32))
            attrs = pick_attrs(wmask, take, reads, attrs)
            return jnp.where(take, tmin, best_t), attrs

        def s_chunk_run(src_ref, chunk_global, base_local, carry,
                        box_ref=None, box_row=None):
            if box_ref is None:
                box_ref, box_row = sph_box_ref, chunk_global
            best_t, _ = carry
            reachable = slab(box_ref, box_row, ox, oy, oz, inv_dx, inv_dy,
                             inv_dz, best_t, t_min)
            if alive_f is not None:
                reachable &= alive_f > 0.0
            return jax.lax.cond(
                jnp.any(reachable),
                functools.partial(s_chunk_math, src_ref, base_local,
                                  chunk_global * PRIM_CHUNK),
                lambda c: c, carry)

        chunks_per_super = SUPER_T // PRIM_CHUNK

        if stream_sph:
            # HBM streaming (mirrors tri_sweep): per segment, a top-level
            # AABB test gates the DMA of the sphere rows AND their chunk
            # boxes into scratch; supers then gate chunks inside.
            chunks_per_seg = SEG_T // PRIM_CHUNK
            supers_per_seg = SEG_T // SUPER_T

            def seg_body(s, carry):
                best_t, _ = carry
                seg_reach = slab(sph_seg_ref, s, ox, oy, oz, inv_dx,
                                 inv_dy, inv_dz, best_t, t_min)
                if alive_f is not None:
                    seg_reach &= alive_f > 0.0

                def run_seg(carry):
                    dma = pltpu.make_async_copy(
                        sph_ref.at[pl.ds(s * SEG_T, SEG_T), :],
                        sph_scratch, sph_dma_sem)
                    dmb = pltpu.make_async_copy(
                        sph_box_ref.at[pl.ds(s * chunks_per_seg,
                                             chunks_per_seg), :],
                        sph_box_scratch, sph_box_sem)
                    dma.start()
                    dmb.start()
                    dma.wait()
                    dmb.wait()

                    def super_body(u, carry):
                        best_t, _ = carry
                        ug = s * supers_per_seg + u
                        sreach = slab(sph_super_ref, ug, ox, oy, oz,
                                      inv_dx, inv_dy, inv_dz, best_t,
                                      t_min)
                        if alive_f is not None:
                            sreach &= alive_f > 0.0

                        def run_super(carry):
                            def body(j, carry):
                                cl = u * chunks_per_super + j
                                return s_chunk_run(
                                    sph_scratch, s * chunks_per_seg + cl,
                                    cl * PRIM_CHUNK, carry,
                                    box_ref=sph_box_scratch, box_row=cl)
                            return jax.lax.fori_loop(0, chunks_per_super,
                                                     body, carry)

                        return jax.lax.cond(jnp.any(sreach), run_super,
                                            lambda c: c, carry)

                    return jax.lax.fori_loop(0, supers_per_seg, super_body,
                                             carry)

                return jax.lax.cond(jnp.any(seg_reach), run_seg,
                                    lambda c: c, carry)

            return jax.lax.fori_loop(0, n_sph_segs, seg_body,
                                     (best_t, attrs))

        def body(j, carry):
            return s_chunk_run(sph_ref, j, j * PRIM_CHUNK, carry)

        if not n_sph_supers:
            return jax.lax.fori_loop(0, n_sph_chunks, body, (best_t, attrs))

        # two-level: one box per SUPER_T spheres gates its 16 chunks
        def super_body(u, carry):
            best_t, _ = carry
            sreach = slab(sph_super_ref, u, ox, oy, oz, inv_dx, inv_dy,
                          inv_dz, best_t, t_min)
            if alive_f is not None:
                sreach &= alive_f > 0.0

            def run_super(carry):
                def sbody(j, carry):
                    return body(u * chunks_per_super + j, carry)
                return jax.lax.fori_loop(0, chunks_per_super, sbody, carry)

            return jax.lax.cond(jnp.any(sreach), run_super, lambda c: c,
                                carry)

        return jax.lax.fori_loop(0, n_sph_supers, super_body,
                                 (best_t, attrs))

    def tri_sweep(ox, oy, oz, dx, dy, dz, alive_f=None):
        inv_dx, inv_dy, inv_dz = 1.0 / dx, 1.0 / dy, 1.0 / dz
        o3x, o3y, o3z = ox[None], oy[None], oz[None]
        d3x, d3y, d3z = dx[None], dy[None], dz[None]
        lo_cut = -float(BIG) if no_t_clip else t_min

        # -------- front-to-back shell ordering (f2b > 0) --------
        # Visiting supers/segments in fixed table order leaves best_t loose
        # until the winner's chunk happens to come up, so the `near < best_t`
        # term of the slab test can't prune.  With f2b = B shells, the
        # top-level boxes are visited in B passes ordered by squared distance
        # from the tile's alive-ray origin CENTROID: nearby geometry (where
        # scattered rays actually hit) tightens best_t in the first shell and
        # far shells then fail `near < best_t` for every lane, skipping their
        # math (and, when streaming, their DMA).  Visit ORDER is the only
        # thing that changes — each box is still visited exactly once (the
        # shell index is a deterministic function of the box) and the merge
        # is order-independent up to exact-t ties between duplicated prims,
        # so results are unchanged (test-pinned).
        if f2b:
            if alive_f is None:
                inv_w = 1.0 / float(shape[0] * shape[1])
                mx = jnp.sum(ox) * inv_w
                my = jnp.sum(oy) * inv_w
                mz = jnp.sum(oz) * inv_w
            else:
                inv_w = 1.0 / jnp.maximum(jnp.sum(alive_f), 1.0)
                mx = jnp.sum(ox * alive_f) * inv_w
                my = jnp.sum(oy * alive_f) * inv_w
                mz = jnp.sum(oz * alive_f) * inv_w

        def box_dist2(box_ref, j):
            qx = jnp.clip(mx, box_scalar(box_ref, j, 0),
                          box_scalar(box_ref, j, 3))
            qy = jnp.clip(my, box_scalar(box_ref, j, 1),
                          box_scalar(box_ref, j, 4))
            qz = jnp.clip(mz, box_scalar(box_ref, j, 2),
                          box_scalar(box_ref, j, 5))
            return ((qx - mx) * (qx - mx) + (qy - my) * (qy - my)
                    + (qz - mz) * (qz - mz))

        def shelled(n_items, box_ref, visit, carry0):
            """Run visit(j, carry) for j in 0..n_items-1, in f2b distance-
            shell passes (approximate front-to-back) instead of index order.
            """
            def dscan(j, c):
                dj = box_dist2(box_ref, j)
                return jnp.minimum(c[0], dj), jnp.maximum(c[1], dj)
            dmin, dmax = jax.lax.fori_loop(
                0, n_items, dscan,
                (jnp.float32(3.4e38), jnp.float32(0.0)))
            scale = float(f2b) / jnp.maximum(dmax - dmin, 1e-30)
            carry = carry0
            for s in range(f2b):
                def body(j, carry, s=s):
                    dj = box_dist2(box_ref, j)
                    sidx = jnp.minimum(jnp.floor((dj - dmin) * scale),
                                       float(f2b - 1))
                    return jax.lax.cond(sidx == float(s),
                                        functools.partial(visit, j),
                                        lambda c: c, carry)
                carry = jax.lax.fori_loop(0, n_items, body, carry)
            return carry

        def gate(reachable):
            # exclude dead lanes from the reachability vote (see
            # sphere_sweep); applied at every cull level, f32 compared
            # locally to stay off the Mosaic i1-operand path
            return reachable if alive_f is None else reachable & (alive_f > 0.0)

        best_t0 = jnp.full(shape, BIG, jnp.float32)
        attrs0 = tuple(jnp.zeros(shape, jnp.float32)
                       for _ in range(3 + N_MAT_COMPS + want_winners))

        def chunk_math(src_ref, base, idx_base, carry):
            """Moller-Trumbore over one PRIM_CHUNK chunk read from src_ref at
            sublane `base`, merged with global prim index `idx_base`."""
            best_t, attrs = carry
            v0x = comp(src_ref, base, T_V0)
            v0y = comp(src_ref, base, T_V0 + 1)
            v0z = comp(src_ref, base, T_V0 + 2)
            e1x = comp(src_ref, base, T_E1)
            e1y = comp(src_ref, base, T_E1 + 1)
            e1z = comp(src_ref, base, T_E1 + 2)
            e2x = comp(src_ref, base, T_E2)
            e2y = comp(src_ref, base, T_E2 + 1)
            e2z = comp(src_ref, base, T_E2 + 2)
            hx = d3y * e2z - d3z * e2y
            hy = d3z * e2x - d3x * e2z
            hz = d3x * e2y - d3y * e2x
            a = e1x * hx + e1y * hy + e1z * hz
            f = 1.0 / a
            sx = o3x - v0x
            sy = o3y - v0y
            sz = o3z - v0z
            u = f * (sx * hx + sy * hy + sz * hz)
            qx = sy * e1z - sz * e1y
            qy = sz * e1x - sx * e1z
            qz = sx * e1y - sy * e1x
            v = f * (d3x * qx + d3y * qy + d3z * qz)
            t = f * (e2x * qx + e2y * qy + e2z * qz)
            valid = (jnp.abs(a) >= TRI_EPSILON) & (u >= 0.0) & (u <= 1.0) \
                & (v >= 0.0) & (u + v <= 1.0)
            if back_culling:       # triangle.h:74
                valid &= a >= TRI_EPSILON
            nx = comp(src_ref, base, T_N)
            ny = comp(src_ref, base, T_N + 1)
            nz = comp(src_ref, base, T_N + 2)
            if backface_only:      # triangle.h:61
                valid &= (d3x * nx + d3y * ny + d3z * nz) >= 0.0
            if no_t_clip:          # triangle.h:92-94 + hitable_list.h:84
                valid &= t < t_max
            else:
                valid &= (t > t_min) & (t < t_max)
            t3 = jnp.where(valid, t, BIG)
            tmin, wmask, take = merge(best_t, t3, idx_base)
            reads = ([lambda v=nx: v, lambda v=ny: v, lambda v=nz: v]
                     + [functools.partial(comp, src_ref, base, T_MAT + k)
                        for k in range(N_MAT_COMPS)])
            if want_winners:     # winner TABLE row as one more carried attr
                reads.append(
                    lambda: (piota + idx_base).astype(jnp.float32))
            attrs = pick_attrs(wmask, take, reads, attrs)
            return jnp.where(take, tmin, best_t), attrs

        chunks_per_super = SUPER_T // PRIM_CHUNK

        def chunk_run(src_ref, chunk_global, base_local, carry,
                      box_ref=None, box_row=None):
            """box_ref/box_row: where this chunk's AABB lives (defaults to
            the VMEM-resident table at the global chunk index; the streaming
            path passes the per-segment box scratch with a LOCAL row)."""
            if box_ref is None:
                box_ref, box_row = tri_box_ref, chunk_global
            best_t, _ = carry
            reachable = gate(slab(box_ref, box_row, ox, oy, oz,
                                  inv_dx, inv_dy, inv_dz, best_t, lo_cut))
            return jax.lax.cond(
                jnp.any(reachable),
                functools.partial(chunk_math, src_ref, base_local,
                                  chunk_global * PRIM_CHUNK),
                lambda c: c, carry)

        if not stream_tri:
            # two-level cull: one box per SUPER_T prims gates its 16 chunks
            def super_body(u, carry):
                best_t, _ = carry
                sreach = gate(slab(tri_super_ref, u, ox, oy, oz, inv_dx,
                                   inv_dy, inv_dz, best_t, lo_cut))

                def run_super(carry):
                    def body(j, carry):
                        cg = u * chunks_per_super + j
                        return chunk_run(tri_ref, cg, cg * PRIM_CHUNK, carry)
                    return jax.lax.fori_loop(0, chunks_per_super, body, carry)

                return jax.lax.cond(jnp.any(sreach), run_super, lambda c: c,
                                    carry)

            n_supers = n_tri_chunks // chunks_per_super
            if f2b:
                return shelled(n_supers, tri_super_ref, super_body,
                               (best_t0, attrs0))
            return jax.lax.fori_loop(0, n_supers, super_body,
                                     (best_t0, attrs0))

        # Streaming: triangle table lives in HBM; per segment, a top-level
        # AABB test decides whether to DMA the segment into VMEM scratch at
        # all — unreachable segments cost one slab test and zero bandwidth.
        chunks_per_seg = SEG_T // PRIM_CHUNK

        def seg_body(s, carry):
            best_t, _ = carry
            seg_reach = gate(slab(tri_seg_ref, s, ox, oy, oz, inv_dx, inv_dy,
                                  inv_dz, best_t, lo_cut))

            def run_seg(carry):
                dma = pltpu.make_async_copy(
                    tri_ref.at[pl.ds(s * SEG_T, SEG_T), :], tri_scratch,
                    dma_sem)
                dmb = pltpu.make_async_copy(
                    tri_box_ref.at[pl.ds(s * chunks_per_seg,
                                         chunks_per_seg), :],
                    box_scratch, box_sem)
                dma.start()
                dmb.start()
                dma.wait()
                dmb.wait()
                supers_per_seg = SEG_T // SUPER_T

                def super_body(u, carry):
                    best_t, _ = carry
                    ug = s * supers_per_seg + u
                    sreach = gate(slab(tri_super_ref, ug, ox, oy, oz, inv_dx,
                                       inv_dy, inv_dz, best_t, lo_cut))

                    def run_super(carry):
                        def body(j, carry):
                            cl = u * chunks_per_super + j
                            return chunk_run(
                                tri_scratch, s * chunks_per_seg + cl,
                                cl * PRIM_CHUNK, carry,
                                box_ref=box_scratch, box_row=cl)
                        return jax.lax.fori_loop(0, chunks_per_super, body,
                                                 carry)

                    return jax.lax.cond(jnp.any(sreach), run_super,
                                        lambda c: c, carry)

                return jax.lax.fori_loop(0, supers_per_seg, super_body,
                                         carry)

            return jax.lax.cond(jnp.any(seg_reach), run_seg, lambda c: c,
                                carry)

        if f2b:
            return shelled(n_tri_segs, tri_seg_ref, seg_body,
                           (best_t0, attrs0))
        return jax.lax.fori_loop(0, n_tri_segs, seg_body, (best_t0, attrs0))

    def tri_sweep_mxu(ox, oy, oz, dx, dy, dz, alive_f=None):
        """Streamed triangle sweep on the MXU (cfg.mega_mxu): per sublane
        row, ONE (n_q*SUPER_T, N_FEAT) @ (N_FEAT, 128) matmul computes every
        Moller-Trumbore quantity of a 256-triangle super against the row's
        128 rays; the validity epilogue + winner merge run on the VPU and
        hide under the MXU passes (measured 1.85x the VPU sweep in
        isolation — docs/experiments/mxu_determinants.py).  Segment/super
        slab culling is kept; CHUNK culling is not (the matmul covers the
        whole super).  MEASURED NEGATIVE end-to-end: losing per-chunk
        best-t pruning inside visited supers costs ~2.8x on the 124k-tri
        path-8 field (docs/ROUND2_NOTES.md "MXU sweep INTEGRATED") — kept
        as a tested, working example of MXU determinant evaluation, off by
        default.

        Numerics: a/t/u/v come from matmul-accumulated bilinear forms
        (t_num = o.n2 - v0.n2 rather than (o - v0).n2), so results agree
        with the VPU path to f32 rounding, not bit-exactly; cancellation
        grows with |o| (fine for scene-scale origins, tested)."""
        inv_dx, inv_dy, inv_dz = 1.0 / dx, 1.0 / dy, 1.0 / dz
        lo_cut = -float(BIG) if no_t_clip else t_min
        n_q = N_Q if backface_only else N_Q - 1   # dn block sliced off
        supers_per_seg = SEG_T // SUPER_T
        piota_t = jax.lax.broadcasted_iota(jnp.int32, (SUPER_T, 1), 0)

        # feature planes Phi = [d | o | c = d x o | 1]
        feats = (dx, dy, dz, ox, oy, oz,
                 dy * oz - dz * oy, dz * ox - dx * oz, dx * oy - dy * ox,
                 jnp.ones(shape, jnp.float32))
        for f, pf in enumerate(feats):
            feat_scratch[pl.ds(f * TILE_ROWS, TILE_ROWS), :] = pf
        # sweep state planes: 0 = best_t, 1..3 = normal, 4..12 = material
        sweep_scratch[pl.ds(0, TILE_ROWS), :] = jnp.full(shape, BIG,
                                                         jnp.float32)
        for p in range(1, 13):
            sweep_scratch[pl.ds(p * TILE_ROWS, TILE_ROWS), :] = jnp.zeros(
                shape, jnp.float32)

        def gate(reachable):
            return (reachable if alive_f is None
                    else reachable & (alive_f > 0.0))

        def super_mxu(s, u, carry):
            def row(r, carry):
                phi = jnp.concatenate(
                    [feat_scratch[pl.ds(f * TILE_ROWS + r, 1), :]
                     for f in range(N_FEAT)], axis=0)          # (N_FEAT,128)
                blk = coef_scratch[pl.ds(u * (N_Q * SUPER_T),
                                         n_q * SUPER_T), 0:N_FEAT]
                prod = jnp.dot(blk, phi,
                               preferred_element_type=jnp.float32)
                a = prod[0:SUPER_T]
                tn = prod[SUPER_T:2 * SUPER_T]
                un = prod[2 * SUPER_T:3 * SUPER_T]
                vn = prod[3 * SUPER_T:4 * SUPER_T]
                f_ = 1.0 / a
                uu = un * f_
                vv = vn * f_
                tt = tn * f_
                valid = (jnp.abs(a) >= TRI_EPSILON) & (uu >= 0.0) \
                    & (uu <= 1.0) & (vv >= 0.0) & (uu + vv <= 1.0)
                if back_culling:       # triangle.h:74
                    valid &= a >= TRI_EPSILON
                if backface_only:      # triangle.h:61 (dn matmul block)
                    valid &= prod[4 * SUPER_T:5 * SUPER_T] >= 0.0
                if no_t_clip:          # triangle.h:92-94
                    valid &= tt < t_max
                else:
                    valid &= (tt > t_min) & (tt < t_max)
                t3 = jnp.where(valid, tt, BIG)                 # (T, 128)
                idx_base = s * SEG_T + u * SUPER_T
                tmin = jnp.min(t3, axis=0, keepdims=True)      # (1, 128)
                idxc = jnp.where(t3 <= tmin, piota_t + idx_base, IDX_BIG)
                imin = jnp.min(idxc, axis=0, keepdims=True)
                wf = jnp.where((piota_t + idx_base) == imin, 1.0, 0.0)
                best_row = sweep_scratch[pl.ds(r, 1), :]
                take = tmin < best_row
                tf = jnp.where(take, 1.0, 0.0)
                sweep_scratch[pl.ds(r, 1), :] = jnp.where(take, tmin,
                                                          best_row)
                tri_base = u * SUPER_T

                def upd(cur):
                    out = []
                    for k, c in enumerate(cur):
                        lane = (T_N + k) if k < 3 else (T_MAT + (k - 3))
                        val = tri_scratch[pl.ds(tri_base, SUPER_T),
                                          lane:lane + 1]       # (T, 1)
                        w = jnp.sum(val * wf, axis=0, keepdims=True)
                        out.append(w * tf + c * (1.0 - tf))
                    return tuple(out)

                cur = tuple(sweep_scratch[pl.ds((1 + k) * TILE_ROWS + r,
                                                1), :]
                            for k in range(12))
                new = jax.lax.cond(jnp.any(take), upd, lambda c: c, cur)
                for k in range(12):
                    sweep_scratch[pl.ds((1 + k) * TILE_ROWS + r, 1), :] \
                        = new[k]
                return carry

            return jax.lax.fori_loop(0, TILE_ROWS, row, carry)

        def seg_body(s, carry):
            best_t = sweep_scratch[pl.ds(0, TILE_ROWS), :]
            seg_reach = gate(slab(tri_seg_ref, s, ox, oy, oz, inv_dx,
                                  inv_dy, inv_dz, best_t, lo_cut))

            def run_seg(carry):
                dma = pltpu.make_async_copy(
                    tri_ref.at[pl.ds(s * SEG_T, SEG_T), :], tri_scratch,
                    dma_sem)
                dmc = pltpu.make_async_copy(
                    tri_coef_ref.at[pl.ds(s * (N_Q * SEG_T),
                                          N_Q * SEG_T), :],
                    coef_scratch, coef_sem)
                dma.start()
                dmc.start()
                dma.wait()
                dmc.wait()

                def super_body(u, carry):
                    best_t = sweep_scratch[pl.ds(0, TILE_ROWS), :]
                    ug = s * supers_per_seg + u
                    sreach = gate(slab(tri_super_ref, ug, ox, oy, oz,
                                       inv_dx, inv_dy, inv_dz, best_t,
                                       lo_cut))
                    return jax.lax.cond(jnp.any(sreach),
                                        functools.partial(super_mxu, s, u),
                                        lambda c: c, carry)

                return jax.lax.fori_loop(0, supers_per_seg, super_body,
                                         carry)

            return jax.lax.cond(jnp.any(seg_reach), run_seg, lambda c: c,
                                carry)

        jax.lax.fori_loop(0, n_tri_segs, seg_body, jnp.float32(0.0))
        best_t = sweep_scratch[pl.ds(0, TILE_ROWS), :]
        attrs = tuple(sweep_scratch[pl.ds((1 + k) * TILE_ROWS, TILE_ROWS), :]
                      for k in range(12))
        return best_t, attrs

    if mxu:
        tri_sweep = tri_sweep_mxu  # noqa: F811 — static dispatch

    def trs_ray_chunk(tbl_ref, base, scl_k, rot_k, pos_k,
                      ox, oy, oz, dx, dy, dz):
        """TransformRay (transform.h:11-14) for one PRIM_CHUNK of table
        rows: ScaleRay divides the DIRECTION by the scale and renormalizes
        (the reference's unscaled-origin quirk), RotateRay row-matrix-
        rotates origin and direction, TranslateRay shifts the origin
        (ops/intersect._transform_rays_nc twin).  Per-row scalars enter as
        (P, 1, 1) sublane slices and broadcast against the (R, L) ray tile
        — the same 3D-candidate-tile amortization as the sphere/triangle
        sweeps (round 5: these sweeps were unrolled python loops over
        single rows before, which is what capped the engine at 64 prims
        per TRS class)."""
        def sc(k):
            return comp(tbl_ref, base, k)

        dsx = dx / sc(scl_k)
        dsy = dy / sc(scl_k + 1)
        dsz = dz / sc(scl_k + 2)
        inv_dl = 1.0 / jnp.sqrt(dsx * dsx + dsy * dsy + dsz * dsz)
        dsx, dsy, dsz = dsx * inv_dl, dsy * inv_dl, dsz * inv_dl
        m = tuple(sc(rot_k + i) for i in range(9))
        drx = m[0] * dsx + m[1] * dsy + m[2] * dsz
        dry = m[3] * dsx + m[4] * dsy + m[5] * dsz
        drz = m[6] * dsx + m[7] * dsy + m[8] * dsz
        orx = m[0] * ox + m[1] * oy + m[2] * oz - sc(pos_k)
        ory = m[3] * ox + m[4] * oy + m[5] * oz - sc(pos_k + 1)
        orz = m[6] * ox + m[7] * oy + m[8] * oz - sc(pos_k + 2)
        return (orx, ory, orz), (drx, dry, drz), m

    def _trs_table_sweep(n_prims, tbl_ref, candidate):
        """Shared chunked-sweep driver for the rect / TRS-sphere / TRS-
        triangle tables: fori_loop over PRIM_CHUNK chunks, merge() for the
        closest-hit reduce (within-chunk ties -> lowest row id, across
        chunks strict < — exactly the old unrolled loop's first-wins
        order), pick_attrs() for the winner attribute carry.  candidate
        (base) -> (t_cmp (P,R,L) BIG-on-miss, reads attr lambdas).

        NaN discipline: pick_attrs selects by sum(val * winner_mask), so
        every attr expression must be finite on NON-winning lanes too
        (0 * NaN = NaN) — candidates guard their t before forming hit
        points, unlike the old per-row where-chain which tolerated NaN on
        untaken rows.  Pad rows duplicate the last real prim
        (build_mega_tables pack): identical geometry -> equal t -> the
        lower (real) id wins merge's tie-break, so pads can never win."""
        best_t = jnp.full(shape, BIG, jnp.float32)
        attrs = tuple(jnp.zeros(shape, jnp.float32)
                      for _ in range(6 + N_MAT_COMPS + want_winners))
        n_chunks = -(-n_prims // PRIM_CHUNK)

        def body(ci, carry):
            best_t, attrs = carry[0], carry[1:]
            base = ci * PRIM_CHUNK
            t_cmp, reads = candidate(base)
            tmin, wmask, take = merge(best_t, t_cmp, base)
            if want_winners:
                reads = reads + [
                    lambda: (piota + base).astype(jnp.float32)]
            attrs = pick_attrs(wmask, take, reads, attrs)
            best_t = jnp.where(take, tmin, best_t)
            return (best_t,) + attrs

        if n_chunks == 1:     # common case: skip the loop machinery
            out = body(0, (best_t,) + attrs)
        else:
            out = jax.lax.fori_loop(0, n_chunks, body, (best_t,) + attrs)
        return out[0], out[1:]

    def rect_sweep(ox, oy, oz, dx, dy, dz):
        """rectangle.h:22-44 through the reference TransformRay chain
        (ops/intersect.rect_candidates twin), swept in PRIM_CHUNK table
        chunks.  Returns native-over-|d| rescaled t plus carried attrs:
        OBJECT-space hit point (the reference rec.p quirk — it is also the
        scattered-ray origin and the checker evaluation point), pre-rotated
        world normal, material block."""
        raw_len = jnp.sqrt(dx * dx + dy * dy + dz * dz)
        inv_raw = 1.0 / raw_len

        def candidate(base):
            def sc(k):
                return comp(rect_ref, base, k)

            sgn = sc(R_SGN)
            (orx, ory, orz), (drx, dry, drz), _ = trs_ray_chunk(
                rect_ref, base, R_SCL, R_ROT, R_POS, ox, oy, oz, dx, dy, dz)
            t = -orz / drz
            x = orx + t * drx
            y = ory + t * dry
            facing = drz * sgn
            valid = (facing <= 0.0) & (t >= t_min) & (t <= t_max) \
                & (x >= -0.5) & (x <= 0.5) & (y >= -0.5) & (y <= 0.5)
            t_cmp = jnp.where(valid, t * inv_raw, BIG)
            # finite-on-miss attr forms (see _trs_table_sweep NaN note):
            # t can be inf/NaN when drz ~ 0
            tp = jnp.where(valid, t, 0.0)
            xg = orx + tp * drx
            yg = ory + tp * dry
            pz = orz + tp * drz
            # p_obj = (x, y, ~0): the rect lives on its object z=0 plane
            reads = [lambda: xg, lambda: yg, lambda: pz,
                     lambda: sc(R_NRM) + 0.0 * xg,
                     lambda: sc(R_NRM + 1) + 0.0 * xg,
                     lambda: sc(R_NRM + 2) + 0.0 * xg] + [
                (lambda k=k: sc(R_MAT + k) + 0.0 * xg)
                for k in range(N_MAT_COMPS)]
            return t_cmp, reads

        return _trs_table_sweep(n_rects, rect_ref, candidate)

    def tsph_sweep(ox, oy, oz, dx, dy, dz):
        """sphere.h:27-55 on the TransformRay'd ray (origin-centered
        object-space sphere; ops/intersect.t_sphere_candidates twin), swept
        in PRIM_CHUNK table chunks.  Attrs: OBJECT-space hit point
        (reference rec.p quirk), world normal (object normal p/r rotated by
        the object rotation, hitable.h:36), material block."""
        raw_len = jnp.sqrt(dx * dx + dy * dy + dz * dz)
        inv_raw = 1.0 / raw_len

        def candidate(base):
            def sc(k):
                return comp(tsph_ref, base, k)

            (orx, ory, orz), (drx, dry, drz), m = trs_ray_chunk(
                tsph_ref, base, TS_SCL, TS_ROT, TS_POS,
                ox, oy, oz, dx, dy, dz)
            b = orx * drx + ory * dry + orz * drz
            a = drx * drx + dry * dry + drz * drz
            c = orx * orx + ory * ory + orz * orz - sc(TS_R2)
            disc = b * b - a * c
            has = disc > 0.0
            sq = jnp.sqrt(jnp.where(has, disc, 0.0))
            inv_a = 1.0 / a
            t0 = (-b - sq) * inv_a
            t1 = (-b + sq) * inv_a
            # t window in the NATIVE (normalized) parameterization
            # (sphere.h:38/45 on the transformed ray)
            ok0 = has & (t0 < t_max) & (t0 > t_min)
            ok1 = has & (t1 < t_max) & (t1 > t_min)
            tn = jnp.where(ok0, t0, t1)
            valid = ok0 | ok1
            t_cmp = jnp.where(valid, tn * inv_raw, BIG)
            tp = jnp.where(valid, tn, 0.0)   # miss: BIG*d overflows to inf
            pxo = orx + tp * drx
            pyo = ory + tp * dry
            pzo = orz + tp * drz
            inv_r = sc(TS_INVR)
            nox, noy, noz = pxo * inv_r, pyo * inv_r, pzo * inv_r
            reads = [lambda: pxo, lambda: pyo, lambda: pzo,
                     lambda: m[0] * nox + m[1] * noy + m[2] * noz,
                     lambda: m[3] * nox + m[4] * noy + m[5] * noz,
                     lambda: m[6] * nox + m[7] * noy + m[8] * noz] + [
                (lambda k=k: sc(TS_MAT + k) + 0.0 * pxo)
                for k in range(N_MAT_COMPS)]
            return t_cmp, reads

        return _trs_table_sweep(n_tsph, tsph_ref, candidate)

    def ttri_sweep(ox, oy, oz, dx, dy, dz):
        """triangle.h:57-100 (Moller-Trumbore, quirks included) on the
        TransformRay'd ray against OBJECT-space vertices
        (ops/intersect.t_triangle_candidates twin), swept in PRIM_CHUNK
        table chunks.  Attrs: object-space hit point, pre-rotated world
        normal, material block."""
        raw_len = jnp.sqrt(dx * dx + dy * dy + dz * dz)
        inv_raw = 1.0 / raw_len

        def candidate(base):
            def sc(k):
                return comp(ttri_ref, base, k)

            (orx, ory, orz), (drx, dry, drz), _ = trs_ray_chunk(
                ttri_ref, base, TT_SCL, TT_ROT, TT_POS,
                ox, oy, oz, dx, dy, dz)
            e1x, e1y, e1z = sc(TT_E1), sc(TT_E1 + 1), sc(TT_E1 + 2)
            e2x, e2y, e2z = sc(TT_E2), sc(TT_E2 + 1), sc(TT_E2 + 2)
            hx = dry * e2z - drz * e2y
            hy = drz * e2x - drx * e2z
            hz = drx * e2y - dry * e2x
            a = e1x * hx + e1y * hy + e1z * hz
            eps_ok = jnp.abs(a) >= TRI_EPSILON
            f = 1.0 / jnp.where(eps_ok, a, 1.0)
            sx = orx - sc(TT_V0)
            sy = ory - sc(TT_V0 + 1)
            sz = orz - sc(TT_V0 + 2)
            uu = f * (sx * hx + sy * hy + sz * hz)
            qx = sy * e1z - sz * e1y
            qy = sz * e1x - sx * e1z
            qz = sx * e1y - sy * e1x
            vv = f * (drx * qx + dry * qy + drz * qz)
            tn = f * (e2x * qx + e2y * qy + e2z * qz)
            valid = eps_ok & (uu >= 0.0) & (uu <= 1.0) \
                & (vv >= 0.0) & (uu + vv <= 1.0)
            if back_culling:
                valid &= a >= TRI_EPSILON
            if backface_only:
                # triangle.h:61 on the TRANSFORMED direction vs the OBJECT
                # normal
                valid &= (drx * sc(TT_NOBJ) + dry * sc(TT_NOBJ + 1)
                          + drz * sc(TT_NOBJ + 2)) >= 0.0
            if no_t_clip:
                valid &= tn < t_max
            else:
                valid &= (tn > t_min) & (tn < t_max)
            t_cmp = jnp.where(valid, tn * inv_raw, BIG)
            tp = jnp.where(valid, tn, 0.0)
            pxo = orx + tp * drx
            pyo = ory + tp * dry
            pzo = orz + tp * drz
            reads = [lambda: pxo, lambda: pyo, lambda: pzo,
                     lambda: sc(TT_NW) + 0.0 * pxo,
                     lambda: sc(TT_NW + 1) + 0.0 * pxo,
                     lambda: sc(TT_NW + 2) + 0.0 * pxo] + [
                (lambda k=k: sc(TT_MAT + k) + 0.0 * pxo)
                for k in range(N_MAT_COMPS)]
            return t_cmp, reads

        return _trs_table_sweep(n_ttri, ttri_ref, candidate)

    def trs_merge(t, px, py, pz, nx, ny, nz, m, ox, oy, oz, dx, dy, dz,
                  wid=None):
        """Fold the runtime-TRS sweeps into the closest-hit state AFTER the
        rect merge (index order [spheres | tris | rects | t_sph | t_tri] —
        strict < keeps the reference's first-wins tie-break).  TRS winners
        use their OBJECT-space hit point (reference rec.p quirk) and the
        rotated world normal, exactly like rects.  Shared by the bounce loop
        and the lambert/normal epilogue.  wid (want_winners): running winner
        TABLE id plane, overridden with [tsph_off | ttri_off] + index when a
        TRS prim wins."""
        for n_prims, sweep, off in ((n_tsph, tsph_sweep, tsph_off),
                                    (n_ttri, ttri_sweep, ttri_off)):
            if not n_prims:
                continue
            w_t, w_at = sweep(ox, oy, oz, dx, dy, dz)
            w = w_t < t
            t = jnp.where(w, w_t, t)
            px = jnp.where(w, w_at[0], px)
            py = jnp.where(w, w_at[1], py)
            pz = jnp.where(w, w_at[2], pz)
            nx = jnp.where(w, w_at[3], nx)
            ny = jnp.where(w, w_at[4], ny)
            nz = jnp.where(w, w_at[5], nz)
            m = [jnp.where(w, w_at[6 + k], m[k]) for k in range(N_MAT_COMPS)]
            if wid is not None:
                wid = jnp.where(w, w_at[6 + N_MAT_COMPS] + float(off), wid)
        return t, px, py, pz, nx, ny, nz, m, wid

    def draw_samples(step):
        """(ballx, bally, ballz, prob) — in-kernel TPU PRNG (Box-Muller
        direction + cbrt radius, the core/rng.random_in_unit_sphere
        distribution) or the injected stream."""
        if injected:
            u4 = uni_ref[pl.ds(step * 4, 4)]
            return u4[0], u4[1], u4[2], u4[3]
        bits = pltpu.prng_random_bits((6,) + shape)
        # prng_random_bits returns SIGNED int32; >> is an arithmetic shift,
        # so mask to the low 24 bits AFTER shifting to get u in [0, 1).
        u = ((bits >> 8) & 0xFFFFFF).astype(jnp.float32) * (1.0 / 16777216.0)
        r1 = jnp.sqrt(-2.0 * jnp.log(jnp.maximum(u[0], 1e-12)))
        ang1 = (2.0 * np.pi) * u[1]
        g0 = r1 * jnp.cos(ang1)
        g1 = r1 * jnp.sin(ang1)
        r2 = jnp.sqrt(-2.0 * jnp.log(jnp.maximum(u[2], 1e-12)))
        g2 = r2 * jnp.cos((2.0 * np.pi) * u[3])
        inv_norm = 1.0 / jnp.maximum(
            jnp.sqrt(g0 * g0 + g1 * g1 + g2 * g2), 1e-12)
        rad = jnp.exp(jnp.log(jnp.maximum(u[4], 1e-30)) * (1.0 / 3.0))
        s = inv_norm * rad
        return g0 * s, g1 * s, g2 * s, u[5]

    # ------------------------------------------------------------------
    # Bounce loop
    # ------------------------------------------------------------------
    def bounce(step, carry):
        # want_winners: carry has a 14th plane (this bounce's winner TABLE
        # id, seeded -1 by the caller); live overwrites it, the identity
        # branch below passes the -1 seed through for dead tiles.
        def live(carry):
            (ox, oy, oz, dx, dy, dz, tr_, tg, tb, rr, rg, rb,
             alive_f) = carry[:13]
            # alive is carried as f32 0/1 — Mosaic cannot carry i1 vectors
            # through fori/cond boundaries (trunci to i1 is unsupported).
            alive = alive_f > 0.0

            if has_sph:
                s_t, s_at = sphere_sweep(ox, oy, oz, dx, dy, dz, alive_f)
            else:
                s_t = jnp.full(shape, BIG, jnp.float32)
                s_at = tuple(jnp.zeros(shape, jnp.float32)
                             for _ in range(4 + N_MAT_COMPS + want_winners))
            if has_tri:
                t_t, t_at = tri_sweep(ox, oy, oz, dx, dy, dz, alive_f)
            else:
                t_t = jnp.full(shape, BIG, jnp.float32)
                t_at = tuple(jnp.zeros(shape, jnp.float32)
                             for _ in range(3 + N_MAT_COMPS + want_winners))

            tri_w = t_t < s_t
            t = jnp.where(tri_w, t_t, s_t)
            if n_rects:
                r_t, r_at = rect_sweep(ox, oy, oz, dx, dy, dz)
                rect_w = r_t < t
                t = jnp.where(rect_w, r_t, t)

            px = ox + t * dx
            py = oy + t * dy
            pz = oz + t * dz
            # normal: sphere (p - c) / r  (sphere.h:40) vs stored face normal
            s_nx = (px - s_at[0]) * s_at[3]
            s_ny = (py - s_at[1]) * s_at[3]
            s_nz = (pz - s_at[2]) * s_at[3]
            nx = jnp.where(tri_w, t_at[0], s_nx)
            ny = jnp.where(tri_w, t_at[1], s_ny)
            nz = jnp.where(tri_w, t_at[2], s_nz)
            m = [jnp.where(tri_w, t_at[3 + k], s_at[4 + k])
                 for k in range(N_MAT_COMPS)]
            if n_rects:
                # rect winners use the OBJECT-space hit point (reference
                # rec.p quirk: also the scattered origin + checker point)
                px = jnp.where(rect_w, r_at[0], px)
                py = jnp.where(rect_w, r_at[1], py)
                pz = jnp.where(rect_w, r_at[2], pz)
                nx = jnp.where(rect_w, r_at[3], nx)
                ny = jnp.where(rect_w, r_at[4], ny)
                nz = jnp.where(rect_w, r_at[5], nz)
                m = [jnp.where(rect_w, r_at[6 + k], m[k])
                     for k in range(N_MAT_COMPS)]
            wid = None
            if want_winners:
                # winner TABLE id ([sphere rows | +tri_off tri rows |
                # +rect_off rect | +tsph_off/+ttri_off TRS index])
                wid = jnp.where(tri_w, t_at[3 + N_MAT_COMPS] + float(tri_off),
                                s_at[4 + N_MAT_COMPS])
                if n_rects:
                    wid = jnp.where(rect_w,
                                    r_at[6 + N_MAT_COMPS] + float(rect_off),
                                    wid)
            if n_tsph or n_ttri:
                (t, px, py, pz, nx, ny, nz, m, wid) = trs_merge(
                    t, px, py, pz, nx, ny, nz, m, ox, oy, oz, dx, dy, dz,
                    wid)
            hit = t < BIG_CUT
            (kind, aux, (atr, atg, atb), (emr, emg, emb), is_met, is_die,
             is_light) = mat_decode(m, px, py, pz)

            ballx, bally, ballz, prob = draw_samples(step)

            # LAMBERTIAN (material.h:60-68): dir = n + ball
            lamx = nx + ballx
            lamy = ny + bally
            lamz = nz + ballz

            # METAL (material.h:81-92)
            d_len2 = dx * dx + dy * dy + dz * dz
            inv_dlen = 1.0 / jnp.sqrt(d_len2)
            udx, udy, udz = dx * inv_dlen, dy * inv_dlen, dz * inv_dlen
            ud_n = udx * nx + udy * ny + udz * nz
            refx = udx - 2.0 * ud_n * nx
            refy = udy - 2.0 * ud_n * ny
            refz = udz - 2.0 * ud_n * nz
            metx = refx + aux * ballx
            mety = refy + aux * bally
            metz = refz + aux * ballz
            met_ok = (metx * nx + mety * ny + metz * nz) > 0.0

            # DIELECTRIC (material.h:104-141)
            d_n = dx * nx + dy * ny + dz * nz
            exiting = d_n > 0.0
            sgn = jnp.where(exiting, -1.0, 1.0)          # outward normal sign
            onx, ony, onz = sgn * nx, sgn * ny, sgn * nz
            ni = jnp.where(exiting, aux, 1.0 / aux)
            cos_plain = jnp.where(exiting, d_n, -d_n) * inv_dlen
            if die_ref_cosine:   # material.h:116-117 nonstandard exit cosine
                qv = 1.0 - aux * aux * (1.0 - cos_plain * cos_plain)
                cos_exit = jnp.where(qv > 0.0,
                                     jnp.sqrt(jnp.maximum(qv, 0.0)), 0.0)
                cosine = jnp.where(exiting, cos_exit, cos_plain)
            else:
                cosine = cos_plain
            # refract(d, outward, ni): on unit d
            dtv = udx * onx + udy * ony + udz * onz
            disc_r = 1.0 - ni * ni * (1.0 - dtv * dtv)
            refr_ok = disc_r > 0.0
            sq_r = jnp.sqrt(jnp.maximum(disc_r, 0.0))
            refrx = ni * (udx - onx * dtv) - onx * sq_r
            refry = ni * (udy - ony * dtv) - ony * sq_r
            refrz = ni * (udz - onz * dtv) - onz * sq_r
            # schlick (material.h:33-37); clamp matches v3.schlick — with
            # non-unit stored normals cosine can exceed 1 and an unclamped
            # (1-cosine)^5 would go negative, diverging from the wavefront
            one_c = jnp.maximum(1.0 - cosine, 0.0)
            r0 = (1.0 - aux) / (1.0 + aux)
            r0 = r0 * r0
            one_c5 = one_c * one_c
            one_c5 = one_c5 * one_c5 * one_c
            refl_p = jnp.where(refr_ok, r0 + (1.0 - r0) * one_c5, 1.0)
            # reflect on the UNNORMALIZED direction (material.h:107)
            drefx = dx - 2.0 * d_n * nx
            drefy = dy - 2.0 * d_n * ny
            drefz = dz - 2.0 * d_n * nz
            take_refl = prob < refl_p
            diex = jnp.where(take_refl, drefx, refrx)
            diey = jnp.where(take_refl, drefy, refry)
            diez = jnp.where(take_refl, drefz, refrz)

            # select by material kind (attenuation already decoded above)
            outx = jnp.where(is_met, metx, lamx)
            outy = jnp.where(is_met, mety, lamy)
            outz = jnp.where(is_met, metz, lamz)
            outx = jnp.where(is_die, diex, outx)
            outy = jnp.where(is_die, diey, outy)
            outz = jnp.where(is_die, diez, outz)
            # no jnp.where on bool operands — Mosaic can't truncate the i8
            # select result back to i1; plain boolean algebra lowers clean
            ok = (is_met & met_ok) | (~is_met & ~is_light)

            # sky (render.h:41-46) on the CURRENT direction
            sky_t = 0.5 * (dy * inv_dlen + 1.0)
            skyr = (1.0 - sky_t) + sky_t * 0.5
            skyg = (1.0 - sky_t) + sky_t * 0.7
            skyb = (1.0 - sky_t) + sky_t * 1.0

            can_rec = step + step_lo < max_depth  # render.h:57 depth > 0
            continues = alive & hit & ok & can_rec
            absorbed = alive & hit & ~(ok & can_rec)
            missed = alive & ~hit

            cr = jnp.where(alive & hit, emr, 0.0) \
                + jnp.where(absorbed, ambient, 0.0) \
                + jnp.where(missed, skyr, 0.0)
            cg = jnp.where(alive & hit, emg, 0.0) \
                + jnp.where(absorbed, ambient, 0.0) \
                + jnp.where(missed, skyg, 0.0)
            cb = jnp.where(alive & hit, emb, 0.0) \
                + jnp.where(absorbed, ambient, 0.0) \
                + jnp.where(missed, skyb, 0.0)
            rr = rr + tr_ * cr
            rg = rg + tg * cg
            rb = rb + tb * cb

            # pre-attenuation throughput, used by the want_tex planes below
            thr_r, thr_g, thr_b = tr_, tg, tb
            tr_ = jnp.where(continues, tr_ * atr, tr_)
            tg = jnp.where(continues, tg * atg, tg)
            tb = jnp.where(continues, tb * atb, tb)
            ox = jnp.where(continues, px, ox)
            oy = jnp.where(continues, py, oy)
            oz = jnp.where(continues, pz, oz)
            dx = jnp.where(continues, outx, dx)
            dy = jnp.where(continues, outy, dy)
            dz = jnp.where(continues, outz, dz)
            out = (ox, oy, oz, dx, dy, dz, tr_, tg, tb, rr, rg, rb,
                   jnp.where(continues, 1.0, 0.0))
            if want_winners:
                # -1 = miss/dead; carried so the (unrolled) driver can store
                # the winner plane per bounce
                out = out + (jnp.where(alive & hit, wid, -1.0),)
            if want_tex:
                # deferred-texturing planes (trace_path_mega_tex): this
                # step's EMISSION term and AMBIENT+SKY term — split because
                # the image emission factor g multiplies only the former —
                # plus the winning hit point (object-space where the winner
                # is, i.e. for rects/TRS prims, like the carried attrs).
                # All use the PRE-update throughput, exactly like the
                # in-kernel accumulation above.
                ah = alive & hit
                out = out + (
                    jnp.where(ah, emr, 0.0) * thr_r,
                    jnp.where(ah, emg, 0.0) * thr_g,
                    jnp.where(ah, emb, 0.0) * thr_b,
                    (jnp.where(absorbed, ambient, 0.0)
                     + jnp.where(missed, skyr, 0.0)) * thr_r,
                    (jnp.where(absorbed, ambient, 0.0)
                     + jnp.where(missed, skyg, 0.0)) * thr_g,
                    (jnp.where(absorbed, ambient, 0.0)
                     + jnp.where(missed, skyb, 0.0)) * thr_b,
                    jnp.where(ah, px, 0.0),
                    jnp.where(ah, py, 0.0),
                    jnp.where(ah, pz, 0.0),
                )
            return out

        return jax.lax.cond(jnp.any(carry[12] > 0.0), live, lambda c: c,
                            carry)

    ox, oy, oz = o_ref[0], o_ref[1], o_ref[2]
    dx, dy, dz = d_ref[0], d_ref[1], d_ref[2]
    if integrator == "path":
        one = jnp.ones(shape, jnp.float32)
        zero = jnp.zeros(shape, jnp.float32)
        if resume:
            carry = (ox, oy, oz, dx, dy, dz,
                     st_ref[0], st_ref[1], st_ref[2],
                     zero, zero, zero, st_ref[3])
        else:
            carry = (ox, oy, oz, dx, dy, dz, one, one, one,
                     zero, zero, zero, one)
        assert n_steps > 0, "caller (_mega_call) resolves the step count"
        if want_winners:
            # Unrolled so each bounce's winner plane is stored at a STATIC
            # leading index (and so the -1 seed can be threaded per step).
            # n_steps is small (max_depth + 1); the math is identical to the
            # fori_loop path.  want_tex adds 9 more per-step planes (em rgb,
            # ambient+sky rgb, hit point xyz) whose dead-tile seeds are 0.
            neg1 = jnp.full(shape, -1.0, jnp.float32)
            n_extra = 10 if want_tex else 1
            zero_p = jnp.zeros(shape, jnp.float32)
            seeds = (neg1,) + (zero_p,) * (n_extra - 1)
            for step in range(n_steps):
                stepped = bounce(step, carry + seeds)
                for j in range(n_extra):
                    out_ref[3 + step * n_extra + j] = stepped[13 + j]
                carry = stepped[:13]
        else:
            carry = jax.lax.fori_loop(0, n_steps, bounce, carry)
        out_ref[0] = carry[9]
        out_ref[1] = carry[10]
        out_ref[2] = carry[11]
        if dump_state:                        # [rad | o | d | thr | alive]
            out_ref[3] = carry[0]
            out_ref[4] = carry[1]
            out_ref[5] = carry[2]
            out_ref[6] = carry[3]
            out_ref[7] = carry[4]
            out_ref[8] = carry[5]
            out_ref[9] = carry[6]
            out_ref[10] = carry[7]
            out_ref[11] = carry[8]
            out_ref[12] = carry[12]
        return

    # ---- single-intersect debug integrators (render.h:70-87 / :90-103) ----
    if has_sph:
        s_t, s_at = sphere_sweep(ox, oy, oz, dx, dy, dz)
    else:
        s_t = jnp.full(shape, BIG, jnp.float32)
        s_at = tuple(jnp.zeros(shape, jnp.float32)
                     for _ in range(4 + N_MAT_COMPS + want_winners))
    if has_tri:
        t_t, t_at = tri_sweep(ox, oy, oz, dx, dy, dz)
    else:
        t_t = jnp.full(shape, BIG, jnp.float32)
        t_at = tuple(jnp.zeros(shape, jnp.float32)
                     for _ in range(3 + N_MAT_COMPS + want_winners))
    tri_w = t_t < s_t
    t = jnp.where(tri_w, t_t, s_t)
    if n_rects:
        r_t, r_at = rect_sweep(ox, oy, oz, dx, dy, dz)
        rect_w = r_t < t
        t = jnp.where(rect_w, r_t, t)
    hit0 = t < BIG_CUT
    ts_ = jnp.where(hit0, t, 0.0)    # miss: BIG*d overflows to inf -> NaN
    px = ox + ts_ * dx
    py = oy + ts_ * dy
    pz = oz + ts_ * dz
    nx = jnp.where(tri_w, t_at[0], (px - s_at[0]) * s_at[3])
    ny = jnp.where(tri_w, t_at[1], (py - s_at[1]) * s_at[3])
    nz = jnp.where(tri_w, t_at[2], (pz - s_at[2]) * s_at[3])
    m = [jnp.where(tri_w, t_at[3 + k], s_at[4 + k])
         for k in range(N_MAT_COMPS)]
    if n_rects:
        px = jnp.where(rect_w, r_at[0], px)
        py = jnp.where(rect_w, r_at[1], py)
        pz = jnp.where(rect_w, r_at[2], pz)
        nx = jnp.where(rect_w, r_at[3], nx)
        ny = jnp.where(rect_w, r_at[4], ny)
        nz = jnp.where(rect_w, r_at[5], nz)
        m = [jnp.where(rect_w, r_at[6 + k], m[k]) for k in range(N_MAT_COMPS)]
    wid = None
    if want_winners:      # winner TABLE id (see bounce loop; lambert tex)
        wid = jnp.where(tri_w, t_at[3 + N_MAT_COMPS] + float(tri_off),
                        s_at[4 + N_MAT_COMPS])
        if n_rects:
            wid = jnp.where(rect_w, r_at[6 + N_MAT_COMPS] + float(rect_off),
                            wid)
    if n_tsph or n_ttri:
        # compare against the UNCLAMPED t (ts_ is 0 on misses, which would
        # shadow any TRS hit there); p/n/m merge like the rect overrides
        (t, px, py, pz, nx, ny, nz, m, wid) = trs_merge(
            t, px, py, pz, nx, ny, nz, m, ox, oy, oz, dx, dy, dz, wid)
    hit = t < BIG_CUT
    inv_dlen = 1.0 / jnp.sqrt(dx * dx + dy * dy + dz * dz)
    sky_t = 0.5 * (dy * inv_dlen + 1.0)
    skyr = (1.0 - sky_t) + sky_t * 0.5
    skyg = (1.0 - sky_t) + sky_t * 0.7
    skyb = (1.0 - sky_t) + sky_t * 1.0
    if integrator == "normal":
        out_ref[0] = jnp.where(hit, nx, skyr)
        out_ref[1] = jnp.where(hit, ny, skyg)
        out_ref[2] = jnp.where(hit, nz, skyb)
        return
    # LambertShade (render.h:70-87): att * max(dot(dir, n), 0) * sky * 0.2
    # + emitted; the reference uses the UNNORMALIZED camera direction
    (_, _, (atr, atg, atb), (emr, emg, emb), _, _, _) = mat_decode(
        m, px, py, pz)
    scale_d = 1.0 if lambert_unnorm else inv_dlen
    tq = jnp.maximum((dx * nx + dy * ny + dz * nz) * scale_d, 0.0)
    litr = atr * tq * skyr * 0.2 + emr
    litg = atg * tq * skyg * 0.2 + emg
    litb = atb * tq * skyb * 0.2 + emb
    out_ref[0] = jnp.where(hit, litr, skyr)
    out_ref[1] = jnp.where(hit, litg, skyg)
    out_ref[2] = jnp.where(hit, litb, skyb)
    if want_tex:
        # Deferred texturing for LambertShade as TWO pseudo-steps of the
        # path reconstruction L = sum_i (em_i g_i + other_i) prod_{j<i} f_j
        # (trace_path_mega_tex docstring):
        #   step 0: em = emitted (placeholder-1 for image lights, g
        #           multiplies the real texel back), other = miss-sky,
        #           f_0 = the winner's attenuation texel;
        #   step 1: em = 0, other = att * t * sky * 0.2 (placeholder-1
        #           att) — picking up exactly one factor f_0.
        # Unlike the path integrator, LambertShade's att term applies to
        # LIGHT materials too (scatter's lam_att, material.h:63), so the
        # reconstruction's f must gate on lambertian OR light rows —
        # integrators route with att_includes_light=True.
        miss = ~hit
        out_ref[3] = jnp.where(hit, wid, -1.0)
        out_ref[4] = jnp.where(hit, emr, 0.0)
        out_ref[5] = jnp.where(hit, emg, 0.0)
        out_ref[6] = jnp.where(hit, emb, 0.0)
        out_ref[7] = jnp.where(miss, skyr, 0.0)
        out_ref[8] = jnp.where(miss, skyg, 0.0)
        out_ref[9] = jnp.where(miss, skyb, 0.0)
        out_ref[10] = jnp.where(hit, px, 0.0)
        out_ref[11] = jnp.where(hit, py, 0.0)
        out_ref[12] = jnp.where(hit, pz, 0.0)
        out_ref[13] = jnp.full(shape, -1.0, jnp.float32)
        out_ref[14] = jnp.zeros(shape, jnp.float32)
        out_ref[15] = jnp.zeros(shape, jnp.float32)
        out_ref[16] = jnp.zeros(shape, jnp.float32)
        out_ref[17] = jnp.where(hit, litr - emr, 0.0)
        out_ref[18] = jnp.where(hit, litg - emg, 0.0)
        out_ref[19] = jnp.where(hit, litb - emb, 0.0)
        out_ref[20] = jnp.zeros(shape, jnp.float32)
        out_ref[21] = jnp.zeros(shape, jnp.float32)
        out_ref[22] = jnp.zeros(shape, jnp.float32)


# ---------------------------------------------------------------------------
# Host wrapper
# ---------------------------------------------------------------------------

def _morton_u32(x: Array, y: Array, z: Array) -> Array:
    """30-bit Morton code of quantized coordinates (device-side jnp twin of
    pallas_intersect.morton_order's host version)."""
    def spread(v):
        v = v & 0x3FF
        v = (v | (v << 16)) & 0x030000FF
        v = (v | (v << 8)) & 0x0300F00F
        v = (v | (v << 4)) & 0x030C30C3
        v = (v | (v << 2)) & 0x09249249
        return v

    def q(a):
        lo = jnp.min(a)
        span = jnp.maximum(jnp.max(a) - lo, 1e-20)
        return jnp.clip((a - lo) / span * 1023.0, 0, 1023).astype(jnp.uint32)

    return (spread(q(x)) << 2) | (spread(q(y)) << 1) | spread(q(z))


def trace_path_mega_compact(scene: Scene, rays: Rays, key: jax.Array,
                            cfg: RenderConfig,
                            tables: Optional[MegaTables] = None,
                            primary_steps: int = 1, samples=None) -> Array:
    """Two-phase fused path with WAVEFRONT COMPACTION between phases.

    Phase A runs `primary_steps` bounces on the coherent camera rays and
    dumps the surviving ray state; the rays are then SORTED — dead rays last,
    alive rays by the Morton code of their scatter origin — and phase B
    resumes the remaining bounces on the sorted wavefront.  Tiles that end up
    fully dead cost one any() test per bounce (the kernel's tile-level
    early-out), and alive tiles become spatially coherent again so the
    chunk/super/segment box culling keeps working for secondary rays.  Wins
    when many primaries miss (mesh scenes over sky); near-neutral when the
    frame is fully covered.  Same math as trace_path_mega — sorting only
    reorders lanes.
    """
    from .integrators import stream_from_key

    if not 0 < primary_steps <= cfg.max_depth:
        raise ValueError(
            f"compact_after/primary_steps must be in [1, max_depth] "
            f"(= [1, {cfg.max_depth}]); got {primary_steps} — phase B needs "
            "at least one remaining bounce step")
    if tables is None:
        tables = build_mega_tables(
            scene, mxu=cfg.mega_mxu and scene.n_triangles > MAX_VMEM_PRIMS)
    n = rays.origin.shape[0]
    rows = _ray_rows(n)
    o = jnp.stack([_pad_rays(rays.origin[:, k], rows) for k in range(3)])
    d = jnp.stack([_pad_rays(rays.direction[:, k], rows) for k in range(3)])

    injected = samples is not None
    if not injected and _interpret():
        samples = stream_from_key(key, n, cfg.max_depth)
        injected = True
    planes_all = (_stream_planes(samples.ball, samples.prob, rows)
                  if injected else None)
    k1, k2 = jax.random.split(key)

    st = _mega_call(scene, o, d, k1, cfg, tables,
                    stream_planes=(planes_all[:4 * primary_steps]
                                   if injected else None),
                    dump_state=True, step_lo=0, n_steps=primary_steps)
    flat = st.reshape(13, -1)
    rad_a = flat[0:3]
    o2, d2, thr, alive = flat[3:6], flat[6:9], flat[9:12], flat[12]
    alive_b = alive > 0.0

    code = _morton_u32(o2[0], o2[1], o2[2]).astype(jnp.int32) & 0x3FFFFFFF
    sort_key = jnp.where(alive_b, code, jnp.int32(2 ** 31 - 2))  # dead last
    order = jnp.argsort(sort_key)

    o3 = o2[:, order].reshape(3, rows, LANES)
    d3 = d2[:, order].reshape(3, rows, LANES)
    state = jnp.concatenate([thr, alive[None]])[:, order].reshape(
        4, rows, LANES)
    planes_b = None
    if injected:
        pb = planes_all[4 * primary_steps:].reshape(-1, rows * LANES)
        planes_b = pb[:, order].reshape(-1, rows, LANES)

    rad_b_sorted = _mega_call(scene, o3, d3, k2, cfg, tables,
                              stream_planes=planes_b, state=state,
                              step_lo=primary_steps).reshape(3, -1)
    rad_b = jnp.zeros_like(rad_b_sorted).at[:, order].set(rad_b_sorted)
    return (rad_a + rad_b)[:, :n].T


def _partition_alive_first(alive_f: Array) -> Array:
    """Stable alive-first partition permutation (two cumsums + one scatter —
    no sort).  Returns order: int32[N] such that x[order] places every alive
    lane before every dead lane, each group in original order.

    Versus the argsort in trace_path_mega_compact this is O(N) instead of a
    multi-pass radix sort, and STABILITY means alive rays keep their original
    screen-swizzled order — which is already spatially coherent, so no Morton
    re-sort is needed."""
    alive = alive_f > 0.0
    alive_i = alive.astype(jnp.int32)
    n_alive = jnp.sum(alive_i)
    pos = jnp.where(alive, jnp.cumsum(alive_i) - 1,
                    n_alive + jnp.cumsum(1 - alive_i) - 1)
    n = alive_f.shape[0]
    return jnp.zeros((n,), jnp.int32).at[pos].set(
        jnp.arange(n, dtype=jnp.int32))


def trace_path_mega_phased(scene: Scene, rays: Rays, key: jax.Array,
                           cfg: RenderConfig,
                           tables: Optional[MegaTables] = None,
                           compact_every: int = 1, samples=None,
                           octants: Optional[bool] = None,
                           first_window: Optional[int] = None) -> Array:
    """Fused path with CHEAP stable-partition compaction every N bounces.

    The single megakernel's per-bounce cost is FLAT on mixed tiles: one alive
    lane among 4096 keeps the whole tile's union-of-work going every bounce
    (the tile-level early-out only fires when ALL lanes die).  This driver
    runs the fused bounce loop in windows of ``compact_every`` bounces and,
    between windows, stably PARTITIONS the wavefront alive-first — dead rays
    collapse into tail tiles that hit the early-out, and the live prefix
    keeps its screen-swizzled spatial coherence (stable partition preserves
    order, unlike trace_path_mega_compact's Morton argsort, whose sort cost
    made it a net loss).  Compaction cost per window is two cumsums, one
    scatter, and a 13-plane gather — O(N) bandwidth, no sort.

    octants=True (cfg.compact_octants) additionally sorts the alive prefix
    by (coarse origin cell, DIRECTION OCTANT, fine origin Morton): scattered
    bounce rays regroup into tiles that share a spatial patch AND a
    direction cone, so each tile's union of reachable boxes collapses from
    "every box in some lane's direction" to the few boxes along one cone.
    This targets LARGE streamed scenes, where measured per-segment lane
    utilization of the monolithic kernel is ~0.2% — for small scenes the
    sort + 14-plane round-trip dominates (see ROUND2_NOTES; both compaction
    modes measured net losses on VMEM-resident workloads).

    Same math as trace_path_mega: reordering only moves lanes, and a chunk
    culled by the tile vote can improve no lane's hit, so results are
    bit-identical for any ``compact_every`` under an injected stream.  With
    the in-kernel PRNG, draws depend on (tile, lane) placement, so images
    differ from the monolithic kernel by sample noise only.
    """
    from .integrators import stream_from_key

    if octants is None:
        octants = cfg.compact_octants
    if tables is None:
        tables = build_mega_tables(
            scene, mxu=cfg.mega_mxu and scene.n_triangles > MAX_VMEM_PRIMS)
    n = rays.origin.shape[0]
    rows = _ray_rows(n)
    rl = rows * LANES

    injected = samples is not None
    if not injected and _interpret():
        samples = stream_from_key(key, n, cfg.max_depth)
        injected = True
    planes_all = (_stream_planes(samples.ball, samples.prob, rows)
                  .reshape(-1, rl) if injected else None)

    total = cfg.max_depth + 1
    idx = jnp.arange(rl, dtype=jnp.int32)    # current slot -> original slot
    rad = jnp.zeros((3, rl), jnp.float32)    # CURRENT arrangement (rides the
    # permutations as a 15th..17th gathered plane; one scatter at the end —
    # arbitrary-permutation scatters are near-serial on TPU, so pay one, not
    # one per phase)
    o_cur = jnp.stack([_pad_rays(rays.origin[:, k], rows)
                       for k in range(3)]).reshape(3, rl)
    d_cur = jnp.stack([_pad_rays(rays.direction[:, k], rows)
                       for k in range(3)]).reshape(3, rl)
    state = None                             # (4, rl): thr rgb + alive
    step_lo, phase = 0, 0
    while step_lo < total:
        # first_window: length of the FIRST phase window.  The round-4
        # decomposition (docs/experiments/big_field_decomp.py) measured the
        # first incoherent bounce as 44% of the 124k-tri frame, running on
        # the UNCOMPACTED post-primary wavefront (1,055 live tiles vs the
        # 889 a compaction would leave) — first_window=1 compacts right
        # after the coherent primary pass.  MEASURED NEGATIVE on the field
        # (9.52 -> 10.49 s/frame): the extra phase boundary's state
        # round-trip + sort costs more than the ~16% of bounce-1 it saves.
        # Kept as an explicit knob for other workload shapes.
        window = (first_window if phase == 0 and first_window
                  else compact_every)
        n_steps = min(window, total - step_lo)
        last = step_lo + n_steps >= total
        sp = None
        if injected:
            # planes for the CURRENT arrangement = original planes at idx
            sp = (planes_all[4 * step_lo:4 * (step_lo + n_steps)][:, idx]
                  .reshape(-1, rows, LANES))
        out = _mega_call(scene, o_cur.reshape(3, rows, LANES),
                         d_cur.reshape(3, rows, LANES),
                         jax.random.fold_in(key, phase), cfg, tables,
                         stream_planes=sp,
                         state=(None if state is None
                                else state.reshape(4, rows, LANES)),
                         dump_state=not last, step_lo=step_lo,
                         n_steps=n_steps)
        flat = out.reshape(-1, rl)
        rad = rad + flat[0:3]
        if last:
            break
        if octants:
            # (coarse origin cell | direction octant | fine origin Morton):
            # alive rays regroup by patch AND direction cone; dead rays last
            o2, d2 = flat[3:6], flat[6:9]
            alive = flat[12] > 0.0
            code = (_morton_u32(o2[0], o2[1], o2[2]).astype(jnp.int32)
                    & 0x3FFFFFFF)
            oct_ = (((d2[0] < 0).astype(jnp.int32) << 2)
                    | ((d2[1] < 0).astype(jnp.int32) << 1)
                    | (d2[2] < 0).astype(jnp.int32))
            cs = _OCT_COARSE_SHIFT
            skey = (((code >> cs) << cs) | (oct_ << (cs - 3))
                    | ((code >> 3) & ((1 << (cs - 3)) - 1)))
            order = jnp.argsort(
                jnp.where(alive, skey, jnp.int32(2 ** 31 - 2)))
        else:
            order = _partition_alive_first(flat[12])
        o_cur = flat[3:6][:, order]
        d_cur = flat[6:9][:, order]
        state = jnp.concatenate([flat[9:12], flat[12:13]])[:, order]
        rad = rad[:, order]
        idx = idx[order]
        step_lo += n_steps
        phase += 1
    rad = jnp.zeros_like(rad).at[:, idx].set(rad)
    return rad[:, :n].T


def select_mega(scene, rays, key, cfg, tables=None, samples=None) -> Array:
    """Route a path-integrator mega render to the right fused driver:
    monolithic, compact_after split, explicit compact_every phasing, or
    compact_auto (large HBM-streamed scenes get inter-phase octant
    compaction — a measured 1.67x at 124k tris, ROUND2_NOTES; VMEM-resident
    scenes skip it, measured loss).  lambert/normal always run monolithic
    (the compaction drivers resume mid-path state, which only the path
    integrator carries)."""
    is_path = cfg.integrator == "path"
    compact_every = cfg.compact_every
    octants = None   # None -> trace_path_mega_phased uses cfg.compact_octants
    if (cfg.compact_auto and not compact_every and not cfg.compact_after
            and max(scene.n_triangles, scene.n_spheres) >= AUTO_COMPACT_TRIS
            and is_path):
        compact_every, octants = 2, True
        if not cfg.mega_f2b_shells:
            # front-to-back segment shells compound with the octant
            # compaction at streamed scale: 9.84 -> 8.91 s/frame on the
            # 124k-tri path-8 field (docs/experiments/big_field_combo.py);
            # f2b is a bit-exact visit reorder, so results are unchanged
            import dataclasses
            cfg = dataclasses.replace(cfg, mega_f2b_shells=8)
    if compact_every > 0 and is_path:
        return trace_path_mega_phased(scene, rays, key, cfg, tables=tables,
                                      compact_every=compact_every,
                                      samples=samples, octants=octants)
    if cfg.compact_after > 0 and is_path:
        return trace_path_mega_compact(scene, rays, key, cfg, tables=tables,
                                       primary_steps=cfg.compact_after,
                                       samples=samples)
    return trace_path_mega(scene, rays, key, cfg, tables=tables,
                           samples=samples)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _mega_diff(scene, rays, stream, cfg, tables):
    if cfg.mega_replay_bwd:
        # monolithic kernel: the same driver the recording fwd pass uses,
        # so primal and fwd values agree bit-for-bit
        return trace_path_mega(scene, rays, jax.random.key(0), cfg,
                               tables=tables, samples=stream)
    return select_mega(scene, rays, jax.random.key(0), cfg, tables=tables,
                       samples=stream)


def _mega_diff_fwd(scene, rays, stream, cfg, tables):
    if cfg.mega_replay_bwd:
        # record each bounce's winning primitive alongside the radiance;
        # the backward replays ONLY those winners (O(rays x depth))
        out, winners = trace_path_mega(scene, rays, jax.random.key(0), cfg,
                                       tables=tables, samples=stream,
                                       want_winners=True)
        return out, (scene, rays, stream, tables, winners)
    out = _mega_diff(scene, rays, stream, cfg, tables)
    return out, (scene, rays, stream, tables, None)


def _mega_diff_bwd(cfg, res, g):
    from .integrators import trace_path   # local: avoid import cycle
    scene, rays, stream, tables, winners = res
    # backward through the wavefront integrator consuming the SAME stream —
    # with the recorded winners (cfg.mega_replay_bwd) it gathers each
    # bounce's single winner instead of re-sweeping every primitive
    # (ops/intersect.replay_hits), the detached-discrete estimator's replay
    # form; without them it re-runs the full sweeps (round-2 behavior).
    # Both compute the same function of (scene, rays, stream) as the fused
    # forward (tests pin them to fp tolerance), so the VJP is the exact
    # gradient.  tables are a (redundant) packing of scene, so their
    # cotangent is zero — the full scene gradient already flows through the
    # wavefront VJP.
    _, vjp = jax.vjp(
        lambda sc, ry: trace_path(sc, ry, jax.random.key(0), cfg,
                                  samples=stream, winners=winners),
        scene, rays)
    g_scene, g_rays = vjp(g)
    return (g_scene, g_rays, jax.tree.map(jnp.zeros_like, stream),
            jax.tree.map(jnp.zeros_like, tables))


_mega_diff.defvjp(_mega_diff_fwd, _mega_diff_bwd)


def trace_path_mega_diff(scene: Scene, rays: Rays, key: jax.Array,
                         cfg: RenderConfig, samples=None,
                         tables: Optional[MegaTables] = None) -> Array:
    """DIFFERENTIABLE fused path: megakernel forward + replay backward
    sharing one injected sample stream (engine='mega_diff').

    The stream is generated on-device from `key` (the wavefront integrator's
    exact internal draws) and fed to the megakernel forward.  With
    cfg.mega_replay_bwd (default) the forward also records each bounce's
    winning primitive id, and the custom VJP differentiates a REPLAY through
    ops/integrators.trace_path(winners=...) that gathers only those winners
    (ops/intersect.replay_hits) — the backward then costs O(rays x depth)
    instead of re-sweeping every primitive per bounce.  The checkpointed
    backward scan (and per-bounce grad_sync_axes collectives, if set)
    produces exact gradients for scene parameters and rays.  With
    cfg.mega_replay_bwd=False the VJP re-runs the full wavefront sweeps
    (round-2 behavior).

    tables: optional prebuilt MegaTables (e.g. Morton-ordered) for the fused
    forward — pass tables REBUILT from the current scene each step when
    fitting geometry (build_mega_tables with static orders; stale tables
    would freeze the forward's geometry while gradients move the scene)."""
    from .integrators import stream_from_key
    stream = (samples if samples is not None else
              stream_from_key(key, rays.origin.shape[0], cfg.max_depth))
    return _mega_diff(scene, rays, stream, cfg, tables)


# _tex_info_table column layout (one row per KERNEL TABLE id, one trailing
# miss row): everything the per-bounce texture-factor math needs, packed so
# the reconstruction does ONE row gather per bounce — measured 19x cheaper
# on v5e than the equivalent ~15 separate small-table gathers
# (docs/experiments/gather_micro.py: 9.5 ms vs 178 ms at 4.15M indices).
TI_CLS, TI_FLAM, TI_FLIT, TI_IMG, TI_W, TI_H, TI_A00, TI_GEO = (
    0, 1, 2, 3, 4, 5, 6, 9)
TI_COLS = 21
# class codes for TI_CLS
_CLS_SPH, _CLS_TRI, _CLS_RECT, _CLS_TSPH, _CLS_TTRI = 0.0, 1.0, 2.0, 3.0, 4.0


def _tex_info_table(scene: Scene) -> dict:
    """Per-SCENE-prim deferred-texturing metadata blocks, keyed by prim
    class; _assemble_tex_info maps them onto kernel TABLE rows.  Columns:
    [cls | lambert-image flag | light-image flag | image id | image w, h |
    texel(0,0) rgb (the quirk-gated lambertian factor, material.h:67) |
    12 geometry floats (per class, see _tex_uv)]."""
    m, t = scene.materials, scene.textures

    def block(mat_id, cls, geom):
        k = mat_id.shape[0]
        tex_id = m.tex_id[mat_id]
        kind = m.kind[mat_id]
        is_img = t.kind[tex_id] == _tex.IMAGE
        img = t.image_id[tex_id]
        wh = t.image_wh[img].astype(jnp.float32)
        zer = jnp.zeros((k,), jnp.float32)
        att00 = _tex.image_texel(t, tex_id, zer, zer)
        geom = jnp.concatenate(
            [geom, jnp.zeros((k, 12 - geom.shape[1]), jnp.float32)], axis=1)
        return jnp.concatenate([
            jnp.full((k, 1), cls, jnp.float32),
            (is_img & (kind == _mat.LAMBERTIAN)).astype(jnp.float32)[:, None],
            (is_img & (kind == _mat.DIFFUSE_LIGHT)).astype(
                jnp.float32)[:, None],
            img.astype(jnp.float32)[:, None],
            wh,
            att00,
            geom], axis=1)

    out = {}
    if scene.n_spheres:
        sp = scene.spheres
        out["sph"] = block(sp.mat, _CLS_SPH, jnp.concatenate(
            [sp.center, (1.0 / sp.radius)[:, None]], axis=1))
    if scene.n_triangles:
        tr = scene.triangles
        out["tri"] = block(tr.mat, _CLS_TRI, jnp.concatenate(
            [tr.v0, tr.v1 - tr.v0, tr.v2 - tr.v0], axis=1))
    if scene.n_rects:
        out["rect"] = block(scene.rects.mat, _CLS_RECT,
                            jnp.zeros((scene.n_rects, 0), jnp.float32))
    if scene.n_t_spheres:
        ts = scene.t_spheres
        out["tsph"] = block(ts.mat, _CLS_TSPH, jnp.concatenate(
            [(1.0 / ts.radius)[:, None], ts.trs.rotation], axis=1))
    if scene.n_t_triangles:
        tt = scene.t_triangles
        out["ttri"] = block(tt.mat, _CLS_TTRI, jnp.concatenate(
            [tt.v0, tt.v1 - tt.v0, tt.v2 - tt.v0], axis=1))
    return out


def _assemble_tex_info(scene: Scene, tables: MegaTables) -> Array:
    """(total_table_rows + 1, TI_COLS) info in KERNEL TABLE-id order:
    [sph_map'd sphere rows | tri_map'd tri rows | rects | t_spheres |
    t_triangles | one all-zero miss row] — so the reconstruction can gather
    by the kernel's winner TABLE ids directly (no scene-id remap)."""
    blocks = _tex_info_table(scene)
    rows = []
    s_pad, t_pad = tables.sph.shape[0], tables.tri.shape[0]
    if scene.n_spheres:
        rows.append(blocks["sph"][tables.sph_map])
    else:
        rows.append(jnp.zeros((s_pad, TI_COLS), jnp.float32))
    if scene.n_triangles:
        rows.append(blocks["tri"][tables.tri_map])
    else:
        rows.append(jnp.zeros((t_pad, TI_COLS), jnp.float32))
    for key in ("rect", "tsph", "ttri"):
        if key in blocks:
            rows.append(blocks[key])
    rows.append(jnp.zeros((1, TI_COLS), jnp.float32))   # miss row
    return jnp.concatenate(rows)


def _rotate_cm(x, y, z, ax, ay, az):
    """core/vec.rotate (vec3.h:200-217 — degrees, negated-Z quirk) on
    COMPONENT-MAJOR operands: rotates (x, y, z) by euler angles
    (ax, ay, az), returning the 3 components.  Same math as
    vec.rotation_matrix_euler_deg, kept unstacked so (steps, n) component
    planes never relayout into a minor-dim-3 array (see _tex_uv)."""
    k = float(np.pi) / 180.0
    rx, ry, rz = k * ax, k * ay, -k * az
    sx, cx = jnp.sin(rx), jnp.cos(rx)
    sy, cy = jnp.sin(ry), jnp.cos(ry)
    sz, cz = jnp.sin(rz), jnp.cos(rz)
    ox = cy * cz * x + (-cy * sz) * y + sy * z
    oy = ((sx * sy * cz + cx * sz) * x + (-sx * sy * sz + cx * cz) * y
          + (-sx * cy) * z)
    oz = ((-cx * sy * cz + sx * sz) * x + (cx * sy * sz + sx * cz) * y
          + (cx * cy) * z)
    return ox, oy, oz


def _tex_uv(rowT: Array, p: Array):
    """(u, v) per lane from the gathered info rows + the recorded hit
    points, per primitive class — the same definitions
    ops/intersect.finalize_hits uses: get_sphere_uv's z-theta on the unit
    normal (texture.h:45-50), Moller-Trumbore barycentrics via the Gram
    solve of p - v0 against e1/e2, object-plane offsets for rects
    (rectangle.h:34-35), and the TRS variants on the OBJECT-space p the
    kernel carries for those winners.  All branches are evaluated on every
    lane (branch-free select); the guards keep non-class lanes finite.

    COMPONENT-MAJOR: rowT is (TI_COLS, steps, n), p is (steps, 3, n) — n
    stays on lanes through every op (a minor-dim-3 layout runs the VPU at
    3/128 lane utilization; see _deferred_texture_radiance)."""
    cls = rowT[TI_CLS]
    g = lambda k: rowT[TI_GEO + k]
    px, py, pz = p[:, 0], p[:, 1], p[:, 2]
    # sphere family: unit normal -> z-theta uv (only x/z components used)
    is_ts = cls == _CLS_TSPH
    nts = _rotate_cm(px * g(0), py * g(0), pz * g(0), g(1), g(2), g(3))
    nrm_x = jnp.where(is_ts, nts[0], (px - g(0)) * g(3))
    nrm_z = jnp.where(is_ts, nts[2], (pz - g(2)) * g(3))
    phi = jnp.arctan2(nrm_z, nrm_x)
    theta = jnp.arcsin(jnp.clip(nrm_z, -1.0, 1.0))
    su = 1.0 - (phi + jnp.pi) / (2.0 * jnp.pi)
    sv = (theta + jnp.pi / 2.0) / jnp.pi
    # triangle family: Gram solve of p - v0 = u e1 + v e2
    qx, qy, qz = px - g(0), py - g(1), pz - g(2)
    e1x, e1y, e1z = g(3), g(4), g(5)
    e2x, e2y, e2z = g(6), g(7), g(8)
    d00 = e1x * e1x + e1y * e1y + e1z * e1z
    d01 = e1x * e2x + e1y * e2y + e1z * e2z
    d11 = e2x * e2x + e2y * e2y + e2z * e2z
    det = d00 * d11 - d01 * d01
    inv = 1.0 / jnp.where(jnp.abs(det) > 1e-30, det, 1.0)
    q0 = qx * e1x + qy * e1y + qz * e1z
    q1 = qx * e2x + qy * e2y + qz * e2z
    bu = (d11 * q0 - d01 * q1) * inv
    bv = (d00 * q1 - d01 * q0) * inv
    is_b = (cls == _CLS_TRI) | (cls == _CLS_TTRI)
    is_r = cls == _CLS_RECT
    u = jnp.where(is_b, bu, su)
    v = jnp.where(is_b, bv, sv)
    u = jnp.where(is_r, px + 0.5, u)   # object-space rect p
    v = jnp.where(is_r, py + 0.5, v)
    return u, v


def _deferred_texture_radiance(scene: Scene, tables: MegaTables, flat: Array,
                               steps: int, quirks,
                               att_includes_light: bool = False,
                               compact: bool = True) -> Array:
    """Reconstruct the radiance from the kernel's want_tex planes, applying
    the image-texture factors the kernel replaced with placeholder 1:

        L = sum_i (em_i * g_i + other_i) * prod_{j<i} f_j

    where em_i/other_i already carry the in-kernel (placeholder) throughput,
    f is the winner's lambertian image texel (at u = v = 0 under the
    lambertian_zero_uv quirk, material.h:67 — precomputed in the info
    table's att00 columns, zero extra gathers) and g the diffuse-light
    texel at the real (u, v).  Per bounce this costs ONE info-row gather +
    ONE image-texel gather + elementwise math.  With no image textures
    f = g = 1 and this equals the kernel's own accumulation up to fp
    reassociation (test-pinned).  A dead/absorbed bounce contributes zero
    to every later term, so multiplying F by that bounce's f is harmless.

    Forward-only companion of the kernel (the planes arrive detached); the
    differentiable path is trace_path_mega_tex_diff's replay backward.

    COMPONENT-MAJOR layout discipline: every elementwise op here runs on
    (steps, n) / (3, steps, n) arrays with n ON LANES.  The first cut did
    the math in (steps, n, 3) — minor dim 3 on a 128-lane VPU — which both
    relayouted em/other/p out of the kernel's plane dump (moveaxis) and ran
    the arithmetic at 3/128 lane utilization.  Only two relayouts remain:
    the info-row gather output (steps, n, TI_COLS) -> (TI_COLS, steps, n)
    and the texel gather (steps, n, 3) -> (3, steps, n), both unavoidable
    (gathers produce row-minor output).  Identical to the row-minor form up
    to fp reassociation across the _TEX_CHUNK boundary (~1e-6 abs, measured):
    lanes processed in different chunks than they would be unchunked see
    reassociated reductions.

    CHUNKED over lanes: a per-lane row gather's output materializes
    (8, 128)-tiled — TI_COLS pads to 128 lanes, so at full-frame scale
    (4.15M rays x 9 bounces) the buffer is ~19 GB and the compile OOMs a
    16 GB v5e (measured; XLA only sometimes fuses it away).  The
    lane-independent body therefore runs under lax.map in <= 2^18-lane
    chunks (~1.2 GB peak), which also matches the render driver's own
    chunk size — for render-pipeline callers the map is a single step."""
    n = flat.shape[1]
    info = _assemble_tex_info(scene, tables)
    miss_row = info.shape[0] - 1
    # Batched over ALL steps: TPU gathers pay per OP (~3.5 ms/M-index on
    # v5e), not per byte, at small-table scale (docs/experiments/
    # gather_micro.py) — one (steps, n)-index info gather + one texel
    # gather replace 2 x steps separate gathers.
    planes = flat[3:3 + 10 * steps].reshape(steps, 10, n)

    def body(pl_c):
        n_c = pl_c.shape[-1]
        w_tab = pl_c[:, 0].astype(jnp.int32)            # (steps, c)
        em = jnp.swapaxes(pl_c[:, 1:4], 0, 1)           # (3, steps, c)
        other = jnp.swapaxes(pl_c[:, 4:7], 0, 1)
        p = pl_c[:, 7:10]                               # (steps, 3, c)
        row = info[jnp.where(w_tab < 0, miss_row, w_tab)]
        rowT = jnp.transpose(row, (2, 0, 1))            # (TI_COLS, steps, c)
        u, v = _tex_uv(rowT, p)
        # nearest texel (texture.h:65-76, same math as textures.image_texel)
        nx, ny = rowT[TI_W], rowT[TI_H]
        i = jnp.clip((u * nx).astype(jnp.int32), 0,
                     jnp.maximum(nx.astype(jnp.int32) - 1, 0))
        j = jnp.clip(((1.0 - v) * ny - 0.001).astype(jnp.int32), 0,
                     jnp.maximum(ny.astype(jnp.int32) - 1, 0))
        texel = jnp.transpose(scene.textures.images[
            rowT[TI_IMG].astype(jnp.int32), j, i],
            (2, 0, 1)).astype(jnp.float32) / 255.0      # (3, steps, c)
        att = (rowT[TI_A00:TI_A00 + 3] if quirks.lambertian_zero_uv
               else texel)
        # f: the attenuation factor.  The path integrator's throughput only
        # multiplies image-LAMBERTIAN albedos (lights never scatter);
        # LambertShade's att term (scatter's lam_att, material.h:63) applies
        # to image-textured LIGHTS too — att_includes_light adds them.
        f_flag = rowT[TI_FLAM]
        if att_includes_light:
            f_flag = f_flag + rowT[TI_FLIT]
        f = jnp.where(f_flag[None] > 0.0, att, 1.0)
        g = jnp.where(rowT[TI_FLIT][None] > 0.0, texel, 1.0)
        # L = sum_i (em_i*g_i + other_i) * prod_{j<i} f_j — excl. cumprod
        big_f = jnp.concatenate([jnp.ones((3, 1, n_c), jnp.float32),
                                 jnp.cumprod(f[:, :-1], axis=1)], axis=1)
        return jnp.sum(big_f * (em * g + other), axis=1)    # (3, c)

    CH = _TEX_CHUNK
    if n <= CH:
        return body(planes)
    k = -(-n // CH)
    pad = k * CH - n
    # pad lanes carry winner plane 0 (a valid table id) — body is total on
    # any id, and the caller slices the pad back off
    padded = (planes if not pad else
              jnp.concatenate([planes, jnp.zeros((steps, 10, pad),
                                                 jnp.float32)], axis=-1))
    if not compact:
        chunked = jnp.moveaxis(padded.reshape(steps, 10, k, CH), 2, 0)
        out = jax.lax.map(body, chunked)                # (k, 3, CH)
        return jnp.moveaxis(out, 0, 1).reshape(3, k * CH)[:, :n]

    # PER-(STEP, CHUNK) SKIP (round 5): the full body loops over ALL rays x
    # depth records, but on a record with NO hit the math is the identity —
    # the lane gathers the all-zero miss row, so f = g = 1.0 and the term
    # reduces to F * (em + other) with the cumprod carry F unchanged.  The
    # engine's own alive decay ([100, 83, 32, 16, 8, 5, 3, 2, 2]% —
    # ROUND4_NOTES §11) makes most cells dead: the render driver's swizzled
    # pixel order keeps each lax.map chunk a contiguous band of screen
    # tiles, and on the bench tex bunny 58% of chunks never hit at all
    # while, WITHIN hit chunks, the per-step any-hit rate decays
    # [100, 98, 87, 72, 51, 30, 14, 5, 4]% — 49-61% of the expensive
    # (step, chunk) cells are skippable (docs/experiments/tex_step_skip.py).
    # So the chunk body scans steps with a per-step lax.cond: a no-hit cell
    # pays one multiply-add instead of the gather + uv + texel work, and a
    # never-hit chunk short-circuits to one sum via the outer cond.
    # Measured (tex bunny, solo v5e, min-of-3): 0.375 s at CH=2^13 vs
    # 0.450 s for the round-5 first cut (per-chunk flag + batched-step
    # body at CH=2^15) vs 1.106 s for the r4 plain map — and BIT-EXACT
    # against the unchunked body (the batched form's sum/cumprod over the
    # 9-step axis associates in the same sequential order).  Physically
    # PERMUTING lanes so hit lanes pack first measured NEGATIVE (+0.5 s:
    # gathering 90 record planes through an arbitrary lane permutation —
    # the 3.5 ms/M-index wall, ROUND4_NOTES §11); both skip forms are
    # permutation-free.
    chunked = jnp.moveaxis(padded.reshape(steps, 10, k, CH), 2, 0)
    step_hit = jnp.any(chunked[:, :, 0, :] >= 0.0, axis=-1)     # (k, steps)

    def step_factors(pl_s):
        """f, g (each (3, c)) for ONE step's planes (10, c) — body()'s
        texture math on a single-step slice (rowT keeps a length-1 steps
        axis so _tex_uv is shared), gathered per step so the scan below
        can skip no-hit cells entirely."""
        w = pl_s[0].astype(jnp.int32)
        row = info[jnp.where(w < 0, miss_row, w)]       # (c, TI_COLS)
        rowT = jnp.transpose(row)[:, None, :]           # (TI_COLS, 1, c)
        u, v = _tex_uv(rowT, pl_s[7:10][None])
        nx, ny = rowT[TI_W], rowT[TI_H]
        i = jnp.clip((u * nx).astype(jnp.int32), 0,
                     jnp.maximum(nx.astype(jnp.int32) - 1, 0))
        j = jnp.clip(((1.0 - v) * ny - 0.001).astype(jnp.int32), 0,
                     jnp.maximum(ny.astype(jnp.int32) - 1, 0))
        texel = jnp.transpose(scene.textures.images[
            rowT[TI_IMG].astype(jnp.int32), j, i],
            (2, 0, 1)).astype(jnp.float32) / 255.0      # (3, 1, c)
        att = (rowT[TI_A00:TI_A00 + 3] if quirks.lambertian_zero_uv
               else texel)
        f_flag = rowT[TI_FLAM]
        if att_includes_light:
            f_flag = f_flag + rowT[TI_FLIT]
        f = jnp.where(f_flag[None] > 0.0, att, 1.0)
        g = jnp.where(rowT[TI_FLIT][None] > 0.0, texel, 1.0)
        return f[:, 0], g[:, 0]

    def cheap(pl_c):
        em = jnp.swapaxes(pl_c[:, 1:4], 0, 1)           # (3, steps, CH)
        other = jnp.swapaxes(pl_c[:, 4:7], 0, 1)
        return jnp.sum(em + other, axis=1)              # (3, CH)

    def chunk_body(args):
        pl_c, flags = args                              # (steps,10,CH), (steps,)

        def scanned(_):
            def step_fn(carry, xs):
                acc, F = carry
                pl_s, flag = xs                         # (10, CH), scalar

                def cheap_step(op):
                    a, Fc = op
                    return a + Fc * (pl_s[1:4] + pl_s[4:7]), Fc

                def full_step(op):
                    a, Fc = op
                    f, g = step_factors(pl_s)
                    return a + Fc * (pl_s[1:4] * g + pl_s[4:7]), Fc * f

                return jax.lax.cond(flag, full_step, cheap_step,
                                    (acc, F)), None

            init = (jnp.zeros((3, CH), jnp.float32),
                    jnp.ones((3, CH), jnp.float32))
            (acc, _), _ = jax.lax.scan(step_fn, init, (pl_c, flags))
            return acc

        return jax.lax.cond(jnp.any(flags), scanned,
                            lambda _: cheap(pl_c), 0)

    out = jax.lax.map(chunk_body, (chunked, step_hit))  # (k, 3, CH)
    return jnp.moveaxis(out, 0, 1).reshape(3, k * CH)[:, :n]


def _mega_tex_planes(scene, rays, key, cfg, tables, samples,
                     padded: bool = False):
    """Run the want_tex kernel and return flat (3 + 10*(max_depth+1), N).

    padded=True keeps the lane-pad tail (N = rows * LANES): the
    reconstruction is safe on pad lanes (their winner planes are valid
    table ids or -1 by construction), and skipping the 93-plane slice lets
    XLA fuse the kernel output straight into the gather pass — callers then
    slice the final (3, n) radiance instead."""
    from .integrators import stream_from_key
    n = rays.origin.shape[0]
    rows = _ray_rows(n)
    o = jnp.stack([_pad_rays(rays.origin[:, k], rows) for k in range(3)])
    d = jnp.stack([_pad_rays(rays.direction[:, k], rows) for k in range(3)])
    injected = samples is not None
    if cfg.integrator == "lambert":     # lambert draws no samples at all
        injected, samples = False, None
    elif not injected and _interpret():
        samples = stream_from_key(key, n, cfg.max_depth)
        injected = True
    planes = (_stream_planes(samples.ball, samples.prob, rows)
              if injected else None)
    out = _mega_call(scene, o, d, key, cfg, tables, stream_planes=planes,
                     want_tex=True)
    flat = out.reshape(out.shape[0], -1)
    return flat if padded else flat[:, :n]


def trace_path_mega_tex(scene: Scene, rays: Rays, key: jax.Array,
                        cfg: RenderConfig, samples=None,
                        tables: Optional[MegaTables] = None) -> Array:
    """Fused path for IMAGE-TEXTURE scenes via DEFERRED texturing
    (engine='mega' routing; the differentiable pairing is
    trace_path_mega_tex_diff).

    Texture values never affect path STRUCTURE — in all four reference
    materials the scatter direction and the continue/absorb events are
    independent of the texture color (lambertian dir = p + n + ball,
    material.h:60-68; metal = reflect + fuzz*ball, :81-92; dielectric uses
    ref_idx only, :104-141; diffuse light never scatters, :146-161); the
    texture only MULTIPLIES attenuation (lambertian albedo; sampled at
    u = v = 0 under the reference quirk, material.h:67) and emission
    (diffuse light at the real u, v).  So the fused kernel runs the whole
    bounce loop with placeholder-1 albedo for image-textured materials and
    DUMPS per bounce: the winner id, the emission term, the ambient+sky
    term, and the hit point (want_tex — 10 planes/step).  A light XLA pass
    (_deferred_texture_radiance) then multiplies the real texel factors
    back in: the per-lane image gathers run in XLA, where gathers are
    cheap, instead of in the kernel, where per-lane dynamic VMEM indexing
    does not exist on TPU.  The O(rays x depth x prims) sweep work stays
    fused; the outside pass is O(rays x depth) gathers + ~10 flops.

    Unlike a replay, no sample stream is needed on TPU (the kernel's
    in-kernel PRNG drives the path; the dumped planes fully determine the
    radiance) — measured on v5e this made the deferred pass ~5x cheaper
    than replaying the bounce loop through the wavefront integrator
    (docs/ROUND3_NOTES.md).  On CPU (interpret) the stream is injected
    automatically, which doubles as the deterministic parity mode the
    tests use.

    Runs the monolithic kernel only (the compaction drivers do not record
    planes); mega_tex_supported() gates scene scope.  Serves integrator
    'path' (one plane-set per bounce) AND 'lambert' (render.h:70-87 as two
    reconstruction pseudo-steps — see the kernel's lambert want_tex
    epilogue; the att factor then also applies to image-textured lights,
    scatter's lam_att, material.h:63)."""
    if tables is None:
        tables = build_mega_tables(scene)
    lam = cfg.integrator == "lambert"
    flat = _mega_tex_planes(scene, rays, key, cfg, tables, samples,
                            padded=True)
    out = _deferred_texture_radiance(scene, tables, flat,
                                     2 if lam else cfg.max_depth + 1,
                                     cfg.quirks, att_includes_light=lam)
    return out[:, :rays.origin.shape[0]].T


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _mega_tex_diff(scene, rays, stream, cfg, tables):
    return trace_path_mega_tex(scene, rays, jax.random.key(0), cfg,
                               samples=stream, tables=tables)


def _mega_tex_diff_fwd(scene, rays, stream, cfg, tables):
    flat = _mega_tex_planes(scene, rays, jax.random.key(0), cfg, tables,
                            stream)
    out = _deferred_texture_radiance(scene, tables, flat, cfg.max_depth + 1,
                                     cfg.quirks).T
    winners = jnp.stack([
        _winners_to_scene(scene, tables,
                          flat[3 + 10 * s].astype(jnp.int32))
        for s in range(cfg.max_depth + 1)])
    return out, (scene, rays, stream, tables, winners)


def _mega_tex_diff_bwd(cfg, res, g):
    # identical estimator to _mega_diff_bwd: differentiate the replay of
    # the recorded winners on the same stream (texture factors included —
    # trace_path evaluates eval_texture at the replayed hits); tables are a
    # redundant packing of scene, so their cotangent is zero
    from .integrators import trace_path
    scene, rays, stream, tables, winners = res
    _, vjp = jax.vjp(
        lambda sc, ry: trace_path(sc, ry, jax.random.key(0), cfg,
                                  samples=stream, winners=winners),
        scene, rays)
    g_scene, g_rays = vjp(g)
    return (g_scene, g_rays, jax.tree.map(jnp.zeros_like, stream),
            jax.tree.map(jnp.zeros_like, tables))


_mega_tex_diff.defvjp(_mega_tex_diff_fwd, _mega_tex_diff_bwd)


def trace_path_mega_tex_diff(scene: Scene, rays: Rays, key: jax.Array,
                             cfg: RenderConfig, samples=None,
                             tables: Optional[MegaTables] = None) -> Array:
    """DIFFERENTIABLE deferred texturing (engine='mega_diff' routing for
    image-texture scenes): the want_tex kernel + deferred pass forward, a
    replay backward through ops/integrators.trace_path(winners=...) sharing
    one injected stream — the same detached-discrete / attached-continuous
    estimator as trace_path_mega_diff, with image-texture factors evaluated
    differentiably in the replay (gradients flow to albedos, geometry, and
    through the texel selection's piecewise-constant regions).

    The stream is REQUIRED here (unlike the forward-only
    trace_path_mega_tex): the backward replays the kernel's exact path, so
    both must consume the same draws."""
    from .integrators import stream_from_key
    stream = (samples if samples is not None else
              stream_from_key(key, rays.origin.shape[0], cfg.max_depth))
    if tables is None:
        tables = build_mega_tables(scene)
    return _mega_tex_diff(scene, rays, stream, cfg, tables)


def _stream_planes(ball: Array, prob: Array, rows: int) -> Array:
    """SampleStream arrays -> (4 * steps, rows, LANES) kernel input planes."""
    steps = ball.shape[0]
    planes = []
    for i in range(steps):
        for comp in range(3):
            planes.append(_pad_rays(ball[i, :, comp], rows))
        planes.append(_pad_rays(prob[i], rows))
    return jnp.stack(planes)


def _mega_call(scene, o, d, key, cfg, tables, stream_planes=None,
               state=None, dump_state=False, step_lo=0, n_steps=0,
               want_winners=False, want_tex=False):
    """One pallas_call over padded (3, rows, LANES) ray planes.

    state: optional (4, rows, LANES) [thr rgb | alive] to RESUME mid-path.
    dump_state: emit (13, rows, LANES) [rad | o | d | thr | alive] instead of
    the (3, ...) radiance — the compaction pipeline's phase-A output.
    step_lo / n_steps: global bounce window (depth budget uses step_lo).
    want_winners: path integrator only — emit (3 + steps, rows, LANES):
    radiance followed by each bounce's winning primitive TABLE id as f32
    (-1 = miss/dead; see trace_path_mega for the scene-index remap).  Forces
    the VPU sweep (the MXU sweep's scratch layout has no winner plane).
    """
    rows = o.shape[1]
    injected = stream_planes is not None
    stream_tri = scene.n_triangles > MAX_VMEM_PRIMS
    stream_sph = scene.n_spheres > MAX_VMEM_PRIMS
    want_winners = want_winners or want_tex   # tex planes ride the winner
    # machinery (unrolled steps, winner-attr carry in every sweep)
    mxu = bool(cfg.mega_mxu) and stream_tri and not want_winners
    if want_winners:
        # want_tex serves path AND lambert (2 pseudo-step plane dump);
        # bare want_winners (replay recording) is path-only
        ok_integ = ("path", "lambert") if want_tex else ("path",)
        assert cfg.integrator in ok_integ and not dump_state and state is None
    if mxu and tables.tri_coef.shape[0] != N_Q * tables.tri.shape[0]:
        raise ValueError(
            "cfg.mega_mxu requires coefficient tables: rebuild with "
            "build_mega_tables(scene, ..., mxu=True)")
    q = cfg.quirks
    kernel = functools.partial(
        _mega_kernel,
        n_sph_chunks=tables.sph.shape[0] // PRIM_CHUNK,
        n_sph_supers=(tables.sph.shape[0] // SUPER_T
                      if scene.n_spheres > SPH_SUPER_MIN else 0),
        n_tri_chunks=tables.tri.shape[0] // PRIM_CHUNK,
        has_sph=scene.n_spheres > 0, has_tri=scene.n_triangles > 0,
        n_rects=scene.n_rects,
        n_tsph=scene.n_t_spheres, n_ttri=scene.n_t_triangles,
        max_depth=cfg.max_depth, t_min=float(cfg.t_min),
        t_max=float(cfg.t_max), ambient=float(q.ambient_on_absorb),
        backface_only=q.triangle_backface_only,
        no_t_clip=q.triangle_no_t_clip,
        back_culling=q.triangle_back_culling,
        die_ref_cosine=q.dielectric_reference_cosine,
        injected=injected, stream_tri=stream_tri,
        n_tri_segs=tables.tri.shape[0] // SEG_T if stream_tri else 0,
        stream_sph=stream_sph,
        n_sph_segs=tables.sph.shape[0] // SEG_T if stream_sph else 0,
        integrator=cfg.integrator,
        lambert_unnorm=q.lambert_unnormalized_dot,
        resume=state is not None, dump_state=dump_state,
        n_steps=n_steps if n_steps else (cfg.max_depth + 1 - step_lo),
        f2b=0 if mxu else cfg.mega_f2b_shells, mxu=mxu,
        want_winners=want_winners, want_tex=want_tex,
        tri_off=tables.sph.shape[0],
        rect_off=tables.sph.shape[0] + tables.tri.shape[0],
        tsph_off=(tables.sph.shape[0] + tables.tri.shape[0]
                  + scene.n_rects),
        ttri_off=(tables.sph.shape[0] + tables.tri.shape[0]
                  + scene.n_rects + scene.n_t_spheres))

    grid = (rows // TILE_ROWS,)
    full = lambda shp: pl.BlockSpec(shp, lambda i: tuple(0 for _ in shp),
                                    memory_space=pltpu.VMEM)
    tile3 = lambda k: pl.BlockSpec((k, TILE_ROWS, LANES), lambda i: (0, i, 0),
                                   memory_space=pltpu.VMEM)
    # streaming: primitive data AND chunk boxes stay in HBM (chunk boxes
    # are 512 B / 8 prims — 33 MB at the 1M-tri ceiling) and ride
    # per-segment DMAs; only seg/super boxes are VMEM-resident.
    tri_spec = (pl.BlockSpec(memory_space=pl.ANY) if stream_tri
                else full(tables.tri.shape))
    tri_box_spec = (pl.BlockSpec(memory_space=pl.ANY) if stream_tri
                    else full(tables.tri_box.shape))
    sph_spec = (pl.BlockSpec(memory_space=pl.ANY) if stream_sph
                else full(tables.sph.shape))
    sph_box_spec = (pl.BlockSpec(memory_space=pl.ANY) if stream_sph
                    else full(tables.sph_box.shape))
    in_specs = [sph_spec, sph_box_spec,
                full(tables.sph_super.shape),
                tri_spec, tri_box_spec,
                full(tables.tri_super.shape), full(tables.rect.shape),
                full(tables.tsph.shape), full(tables.ttri.shape),
                tile3(3), tile3(3)]
    args = [tables.sph, tables.sph_box, tables.sph_super, tables.tri,
            tables.tri_box, tables.tri_super, tables.rect, tables.tsph,
            tables.ttri, o, d]
    # kernel consumes *rest as (tri_seg, [sph_seg], [tri_coef], [state],
    # [uni], seed)
    if stream_tri:
        in_specs.append(full(tables.tri_seg.shape))
        args.append(tables.tri_seg)
    if stream_sph:
        in_specs.append(full(tables.sph_seg.shape))
        args.append(tables.sph_seg)
    if mxu:
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        args.append(tables.tri_coef)
    if state is not None:
        in_specs.append(tile3(4))
        args.append(state)
    if injected:
        in_specs.append(tile3(stream_planes.shape[0]))
        args.append(stream_planes)
    in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
    seed = jax.random.randint(key, (1,), 0, 2 ** 30 - 1, dtype=jnp.int32)
    args.append(jnp.concatenate([seed, jnp.full((1,), step_lo, jnp.int32)]))
    if mxu:
        scratch = [pltpu.VMEM((SEG_T, LANES), jnp.float32),
                   pltpu.VMEM((N_Q * SEG_T, LANES), jnp.float32),
                   pltpu.SemaphoreType.DMA, pltpu.SemaphoreType.DMA,
                   pltpu.VMEM((N_FEAT * TILE_ROWS, LANES), jnp.float32),
                   pltpu.VMEM((13 * TILE_ROWS, LANES), jnp.float32)]
    elif stream_tri:
        scratch = [pltpu.VMEM((SEG_T, LANES), jnp.float32),
                   pltpu.VMEM((SEG_T // PRIM_CHUNK, LANES), jnp.float32),
                   pltpu.SemaphoreType.DMA, pltpu.SemaphoreType.DMA]
    else:
        scratch = []
    if stream_sph:    # sphere streaming scratch rides at the tail
        scratch += [pltpu.VMEM((SEG_T, LANES), jnp.float32),
                    pltpu.VMEM((SEG_T // PRIM_CHUNK, LANES), jnp.float32),
                    pltpu.SemaphoreType.DMA, pltpu.SemaphoreType.DMA]

    n_steps_eff = n_steps if n_steps else (cfg.max_depth + 1 - step_lo)
    if cfg.integrator == "lambert":
        n_steps_eff = 2        # the lambert want_tex pseudo-steps
    per_step = 10 if want_tex else 1
    n_out = 13 if dump_state else (
        3 + per_step * n_steps_eff if want_winners else 3)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=tile3(n_out),
        out_shape=jax.ShapeDtypeStruct((n_out, rows, LANES), jnp.float32),
        scratch_shapes=scratch,
        interpret=_interpret(),
    )(*args)


def trace_path_mega(scene: Scene, rays: Rays, key: jax.Array,
                    cfg: RenderConfig, tables: Optional[MegaTables] = None,
                    samples=None, want_winners: bool = False):
    """Fused integrator (cfg.integrator: path / lambert / normal) — drop-in
    for integrators.integrate on supported scenes (forward only).  Returns
    radiance f32[N, 3].

    samples: optional integrators.SampleStream for injected-sample parity.
    On non-TPU backends, where the Mosaic PRNG doesn't lower, the wrapper
    injects stream_from_key(key, ...) — the jnp integrator's exact stream —
    automatically, so CPU results match trace_path to fp tolerance.

    want_winners (path only): return (radiance, winners) where winners is
    i32[max_depth + 1, N] — each bounce's winning primitive in the SCENE
    index space of intersect.Hits.prim ([spheres | triangles | rects |
    t_spheres | t_triangles], -1 = miss/dead) — the recording the replay
    backward consumes (trace_path_mega_diff /
    integrators.trace_path(winners=...)).
    """
    from .integrators import stream_from_key   # local: avoid import cycle

    if tables is None:
        tables = build_mega_tables(
            scene, mxu=cfg.mega_mxu and scene.n_triangles > MAX_VMEM_PRIMS
            and not want_winners)
    n = rays.origin.shape[0]
    rows = _ray_rows(n)
    o = jnp.stack([_pad_rays(rays.origin[:, k], rows) for k in range(3)])
    d = jnp.stack([_pad_rays(rays.direction[:, k], rows) for k in range(3)])

    injected = samples is not None and cfg.integrator == "path"
    if not injected and _interpret() and cfg.integrator == "path":
        samples = stream_from_key(key, n, cfg.max_depth)
        injected = True
    planes = (_stream_planes(samples.ball, samples.prob, rows)
              if injected else None)

    out = _mega_call(scene, o, d, key, cfg, tables, stream_planes=planes,
                     want_winners=want_winners)
    flat = out.reshape(out.shape[0], -1)[:, :n]
    if not want_winners:
        return flat[:3].T
    winners = _winners_to_scene(scene, tables,
                                flat[3:].astype(jnp.int32))
    return flat[:3].T, winners


def _winners_to_scene(scene: Scene, tables: MegaTables, w: Array) -> Array:
    """Map winner TABLE ids ([sphere rows | +S_pad tri rows | +S_pad+T_pad
    rect, t_sphere, t_triangle indices — contiguous], -1 = miss) into the
    SCENE prim-index space of intersect.Hits.prim, undoing the tables'
    Morton permutation and padding (pad rows repeat their source prim, so
    mapping them to that prim is the duplicate's correct identity).  The
    rect/TRS branch is a single shift: their in-kernel offsets are laid out
    contiguously after the padded sphere/tri tables in scene order."""
    s_pad = tables.sph.shape[0]
    t_pad = tables.tri.shape[0]
    n_s, n_t = scene.n_spheres, scene.n_triangles
    sid = tables.sph_map[jnp.clip(w, 0, s_pad - 1)]
    tid = tables.tri_map[jnp.clip(w - s_pad, 0, t_pad - 1)] + n_s
    rid = w - (s_pad + t_pad) + n_s + n_t
    out = jnp.where(w < s_pad, sid, jnp.where(w < s_pad + t_pad, tid, rid))
    return jnp.where(w < 0, -1, out)
