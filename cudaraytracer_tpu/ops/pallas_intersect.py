"""Pallas TPU kernels for the hot intersection loops.

The jnp brute-force path (ops/intersect.py) materializes (rays x prims)
candidate arrays in HBM — correct, differentiable, but HBM-bandwidth bound.
These kernels keep a ray tile and the whole primitive table in VMEM and fuse
candidate evaluation with the running closest-hit reduction, so HBM traffic is
one read of the rays and one write of (best_t, best_idx) — the speed-of-light
layout for brute-force intersection (SURVEY.md §7 phase 5).

Layout: N rays are padded to (rows, 128) f32 tiles per component; the grid
tiles rows.  Each inner step evaluates a 3D candidate tile
(PRIM_CHUNK, TILE_ROWS, 128): primitive components enter as (PRIM_CHUNK,1,1)
sublane slices of the (comp, c_pad, 1) table and broadcast against the whole
(1, TILE_ROWS, 128) ray block — pure vector ops, no scalar extracts (Mosaic
cannot index VMEM lanes dynamically), and the per-iteration loop overhead is
amortized over PRIM_CHUNK * TILE_ROWS * 128 candidate pairs.  The chunk
winner reduces over the prim axis and merges into the per-ray running best
with a strictly-less compare, preserving the reference's first-prim-wins
tie-break (hitable_list.h:84).

Differentiability: pallas_call has no autodiff rule, so each kernel is wrapped
in jax.custom_vjp — the backward pass recomputes the WINNING primitive's
intersection with plain jnp (a per-ray, single-primitive formula) and chains
through it, which is both exact and far cheaper than differentiating the full
candidate sweep.  Gradients flow to ray origins/directions and to the winning
primitive's parameters (scatter-add).

Quirk parity matches ops/intersect.py (backface-only triangles, no-t-clip).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import Quirks
from .intersect import BIG, TRI_EPSILON

Array = jnp.ndarray

LANES = 128
TILE_ROWS = 32          # 32 x 128 = 4096 rays per kernel instance
PRIM_CHUNK = 16         # prims per inner step (leading axis of the 3D tile)
# Primitive tables are shaped (comp, c_pad, 1); Mosaic pads the unit lane dim
# to 128 in VMEM (x128 memory), so tables are SEGMENTED over a second,
# fastest-varying grid dimension — each kernel instance sees at most SEG_PRIMS
# prims (a few MB of VMEM) and revisits its output block across segments with
# a running-min merge.  Segment order preserves the first-prim-wins tie-break.
SEG_PRIMS = 1024
IDX_BIG = 2 ** 30  # python int: kernels may not capture traced constants


def _pad_rays(x: Array, rows: int) -> Array:
    n = x.shape[0]
    pad = rows * LANES - n
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad,), x.dtype)])
    return x.reshape(rows, LANES)


def _ray_rows(n: int) -> int:
    rows = -(-n // LANES)
    return -(-rows // TILE_ROWS) * TILE_ROWS


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _chunk_reachable(box_ref, j, ox, oy, oz, inv_dx, inv_dy, inv_dz,
                     best_t, lo_cut):
    """(R, L) chunk-box slab reachability — the ONE copy of the in-kernel
    cull test (shared by the sphere kernels and the culled triangle
    kernel).  Negated form: axis-parallel rays (inv_d = inf) starting
    exactly on an unpadded box plane give 0 * inf = NaN in near/far; NaN
    comparisons are False, so this shape makes NaN lanes conservatively
    REACHABLE instead of silently culled.  lo_cut is t_min, or -BIG under
    the no-t-clip triangle quirk (negative t can win there)."""
    def bx(k):
        return box_ref[k, pl.ds(j, 1), :][0, 0]

    tx0 = (bx(0) - ox) * inv_dx
    tx1 = (bx(3) - ox) * inv_dx
    ty0 = (bx(1) - oy) * inv_dy
    ty1 = (bx(4) - oy) * inv_dy
    tz0 = (bx(2) - oz) * inv_dz
    tz1 = (bx(5) - oz) * inv_dz
    near = jnp.maximum(jnp.maximum(jnp.minimum(tx0, tx1),
                                   jnp.minimum(ty0, ty1)),
                       jnp.minimum(tz0, tz1))
    far = jnp.minimum(jnp.minimum(jnp.maximum(tx0, tx1),
                                  jnp.maximum(ty0, ty1)),
                      jnp.maximum(tz0, tz1))
    return ~((far < near) | (far < lo_cut) | (near >= best_t))


def _merge_chunk(best_t, best_i, t, base, prim_iota):
    """Reduce a (PRIM_CHUNK, R, L) candidate tile over prims and merge into
    the running (R, L) best; ties -> lowest prim id, earlier chunks win."""
    tmin = jnp.min(t, axis=0)
    idx = jnp.where(t <= tmin[None], prim_iota + base, IDX_BIG)
    imin = jnp.min(idx, axis=0)
    take = tmin < best_t
    return jnp.where(take, tmin, best_t), jnp.where(take, imin, best_i)


def _sphere_chunk_t(sph_ref, base, ox, oy, oz, dx, dy, dz, a, inv_a,
                    t_min, t_max):
    """One PRIM_CHUNK of sphere quadratics -> (P, R, L) candidate t (BIG on
    miss): nearest in-range root first (sphere.h:31-49).  Shared by the
    culled and plain kernels so the twins cannot diverge."""
    cx = sph_ref[0, pl.ds(base, PRIM_CHUNK), :][:, :, None]   # (P, 1, 1)
    cy = sph_ref[1, pl.ds(base, PRIM_CHUNK), :][:, :, None]
    cz = sph_ref[2, pl.ds(base, PRIM_CHUNK), :][:, :, None]
    r2 = sph_ref[3, pl.ds(base, PRIM_CHUNK), :][:, :, None]
    ocx = ox - cx                                             # (P, R, L)
    ocy = oy - cy
    ocz = oz - cz
    b = ocx * dx + ocy * dy + ocz * dz
    c = ocx * ocx + ocy * ocy + ocz * ocz - r2
    disc = b * b - a * c
    hit = disc > 0.0
    sq = jnp.sqrt(jnp.where(hit, disc, 0.0))
    t0 = (-b - sq) * inv_a
    t1 = (-b + sq) * inv_a
    ok0 = hit & (t0 < t_max) & (t0 > t_min)
    ok1 = hit & (t1 < t_max) & (t1 > t_min)
    return jnp.where(ok0, t0, jnp.where(ok1, t1, BIG))


def _tri_chunk_t(tri_ref, base, ox, oy, oz, dx, dy, dz, *, t_min, t_max,
                 backface_only, no_t_clip, back_culling):
    """One PRIM_CHUNK of Moller-Trumbore tests incl. every quirk gate ->
    (P, R, L) candidate t (BIG on miss).  Shared by the plain and culled
    kernels so a quirk-semantics change cannot silently diverge between
    them (their 'bit-identical' contract)."""
    def comp(k):
        return tri_ref[k, pl.ds(base, PRIM_CHUNK), :][:, :, None]  # (P,1,1)

    v0x, v0y, v0z = comp(0), comp(1), comp(2)
    e1x, e1y, e1z = comp(3), comp(4), comp(5)
    e2x, e2y, e2z = comp(6), comp(7), comp(8)
    # h = d x e2 -> (P, R, L)
    hx = dy * e2z - dz * e2y
    hy = dz * e2x - dx * e2z
    hz = dx * e2y - dy * e2x
    a = e1x * hx + e1y * hy + e1z * hz
    f = 1.0 / a
    sx = ox - v0x
    sy = oy - v0y
    sz = oz - v0z
    u = f * (sx * hx + sy * hy + sz * hz)
    qx = sy * e1z - sz * e1y
    qy = sz * e1x - sx * e1z
    qz = sx * e1y - sy * e1x
    v = f * (dx * qx + dy * qy + dz * qz)
    t = f * (e2x * qx + e2y * qy + e2z * qz)
    valid = (jnp.abs(a) >= TRI_EPSILON) & (u >= 0.0) & (u <= 1.0) \
        & (v >= 0.0) & (u + v <= 1.0)
    if back_culling:    # triangle.h:74 (quirk-gated; scenes pass false)
        valid &= a >= TRI_EPSILON
    if backface_only:   # triangle.h:61
        nx, ny, nz = comp(9), comp(10), comp(11)
        valid &= (dx * nx + dy * ny + dz * nz) >= 0.0
    if no_t_clip:       # triangle.h:92-94 + hitable_list.h:84
        valid &= t < t_max
    else:
        valid &= (t > t_min) & (t < t_max)
    return jnp.where(valid, t, BIG)


# ---------------------------------------------------------------------------
# Spheres
# ---------------------------------------------------------------------------

def _sphere_kernel(sph_ref, box_ref, *rest, n_chunks: int, t_min: float,
                   t_max: float, has_alive: bool = False):
    """Sphere sweep with the same tiled chunk-box culling as the triangle
    kernel: one slab test per (chunk x ray tile) decides whether the chunk's
    quadratics run at all.  Sphere tables are usually built in spatial order
    (e.g. the One-Weekend grid), so chunks are compact.

    has_alive: an f32 0/1 alive mask rides before the ray planes — a fully
    dead TILE skips the whole sweep (outputs keep their miss seed), and
    dead lanes are excluded from the chunk reachability vote (a dead ray's
    stale direction otherwise forces chunk visits; same rationale as the
    megakernel's alive gating).  Dead lanes report miss (-1), which the
    integrator's masks already treat as 'no contribution'."""
    rest = list(rest)
    alive_ref = rest.pop(0) if has_alive else None
    o_ref, d_ref, out_t_ref, out_i_ref = rest
    seg = pl.program_id(1)
    seg_base = seg * SEG_PRIMS

    @pl.when(seg == 0)
    def _():
        out_t_ref[:] = jnp.full((TILE_ROWS, LANES), BIG, jnp.float32)
        out_i_ref[:] = jnp.full((TILE_ROWS, LANES), -1, jnp.int32)

    def sweep():
        ox = o_ref[0][None]        # (1, R, L)
        oy = o_ref[1][None]
        oz = o_ref[2][None]
        dx = d_ref[0][None]
        dy = d_ref[1][None]
        dz = d_ref[2][None]
        a = dx * dx + dy * dy + dz * dz
        inv_a = 1.0 / a
        inv_dx = 1.0 / dx[0]
        inv_dy = 1.0 / dy[0]
        inv_dz = 1.0 / dz[0]
        prim_iota = jax.lax.broadcasted_iota(
            jnp.int32, (PRIM_CHUNK, TILE_ROWS, LANES), 0)

        best_t0 = out_t_ref[:]
        best_i0 = out_i_ref[:]

        def body(j, carry):
            best_t, best_i = carry
            base = j * PRIM_CHUNK
            # sphere tests DO respect [t_min, t_max] (no negative-t quirk),
            # so the cull window matches exactly (lo_cut = t_min)
            reachable = _chunk_reachable(box_ref, j, ox[0], oy[0], oz[0],
                                         inv_dx, inv_dy, inv_dz, best_t,
                                         t_min)
            if has_alive:
                reachable &= alive_ref[:] > 0.0
            any_hit = jnp.any(reachable)

            def run_chunk(carry):
                best_t, best_i = carry
                t = _sphere_chunk_t(sph_ref, base, ox, oy, oz, dx, dy, dz,
                                    a, inv_a, t_min, t_max)
                return _merge_chunk(best_t, best_i, t, seg_base + base,
                                    prim_iota)

            return jax.lax.cond(any_hit, run_chunk, lambda cr: cr,
                                (best_t, best_i))

        best_t, best_i = jax.lax.fori_loop(0, n_chunks, body,
                                           (best_t0, best_i0))
        out_t_ref[:] = best_t
        out_i_ref[:] = best_i

    if has_alive:
        @pl.when(jnp.any(alive_ref[:] > 0.0))
        def _():
            sweep()
    else:
        sweep()


def _sphere_kernel_plain(sph_ref, *rest, n_chunks: int, t_min: float,
                         t_max: float, has_alive: bool = False):
    """Uncull'd sphere sweep — the right default for path tracing, where
    bounced rays are incoherent and per-chunk box tests are pure overhead
    (measured ~15% loss on the 484-sphere path-8 benchmark).

    has_alive: tile-level early-out on a fully dead tile (see
    _sphere_kernel); within a live tile every chunk still runs (no
    per-chunk vote here by design)."""
    rest = list(rest)
    alive_ref = rest.pop(0) if has_alive else None
    o_ref, d_ref, out_t_ref, out_i_ref = rest
    seg = pl.program_id(1)
    seg_base = seg * SEG_PRIMS

    @pl.when(seg == 0)
    def _():
        out_t_ref[:] = jnp.full((TILE_ROWS, LANES), BIG, jnp.float32)
        out_i_ref[:] = jnp.full((TILE_ROWS, LANES), -1, jnp.int32)

    def sweep():
        ox = o_ref[0][None]
        oy = o_ref[1][None]
        oz = o_ref[2][None]
        dx = d_ref[0][None]
        dy = d_ref[1][None]
        dz = d_ref[2][None]
        a = dx * dx + dy * dy + dz * dz
        inv_a = 1.0 / a
        prim_iota = jax.lax.broadcasted_iota(
            jnp.int32, (PRIM_CHUNK, TILE_ROWS, LANES), 0)

        best_t0 = out_t_ref[:]
        best_i0 = out_i_ref[:]

        def body(j, carry):
            best_t, best_i = carry
            base = j * PRIM_CHUNK
            t = _sphere_chunk_t(sph_ref, base, ox, oy, oz, dx, dy, dz,
                                a, inv_a, t_min, t_max)
            return _merge_chunk(best_t, best_i, t, seg_base + base,
                                prim_iota)

        best_t, best_i = jax.lax.fori_loop(0, n_chunks, body,
                                           (best_t0, best_i0))
        out_t_ref[:] = best_t
        out_i_ref[:] = best_i

    if has_alive:
        @pl.when(jnp.any(alive_ref[:] > 0.0))
        def _():
            sweep()
    else:
        sweep()


def _sphere_kernel_attrs(sph_ref, *rest, n_chunks: int, t_min: float,
                         t_max: float, cull: bool, has_alive: bool,
                         n_attrs: int):
    """Sphere sweep that ALSO carries the winner's per-prim attribute row
    (the megakernel's pick_attrs pattern): each chunk merge extracts the
    improving lanes' attr components from a (n_attrs, prims, 1) VMEM table,
    so finalize needs NO per-ray winner-row gather at all for pure-sphere
    scenes (one gather op costs ~3.5 ms/M indices on v5e — ~0.45 s of the
    round-4 headline frame).  Same candidate math (_sphere_chunk_t) and
    same tie semantics as the (t, i)-only twins: within a chunk the lowest
    prim id wins ties, across chunks the earlier chunk wins (strict <)."""
    rest = list(rest)
    box_ref = rest.pop(0) if cull else None
    attr_ref = rest.pop(0)
    alive_ref = rest.pop(0) if has_alive else None
    o_ref, d_ref, out_t_ref, out_i_ref = rest[:4]
    out_attr_refs = rest[4:]
    seg = pl.program_id(1)
    seg_base = seg * SEG_PRIMS

    @pl.when(seg == 0)
    def _():
        out_t_ref[:] = jnp.full((TILE_ROWS, LANES), BIG, jnp.float32)
        out_i_ref[:] = jnp.full((TILE_ROWS, LANES), -1, jnp.int32)
        # zeros here; the wrapper swaps miss lanes to PRIM 0's attr row
        # outside the kernel (Mosaic cannot broadcast (1,1) -> (R,L):
        # "Broadcast in both sublanes and lanes" is unimplemented)
        for ar in out_attr_refs:
            ar[:] = jnp.zeros((TILE_ROWS, LANES), jnp.float32)

    def sweep():
        ox = o_ref[0][None]
        oy = o_ref[1][None]
        oz = o_ref[2][None]
        dx = d_ref[0][None]
        dy = d_ref[1][None]
        dz = d_ref[2][None]
        a = dx * dx + dy * dy + dz * dz
        inv_a = 1.0 / a
        if cull:
            inv_dx = 1.0 / dx[0]
            inv_dy = 1.0 / dy[0]
            inv_dz = 1.0 / dz[0]
        prim_iota = jax.lax.broadcasted_iota(
            jnp.int32, (PRIM_CHUNK, TILE_ROWS, LANES), 0)

        carry0 = (out_t_ref[:], out_i_ref[:],
                  tuple(ar[:] for ar in out_attr_refs))

        def body(j, carry):
            base = j * PRIM_CHUNK

            def run(carry):
                best_t, best_i, attrs = carry
                t3 = _sphere_chunk_t(sph_ref, base, ox, oy, oz, dx, dy, dz,
                                     a, inv_a, t_min, t_max)
                tmin = jnp.min(t3, axis=0)
                gidx = prim_iota + (seg_base + base)
                idxc = jnp.where(t3 <= tmin[None], gidx, IDX_BIG)
                imin = jnp.min(idxc, axis=0)
                take = tmin < best_t
                # f32 masks: i1 vectors may not cross the lax.cond boundary
                # (Mosaic trunci) — same workaround as the megakernel
                tf = jnp.where(take, 1.0, 0.0)
                wf = jnp.where(gidx == imin[None], 1.0, 0.0)
                new_attrs = []
                for k, curk in enumerate(attrs):
                    valk = attr_ref[k, pl.ds(base, PRIM_CHUNK), :][:, :, None]
                    w = jnp.sum(valk * wf, axis=0)
                    new_attrs.append(w * tf + curk * (1.0 - tf))
                return (jnp.where(take, tmin, best_t),
                        jnp.where(take, imin, best_i), tuple(new_attrs))

            if not cull:
                return run(carry)
            best_t = carry[0]
            reachable = _chunk_reachable(box_ref, j, ox[0], oy[0], oz[0],
                                         inv_dx, inv_dy, inv_dz, best_t,
                                         t_min)
            if has_alive:
                reachable &= alive_ref[:] > 0.0
            return jax.lax.cond(jnp.any(reachable), run, lambda c: c, carry)

        best_t, best_i, attrs = jax.lax.fori_loop(0, n_chunks, body, carry0)
        out_t_ref[:] = best_t
        out_i_ref[:] = best_i
        for ar, val in zip(out_attr_refs, attrs):
            ar[:] = val

    if has_alive:
        @pl.when(jnp.any(alive_ref[:] > 0.0))
        def _():
            sweep()
    else:
        sweep()


def sphere_best_hit_attrs_raw(origin: Array, direction: Array, center: Array,
                              radius: Array, attr_tbl: Array, t_min: float,
                              t_max: float, cull: bool = False,
                              alive: Array | None = None):
    """(t f32[N], idx int32[N], attrs f32[N, A]) — sphere sweep carrying the
    winner's attribute row out of the kernel (see _sphere_kernel_attrs).

    attr_tbl: f32[A, C] per-prim columns.  CONTRACT: rows 0..2 = center
    xyz and row 3 = radius (the custom VJP's exact-root backward reads the
    winner's center/radius from the returned attrs instead of gathering).
    Miss lanes carry PRIM 0's attr row — the analogue of the gather path's
    clamped index, keeping downstream math finite (zeros would feed
    ref_idx = 0 into 1/ri)."""
    n = origin.shape[0]
    c = center.shape[0]
    n_attrs = attr_tbl.shape[0]
    rows = _ray_rows(n)
    o = jnp.stack([_pad_rays(origin[:, k], rows) for k in range(3)])
    d = jnp.stack([_pad_rays(direction[:, k], rows) for k in range(3)])
    c_seg = PRIM_CHUNK if c <= SEG_PRIMS else SEG_PRIMS
    c_pad = -(-c // c_seg) * c_seg
    seg_prims = min(c_pad, SEG_PRIMS)
    n_segs = c_pad // seg_prims
    pad = c_pad - c
    center_p = jnp.concatenate(
        [center, jnp.broadcast_to(center[-1:], (pad, 3))]) if pad else center
    radius_p = jnp.concatenate(
        [radius, jnp.broadcast_to(radius[-1:], (pad,))]) if pad else radius
    attr_p = jnp.concatenate(
        [attr_tbl, jnp.broadcast_to(attr_tbl[:, -1:], (n_attrs, pad))],
        axis=1) if pad else attr_tbl
    tbl = jnp.concatenate([center_p.T, (radius_p * radius_p)[None]])[..., None]
    attr3 = attr_p[..., None]

    n_chunks_total = c_pad // PRIM_CHUNK
    seg_chunks = seg_prims // PRIM_CHUNK
    grid = (rows // TILE_ROWS, n_segs)
    has_alive = alive is not None
    ray_spec = pl.BlockSpec((3, TILE_ROWS, LANES), lambda i, s: (0, i, 0),
                            memory_space=pltpu.VMEM)
    alive_spec = pl.BlockSpec((TILE_ROWS, LANES), lambda i, s: (i, 0),
                              memory_space=pltpu.VMEM)
    alive_args = ((_pad_rays(alive.astype(jnp.float32), rows),)
                  if has_alive else ())
    alive_specs = (alive_spec,) if has_alive else ()
    attr_spec = pl.BlockSpec((n_attrs, seg_prims, 1), lambda i, s: (0, s, 0),
                             memory_space=pltpu.VMEM)
    if cull:
        lo = (center_p - radius_p[:, None]).reshape(n_chunks_total,
                                                    PRIM_CHUNK, 3)
        hi = (center_p + radius_p[:, None]).reshape(n_chunks_total,
                                                    PRIM_CHUNK, 3)
        boxes = jnp.concatenate([lo.min(axis=1).T, hi.max(axis=1).T])[..., None]
        box_specs = (pl.BlockSpec((6, seg_chunks, 1), lambda i, s: (0, s, 0),
                                  memory_space=pltpu.VMEM),)
        box_args = (boxes,)
    else:
        box_specs, box_args = (), ()
    kernel = functools.partial(_sphere_kernel_attrs, n_chunks=seg_chunks,
                               t_min=float(t_min), t_max=float(t_max),
                               cull=cull, has_alive=has_alive,
                               n_attrs=n_attrs)
    out_plane = pl.BlockSpec((TILE_ROWS, LANES), lambda i, s: (i, 0),
                             memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((4, seg_prims, 1), lambda i, s: (0, s, 0),
                         memory_space=pltpu.VMEM),
            *box_specs, attr_spec, *alive_specs, ray_spec, ray_spec,
        ],
        out_specs=[out_plane] * (2 + n_attrs),
        out_shape=[jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
                   jax.ShapeDtypeStruct((rows, LANES), jnp.int32)]
        + [jax.ShapeDtypeStruct((rows, LANES), jnp.float32)] * n_attrs,
        interpret=_interpret(),
    )(tbl, *box_args, attr3, *alive_args, o, d)
    out_t, out_i, *out_attrs = outs
    t = out_t.reshape(-1)[:n]
    i = out_i.reshape(-1)[:n]
    attrs = jnp.stack([p.reshape(-1)[:n] for p in out_attrs], axis=-1)
    # miss lanes carry PRIM 0's attr row — the analogue of the gather
    # path's clamped index (max(idx, 0)); an all-zeros row would feed
    # ref_idx = 0 into the dielectric leg's 1/ri and NaN the backward.
    # A broadcast where, not a gather (Mosaic can't do this init in-kernel:
    # (1,1) -> (R,L) broadcast is unimplemented).
    attrs = jnp.where((i >= 0)[:, None], attrs,
                      jax.lax.stop_gradient(attr_tbl[:, 0])[None, :])
    return t, i, attrs


def sphere_best_hit_raw(origin: Array, direction: Array, center: Array,
                        radius: Array, t_min: float, t_max: float,
                        cull: bool = False,
                        alive: Array | None = None) -> Tuple[Array, Array]:
    """(best_t f32[N], best_idx int32[N]) over all spheres; idx -1 = miss.

    cull=True enables tiled chunk-box culling (wins for coherent
    primary-ray workloads; loses for incoherent path bounces).

    alive: optional f32/bool[N] mask — fully dead ray TILES skip the sweep
    entirely (tile early-out) and dead lanes report miss; the path
    integrator's alive carry makes later bounces progressively cheaper.
    """
    n = origin.shape[0]
    c = center.shape[0]
    rows = _ray_rows(n)
    o = jnp.stack([_pad_rays(origin[:, k], rows) for k in range(3)])
    d = jnp.stack([_pad_rays(direction[:, k], rows) for k in range(3)])
    # sphere table (4, c_pad, 1): x, y, z, r^2; pad by duplicating the last
    # sphere (keeps chunk boxes tight; duplicates lose the first-wins tie).
    # c_pad is a SEG_PRIMS multiple when segmented (> one segment).
    c_seg = PRIM_CHUNK if c <= SEG_PRIMS else SEG_PRIMS
    c_pad = -(-c // c_seg) * c_seg
    seg_prims = min(c_pad, SEG_PRIMS)
    n_segs = c_pad // seg_prims
    pad = c_pad - c
    center_p = jnp.concatenate(
        [center, jnp.broadcast_to(center[-1:], (pad, 3))]) if pad else center
    radius_p = jnp.concatenate(
        [radius, jnp.broadcast_to(radius[-1:], (pad,))]) if pad else radius
    tbl = jnp.concatenate([center_p.T, (radius_p * radius_p)[None]])[..., None]

    n_chunks_total = c_pad // PRIM_CHUNK
    seg_chunks = seg_prims // PRIM_CHUNK
    lo = (center_p - radius_p[:, None]).reshape(n_chunks_total, PRIM_CHUNK, 3)
    hi = (center_p + radius_p[:, None]).reshape(n_chunks_total, PRIM_CHUNK, 3)
    boxes = jnp.concatenate([lo.min(axis=1).T, hi.max(axis=1).T])[..., None]

    grid = (rows // TILE_ROWS, n_segs)
    has_alive = alive is not None
    ray_spec = pl.BlockSpec((3, TILE_ROWS, LANES), lambda i, s: (0, i, 0),
                            memory_space=pltpu.VMEM)
    alive_spec = pl.BlockSpec((TILE_ROWS, LANES), lambda i, s: (i, 0),
                              memory_space=pltpu.VMEM)
    alive_args = ((_pad_rays(alive.astype(jnp.float32), rows),)
                  if has_alive else ())
    alive_specs = (alive_spec,) if has_alive else ()
    if cull:
        kernel = functools.partial(_sphere_kernel, n_chunks=seg_chunks,
                                   t_min=float(t_min), t_max=float(t_max),
                                   has_alive=has_alive)
        in_specs = [
            pl.BlockSpec((4, seg_prims, 1), lambda i, s: (0, s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((6, seg_chunks, 1), lambda i, s: (0, s, 0),
                         memory_space=pltpu.VMEM),
            *alive_specs, ray_spec, ray_spec,
        ]
        args = (tbl, boxes, *alive_args, o, d)
    else:
        kernel = functools.partial(_sphere_kernel_plain, n_chunks=seg_chunks,
                                   t_min=float(t_min), t_max=float(t_max),
                                   has_alive=has_alive)
        in_specs = [
            pl.BlockSpec((4, seg_prims, 1), lambda i, s: (0, s, 0),
                         memory_space=pltpu.VMEM),
            *alive_specs, ray_spec, ray_spec,
        ]
        args = (tbl, *alive_args, o, d)
    out_t, out_i = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((TILE_ROWS, LANES), lambda i, s: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_ROWS, LANES), lambda i, s: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
            jax.ShapeDtypeStruct((rows, LANES), jnp.int32),
        ],
        interpret=_interpret(),
    )(*args)
    return out_t.reshape(-1)[:n], out_i.reshape(-1)[:n]


# ---------------------------------------------------------------------------
# Triangles (Moller-Trumbore, quirk-compatible)
# ---------------------------------------------------------------------------

def _triangle_kernel(tri_ref, *rest, n_chunks: int, t_min: float,
                     t_max: float, backface_only: bool, no_t_clip: bool,
                     back_culling: bool, has_alive: bool = False):
    rest = list(rest)
    alive_ref = rest.pop(0) if has_alive else None
    o_ref, d_ref, out_t_ref, out_i_ref = rest
    seg = pl.program_id(1)
    seg_base = seg * SEG_PRIMS

    @pl.when(seg == 0)
    def _():
        out_t_ref[:] = jnp.full((TILE_ROWS, LANES), BIG, jnp.float32)
        out_i_ref[:] = jnp.full((TILE_ROWS, LANES), -1, jnp.int32)

    def sweep():
        ox = o_ref[0][None]
        oy = o_ref[1][None]
        oz = o_ref[2][None]
        dx = d_ref[0][None]
        dy = d_ref[1][None]
        dz = d_ref[2][None]
        prim_iota = jax.lax.broadcasted_iota(
            jnp.int32, (PRIM_CHUNK, TILE_ROWS, LANES), 0)

        best_t0 = out_t_ref[:]
        best_i0 = out_i_ref[:]

        def body(j, carry):
            best_t, best_i = carry
            base = j * PRIM_CHUNK
            t = _tri_chunk_t(tri_ref, base, ox, oy, oz, dx, dy, dz,
                             t_min=t_min, t_max=t_max,
                             backface_only=backface_only,
                             no_t_clip=no_t_clip, back_culling=back_culling)
            return _merge_chunk(best_t, best_i, t, seg_base + base,
                                prim_iota)

        best_t, best_i = jax.lax.fori_loop(0, n_chunks, body,
                                           (best_t0, best_i0))
        out_t_ref[:] = best_t
        out_i_ref[:] = best_i

    if has_alive:   # tile early-out (see _sphere_kernel)
        @pl.when(jnp.any(alive_ref[:] > 0.0))
        def _():
            sweep()
    else:
        sweep()


def _triangle_kernel_culled(tri_ref, box_ref, *rest, n_chunks: int,
                            t_min: float, t_max: float, backface_only: bool,
                            no_t_clip: bool, back_culling: bool,
                            has_alive: bool = False):
    """Triangle sweep with TILED AABB CULLING.

    Triangles arrive Morton-sorted, so each PRIM_CHUNK chunk is spatially
    compact; box_ref holds per-chunk AABBs (6, n_chunks, 1).  Before running
    a chunk's Moller-Trumbore block, one slab test against the whole ray tile
    decides whether ANY ray can hit the chunk's box within its current best
    t — if not, the chunk is skipped via lax.cond.  Primary-ray tiles are
    spatially coherent, so most chunks skip; worst case adds ~20 ops per
    chunk.  The lower t bound for culling is -inf under the no-t-clip quirk
    (behind-ray triangles stay reachable), so results are bit-identical to
    the uncculled sweep in both quirk profiles.
    """
    rest = list(rest)
    alive_ref = rest.pop(0) if has_alive else None
    o_ref, d_ref, out_t_ref, out_i_ref = rest
    seg = pl.program_id(1)
    seg_base = seg * SEG_PRIMS

    @pl.when(seg == 0)
    def _():
        out_t_ref[:] = jnp.full((TILE_ROWS, LANES), BIG, jnp.float32)
        out_i_ref[:] = jnp.full((TILE_ROWS, LANES), -1, jnp.int32)

    def sweep():
        ox = o_ref[0][None]
        oy = o_ref[1][None]
        oz = o_ref[2][None]
        dx = d_ref[0][None]
        dy = d_ref[1][None]
        dz = d_ref[2][None]
        inv_dx = 1.0 / dx[0]
        inv_dy = 1.0 / dy[0]
        inv_dz = 1.0 / dz[0]
        cull_lo = -float(BIG) if no_t_clip else t_min
        prim_iota = jax.lax.broadcasted_iota(
            jnp.int32, (PRIM_CHUNK, TILE_ROWS, LANES), 0)

        best_t0 = out_t_ref[:]
        best_i0 = out_i_ref[:]

        def body(j, carry):
            best_t, best_i = carry
            base = j * PRIM_CHUNK

            # chunk box vs ray tile (slab test against running best);
            # lo_cut = -BIG under the no-t-clip quirk (negative t can win)
            reachable = _chunk_reachable(box_ref, j, ox[0], oy[0], oz[0],
                                         inv_dx, inv_dy, inv_dz, best_t,
                                         cull_lo)
            if has_alive:   # dead lanes can't force chunk visits
                reachable &= alive_ref[:] > 0.0
            any_hit = jnp.any(reachable)

            def run_chunk(carry):
                best_t, best_i = carry
                t = _tri_chunk_t(tri_ref, base, ox, oy, oz, dx, dy, dz,
                                 t_min=t_min, t_max=t_max,
                                 backface_only=backface_only,
                                 no_t_clip=no_t_clip,
                                 back_culling=back_culling)
                return _merge_chunk(best_t, best_i, t, seg_base + base,
                                    prim_iota)

            return jax.lax.cond(any_hit, run_chunk, lambda c: c,
                                (best_t, best_i))

        best_t, best_i = jax.lax.fori_loop(0, n_chunks, body,
                                           (best_t0, best_i0))
        out_t_ref[:] = best_t
        out_i_ref[:] = best_i

    if has_alive:   # tile early-out (see _sphere_kernel)
        @pl.when(jnp.any(alive_ref[:] > 0.0))
        def _():
            sweep()
    else:
        sweep()


def morton_argsort(points: Array) -> Array:
    """Traced Morton (30-bit) argsort of f32[N,3] points -> int32[N] order.

    Used by intersect_scene_pallas to lay sphere chunks out spatially
    compact INSIDE jit (the wavefront has no host-built aux tables by
    design — the scene is the only input, and per-frame vertex updates
    must not recompile).  The sort depends only on the scene, so XLA's
    while-loop invariant code motion hoists it out of the bounce scan;
    at wavefront scene scales (<= a few thousand prims) it is nanoseconds
    either way."""
    lo = points.min(axis=0)
    span = jnp.maximum(points.max(axis=0) - lo, 1e-20)
    q = jnp.clip((points - lo) / span * 1023.0, 0.0, 1023.0).astype(jnp.uint32)

    def spread(x):
        x = (x | (x << 16)) & jnp.uint32(0x030000FF)
        x = (x | (x << 8)) & jnp.uint32(0x0300F00F)
        x = (x | (x << 4)) & jnp.uint32(0x030C30C3)
        x = (x | (x << 2)) & jnp.uint32(0x09249249)
        return x

    code = (spread(q[:, 0]) << 2) | (spread(q[:, 1]) << 1) | spread(q[:, 2])
    return jnp.argsort(code, stable=True).astype(jnp.int32)


def morton_order(v0: Array, v1: Array, v2: Array):
    """Spatial sort order of triangles by 30-bit Morton code of centroids
    (host-side numpy) — makes PRIM_CHUNK chunks spatially compact."""
    import numpy as onp
    c = (onp.asarray(v0) + onp.asarray(v1) + onp.asarray(v2)) / 3.0
    lo = c.min(axis=0)
    span = onp.maximum(c.max(axis=0) - lo, 1e-20)
    q = onp.clip(((c - lo) / span * 1023.0), 0, 1023).astype(onp.uint64)

    def spread(x):
        x = (x | (x << 16)) & 0x030000FF
        x = (x | (x << 8)) & 0x0300F00F
        x = (x | (x << 4)) & 0x030C30C3
        x = (x | (x << 2)) & 0x09249249
        return x

    code = (spread(q[:, 0]) << 2) | (spread(q[:, 1]) << 1) | spread(q[:, 2])
    return onp.argsort(code, kind="stable").astype(onp.int32)


def triangle_best_hit_raw(origin: Array, direction: Array, v0: Array,
                          v1: Array, v2: Array, normal: Array, t_min: float,
                          t_max: float, quirks: Quirks,
                          cull: bool | None = None,
                          alive: Array | None = None) -> Tuple[Array, Array]:
    n = origin.shape[0]
    c = v0.shape[0]
    rows = _ray_rows(n)
    o = jnp.stack([_pad_rays(origin[:, k], rows) for k in range(3)])
    d = jnp.stack([_pad_rays(direction[:, k], rows) for k in range(3)])
    al = (None if alive is None
          else _pad_rays(alive.astype(jnp.float32), rows))
    if cull is None:
        cull = c >= 128
    if cull:
        return _triangle_best_hit_culled(o, d, v0, v1, v2, normal, n, rows,
                                         t_min, t_max, quirks, al)
    return _triangle_best_hit_plain(o, d, v0, v1, v2, normal, n, rows,
                                    t_min, t_max, quirks, al)


def _pad_tris(v0, v1, v2, normal, multiple=PRIM_CHUNK):
    """Pad the triangle set to a `multiple` by DUPLICATING the last
    triangle (duplicates lose the first-wins tie-break, and chunk bounding
    boxes stay tight — zero-padding would plant degenerate geometry at the
    origin and a huge-sentinel pad would blow up the last chunk's box)."""
    c = v0.shape[0]
    c_pad = -(-c // multiple) * multiple
    pad = c_pad - c
    if pad:
        v0 = jnp.concatenate([v0, jnp.broadcast_to(v0[-1:], (pad, 3))])
        v1 = jnp.concatenate([v1, jnp.broadcast_to(v1[-1:], (pad, 3))])
        v2 = jnp.concatenate([v2, jnp.broadcast_to(v2[-1:], (pad, 3))])
        normal = jnp.concatenate(
            [normal, jnp.broadcast_to(normal[-1:], (pad, 3))])
    return v0, v1, v2, normal, c_pad


def _tri_table(v0, v1, v2, normal, c_pad):
    tbl = jnp.zeros((12, c_pad), jnp.float32)
    tbl = tbl.at[0:3].set(v0.T)
    tbl = tbl.at[3:6].set((v1 - v0).T)
    tbl = tbl.at[6:9].set((v2 - v0).T)
    tbl = tbl.at[9:12].set(normal.T)
    return tbl[..., None]


def _triangle_best_hit_culled(o, d, v0, v1, v2, normal, n, rows, t_min,
                              t_max, quirks: Quirks, alive=None):
    c = v0.shape[0]
    mult = PRIM_CHUNK if c <= SEG_PRIMS else SEG_PRIMS
    v0, v1, v2, normal, c_pad = _pad_tris(v0, v1, v2, normal, mult)
    seg_prims = min(c_pad, SEG_PRIMS)
    n_segs = c_pad // seg_prims
    seg_chunks = seg_prims // PRIM_CHUNK
    tbl = _tri_table(v0, v1, v2, normal, c_pad)
    n_chunks_total = c_pad // PRIM_CHUNK
    # per-chunk AABBs, computed on device so per-frame vertex updates flow
    lo = jnp.minimum(jnp.minimum(v0, v1), v2).reshape(n_chunks_total,
                                                      PRIM_CHUNK, 3)
    hi = jnp.maximum(jnp.maximum(v0, v1), v2).reshape(n_chunks_total,
                                                      PRIM_CHUNK, 3)
    boxes = jnp.concatenate([lo.min(axis=1).T, hi.max(axis=1).T])[..., None]

    grid = (rows // TILE_ROWS, n_segs)
    has_alive = alive is not None
    ray_spec = pl.BlockSpec((3, TILE_ROWS, LANES), lambda i, s: (0, i, 0),
                            memory_space=pltpu.VMEM)
    alive_specs = ((pl.BlockSpec((TILE_ROWS, LANES), lambda i, s: (i, 0),
                                 memory_space=pltpu.VMEM),)
                   if has_alive else ())
    alive_args = (alive,) if has_alive else ()
    kernel = functools.partial(
        _triangle_kernel_culled, n_chunks=seg_chunks, t_min=float(t_min),
        t_max=float(t_max), backface_only=quirks.triangle_backface_only,
        no_t_clip=quirks.triangle_no_t_clip,
        back_culling=quirks.triangle_back_culling, has_alive=has_alive)
    out_t, out_i = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((12, seg_prims, 1), lambda i, s: (0, s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((6, seg_chunks, 1), lambda i, s: (0, s, 0),
                         memory_space=pltpu.VMEM),
            *alive_specs, ray_spec, ray_spec,
        ],
        out_specs=[
            pl.BlockSpec((TILE_ROWS, LANES), lambda i, s: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_ROWS, LANES), lambda i, s: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
            jax.ShapeDtypeStruct((rows, LANES), jnp.int32),
        ],
        interpret=_interpret(),
    )(tbl, boxes, *alive_args, o, d)
    return out_t.reshape(-1)[:n], out_i.reshape(-1)[:n]


def _triangle_best_hit_plain(o, d, v0, v1, v2, normal, n, rows, t_min,
                             t_max, quirks: Quirks, alive=None):
    # triangle table (12, c_pad, 1): v0, e1, e2, normal
    c = v0.shape[0]
    mult = PRIM_CHUNK if c <= SEG_PRIMS else SEG_PRIMS
    v0, v1, v2, normal, c_pad = _pad_tris(v0, v1, v2, normal, mult)
    seg_prims = min(c_pad, SEG_PRIMS)
    n_segs = c_pad // seg_prims
    tbl = _tri_table(v0, v1, v2, normal, c_pad)

    grid = (rows // TILE_ROWS, n_segs)
    has_alive = alive is not None
    ray_spec = pl.BlockSpec((3, TILE_ROWS, LANES), lambda i, s: (0, i, 0),
                            memory_space=pltpu.VMEM)
    alive_specs = ((pl.BlockSpec((TILE_ROWS, LANES), lambda i, s: (i, 0),
                                 memory_space=pltpu.VMEM),)
                   if has_alive else ())
    alive_args = (alive,) if has_alive else ()
    kernel = functools.partial(
        _triangle_kernel, n_chunks=seg_prims // PRIM_CHUNK,
        t_min=float(t_min), t_max=float(t_max),
        backface_only=quirks.triangle_backface_only,
        no_t_clip=quirks.triangle_no_t_clip,
        back_culling=quirks.triangle_back_culling, has_alive=has_alive)
    out_t, out_i = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((12, seg_prims, 1), lambda i, s: (0, s, 0),
                         memory_space=pltpu.VMEM),
            *alive_specs, ray_spec, ray_spec,
        ],
        out_specs=[
            pl.BlockSpec((TILE_ROWS, LANES), lambda i, s: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_ROWS, LANES), lambda i, s: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
            jax.ShapeDtypeStruct((rows, LANES), jnp.int32),
        ],
        interpret=_interpret(),
    )(tbl, *alive_args, o, d)
    return out_t.reshape(-1)[:n], out_i.reshape(-1)[:n]


# ---------------------------------------------------------------------------
# custom_vjp wrappers: pallas forward, winner-only jnp backward
# ---------------------------------------------------------------------------

def _sphere_t_of(origin, direction, center, radius, pick_first):
    """Differentiable t for a KNOWN winning sphere per ray (sphere.h math)."""
    oc = origin - center
    a = jnp.sum(direction * direction, axis=-1)
    b = jnp.sum(oc * direction, axis=-1)
    cc = jnp.sum(oc * oc, axis=-1) - radius * radius
    disc = jnp.maximum(b * b - a * cc, 1e-20)
    sq = jnp.sqrt(disc)
    return jnp.where(pick_first, (-b - sq) / a, (-b + sq) / a)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def sphere_best_hit(origin, direction, center, radius, t_min, t_max,
                    cull=False, alive=None):
    return sphere_best_hit_raw(origin, direction, center, radius, t_min,
                               t_max, cull, alive)


def _sphere_fwd(origin, direction, center, radius, t_min, t_max, cull=False,
                alive=None):
    t, idx = sphere_best_hit_raw(origin, direction, center, radius, t_min,
                                 t_max, cull, alive)
    return (t, idx), (origin, direction, center, radius, t, idx, alive)


def _sphere_bwd(t_min, t_max, cull, res, g):
    origin, direction, center, radius, t, idx, alive = res
    g_t, _ = g
    hit = idx >= 0
    safe = jnp.maximum(idx, 0)
    c_w = center[safe]
    r_w = radius[safe]
    # which root won: re-evaluate the kernel's EXACT selection rule (take t0
    # iff it lies in the (t_min, t_max) window, sphere.h:38-45) instead of a
    # tolerance match on t, which could misattribute gradients for grazing
    # rays where t0 ~= t1
    oc = origin - c_w
    a = jnp.sum(direction * direction, axis=-1)
    b = jnp.sum(oc * direction, axis=-1)
    cc = jnp.sum(oc * oc, axis=-1) - r_w * r_w
    disc = b * b - a * cc
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t0 = (-b - sq) / a
    pick_first = (disc > 0.0) & (t0 < t_max) & (t0 > t_min)

    def t_fn(o, d, c, r):
        return jnp.sum(_sphere_t_of(o, d, c, r, pick_first)
                       * jnp.where(hit, g_t, 0.0))

    g_o, g_d, g_c, g_r = jax.grad(t_fn, argnums=(0, 1, 2, 3))(
        origin, direction, c_w, r_w)
    g_center = jnp.zeros_like(center).at[safe].add(
        jnp.where(hit[:, None], g_c, 0.0))
    g_radius = jnp.zeros_like(radius).at[safe].add(jnp.where(hit, g_r, 0.0))
    g_alive = None if alive is None else jnp.zeros_like(alive)
    return (jnp.where(hit[:, None], g_o, 0.0),
            jnp.where(hit[:, None], g_d, 0.0), g_center, g_radius, g_alive)


sphere_best_hit.defvjp(_sphere_fwd, _sphere_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def sphere_best_hit_attrs(origin, direction, center, radius, attr_tbl,
                          t_min, t_max, cull=False, alive=None):
    """Differentiable attrs-carrying sweep (see sphere_best_hit_attrs_raw).

    Gradients: t flows to origin/direction/center/radius via the exact
    nearest-root recompute (detached winner, like sphere_best_hit) — with
    the winner's center/radius read from the returned ATTRS (contract:
    attr_tbl rows 0..3), not re-gathered; attr outputs flow to attr_tbl by
    scatter-add at the winner rows (the gather VJP, one scatter op).  The
    caller builds attr_tbl from center/radius/decode_table, so attr
    cotangents reach scene parameters through that concat's VJP, while the
    t path reaches center/radius directly — two disjoint paths, no double
    counting."""
    return sphere_best_hit_attrs_raw(origin, direction, center, radius,
                                     attr_tbl, t_min, t_max, cull, alive)


def _sphere_attrs_fwd(origin, direction, center, radius, attr_tbl,
                      t_min, t_max, cull=False, alive=None):
    t, idx, attrs = sphere_best_hit_attrs_raw(origin, direction, center,
                                              radius, attr_tbl, t_min,
                                              t_max, cull, alive)
    return (t, idx, attrs), (origin, direction, attr_tbl.shape, t, idx,
                             attrs, alive)


def _sphere_attrs_bwd(t_min, t_max, cull, res, g):
    origin, direction, tbl_shape, t, idx, attrs, alive = res
    g_t, _, g_attrs = g
    hit = idx >= 0
    safe = jnp.maximum(idx, 0)
    c_w = attrs[:, 0:3]                  # contract: rows 0..2 center xyz
    r_w = attrs[:, 3]                    #           row 3 radius
    # miss lanes carry prim-0's attr row (finite real geometry), and every
    # grad term is where(hit, ..)-masked — same shape as _sphere_bwd's
    # clamped gather
    oc = origin - c_w
    a = jnp.sum(direction * direction, axis=-1)
    b = jnp.sum(oc * direction, axis=-1)
    cc = jnp.sum(oc * oc, axis=-1) - r_w * r_w
    disc = b * b - a * cc
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t0 = (-b - sq) / a
    pick_first = (disc > 0.0) & (t0 < t_max) & (t0 > t_min)

    def t_fn(o, d, c, r):
        return jnp.sum(_sphere_t_of(o, d, c, r, pick_first)
                       * jnp.where(hit, g_t, 0.0))

    g_o, g_d, g_c, g_r = jax.grad(t_fn, argnums=(0, 1, 2, 3))(
        origin, direction, c_w, r_w)
    n_c = tbl_shape[1]
    g_center = jnp.zeros((n_c, 3), origin.dtype).at[safe].add(
        jnp.where(hit[:, None], g_c, 0.0))
    g_radius = jnp.zeros((n_c,), origin.dtype).at[safe].add(
        jnp.where(hit, g_r, 0.0))
    g_tbl = jnp.zeros(tbl_shape, origin.dtype).at[:, safe].add(
        jnp.where(hit[None], g_attrs.T, 0.0))
    g_alive = None if alive is None else jnp.zeros_like(alive)
    return (jnp.where(hit[:, None], g_o, 0.0),
            jnp.where(hit[:, None], g_d, 0.0), g_center, g_radius, g_tbl,
            g_alive)


sphere_best_hit_attrs.defvjp(_sphere_attrs_fwd, _sphere_attrs_bwd)


def _tri_t_of(origin, direction, v0, v1, v2, mask):
    """Differentiable t for a KNOWN winning triangle per ray.

    mask: lanes that actually hit.  Miss lanes pair with an arbitrary
    (index-0) triangle whose determinant `a` may be exactly 0 — the
    double-where keeps 1/a finite there, since inf * (zero cotangent) = NaN
    would otherwise poison the whole scatter-add (hit lanes have
    |a| >= TRI_EPSILON by construction)."""
    e1 = v1 - v0
    e2 = v2 - v0
    q = jnp.cross(origin - v0, e1)
    h = jnp.cross(direction, e2)
    a = jnp.sum(e1 * h, axis=-1)
    a_safe = jnp.where(mask, a, 1.0)
    return jnp.where(mask, jnp.sum(e2 * q, axis=-1) / a_safe, 0.0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def triangle_best_hit(origin, direction, v0, v1, v2, normal, t_min, t_max,
                      quirks, alive=None):
    return triangle_best_hit_raw(origin, direction, v0, v1, v2, normal,
                                 t_min, t_max, quirks, alive=alive)


def _tri_fwd(origin, direction, v0, v1, v2, normal, t_min, t_max, quirks,
             alive=None):
    t, idx = triangle_best_hit_raw(origin, direction, v0, v1, v2, normal,
                                   t_min, t_max, quirks, alive=alive)
    return (t, idx), (origin, direction, v0, v1, v2, idx, alive)


def _tri_bwd(t_min, t_max, quirks, res, g):
    origin, direction, v0, v1, v2, idx, alive = res
    g_t, _ = g
    hit = idx >= 0
    safe = jnp.maximum(idx, 0)

    def t_fn(o, d, a0, a1, a2):
        return jnp.sum(_tri_t_of(o, d, a0, a1, a2, hit)
                       * jnp.where(hit, g_t, 0.0))

    g_o, g_d, g0, g1, g2 = jax.grad(t_fn, argnums=(0, 1, 2, 3, 4))(
        origin, direction, v0[safe], v1[safe], v2[safe])
    z = jnp.where(hit[:, None], 1.0, 0.0)
    gv0 = jnp.zeros_like(v0).at[safe].add(g0 * z)
    gv1 = jnp.zeros_like(v1).at[safe].add(g1 * z)
    gv2 = jnp.zeros_like(v2).at[safe].add(g2 * z)
    g_alive = None if alive is None else jnp.zeros_like(alive)
    return (g_o * z, g_d * z, gv0, gv1, gv2, jnp.zeros_like(v0), g_alive)


triangle_best_hit.defvjp(_tri_fwd, _tri_bwd)


# ---------------------------------------------------------------------------
# In-kernel scatter draws (round 5): the wavefront's per-bounce threefry
# RNG measured ~0.15 s of the 2.25 s headline frame (docs/ROUND5_NOTES.md
# §10 — shared-stream control), so the TPU forward path draws its unit-ball
# + uniform samples with the hardware PRNG instead, in a tiny Pallas
# kernel.  Distribution and math are IDENTICAL to the megakernel's
# draw_samples (Box-Muller direction + cbrt radius, 24-bit-mantissa
# uniforms — distribution-checked in round 2); the seed derives from the
# bounce key by one scalar threefry draw, exactly like the megakernel's
# seeding, so replays/remats of the same key reproduce the same samples.
# ---------------------------------------------------------------------------

def _draws_kernel(seed_ref, out_ref):
    import numpy as _np
    pltpu.prng_seed(seed_ref[0], pl.program_id(0))
    bits = pltpu.prng_random_bits((6, TILE_ROWS, LANES))
    # SIGNED int32 >> is arithmetic: mask the low 24 bits AFTER the shift
    u = ((bits >> 8) & 0xFFFFFF).astype(jnp.float32) * (1.0 / 16777216.0)
    r1 = jnp.sqrt(-2.0 * jnp.log(jnp.maximum(u[0], 1e-12)))
    ang1 = (2.0 * _np.pi) * u[1]
    g0 = r1 * jnp.cos(ang1)
    g1 = r1 * jnp.sin(ang1)
    r2 = jnp.sqrt(-2.0 * jnp.log(jnp.maximum(u[2], 1e-12)))
    g2 = r2 * jnp.cos((2.0 * _np.pi) * u[3])
    inv_norm = 1.0 / jnp.maximum(jnp.sqrt(g0 * g0 + g1 * g1 + g2 * g2),
                                 1e-12)
    rad = jnp.exp(jnp.log(jnp.maximum(u[4], 1e-30)) * (1.0 / 3.0))
    s = inv_norm * rad
    out_ref[0] = g0 * s
    out_ref[1] = g1 * s
    out_ref[2] = g2 * s
    out_ref[3] = u[5]


def scatter_draws_pallas(key: jax.Array, n: int):
    """(ball f32[n,3], prob f32[n]) from the TPU hardware PRNG — drop-in
    for models/materials.scatter_draws on the TPU forward path
    (cfg.wavefront_tpu_prng).  TPU-only: interpret mode has no lowering for
    the pltpu PRNG primitives (raises NotImplementedError on CPU — the
    integrator's gate never calls this off-TPU), and CPU keeps the
    threefry draws (bit-parity with stream_from_key)."""
    if _interpret():
        raise NotImplementedError(
            "scatter_draws_pallas is TPU-only (pltpu.prng_* has no CPU/"
            "interpret lowering); use models.materials.scatter_draws")
    rows = _ray_rows(n)
    seed = jax.random.randint(key, (1,), 0, 2 ** 30 - 1, dtype=jnp.int32)
    out = pl.pallas_call(
        _draws_kernel,
        grid=(rows // TILE_ROWS,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((4, TILE_ROWS, LANES), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((4, rows, LANES), jnp.float32),
    )(seed)
    flat = out.reshape(4, rows * LANES)[:, :n]
    return flat[:3].T, flat[3]
