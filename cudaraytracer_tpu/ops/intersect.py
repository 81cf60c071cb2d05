"""Vectorized ray-primitive intersection over SoA tables.

Replaces the virtual ``collision_detection`` dispatch (sphere.h / triangle.h /
rectangle.h + hitable_list.h linear scan) with masked, branch-free batch tests
and an argmin-style closest-hit reduction — the wavefront formulation that maps
onto the TPU VPU.  Large primitive sets are processed in chunks via
``lax.scan`` carrying the running closest hit, so memory stays bounded while
XLA fuses each chunk's elementwise chain.

Reference quirks (config.Quirks) reproduced here:
  * triangle_backface_only — triangle.h:61 rejects rays with
    dot(dir, face_normal) < 0 (only back faces render).
  * triangle_no_t_clip — triangle.h:92-94 never tests t against t_min/t_max;
    only the caller's closest-so-far comparison (hitable_list.h:84) applies, so
    even negative t wins.  hitable_list seeds closest_so_far with t_max.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import Quirks
from ..core import vec as v3
from ..core.rays import Rays
from ..models.scene import Scene

Array = jnp.ndarray

# FLT_MAX as a host-side numpy scalar: module import must NOT create device
# arrays (a device constant here would trigger TPU-tunnel I/O at import time).
import numpy as _np
BIG = _np.float32(3.4028235e38)
TRI_EPSILON = 1e-6               # triangle.h:9 EPSILON
# Fold the material decode columns into finalize_hits' winner-row gather
# (consolidated TPU form, sphere/tri-only scenes).  Module-level so the
# A/B is testable; see _prim_rows(with_dec)/Hits.dec.
FOLD_DEC = True
# Test hook: force the consolidated row form on/off regardless of backend
# (None = follow jax.default_backend()).  The CPU suite uses it to exercise
# the TPU-default fold path (tests/test_intersect.py).
CONSOLIDATE = None


class Hits(NamedTuple):
    """Batched HitRecord (hitable.h:11-18)."""

    hit: Array     # bool[N]
    t: Array       # f32[N]
    p: Array       # f32[N,3]
    normal: Array  # f32[N,3]
    u: Array       # f32[N]
    v: Array       # f32[N]
    mat: Array     # int32[N]
    prim: Array    # int32[N] global primitive id (spheres, then tris, then rects)
    # Pre-decoded material/texture fields for the winner, when finalize_hits
    # could fold the decode columns into its winner-row gathers (the
    # consolidated TPU form; prim rows and xform rows both carry them).
    # The separate per-ray decode_materials gather measured ~0.45 s/frame
    # on the r4 wavefront headline; sharing the row gather removes it.
    # None -> the bounce body decodes via decode_materials as before.
    # Miss lanes carry prim-0's decoded row (the old form decoded mat 0
    # there) — both are masked downstream and only need to be finite.
    dec: object = None   # Optional[models.materials.DecodedMaterials]


# ---------------------------------------------------------------------------
# Per-type candidate tests.  Each returns (valid[N,C], t[N,C]) plus enough info
# to reconstruct the hit record after the winner is chosen.
# ---------------------------------------------------------------------------

def sphere_candidates(origin, direction, center, radius, t_min, t_max):
    """sphere.h:27-55 — object-space quadratic; nearest in-range root.

    origin/direction: f32[N,3]; center f32[C,3]; radius f32[C].
    Returns valid bool[N,C], t f32[N,C].
    """
    oc = origin[:, None, :] - center[None, :, :]          # (N,C,3)
    d = direction[:, None, :]
    a = jnp.sum(d * d, axis=-1)                            # (N,1->C broadcast)
    b = jnp.sum(oc * d, axis=-1)
    c = jnp.sum(oc * oc, axis=-1) - radius[None, :] ** 2
    disc = b * b - a * c
    # double-where so d(sqrt)/d(disc) is finite for misses (disc <= 0): a bare
    # sqrt(max(disc, 0)) yields 0 * inf = NaN in the backward pass.
    disc_safe = jnp.where(disc > 0.0, disc, 1.0)
    sq = jnp.where(disc > 0.0, jnp.sqrt(disc_safe), 0.0)
    t0 = (-b - sq) / a
    t1 = (-b + sq) / a
    ok0 = (disc > 0.0) & (t0 < t_max) & (t0 > t_min)
    ok1 = (disc > 0.0) & (t1 < t_max) & (t1 > t_min)
    t = jnp.where(ok0, t0, jnp.where(ok1, t1, BIG))
    return ok0 | ok1, t


def triangle_candidates(origin, direction, v0, v1, v2, face_normal,
                        t_min, t_max, quirks: Quirks):
    """triangle.h:57-100 — Moller-Trumbore with the reference's quirks.

    Returns valid bool[N,C], t f32[N,C], u f32[N,C], v f32[N,C].
    """
    d = direction[:, None, :]                              # (N,1,3)
    e1 = (v1 - v0)[None, :, :]                             # (1,C,3)
    e2 = (v2 - v0)[None, :, :]
    h = jnp.cross(d, e2)
    a = jnp.sum(e1 * h, axis=-1)                           # (N,C)
    # double-where the 1/a: rejected near-zero determinants otherwise leak
    # inf into the backward pass (0 cotangent * inf = NaN)
    eps_ok = jnp.abs(a) >= TRI_EPSILON
    f = 1.0 / jnp.where(eps_ok, a, 1.0)
    s = origin[:, None, :] - v0[None, :, :]
    u = f * jnp.sum(s * h, axis=-1)
    q = jnp.cross(s, e1)
    v = f * jnp.sum(d * q, axis=-1)
    t = f * jnp.sum(e2 * q, axis=-1)

    # triangle.h:77-78 — unconditional two-sided epsilon rejection; with the
    # per-triangle backCulling flag (triangle.h:74, quirk-gated — reference
    # scenes always pass cull=false) front-determinant rays also miss.
    valid = eps_ok & (u >= 0.0) & (u <= 1.0) \
        & (v >= 0.0) & (u + v <= 1.0)
    if quirks.triangle_back_culling:
        valid &= a >= TRI_EPSILON
    if quirks.triangle_backface_only:
        # triangle.h:61 — dot(dir, stored normal) < 0 => miss.
        facing = jnp.sum(d * face_normal[None, :, :], axis=-1)
        valid &= facing >= 0.0
    if not quirks.triangle_no_t_clip:
        valid &= (t > t_min) & (t < t_max)
    else:
        # hitable_list.h:84 only demands t < closest_so_far (seeded with t_max).
        valid &= t < t_max
    return valid, jnp.where(valid, t, BIG), u, v


def rect_candidates(rays: Rays, rects, t_min, t_max):
    """rectangle.h:22-44 through the reference ray transform (hitable.h:29-38).

    Returns valid[N,C], t[N,C], u[N,C], v[N,C], p[N,C,3] (object-space hit
    point, reproducing the reference's untransformed rec.p), normal[N,C,3]
    (object normal rotated by the object rotation, hitable.h:36).

    t parameterization: the rect test runs on the ScaleRay'd ray whose
    direction is NORMALIZED (transform.h:50-54) while sphere/triangle t here
    is measured along the raw unnormalized direction.  The reference compares
    every primitive's t in its own TransformRay-normalized parameterization
    (hitable.h:29-38) — and since ScaleRay leaves the ORIGIN unscaled
    (reference quirk), the rect's native t is a distance along a unit vector,
    i.e. commensurable with the world-distance t of identity-transform
    spheres/triangles.  Returned t is therefore rescaled into the caller's
    raw-direction parameterization by 1/|direction|, which reproduces the
    reference's closest-hit ordering exactly for ANY |direction| (camera rays
    are deliberately unnormalized, |d| ~ focus_dist).  The [t_min, t_max]
    window is applied to the native (normalized-param) t, matching
    rectangle.h:32; note sphere/triangle windows use raw-param t — the same
    epsilon-scale divergence the reference itself has for |d| != 1.
    """
    trs = rects.trs
    o, d, raw_len = _transform_rays_nc(rays, trs)   # the exact TransformRay

    obj_normal = jnp.where(rects.flip[:, None],
                           jnp.asarray([0.0, 0.0, -1.0]),
                           jnp.asarray([0.0, 0.0, 1.0]))[None, :, :]     # (1,C,3)
    facing = jnp.sum(d * obj_normal, axis=-1)
    # double-where the plane division: edge-on rays (d_z == 0) are invalid
    # (matching the reference, where t = +-inf/NaN fails the window tests)
    # but an unguarded inf would NaN the backward pass
    dz = d[..., 2]
    dz_ok = dz != 0.0
    t = -o[..., 2] / jnp.where(dz_ok, dz, 1.0)
    x = o[..., 0] + t * d[..., 0]
    y = o[..., 1] + t * d[..., 1]
    valid = dz_ok & (facing <= 0.0) & (t >= t_min) & (t <= t_max) \
        & (x >= -0.5) & (x <= 0.5) & (y >= -0.5) & (y <= 0.5)
    u = x + 0.5
    v = y + 0.5
    p = o + t[..., None] * d
    normal = v3.rotate(jnp.broadcast_to(obj_normal, d.shape), trs.rotation[None])
    # rescale native t into the caller's raw-direction parameterization (see
    # docstring) so the closest-hit reduction compares commensurable values
    t_cmp = t / raw_len
    return valid, jnp.where(valid, t_cmp, BIG), u, v, p, normal


def _transform_rays_nc(rays: Rays, trs):
    """TransformRay (transform.h:11-14) broadcast to (N, C): returns the
    object-space origin/unit-direction plus 1/|raw d| for rescaling the
    native t into the caller's raw-direction parameterization (see
    rect_candidates' docstring — identical reasoning)."""
    o = rays.origin[:, None, :]
    dir0 = rays.direction[:, None, :]
    raw_len = jnp.sqrt(jnp.sum(dir0 * dir0, axis=-1))      # (N,1)
    d = dir0 / trs.scale[None, :, :]                        # ScaleRay
    dlen = jnp.sqrt(jnp.sum(d * d, axis=-1, keepdims=True))
    d = d / dlen
    o = v3.rotate(jnp.broadcast_to(o, d.shape), trs.rotation[None])  # RotateRay
    d = v3.rotate(d, trs.rotation[None])
    o = o - trs.position[None]                              # TranslateRay
    return o, d, raw_len


def t_sphere_candidates(rays: Rays, tsph, t_min, t_max):
    """Runtime-TRS spheres — sphere.h:27-55 on the TransformRay'd ray
    (origin-centered object-space sphere; hitable.h:29-38 chain).

    Returns valid[N,C], t_cmp[N,C] (raw-direction parameterization),
    p_obj[N,C,3] (reference rec.p stays object-space), normal[N,C,3]
    (object normal p/r rotated by the object rotation, hitable.h:36).
    """
    o, d, raw_len = _transform_rays_nc(rays, tsph.trs)
    r = tsph.radius[None, :]
    b = jnp.sum(o * d, axis=-1)
    a = jnp.sum(d * d, axis=-1)
    c = jnp.sum(o * o, axis=-1) - r * r
    disc = b * b - a * c
    disc_safe = jnp.where(disc > 0.0, disc, 1.0)
    sq = jnp.where(disc > 0.0, jnp.sqrt(disc_safe), 0.0)
    t0 = (-b - sq) / a
    t1 = (-b + sq) / a
    # t window applies in the NATIVE (normalized) parameterization, as the
    # reference does (sphere.h:38/45 on the transformed ray)
    ok0 = (disc > 0.0) & (t0 < t_max) & (t0 > t_min)
    ok1 = (disc > 0.0) & (t1 < t_max) & (t1 > t_min)
    t = jnp.where(ok0, t0, jnp.where(ok1, t1, BIG))
    valid = ok0 | ok1
    # p at t = BIG overflows to inf for invalid candidates, and the masked
    # 1/r radius partial of `normal` would then be 0 * inf = NaN in the
    # backward — compute p at t = 0 there (finalize gathers winners only)
    t_p = jnp.where(valid, t, 0.0)
    p = o + t_p[..., None] * d
    normal = v3.rotate(p / r[..., None], tsph.trs.rotation[None])
    t_cmp = t / raw_len
    return valid, jnp.where(valid, t_cmp, BIG), p, normal


def t_triangle_candidates(rays: Rays, ttri, t_min, t_max, quirks: Quirks):
    """Runtime-TRS triangles — triangle.h:57-100 on the TransformRay'd ray
    against OBJECT-space vertices, quirks included; normal is the stored
    object normal rotated by the object rotation (hitable.h:36).

    Returns valid[N,C], t_cmp[N,C], u, v, p_obj[N,C,3], normal[N,C,3]."""
    o, d, raw_len = _transform_rays_nc(rays, ttri.trs)
    e1 = (ttri.v1 - ttri.v0)[None]
    e2 = (ttri.v2 - ttri.v0)[None]
    h = jnp.cross(d, e2)
    a = jnp.sum(e1 * h, axis=-1)
    eps_ok = jnp.abs(a) >= TRI_EPSILON       # double-where: see above
    f = 1.0 / jnp.where(eps_ok, a, 1.0)
    s = o - ttri.v0[None]
    u = f * jnp.sum(s * h, axis=-1)
    q = jnp.cross(s, e1)
    v = f * jnp.sum(d * q, axis=-1)
    t = f * jnp.sum(e2 * q, axis=-1)
    valid = eps_ok & (u >= 0.0) & (u <= 1.0) \
        & (v >= 0.0) & (u + v <= 1.0)
    if quirks.triangle_back_culling:
        valid &= a >= TRI_EPSILON
    if quirks.triangle_backface_only:
        # triangle.h:61 on the TRANSFORMED direction vs the object normal
        valid &= jnp.sum(d * ttri.normal[None], axis=-1) >= 0.0
    if not quirks.triangle_no_t_clip:
        valid &= (t > t_min) & (t < t_max)
    else:
        valid &= t < t_max
    p = o + t[..., None] * d
    normal = v3.rotate(jnp.broadcast_to(ttri.normal[None], d.shape),
                       ttri.trs.rotation[None])
    t_cmp = t / raw_len
    return valid, jnp.where(valid, t_cmp, BIG), u, v, p, normal


# ---------------------------------------------------------------------------
# Whole-scene brute-force intersect with chunked reduction.
# ---------------------------------------------------------------------------

def _reduce_t_tables(scene: Scene, rays: Rays, best, t_min, t_max,
                     quirks: Quirks):
    """Fold the runtime-TRS sphere/triangle tables into the running best.
    Global index space appends them after rects: [spheres, triangles, rects,
    t_spheres, t_triangles]."""
    best_t, best_idx = best
    n_base = scene.n_spheres + scene.n_triangles + scene.n_rects
    n_ts = scene.n_t_spheres
    if n_ts:
        valid, t, _, _ = t_sphere_candidates(rays, scene.t_spheres, t_min,
                                             t_max)
        idx = jnp.arange(n_ts, dtype=jnp.int32) + n_base
        best_t, best_idx = _reduce_best((best_t, best_idx), t, valid,
                                        jnp.broadcast_to(idx[None], t.shape))
    if scene.n_t_triangles:
        valid, t, _, _, _, _ = t_triangle_candidates(rays, scene.t_triangles,
                                                     t_min, t_max, quirks)
        idx = jnp.arange(scene.n_t_triangles, dtype=jnp.int32) + n_base + n_ts
        best_t, best_idx = _reduce_best((best_t, best_idx), t, valid,
                                        jnp.broadcast_to(idx[None], t.shape))
    return best_t, best_idx



def _reduce_best(best, cand_t, cand_valid, cand_idx):
    """Keep the smaller-t candidate; first occurrence wins ties (matching the
    hitable_list.h:84 strictly-less scan order)."""
    best_t, best_idx = best
    c = jnp.argmin(cand_t, axis=1)
    rows = jnp.arange(cand_t.shape[0])
    ct = cand_t[rows, c]
    cv = cand_valid[rows, c]
    ci = cand_idx[rows, c] if cand_idx.ndim == 2 else cand_idx[c]
    take = cv & (ct < best_t)
    return jnp.where(take, ct, best_t), jnp.where(take, ci, best_idx)


def intersect_scene(scene: Scene, rays: Rays, t_min: float = 1e-3,
                    t_max: float = float(BIG), quirks: Quirks = Quirks(),
                    prim_chunk: int = 1024,
                    tri_override=None) -> Hits:
    """Closest-hit over all primitives; the SoA analog of
    HitableList::collision_detection (hitable_list.h:76-91).

    tri_override: optional (v0, v1, v2, normal) arrays replacing the scene's
    triangle geometry (used by animation to avoid rebuilding the pytree).
    """
    n = rays.origin.shape[0]
    t_min = jnp.float32(t_min)
    t_max = jnp.float32(t_max)
    best_t = jnp.full((n,), BIG)
    best_idx = jnp.full((n,), -1, jnp.int32)

    n_s = scene.n_spheres
    n_t = scene.n_triangles
    n_r = scene.n_rects

    if n_s:
        def sphere_chunk(carry, chunk):
            center, radius, idx = chunk
            valid, t = sphere_candidates(rays.origin, rays.direction,
                                         center, radius, t_min, t_max)
            return _reduce_best(carry, jnp.where(valid, t, BIG), valid,
                                jnp.broadcast_to(idx[None], t.shape)), None

        chunks = _chunk_arrays((scene.spheres.center, scene.spheres.radius,
                                jnp.arange(n_s, dtype=jnp.int32)), prim_chunk)
        (best_t, best_idx), _ = jax.lax.scan(sphere_chunk, (best_t, best_idx), chunks)

    if n_t:
        tv0, tv1, tv2, tnorm = (tri_override if tri_override is not None else
                                (scene.triangles.v0, scene.triangles.v1,
                                 scene.triangles.v2, scene.triangles.normal))

        def tri_chunk(carry, chunk):
            v0, v1, v2, nrm, idx = chunk
            valid, t, _, _ = triangle_candidates(rays.origin, rays.direction,
                                                 v0, v1, v2, nrm, t_min, t_max, quirks)
            return _reduce_best(carry, t, valid,
                                jnp.broadcast_to(idx[None], t.shape)), None

        chunks = _chunk_arrays((tv0, tv1, tv2, tnorm,
                                jnp.arange(n_t, dtype=jnp.int32) + n_s), prim_chunk)
        (best_t, best_idx), _ = jax.lax.scan(tri_chunk, (best_t, best_idx), chunks)

    if n_r:
        valid, t, _, _, _, _ = rect_candidates(rays, scene.rects, t_min, t_max)
        idx = jnp.arange(n_r, dtype=jnp.int32) + n_s + n_t
        (best_t, best_idx) = _reduce_best((best_t, best_idx), t, valid,
                                          jnp.broadcast_to(idx[None], t.shape))

    best_t, best_idx = _reduce_t_tables(scene, rays, (best_t, best_idx),
                                        t_min, t_max, quirks)
    return finalize_hits(scene, rays, best_t, best_idx, t_min, t_max, quirks,
                         tri_override)


def intersect_scene_bvh(scene: Scene, rays: Rays, bvh, t_min: float = 1e-3,
                        t_max: float = float(BIG), quirks: Quirks = Quirks(),
                        prim_chunk: int = 1024, tri_override=None) -> Hits:
    """Closest-hit using a FlatBVH for the triangle set (the reference's
    active pipeline: BVH over the FBX mesh, kernel.cu:97) and brute force for
    the few spheres/rects (matching the reference scene layout where only the
    mesh goes through the BVH)."""
    from . import bvh as _bvh  # local import to avoid cycle

    n = rays.origin.shape[0]
    t_min_f = jnp.float32(t_min)
    t_max_f = jnp.float32(t_max)
    best_t = jnp.full((n,), BIG)
    best_idx = jnp.full((n,), -1, jnp.int32)

    n_s = scene.n_spheres
    n_t = scene.n_triangles
    n_r = scene.n_rects

    if n_s:
        valid, t = sphere_candidates(rays.origin, rays.direction,
                                     scene.spheres.center, scene.spheres.radius,
                                     t_min_f, t_max_f)
        idx = jnp.arange(n_s, dtype=jnp.int32)
        best_t, best_idx = _reduce_best((best_t, best_idx),
                                        jnp.where(valid, t, BIG), valid,
                                        jnp.broadcast_to(idx[None], t.shape))

    if n_t:
        tv0, tv1, tv2, tnorm = (tri_override if tri_override is not None else
                                (scene.triangles.v0, scene.triangles.v1,
                                 scene.triangles.v2, scene.triangles.normal))
        bt, bp = _bvh.traverse_bvh(bvh, tv0, tv1, tv2, tnorm, rays,
                                   t_min, t_max, quirks)
        take = (bp >= 0) & (bt < best_t)
        best_t = jnp.where(take, bt, best_t)
        best_idx = jnp.where(take, bp + n_s, best_idx)

    if n_r:
        valid, t, _, _, _, _ = rect_candidates(rays, scene.rects, t_min_f, t_max_f)
        idx = jnp.arange(n_r, dtype=jnp.int32) + n_s + n_t
        best_t, best_idx = _reduce_best((best_t, best_idx), t, valid,
                                        jnp.broadcast_to(idx[None], t.shape))

    best_t, best_idx = _reduce_t_tables(scene, rays, (best_t, best_idx),
                                        t_min_f, t_max_f, quirks)
    return finalize_hits(scene, rays, best_t, best_idx, t_min, t_max, quirks,
                         tri_override)


def intersect_scene_pallas(scene: Scene, rays: Rays, t_min: float = 1e-3,
                           t_max: float = float(BIG),
                           quirks: Quirks = Quirks(),
                           coherent: bool = False,
                           alive: Array | None = None,
                           sphere_cull: str = "primary",
                           kernel_attrs: bool = False,
                           fold_dec: bool = True) -> Hits:
    """Closest-hit via the fused Pallas kernels (ops/pallas_intersect.py):
    sphere and triangle sweeps run fully in VMEM with no (rays x prims)
    HBM materialization; rects (rare) stay on the jnp path.  Differentiable
    via the kernels' custom VJPs.

    sphere_cull selects the sphere-sweep culling policy:
      * "all"     — chunk-box culling on EVERY sweep.  Only worth it when
        the sphere table is spatially ordered (trace_path's 'morton' mode
        permutes the scene's sphere block once and passes this policy —
        without an order "every chunk spans the whole scene and the
        per-chunk cull never fires", build_mega_tables).
      * "primary" — cull only when coherent=True (builder order).
      * "off"     — never cull.
    coherent=True marks coherent primary/camera rays rendered in swizzled
    screen blocks (the (primary, bounce) intersector pair).  Triangle
    sweeps always cull — mesh chunks are compact enough that the box test
    wins even for bounced rays.

    alive: optional bool/f32[N] mask from the path integrator's carry —
    fully dead (32 x 128) ray tiles skip the sweeps entirely and dead
    lanes report miss, which the integrator's own masks already treat as
    'no contribution' (the sweep-side half of dead-ray harvesting; the
    megakernel gets the same effect from its in-kernel early-out)."""
    from . import pallas_intersect as pk  # local import: pallas optional

    n = rays.origin.shape[0]
    best_t = jnp.full((n,), BIG)
    best_idx = jnp.full((n,), -1, jnp.int32)

    n_s, n_t, n_r = scene.n_spheres, scene.n_triangles, scene.n_rects
    n_x_all = n_r + scene.n_t_spheres + scene.n_t_triangles

    if (n_s and not n_t and not n_x_all and kernel_attrs and fold_dec
            and _want_fold()):
        # PURE-SPHERE gradient-optimized path
        # (cfg.wavefront_kernel_attrs, the fit paths' default): the sweep
        # kernel carries the winner's attribute row out ([center(3),
        # radius, mat, decode_table(16)]), so the hit record builds with
        # NO per-ray winner gather at all.  v5e: backward 16-19% faster
        # (no gather VJP scatter, residual center/radius), forward ~6%
        # slower than the row-gather form — hence opt-in (ROUND4_NOTES
        # §17).
        return _sphere_attrs_hits(scene, rays, t_min, t_max, coherent,
                                  sphere_cull, alive)

    if n_s:
        cull = sphere_cull == "all" or (sphere_cull != "off" and coherent)
        st, si = pk.sphere_best_hit(rays.origin, rays.direction,
                                    scene.spheres.center,
                                    scene.spheres.radius,
                                    float(t_min), float(t_max), cull,
                                    alive)
        take = (si >= 0) & (st < best_t)
        best_t = jnp.where(take, st, best_t)
        best_idx = jnp.where(take, si, best_idx)

    if n_t:
        tr = scene.triangles
        tt, ti = pk.triangle_best_hit(rays.origin, rays.direction, tr.v0,
                                      tr.v1, tr.v2, tr.normal, float(t_min),
                                      float(t_max), quirks, alive)
        take = (ti >= 0) & (tt < best_t)
        best_t = jnp.where(take, tt, best_t)
        best_idx = jnp.where(take, ti + n_s, best_idx)

    if n_r:
        valid, t, _, _, _, _ = rect_candidates(rays, scene.rects,
                                               jnp.float32(t_min),
                                               jnp.float32(t_max))
        idx = jnp.arange(n_r, dtype=jnp.int32) + n_s + n_t
        best_t, best_idx = _reduce_best((best_t, best_idx), t, valid,
                                        jnp.broadcast_to(idx[None], t.shape))

    best_t, best_idx = _reduce_t_tables(scene, rays, (best_t, best_idx),
                                        jnp.float32(t_min), jnp.float32(t_max),
                                        quirks)
    return finalize_hits(scene, rays, best_t, best_idx, t_min, t_max, quirks,
                         fold_dec=fold_dec)


def _want_fold() -> bool:
    """Trace-time: should finalize fold decode columns / should the pure-
    sphere path use the attrs-carrying kernel?  (Consolidated TPU form;
    tests force it on CPU via CONSOLIDATE.)"""
    consolidate = (CONSOLIDATE if CONSOLIDATE is not None
                   else jax.default_backend() == "tpu")
    return FOLD_DEC and consolidate


def _sphere_attrs_hits(scene: Scene, rays: Rays, t_min, t_max,
                       coherent: bool, sphere_cull: str,
                       alive: Array | None) -> Hits:
    """Pure-sphere hit records via the attrs-carrying sweep: the kernel
    returns the winner's [center(3), radius, mat, decode_table(16)] row per
    lane, so the record (and Hits.dec) builds gather-free.  Value-identical
    to the finalize_hits path (same candidate math, same tie rules, same
    double-where discipline); pinned by
    tests/test_intersect.py::test_sphere_attrs_path_matches_finalize."""
    from . import pallas_intersect as pk
    from ..models import materials as _m

    sp = scene.spheres
    cull = sphere_cull == "all" or (sphere_cull != "off" and coherent)
    attr_tbl = jnp.concatenate([
        sp.center.T, sp.radius[None], sp.mat.astype(jnp.float32)[None],
        _m.decode_table(scene.materials, scene.textures)[sp.mat].T], axis=0)
    st, si, attrs = pk.sphere_best_hit_attrs(
        rays.origin, rays.direction, sp.center, sp.radius, attr_tbl,
        float(t_min), float(t_max), cull, alive)
    hit = si >= 0
    t = jnp.where(hit, st, BIG)
    p = rays.point_at(t)
    center = attrs[:, 0:3]
    s_norm, s_u, s_v = _sphere_record(p, hit, center, attrs[:, 3])
    u = jnp.where(hit, s_u, 0.0)
    vv = jnp.where(hit, s_v, 0.0)
    normal = jnp.where(hit[..., None], s_norm, 0.0)
    mat = jnp.where(hit, attrs[:, 4].astype(jnp.int32), 0)
    dec = _m.decoded_from_rows(attrs[:, 5:5 + _m.DEC_COLS])
    return Hits(hit, t, p, normal, u, vv, mat, si, dec)


def _sphere_record(p: Array, mask: Array, center: Array, radius_raw: Array):
    """(normal, u, v) of sphere winners — the ONE copy of the sphere hit-
    record math, shared by finalize_hits' sphere branch and the attrs-
    kernel path so a quirk or NaN-guard fix cannot silently diverge.

    sphere.h:40 — normal = p / radius in object space => (p - c)/r world.
    Double-where the INPUTS: non-mask lanes pair p (possibly inf at
    t = BIG) with another prim's row, and the masked-out 1/r^2 radius
    partial would be inf — 0 cotangent * inf = NaN in the backward.  The
    radius column can hold triangle data (even 0) on non-sphere rows, so
    it is double-where'd too.  u/v: get_sphere_uv (texture.h:45-50) on
    the unit normal; the reference leaves sphere u,v uninitialized (never
    set in Sphere::collision_detection) — we define them via the existing
    helper (its z-based theta verbatim)."""
    p_in = jnp.where(mask[..., None], p, center)
    radius = jnp.where(mask, radius_raw, 1.0)
    s_norm = (p_in - center) / radius[..., None]
    phi = jnp.arctan2(s_norm[..., 2], s_norm[..., 0])
    theta = _safe_arcsin(s_norm[..., 2])
    u = 1.0 - (phi + jnp.pi) / (2.0 * jnp.pi)
    v = (theta + jnp.pi / 2.0) / jnp.pi
    return s_norm, u, v


def _prim_geom_width(scene: Scene) -> int:
    """f32 geometry-column count of _prim_rows rows (mat column follows)."""
    return max(4, 12 if scene.n_triangles else 4)


def _prim_rows(scene: Scene, tri_override=None,
               consolidate: bool | None = None,
               with_dec: bool = False) -> tuple[Array, Array]:
    """Unified per-primitive row tables for finalize_hits/replay_hits:
    (f32 geometry rows, i32-or-f32 material ids) over [spheres|triangles]
    — sphere rows [center(3), radius(1), pad...], triangle rows [v0(3),
    v1(3), v2(3), normal(3)].  ONE f32 row gather per bounce replaces the
    per-type field gathers (separate small-table gathers measured 19x
    slower on v5e, docs/experiments/gather_micro.py).

    Backend-specialized like decode_materials (same measured trade, same
    SCALING_r03 root cause): on TPU (consolidate=True) the mat id is
    PACKED as a 13th f32 column and the returned mat array is a cast of
    that column — one gather op total (adding a second int gather measured
    a net loss on the TPU wavefront headline).  On CPU the mat id rides a
    separate int32 table (no VJP — the f32-packed form scatter-adds a
    cotangent column for it) and the f32 width is minimal per scene (4
    when sphere-only).  Values identical either way; differentiable: the
    concat's VJP is a slice, the gather's a scatter-add — same gradients
    as the per-field form up to fp summation order."""
    if consolidate is None:
        consolidate = (CONSOLIDATE if CONSOLIDATE is not None
                       else jax.default_backend() == "tpu")
    n_s, n_t = scene.n_spheres, scene.n_triangles
    width = _prim_geom_width(scene)
    blocks, mats = [], []
    if n_s:
        sp = scene.spheres
        cols = [sp.center, sp.radius[:, None]]
        if width > 4:
            cols.append(jnp.zeros((n_s, width - 4), jnp.float32))
        blocks.append(jnp.concatenate(cols, axis=1))
        mats.append(sp.mat)
    if n_t:
        tv0, tv1, tv2, tnorm = (tri_override if tri_override is not None else
                                (scene.triangles.v0, scene.triangles.v1,
                                 scene.triangles.v2, scene.triangles.normal))
        blocks.append(jnp.concatenate([tv0, tv1, tv2, tnorm], axis=1))
        mats.append(scene.triangles.mat)
    if not blocks:
        return jnp.zeros((1, width), jnp.float32), jnp.zeros((1,), jnp.int32)
    geom = jnp.concatenate(blocks)
    mat = jnp.concatenate(mats)
    if consolidate:
        cols = [geom, mat.astype(jnp.float32)[:, None]]
        if with_dec:
            # fold the (M, 16) decode_table rows in per PRIM (a tiny
            # n_prims-row gather) so the per-RAY winner gather serves
            # finalize geometry AND material decode in ONE op — TPU
            # gathers pay per op, not per byte (gather_micro.py)
            from ..models import materials as _m
            cols.append(_m.decode_table(scene.materials,
                                        scene.textures)[mat])
        return jnp.concatenate(cols, axis=1), None
    return geom, mat


def _xform_rows(scene: Scene, with_dec: bool = False) -> Array:
    """Unified row table for the transform-tested classes
    [rects | t_spheres | t_triangles] x 23 f32 columns:
    [trs.position(3), trs.rotation(3), trs.scale(3), mat(1),
     {rect: object-normal z (+-1) | t_sphere: radius | t_triangle: 0}(1),
     t_triangle v0(3), v1(3), v2(3), object normal(3)]
    (+ the 16 packed decode_table columns when with_dec — see _prim_rows).

    Same rationale as _prim_rows: finalize_hits/replay_hits gather ONE row
    per winner and recompute that prim's continuous quantities on a
    per-lane TransformRay'd ray (_transform_rays_single) — O(rays) per
    bounce — instead of re-running the full (rays x prims) candidate
    sweeps and ~12 separate small-table gathers (separate gathers measured
    19x slower than one row gather, docs/experiments/gather_micro.py)."""
    blocks = []
    n_r, n_ts, n_tt = scene.n_rects, scene.n_t_spheres, scene.n_t_triangles
    if n_r:
        rc = scene.rects
        # rectangle.h:23 flipNormal selects the -z object normal
        nz = jnp.where(rc.flip, -1.0, 1.0).astype(jnp.float32)
        blocks.append(jnp.concatenate([
            rc.trs.position, rc.trs.rotation, rc.trs.scale,
            rc.mat.astype(jnp.float32)[:, None], nz[:, None],
            jnp.zeros((n_r, 12), jnp.float32)], axis=1))
    if n_ts:
        tsph = scene.t_spheres
        blocks.append(jnp.concatenate([
            tsph.trs.position, tsph.trs.rotation, tsph.trs.scale,
            tsph.mat.astype(jnp.float32)[:, None], tsph.radius[:, None],
            jnp.zeros((n_ts, 12), jnp.float32)], axis=1))
    if n_tt:
        ttri = scene.t_triangles
        blocks.append(jnp.concatenate([
            ttri.trs.position, ttri.trs.rotation, ttri.trs.scale,
            ttri.mat.astype(jnp.float32)[:, None],
            jnp.zeros((n_tt, 1), jnp.float32),
            ttri.v0, ttri.v1, ttri.v2, ttri.normal], axis=1))
    rows = (jnp.concatenate(blocks) if blocks
            else jnp.zeros((1, 23), jnp.float32))
    if with_dec and blocks:
        from ..models import materials as _m
        rows = jnp.concatenate(
            [rows, _m.decode_table(scene.materials, scene.textures)[
                rows[:, 9].astype(jnp.int32)]], axis=1)
    return rows


def finalize_hits(scene: Scene, rays: Rays, best_t: Array, best_idx: Array,
                  t_min, t_max, quirks: Quirks, tri_override=None,
                  fold_dec: bool = True) -> Hits:
    """Reconstruct the full hit record for the winning primitive only.

    fold_dec=False skips the Hits.dec decode-column folding even on the
    consolidated (TPU) form — for callers whose consumer never reads
    materials (the 'normal' debug integrator, the tp-combine local
    records), so they don't pay the 16 extra gathered columns."""
    n = rays.origin.shape[0]
    n_s, n_t, n_r = scene.n_spheres, scene.n_triangles, scene.n_rects
    hit = best_idx >= 0
    idx = jnp.maximum(best_idx, 0)

    t = jnp.where(hit, best_t, BIG)
    p = rays.point_at(t)
    normal = jnp.zeros((n, 3), jnp.float32)
    u = jnp.zeros((n,), jnp.float32)
    vv = jnp.zeros((n,), jnp.float32)
    mat = jnp.zeros((n,), jnp.int32)

    base = n_s + n_t + n_r
    n_ts, n_tt = scene.n_t_spheres, scene.n_t_triangles
    n_x = n_r + n_ts + n_tt
    # dec folding (consolidated TPU form): the winner-row gathers — prim
    # rows AND xform rows — carry the 16 packed decode_table columns, so
    # the bounce body pays NO separate per-ray decode gather (Hits.dec)
    consolidate = (CONSOLIDATE if CONSOLIDATE is not None
                   else jax.default_backend() == "tpu")
    want_dec = FOLD_DEC and consolidate and fold_dec
    dec = None
    if n_s or n_t:
        prow, pmat = _prim_rows(scene, tri_override, consolidate,
                                with_dec=want_dec)
        cidx = jnp.clip(idx, 0, max(n_s + n_t - 1, 0))
        row = prow[cidx]
        # consolidated (TPU) form: mat rides the f32 column after the
        # geometry block; split (CPU) form: separate int32 gather (no VJP)
        gw = _prim_geom_width(scene)
        row_mat = (row[..., gw].astype(jnp.int32) if pmat is None
                   else pmat[cidx])
        if want_dec and pmat is None and row.shape[-1] > gw + 1:
            from ..models import materials as _m
            dec = _m.decoded_from_rows(row[..., gw + 1:gw + 1 + _m.DEC_COLS])
    if n_s:
        center = row[..., 0:3]
        is_s = hit & (best_idx < n_s)
        s_norm, s_u, s_v = _sphere_record(p, is_s, center, row[..., 3])
        normal = jnp.where(is_s[..., None], s_norm, normal)
        u = jnp.where(is_s, s_u, u)
        vv = jnp.where(is_s, s_v, vv)
        mat = jnp.where(is_s, row_mat, mat)

    if n_t:
        is_t = hit & (best_idx >= n_s) & (best_idx < n_s + n_t)
        tnorm_r = row[..., 9:12]
        _, tt, tu, tv = _tri_single(rays, row[..., 0:3], row[..., 3:6],
                                    row[..., 6:9], tnorm_r,
                                    t_min, t_max, quirks)
        normal = jnp.where(is_t[..., None], tnorm_r, normal)
        u = jnp.where(is_t, tu, u)
        vv = jnp.where(is_t, tv, vv)
        mat = jnp.where(is_t, row_mat, mat)

    if n_x:
        # ONE row gather + ONE per-lane TransformRay for all three
        # transform-tested classes (see _xform_rows); recompute the winner's
        # continuous quantities instead of re-sweeping every candidate.
        xrow = _xform_rows(scene, with_dec=want_dec)[
            jnp.clip(idx - n_s - n_t, 0, n_x - 1)]
        x_rot = xrow[..., 3:6]
        xo, xd, _ = _transform_rays_single(rays, xrow[..., 0:3], x_rot,
                                           xrow[..., 6:9])
        x_mat = xrow[..., 9].astype(jnp.int32)
    if n_r:
        # upper bound matters: t_sphere/t_triangle winners (idx >= base)
        # must not inherit a rect's u/v/p
        is_r = hit & (best_idx >= n_s + n_t) & (best_idx < base)
        # rectangle.h:22-44 on the TransformRay'd ray; the plane division is
        # double-where'd (edge-on dz == 0 never wins, but an unguarded inf
        # would NaN the backward)
        dz = xd[..., 2]
        tz = -xo[..., 2] / jnp.where(dz != 0.0, dz, 1.0)
        rx = xo[..., 0] + tz * xd[..., 0]
        ry = xo[..., 1] + tz * xd[..., 1]
        r_obj_n = jnp.concatenate([jnp.zeros_like(xo[..., 0:2]),
                                   xrow[..., 10:11]], axis=-1)
        normal = jnp.where(is_r[..., None], v3.rotate(r_obj_n, x_rot), normal)
        u = jnp.where(is_r, rx + 0.5, u)
        vv = jnp.where(is_r, ry + 0.5, vv)
        # reference rec.p is the object-space point (hitable.h never maps back)
        p = jnp.where(is_r[..., None], xo + tz[..., None] * xd, p)
        mat = jnp.where(is_r, x_mat, mat)

    if n_ts:
        is_ts = hit & (best_idx >= base) & (best_idx < base + n_ts)
        # sphere.h:27-55 on the transformed ray (native-parameterization
        # windows); non-tsph lanes pair with a row whose col-10 may be 0 —
        # double-where the radius so the masked 1/r normal stays finite
        r = jnp.where(is_ts, xrow[..., 10], 1.0)
        b = jnp.sum(xo * xd, axis=-1)
        a = jnp.sum(xd * xd, axis=-1)
        c = jnp.sum(xo * xo, axis=-1) - r * r
        disc = b * b - a * c
        disc_safe = jnp.where(disc > 0.0, disc, 1.0)
        sq = jnp.where(disc > 0.0, jnp.sqrt(disc_safe), 0.0)
        t0 = (-b - sq) / a
        t1 = (-b + sq) / a
        # root CHOICE re-derived like the sweep (far-root fallback so a
        # recorded winner never produces an overflow t)
        ok0 = (disc > 0.0) & (t0 < t_max) & (t0 > t_min)
        ts_nat = jnp.where(ok0, t0, t1)
        ps = xo + ts_nat[..., None] * xd
        tsn_w = v3.rotate(ps / r[..., None], x_rot)
        normal = jnp.where(is_ts[..., None], tsn_w, normal)
        # reference rec.p stays in object space (hitable.h never maps back)
        p = jnp.where(is_ts[..., None], ps, p)
        # same defined uv as static spheres (get_sphere_uv on the unit normal;
        # the reference leaves sphere u,v uninitialized)
        ts_phi = jnp.arctan2(tsn_w[..., 2], tsn_w[..., 0])
        ts_theta = _safe_arcsin(tsn_w[..., 2])
        u = jnp.where(is_ts, 1.0 - (ts_phi + jnp.pi) / (2.0 * jnp.pi), u)
        vv = jnp.where(is_ts, (ts_theta + jnp.pi / 2.0) / jnp.pi, vv)
        mat = jnp.where(is_ts, x_mat, mat)
    if n_tt:
        is_tt = hit & (best_idx >= base + n_ts)
        # Moller-Trumbore on the object-space vertices (triangle.h:57-100
        # semantics; validity is NOT re-applied — the winner already passed)
        tv0 = xrow[..., 11:14]
        e1 = xrow[..., 14:17] - tv0
        e2 = xrow[..., 17:20] - tv0
        hh = jnp.cross(xd, e2)
        det = jnp.sum(e1 * hh, axis=-1)
        f = 1.0 / jnp.where(jnp.abs(det) >= TRI_EPSILON, det, 1.0)
        s = xo - tv0
        ttu = f * jnp.sum(s * hh, axis=-1)
        q = jnp.cross(s, e1)
        ttv = f * jnp.sum(xd * q, axis=-1)
        ttt = f * jnp.sum(e2 * q, axis=-1)
        normal = jnp.where(is_tt[..., None],
                           v3.rotate(xrow[..., 20:23], x_rot), normal)
        p = jnp.where(is_tt[..., None], xo + ttt[..., None] * xd, p)
        u = jnp.where(is_tt, ttu, u)
        vv = jnp.where(is_tt, ttv, vv)
        mat = jnp.where(is_tt, x_mat, mat)

    if n_x and want_dec:
        # merge the xform winners' decode columns into dec per lane (the
        # same where-merge finalize already does for p/normal/mat)
        from ..models import materials as _m
        xdec = _m.decoded_from_rows(xrow[..., 23:23 + _m.DEC_COLS])
        if dec is None:           # xform-only scene: xrow covers all lanes
            dec = xdec
        else:
            is_x = hit & (best_idx >= n_s + n_t)
            dec = jax.tree.map(
                lambda a, b: jnp.where(
                    is_x.reshape(is_x.shape + (1,) * (a.ndim - 1)), a, b),
                xdec, dec)

    return Hits(hit, t, p, normal, u, vv, mat, best_idx, dec)


def replay_hits(scene: Scene, rays: Rays, winner: Array, t_min, t_max,
                quirks: Quirks, tri_override=None) -> Hits:
    """Hit record for a PRE-DECIDED winner — the replay half of the
    detached-discrete / attached-continuous estimator (see
    ops/integrators.py module docstring).

    winner: i32[N] global primitive index in the Hits.prim index space
    ([spheres | triangles | rects]); -1 = miss.  Instead of sweeping all
    primitives, this gathers each ray's single winning primitive and
    recomputes only its CONTINUOUS quantities (t, p, normal, u, v)
    differentiably — O(N) per bounce vs the O(N x prims) sweep.  Because
    the discrete argmin the sweep performs is piecewise-constant in the
    scene parameters, gradients through this replay equal the full
    intersect_scene gradients wherever the recorded winners match the
    sweep's winners.  Used by the megakernel's replay backward
    (ops/megakernel.trace_path_mega_diff with cfg.mega_replay_bwd).

    Validity windows are NOT re-applied: the winner already passed them in
    the recording pass, and re-testing at f32 would let an fp-marginal
    disagreement replace a real t with BIG (whose point_at overflows to
    inf and NaNs the backward).  Root/branch choices that pick WHICH
    continuous value to return (sphere nearest-root) are re-derived; a
    marginal flip there selects between two nearly-equal roots.

    Runtime-TRS winners ([... | t_spheres | t_triangles] after rects)
    recompute their native-parameterization t on the gathered prim's
    TransformRay'd ray (the n_prims <= 64 tables gather per winner);
    finalize_hits then restores their object-space p / rotated normal.
    """
    n = rays.origin.shape[0]
    n_s, n_t, n_r = scene.n_spheres, scene.n_triangles, scene.n_rects
    t_min = jnp.float32(t_min)
    t_max = jnp.float32(t_max)
    hit = winner >= 0
    idx = jnp.maximum(winner, 0)
    best_t = jnp.full((n,), BIG)

    if n_s or n_t:
        # one unified row gather for both prim types (see _prim_rows);
        # replay only needs geometry — the int mat table is unused here
        row = _prim_rows(scene, tri_override)[0][
            jnp.clip(idx, 0, max(n_s + n_t - 1, 0))]
    if n_s:
        ts = _sphere_single(rays, row[..., 0:3], row[..., 3], t_min, t_max)
        is_s = hit & (winner < n_s)
        best_t = jnp.where(is_s, ts, best_t)

    if n_t:
        _, tt, _, _ = _tri_single(rays, row[..., 0:3], row[..., 3:6],
                                  row[..., 6:9], row[..., 9:12],
                                  t_min, t_max, quirks)
        is_t = hit & (winner >= n_s) & (winner < n_s + n_t)
        best_t = jnp.where(is_t, tt, best_t)

    base = n_s + n_t + n_r
    n_ts, n_tt = scene.n_t_spheres, scene.n_t_triangles
    n_x = n_r + n_ts + n_tt
    if n_x:
        # one row gather + one per-lane TransformRay shared by all three
        # transform-tested classes (see _xform_rows)
        xrow = _xform_rows(scene)[jnp.clip(idx - n_s - n_t, 0, n_x - 1)]
        o, d, raw_len = _transform_rays_single(rays, xrow[..., 0:3],
                                               xrow[..., 3:6], xrow[..., 6:9])
    if n_r:
        # raw per-rect plane t (no validity mask — see docstring), rescaled
        # into the caller's raw-direction parameterization exactly as
        # rect_candidates does
        dz = d[..., 2]
        tz = -o[..., 2] / jnp.where(dz != 0.0, dz, 1.0)
        is_r = hit & (winner >= n_s + n_t) & (winner < base)
        best_t = jnp.where(is_r, tz / raw_len, best_t)

    if n_ts:
        r = xrow[..., 10]
        b = jnp.sum(o * d, axis=-1)
        a = jnp.sum(d * d, axis=-1)
        c = jnp.sum(o * o, axis=-1) - r * r
        disc = b * b - a * c
        disc_safe = jnp.where(disc > 0.0, disc, 1.0)
        sq = jnp.where(disc > 0.0, jnp.sqrt(disc_safe), 0.0)
        t0 = (-b - sq) / a
        t1 = (-b + sq) / a
        # root CHOICE re-derived in the native parameterization
        # (sphere.h:38/45 windows), far-root fallback like _sphere_single
        ok0 = (disc > 0.0) & (t0 < t_max) & (t0 > t_min)
        ts_ = jnp.where(ok0, t0, t1)
        is_ts = hit & (winner >= base) & (winner < base + n_ts)
        best_t = jnp.where(is_ts, ts_ / raw_len, best_t)
    if n_tt:
        tv0 = xrow[..., 11:14]
        e1 = xrow[..., 14:17] - tv0
        e2 = xrow[..., 17:20] - tv0
        h = jnp.cross(d, e2)
        a = jnp.sum(e1 * h, axis=-1)
        f = 1.0 / jnp.where(jnp.abs(a) >= TRI_EPSILON, a, 1.0)
        s = o - tv0
        q = jnp.cross(s, e1)
        tt = f * jnp.sum(e2 * q, axis=-1)
        is_tt = hit & (winner >= base + n_ts)
        best_t = jnp.where(is_tt, tt / raw_len, best_t)

    return finalize_hits(scene, rays, jnp.where(hit, best_t, BIG), winner,
                         t_min, t_max, quirks, tri_override)


def _transform_rays_single(rays: Rays, position, rotation, scale):
    """TransformRay (transform.h:11-14) with PER-RAY gathered TRS params
    (the replay form of _transform_rays_nc: one already-chosen object per
    ray instead of an (N, C) broadcast).  Returns object-space origin /
    unit direction and |raw d| for the native->raw t rescale."""
    raw_len = jnp.sqrt(jnp.sum(rays.direction * rays.direction, axis=-1))
    d = rays.direction / scale                              # ScaleRay
    dlen = jnp.sqrt(jnp.sum(d * d, axis=-1, keepdims=True))
    d = d / dlen
    o = v3.rotate(rays.origin, rotation)                    # RotateRay
    d = v3.rotate(d, rotation)
    o = o - position                                        # TranslateRay
    return o, d, raw_len


def _sphere_single(rays: Rays, center, radius, t_min, t_max):
    """Nearest in-range quadratic root for one already-chosen sphere per ray
    (sphere.h:27-55, N-wise).  Non-winner lanes pair with a CLIPPED index —
    double-where keeps their (masked-out) values finite.  Falls back to the
    far root (not BIG) when the recompute finds neither root in-window, so a
    recorded winner can never produce an overflow t."""
    oc = rays.origin - center
    d = rays.direction
    a = jnp.sum(d * d, axis=-1)
    b = jnp.sum(oc * d, axis=-1)
    c = jnp.sum(oc * oc, axis=-1) - radius * radius
    disc = b * b - a * c
    disc_safe = jnp.where(disc > 0.0, disc, 1.0)
    sq = jnp.where(disc > 0.0, jnp.sqrt(disc_safe), 0.0)
    t0 = (-b - sq) / a
    t1 = (-b + sq) / a
    ok0 = (disc > 0.0) & (t0 < t_max) & (t0 > t_min)
    return jnp.where(ok0, t0, t1)


def _safe_arcsin(z: Array) -> Array:
    """arcsin(clip(z, -1, 1)) with finite gradients everywhere: the bare
    composition is 0 * inf = NaN in the backward at |z| >= 1 (clip' = 0
    outside, arcsin' = inf at the boundary — and unit normals land exactly
    on +-1 at sphere poles / beyond it by fp rounding).  Values unchanged;
    the gradient at the poles is defined as 0 (the true one is infinite)."""
    zc = jnp.clip(z, -1.0, 1.0)
    interior = jnp.abs(zc) < 1.0
    inner = jnp.where(interior, zc, 0.0)
    return jnp.where(interior, jnp.arcsin(inner),
                     jnp.sign(zc) * (jnp.pi / 2.0))


def _tri_single(rays: Rays, v0, v1, v2, nrm, t_min, t_max, quirks: Quirks):
    """Recompute u,v for one already-chosen triangle per ray (N-wise, no C
    axis).  Non-winner lanes pair with a CLIPPED index whose determinant may
    be 0 — double-where keeps their (masked-out) values finite so gradients
    through finalize_hits stay NaN-free; real winners have |a| >= eps."""
    d = rays.direction
    e1 = v1 - v0
    e2 = v2 - v0
    h = jnp.cross(d, e2)
    a = jnp.sum(e1 * h, axis=-1)
    f = 1.0 / jnp.where(jnp.abs(a) >= TRI_EPSILON, a, 1.0)
    s = rays.origin - v0
    u = f * jnp.sum(s * h, axis=-1)
    q = jnp.cross(s, e1)
    v = f * jnp.sum(d * q, axis=-1)
    t = f * jnp.sum(e2 * q, axis=-1)
    return None, t, u, v


def _chunk_arrays(arrays, chunk: int):
    """Pad leading axis to a multiple of `chunk` and reshape to (k, chunk, ...).

    Padding replicates row 0 (geometry AND index arrays alike).  A padded
    duplicate can never change the result because the reduction is
    strictly-less on t: the original row 0, scanned first, already holds
    that t, so the duplicate loses the tie.  Do not weaken the reduction
    to <= without revisiting this.
    """
    n = arrays[0].shape[0]
    chunk = max(1, min(chunk, n))
    k = -(-n // chunk)
    pad = k * chunk - n
    out = []
    for a in arrays:
        if pad:
            a = jnp.concatenate([a, jnp.broadcast_to(a[:1], (pad,) + a.shape[1:])])
        out.append(a.reshape((k, chunk) + a.shape[1:]))
    return tuple(out)
