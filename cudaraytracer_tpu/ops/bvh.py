"""Flattened BVH: host build, vectorized refit, batched stackless traversal.

The reference builds a pointer-based BVH *on one device thread* with recursive
constructors + thrust::sort (bvh.h:76-125), traverses it recursively
(bvh.h:160-190), and refits it every frame for animated meshes
(bvh.h:135-158 ``UpdateBVH``).  None of that maps to TPU.  The TPU-native
design:

  * BUILD (host, NumPy): recursive median split over the chosen axis,
    reproducing the reference topology (sort prims by AABB min along the axis
    — BoxCompare bvh.h:9-45 — split at n/2, leaves hold 1-2 prims,
    bvh.h:95-109).  Axis choice is the largest centroid extent by default
    (deterministic, better trees); ``axis_mode='random'`` matches the
    reference's curand axis draw (bvh.h:83-93) with a seeded RNG.
    Nodes are emitted in DFS preorder with SKIP LINKS so traversal needs no
    stack: on a box hit descend to node+1, on a miss jump to skip[node].

  * REFIT (device, vectorized): bottom-up by precomputed level — leaf boxes
    from current triangle vertices (a gather + min/max), internal boxes as
    unions of child boxes, one fused pass per level.  This is the per-frame
    dynamic-scene mechanism (bvh.h:135-158) without the serial recursion.

  * TRAVERSAL (device, batched): all rays advance their node pointer in
    lock-step inside one ``lax.while_loop``; per step each ray does one AABB
    slab test (aabb.h:30-43 semantics: strict ``t_max <= t_min`` miss) and, at
    leaves, up to two triangle tests.  No recursion, no stack, pure gathers —
    the whole wavefront stays on the VPU.

Parity note: the reference BVH passes the ORIGINAL [t_min, t_max] down the
whole tree (no shrinking by closest-so-far, bvh.h:160-190), which interacts
with the triangle no-t-clip quirk.  ``shrink=False`` (default in quirk-compat)
reproduces that; ``shrink=True`` prunes with the running best t (faster,
identical results when all hits are forward).
"""

from __future__ import annotations

from typing import List, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Quirks
from ..core.rays import Rays
from .intersect import BIG, TRI_EPSILON

Array = jnp.ndarray

# Boxes are padded by this margin at build/refit.  The reference's strict slab
# test (aabb.h:41 `t_max <= t_min` => miss) silently culls axis-aligned
# (zero-thickness) geometry; padding fixes that while only ever ADDING
# candidate triangle tests, so final hits are unchanged for regular geometry.
AABB_PAD = 1e-4


class FlatBVH(NamedTuple):
    bbox_min: Array     # f32[N,3]
    bbox_max: Array     # f32[N,3]
    is_leaf: Array      # bool[N]
    skip: Array         # int32[N] — next node when this subtree is done/missed
    prim0: Array        # int32[N] — leaf: first prim id; internal: -1
    prim1: Array        # int32[N] — leaf: second prim id (== prim0 if count 1)
    # refit metadata (static per topology):
    levels: Tuple[Array, ...]   # per depth level (deep->shallow), ids of
                                # INTERNAL nodes at that level
    child_l: Array      # int32[N] — internal: left child (= node+1); leaf: -1
    child_r: Array      # int32[N] — internal: right child; leaf: -1

    @property
    def n_nodes(self) -> int:
        return self.bbox_min.shape[0]


# ---------------------------------------------------------------------------
# Host build
# ---------------------------------------------------------------------------

def _levels_from_depth(depth_arr: np.ndarray, leaf_arr: np.ndarray):
    """Per-depth internal-node groups, deepest first (refit ordering)."""
    levels = []
    if len(depth_arr) == 0:
        return levels
    for d in range(int(depth_arr.max()), -1, -1):
        ids = np.nonzero((depth_arr == d) & ~leaf_arr)[0]
        if len(ids):
            levels.append(jnp.asarray(ids.astype(np.int32)))
    return levels


def build_bvh(prim_min: np.ndarray, prim_max: np.ndarray,
              axis_mode: str = "largest", seed: int = 0,
              leaf_size: int = 2, backend: str = "auto") -> FlatBVH:
    """Build from per-primitive AABBs -> FlatBVH (device arrays).

    Topology parity with bvh.h:76-125: sort the span by box-min along the
    chosen axis, split n/2, spans of <= leaf_size become leaves.

    backend: 'auto' uses the native C++ builder (cudaraytracer_tpu/native)
    when it compiles/loads, falling back to the Python builder; 'python' and
    'native' force one.  Both emit identical layouts for deterministic axis
    modes.  axis_mode='random' draws axes from each backend's OWN generator
    (np.random vs mt19937), so 'auto' pins it to the Python builder to keep
    seeded builds reproducible across environments; pass backend='native'
    explicitly to accept native-RNG topologies.
    """
    prim_min = np.asarray(prim_min, np.float32)
    prim_max = np.asarray(prim_max, np.float32)
    if leaf_size > 2:
        # FlatBVH leaves store (and traversal tests) exactly two primitive
        # slots (prim0/prim1, bvh.h:95-109 parity); a wider leaf would
        # silently drop its middle primitives.
        raise ValueError(f"leaf_size must be 1 or 2, got {leaf_size} — "
                         "FlatBVH leaves hold at most two primitives")

    if axis_mode == "random" and backend == "auto":
        backend = "python"
    if backend in ("auto", "native"):
        from ..native import build_bvh_native
        out = build_bvh_native(prim_min, prim_max, leaf_size=leaf_size,
                               axis_mode=axis_mode, seed=seed)
        if out is not None:
            (bb_min, bb_max, leaf_arr, skip, p0, p1, cl, cr, depth_arr) = out
            return FlatBVH(
                jnp.asarray(bb_min), jnp.asarray(bb_max),
                jnp.asarray(leaf_arr), jnp.asarray(skip),
                jnp.asarray(p0), jnp.asarray(p1),
                tuple(_levels_from_depth(depth_arr, leaf_arr)),
                jnp.asarray(cl), jnp.asarray(cr))
        if backend == "native":
            raise RuntimeError("native BVH builder unavailable")
    n = prim_min.shape[0]
    assert n >= 1
    rng = np.random.default_rng(seed)
    centroids = 0.5 * (prim_min + prim_max)

    # Emit nodes in DFS preorder.
    bb_min: List[np.ndarray] = []
    bb_max: List[np.ndarray] = []
    is_leaf: List[bool] = []
    prim0: List[int] = []
    prim1: List[int] = []
    child_l: List[int] = []
    child_r: List[int] = []
    depth_of: List[int] = []

    order = np.arange(n)

    def emit(span: np.ndarray, depth: int) -> int:
        idx = len(is_leaf)
        bb_min.append(prim_min[span].min(axis=0) - AABB_PAD)
        bb_max.append(prim_max[span].max(axis=0) + AABB_PAD)
        depth_of.append(depth)
        if len(span) <= leaf_size:
            is_leaf.append(True)
            prim0.append(int(span[0]))
            prim1.append(int(span[-1]))  # == span[0] when single prim
            child_l.append(-1)
            child_r.append(-1)
            return idx
        if axis_mode == "random":
            axis = int(rng.integers(0, 3))     # bvh.h:83 curand axis
        else:
            axis = int(np.argmax(centroids[span].max(0) - centroids[span].min(0)))
        # BoxCompare (bvh.h:9-45) sorts by bbox MIN along the axis.
        span = span[np.argsort(prim_min[span, axis], kind="stable")]
        is_leaf.append(False)
        prim0.append(-1)
        prim1.append(-1)
        child_l.append(-1)  # patched below
        child_r.append(-1)
        half = len(span) // 2                   # bvh.h:111-112 n/2 split
        l = emit(span[:half], depth + 1)
        r = emit(span[half:], depth + 1)
        child_l[idx] = l
        child_r[idx] = r
        return idx

    import sys
    old = sys.getrecursionlimit()
    sys.setrecursionlimit(max(old, 4 * int(np.ceil(np.log2(n + 1))) + 1000))
    emit(order, 0)
    sys.setrecursionlimit(old)

    n_nodes = len(is_leaf)
    skip = np.zeros(n_nodes, np.int32)

    def fill_skip(idx: int, after: int) -> None:
        skip[idx] = after
        if not is_leaf[idx]:
            fill_skip(child_l[idx], child_r[idx])
            fill_skip(child_r[idx], after)

    fill_skip(0, n_nodes)

    depth_arr = np.asarray(depth_of)
    leaf_arr = np.asarray(is_leaf)
    levels = _levels_from_depth(depth_arr, leaf_arr)

    return FlatBVH(
        jnp.asarray(np.stack(bb_min)), jnp.asarray(np.stack(bb_max)),
        jnp.asarray(leaf_arr), jnp.asarray(skip),
        jnp.asarray(np.asarray(prim0, np.int32)),
        jnp.asarray(np.asarray(prim1, np.int32)),
        tuple(levels),
        jnp.asarray(np.asarray(child_l, np.int32)),
        jnp.asarray(np.asarray(child_r, np.int32)))


def triangle_bounds(v0, v1, v2):
    """Triangle AABBs (triangle.h:103-115 bounding_box)."""
    lo = np.minimum(np.minimum(v0, v1), v2)
    hi = np.maximum(np.maximum(v0, v1), v2)
    return lo, hi


def build_triangle_bvh(v0, v1, v2, **kw) -> FlatBVH:
    lo, hi = triangle_bounds(np.asarray(v0), np.asarray(v1), np.asarray(v2))
    return build_bvh(lo, hi, **kw)


# ---------------------------------------------------------------------------
# Refit (vectorized UpdateBVH, bvh.h:135-158)
# ---------------------------------------------------------------------------

@jax.jit
def refit_bvh(bvh: FlatBVH, v0: Array, v1: Array, v2: Array) -> FlatBVH:
    """Recompute all node boxes for the current triangle vertices.

    Leaves take the union of their (<=2) triangles' bounds; each internal
    level takes the union of its children, deep to shallow.  Everything is a
    fused gather/min/max pass — the vectorized equivalent of the reference's
    single-thread recursive refit.
    """
    tri_lo = jnp.minimum(jnp.minimum(v0, v1), v2) - AABB_PAD
    tri_hi = jnp.maximum(jnp.maximum(v0, v1), v2) + AABB_PAD

    p0 = jnp.maximum(bvh.prim0, 0)
    p1 = jnp.maximum(bvh.prim1, 0)
    leaf_lo = jnp.minimum(tri_lo[p0], tri_lo[p1])
    leaf_hi = jnp.maximum(tri_hi[p0], tri_hi[p1])
    lo = jnp.where(bvh.is_leaf[:, None], leaf_lo, bvh.bbox_min)
    hi = jnp.where(bvh.is_leaf[:, None], leaf_hi, bvh.bbox_max)

    for ids in bvh.levels:  # deepest internal level first; static unroll
        l = bvh.child_l[ids]
        r = bvh.child_r[ids]
        lo = lo.at[ids].set(jnp.minimum(lo[l], lo[r]))
        hi = hi.at[ids].set(jnp.maximum(hi[l], hi[r]))

    return bvh._replace(bbox_min=lo, bbox_max=hi)


# ---------------------------------------------------------------------------
# Traversal
# ---------------------------------------------------------------------------

def _aabb_hit(lo, hi, origin, inv_dir, t_min, t_max):
    """aabb.h:30-43 slab test; strict `t_max <= t_min` => miss."""
    t0 = (lo - origin) * inv_dir
    t1 = (hi - origin) * inv_dir
    near = jnp.minimum(t0, t1)
    far = jnp.maximum(t0, t1)
    tmin = jnp.maximum(jnp.max(near, axis=-1), t_min)
    tmax = jnp.minimum(jnp.min(far, axis=-1), t_max)
    return tmax > tmin


def _tri_test(origin, direction, v0, v1, v2, nrm, t_max, quirks: Quirks,
              t_min):
    """Single-triangle Moller-Trumbore per ray (quirk semantics of
    triangle.h:57-100); returns (valid, t)."""
    e1 = v1 - v0
    e2 = v2 - v0
    h = jnp.cross(direction, e2)
    a = jnp.sum(e1 * h, axis=-1)
    f = 1.0 / a
    s = origin - v0
    u = f * jnp.sum(s * h, axis=-1)
    q = jnp.cross(s, e1)
    v = f * jnp.sum(direction * q, axis=-1)
    t = f * jnp.sum(e2 * q, axis=-1)
    valid = (jnp.abs(a) >= TRI_EPSILON) & (u >= 0.0) & (u <= 1.0) \
        & (v >= 0.0) & (u + v <= 1.0)
    if quirks.triangle_back_culling:   # triangle.h:74
        valid &= a >= TRI_EPSILON
    if quirks.triangle_backface_only:
        valid &= jnp.sum(direction * nrm, axis=-1) >= 0.0
    if not quirks.triangle_no_t_clip:
        valid &= (t > t_min) & (t < t_max)
    else:
        valid &= t < t_max
    return valid, jnp.where(valid, t, BIG)


def traverse_bvh(bvh: FlatBVH, v0: Array, v1: Array, v2: Array, normal: Array,
                 rays: Rays, t_min: float, t_max: float, quirks: Quirks,
                 shrink: bool | None = None):
    """Closest triangle hit through the BVH for a ray batch.

    Returns (best_t f32[N], best_prim int32[N]); best_prim == -1 on miss.
    shrink=None -> derived from quirks (no shrinking in no-t-clip compat mode,
    matching bvh.h passing the caller's t range unchanged).
    """
    if shrink is None:
        shrink = not quirks.triangle_no_t_clip
    n = rays.origin.shape[0]
    origin = rays.origin
    direction = rays.direction
    inv_dir = 1.0 / direction
    t_min = jnp.float32(t_min)
    t_max_c = jnp.float32(t_max)

    n_nodes = bvh.n_nodes
    node0 = jnp.zeros((n,), jnp.int32)
    best_t0 = jnp.full((n,), BIG)
    best_p0 = jnp.full((n,), -1, jnp.int32)

    def cond(state):
        node, _, _ = state
        return jnp.any(node < n_nodes)

    def body(state):
        node, best_t, best_p = state
        nid = jnp.minimum(node, n_nodes - 1)
        lo = bvh.bbox_min[nid]
        hi = bvh.bbox_max[nid]
        leaf = bvh.is_leaf[nid]
        active = node < n_nodes

        prune_t = jnp.minimum(best_t, t_max_c) if shrink else t_max_c
        box_ok = _aabb_hit(lo, hi, origin, inv_dir, t_min, prune_t) & active

        do_leaf = box_ok & leaf
        p0 = bvh.prim0[nid]
        p1 = bvh.prim1[nid]
        val0, t0 = _tri_test(origin, direction, v0[p0], v1[p0], v2[p0],
                             normal[p0], prune_t, quirks, t_min)
        val1, t1 = _tri_test(origin, direction, v0[p1], v1[p1], v2[p1],
                             normal[p1], prune_t, quirks, t_min)
        val1 &= p1 != p0
        # list order within a leaf: first strictly-smaller t wins
        take0 = do_leaf & val0 & (t0 < best_t)
        best_t = jnp.where(take0, t0, best_t)
        best_p = jnp.where(take0, p0, best_p)
        take1 = do_leaf & val1 & (t1 < best_t)
        best_t = jnp.where(take1, t1, best_t)
        best_p = jnp.where(take1, p1, best_p)

        descend = box_ok & ~leaf
        nxt = jnp.where(descend, nid + 1, bvh.skip[nid])
        node = jnp.where(active, nxt, node)
        return node, best_t, best_p

    _, best_t, best_p = jax.lax.while_loop(cond, body, (node0, best_t0, best_p0))
    return best_t, best_p
