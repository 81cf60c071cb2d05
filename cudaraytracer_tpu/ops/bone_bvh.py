"""Per-bone BVH forest — TPU-native BoneBVH (hitable/BoneBVH.h).

The reference's alternative dynamic-scene structure (disabled at kernel.cu:95)
builds ONE BVH PER SKELETON BONE over the triangles fully weighted to that
bone (createScene.h:253-306), stores leaf boxes in bone-local space, and
refits per frame with only the bone's translation — one bone per CUDA thread
(createScene.h:60-96).

Analysis (SURVEY.md §3.5): the translate-into-bone-space-and-back dance is
mathematically the identity — leaf refit reads the CURRENT skinned world-space
triangle bounds (BoneBVH.h:105-133 via Hitable::GetBV), so box+nowTransform
always equals the exact world bbox.  The TPU-native design therefore keeps the
forest in WORLD space:

  * partition triangles by bone with the reference's exact rule
    (createScene.h:262-288): a triangle belongs to bone b iff all three of its
    vertex indices appear in b's weight set; bones claim triangles
    first-come-first-served in cluster order; unclaimed triangles are DROPPED
    (faithful to the reference, where they silently vanish from this
    pipeline — set `orphans='keep'` to gather them under an extra root).
  * build one flattened BVH per bone and CONCATENATE them: DFS-with-skip-links
    layouts compose — each tree's exit skip lands exactly on the next tree's
    root — so the whole forest traverses and refits with the single-BVH code
    (ops/bvh.py), and the per-frame refit is one fused vectorized pass over
    every bone at once (vs. one-bone-per-thread).
"""

from __future__ import annotations

from typing import List, NamedTuple

import jax.numpy as jnp
import numpy as np

from .bvh import FlatBVH, build_bvh, triangle_bounds


class BoneForest(NamedTuple):
    bvh: FlatBVH            # concatenated forest; use traverse_bvh/refit_bvh
    bone_of_tri: np.ndarray  # int32[T] bone id per triangle (-1 = orphan)
    root_offsets: np.ndarray  # int32[n_nonempty] node offset of each tree
    root_bones: np.ndarray    # int32[n_nonempty] bone id of each tree
    n_dropped: int            # orphan triangles not in any tree


def partition_by_bone(weights: np.ndarray, faces: np.ndarray) -> np.ndarray:
    """createScene.h:262-288 — first bone (cluster order) whose weight set
    contains ALL THREE vertices claims the triangle.  Returns int32[T] bone
    ids, -1 for unclaimed."""
    has_weight = np.asarray(weights) > 0.0           # (P, B)
    tri_covered = has_weight[np.asarray(faces)].all(axis=1)   # (T, B)
    any_bone = tri_covered.any(axis=1)
    first = np.argmax(tri_covered, axis=1).astype(np.int32)
    return np.where(any_bone, first, -1).astype(np.int32)


def build_bone_forest(v0: np.ndarray, v1: np.ndarray, v2: np.ndarray,
                      weights: np.ndarray, faces: np.ndarray,
                      orphans: str = "drop", **bvh_kw) -> BoneForest:
    """Build the forest from bind-pose triangle vertices + skin weights."""
    v0 = np.asarray(v0, np.float32)
    v1 = np.asarray(v1, np.float32)
    v2 = np.asarray(v2, np.float32)
    bone_of_tri = partition_by_bone(weights, faces)
    n_bones = np.asarray(weights).shape[1]
    lo, hi = triangle_bounds(v0, v1, v2)

    groups: List[np.ndarray] = []
    group_bones: List[int] = []
    for b in range(n_bones):
        tris = np.nonzero(bone_of_tri == b)[0]
        if len(tris):                    # empty bone -> no tree
            groups.append(tris)          # (create_emptyBoneBVH analog: skip)
            group_bones.append(b)
    orphan_ids = np.nonzero(bone_of_tri < 0)[0]
    n_dropped = len(orphan_ids)
    if orphans == "keep" and n_dropped:
        groups.append(orphan_ids)
        group_bones.append(-1)
        n_dropped = 0

    trees = [build_bvh(lo[g], hi[g], **bvh_kw) for g in groups]
    forest = concatenate_bvhs(trees, groups)
    offsets = np.cumsum([0] + [t.n_nodes for t in trees[:-1]]).astype(np.int32) \
        if trees else np.zeros(0, np.int32)
    return BoneForest(forest, bone_of_tri, offsets,
                      np.asarray(group_bones, np.int32), n_dropped)


def concatenate_bvhs(trees: List[FlatBVH], prim_maps: List[np.ndarray]
                     ) -> FlatBVH:
    """Concatenate skip-link BVHs into one walkable forest.

    Node indices and skip links shift by each tree's offset; a tree's
    exit-skip (== its node count) then points at the next tree's root, so a
    single traversal walks every tree in sequence.  prim_maps[i] maps tree
    i's local primitive ids to global triangle ids.
    """
    if not trees:
        raise ValueError(
            "empty bone forest: no triangle had all three vertices inside "
            "any single bone's weight set (densely blended or unskinned "
            "mesh) and orphans were dropped — use the plain BVH/megakernel "
            "pipeline for this mesh, or orphans='keep'")
    offset = 0
    bb_min, bb_max, is_leaf, skip, p0, p1, cl, cr = [], [], [], [], [], [], [], []
    level_groups = {}
    for tree, pmap in zip(trees, prim_maps):
        n = tree.n_nodes
        bb_min.append(np.asarray(tree.bbox_min))
        bb_max.append(np.asarray(tree.bbox_max))
        is_leaf.append(np.asarray(tree.is_leaf))
        skip.append(np.asarray(tree.skip) + offset)
        pmap = np.asarray(pmap, np.int32)
        lp0 = np.asarray(tree.prim0)
        lp1 = np.asarray(tree.prim1)
        p0.append(np.where(lp0 >= 0, pmap[np.maximum(lp0, 0)], -1))
        p1.append(np.where(lp1 >= 0, pmap[np.maximum(lp1, 0)], -1))
        lcl = np.asarray(tree.child_l)
        lcr = np.asarray(tree.child_r)
        cl.append(np.where(lcl >= 0, lcl + offset, -1))
        cr.append(np.where(lcr >= 0, lcr + offset, -1))
        for d, ids in enumerate(tree.levels):      # deepest-first per tree
            # Key by position in the tree's OWN deepest-first order: within a
            # tree, level d's children all live in levels < d, and trees are
            # independent, so merging by d and iterating ascending keeps every
            # child-before-parent constraint of refit_bvh.
            level_groups.setdefault(d, []).append(np.asarray(ids) + offset)
        offset += n

    # merge levels bottom-up: group d of every tree refits once groups < d are
    # done (trees are independent), so ascending-d iteration is deepest-first
    levels = []
    for k in sorted(level_groups):
        levels.append(jnp.asarray(np.concatenate(level_groups[k]).astype(np.int32)))

    return FlatBVH(
        jnp.asarray(np.concatenate(bb_min)), jnp.asarray(np.concatenate(bb_max)),
        jnp.asarray(np.concatenate(is_leaf)), jnp.asarray(np.concatenate(skip).astype(np.int32)),
        jnp.asarray(np.concatenate(p0).astype(np.int32)),
        jnp.asarray(np.concatenate(p1).astype(np.int32)),
        tuple(levels),
        jnp.asarray(np.concatenate(cl).astype(np.int32)),
        jnp.asarray(np.concatenate(cr).astype(np.int32)))
