"""BoneBVH forest + keyframe animation tests."""

import jax
import jax.numpy as jnp
import numpy as np

from cudaraytracer_tpu.config import Quirks
from cudaraytracer_tpu.core.rays import make_rays
from cudaraytracer_tpu.models.animation import evaluate, make_track
from cudaraytracer_tpu.ops import bone_bvh as bb
from cudaraytracer_tpu.ops import bvh as bvhmod
from cudaraytracer_tpu.ops import intersect as isect
from cudaraytracer_tpu.utils.fbx_loader import load_skinned_mesh

WALKING = "/root/reference/CudaTest/objects/low_walking.fbx"


def test_partition_rule():
    # 4 points, 2 bones; triangle 0 fully in bone 0, triangle 1 split
    weights = np.array([[1.0, 0.0],
                        [0.7, 0.3],
                        [1.0, 0.0],
                        [0.0, 1.0]])
    faces = np.array([[0, 1, 2], [1, 2, 3]])
    bones = bb.partition_by_bone(weights, faces)
    assert bones[0] == 0          # all three verts have weight to bone 0
    assert bones[1] == -1         # vert 0,3 not both in either bone fully...
    # (vert 3 has no weight to bone 0; vert 0 has none to bone 1)


def test_first_come_first_served():
    """A triangle in BOTH bones' weight sets goes to the lower-index bone
    (createScene.h:268-287 IsTriangleAdded)."""
    weights = np.array([[0.5, 0.5], [0.5, 0.5], [0.5, 0.5]])
    faces = np.array([[0, 1, 2]])
    assert bb.partition_by_bone(weights, faces)[0] == 0


def test_forest_traversal_matches_bruteforce():
    mesh = load_skinned_mesh(WALKING)
    # bind-pose triangles with reference winding
    pts = mesh.points
    f = mesh.faces
    v0, v1, v2 = pts[f[:, 2]], pts[f[:, 1]], pts[f[:, 0]]
    forest = bb.build_bone_forest(v0, v1, v2, mesh.weights, mesh.faces)
    claimed = (forest.bone_of_tri >= 0)
    print_n = claimed.sum()
    assert print_n > 0
    assert forest.n_dropped == (~claimed).sum()

    # rays at the character (y-up 0..172 bind space)
    rng = np.random.default_rng(0)
    n = 128
    o = np.tile(np.array([[0.0, 90.0, 500.0]], np.float32), (n, 1))
    d = np.concatenate([rng.uniform(-0.3, 0.3, (n, 1)),
                        rng.uniform(-0.2, 0.2, (n, 1)),
                        -np.ones((n, 1))], axis=1).astype(np.float32)
    rays = make_rays(jnp.asarray(o), jnp.asarray(d))
    quirks = Quirks.reference()

    bt, bp = bvhmod.traverse_bvh(forest.bvh, jnp.asarray(v0), jnp.asarray(v1),
                                 jnp.asarray(v2), jnp.asarray(mesh.normals),
                                 rays, 1e-3, 3.4e38, quirks)

    # brute force restricted to CLAIMED triangles (orphans are dropped by the
    # reference pipeline)
    sel = np.nonzero(claimed)[0]
    valid, t, _, _ = isect.triangle_candidates(
        rays.origin, rays.direction, jnp.asarray(v0[sel]), jnp.asarray(v1[sel]),
        jnp.asarray(v2[sel]), jnp.asarray(mesh.normals[sel]), 1e-3, 3.4e38,
        quirks)
    ref_t = np.where(np.asarray(valid), np.asarray(t), np.inf).min(axis=1)
    got_hit = np.asarray(bp) >= 0
    np.testing.assert_array_equal(got_hit, np.isfinite(ref_t))
    np.testing.assert_allclose(np.asarray(bt)[got_hit],
                               ref_t[np.isfinite(ref_t)], rtol=1e-5)
    assert got_hit.sum() >= 5     # the rays do hit the character


def test_forest_refit():
    mesh = load_skinned_mesh(WALKING)
    pts = mesh.points
    f = mesh.faces
    v0, v1, v2 = pts[f[:, 2]], pts[f[:, 1]], pts[f[:, 0]]
    forest = bb.build_bone_forest(v0, v1, v2, mesh.weights, mesh.faces)
    # deform and refit: forest boxes must bound their triangles
    rng = np.random.default_rng(1)
    w0 = v0 + rng.normal(scale=2.0, size=v0.shape).astype(np.float32)
    w1 = v1 + rng.normal(scale=2.0, size=v1.shape).astype(np.float32)
    w2 = v2 + rng.normal(scale=2.0, size=v2.shape).astype(np.float32)
    refit = bvhmod.refit_bvh(forest.bvh, jnp.asarray(w0), jnp.asarray(w1),
                             jnp.asarray(w2))
    # every leaf box bounds its prims
    p0 = np.asarray(refit.prim0)
    leaf = np.asarray(refit.is_leaf)
    lo = np.asarray(refit.bbox_min)
    hi = np.asarray(refit.bbox_max)
    tlo, thi = bvhmod.triangle_bounds(w0, w1, w2)
    ids = np.nonzero(leaf)[0]
    assert (lo[ids] <= tlo[p0[ids]] + 1e-3).all()
    assert (hi[ids] >= thi[p0[ids]] - 1e-3).all()
    # ...and every INTERNAL node bounds its children (regression: concatenated
    # forests once merged refit levels root-first, leaving internal boxes at
    # the bind pose after deformation)
    cl = np.asarray(refit.child_l)
    cr = np.asarray(refit.child_r)
    internal = np.nonzero(~leaf)[0]
    assert (lo[internal] <= lo[cl[internal]] + 1e-4).all()
    assert (lo[internal] <= lo[cr[internal]] + 1e-4).all()
    assert (hi[internal] >= hi[cl[internal]] - 1e-4).all()
    assert (hi[internal] >= hi[cr[internal]] - 1e-4).all()


def test_forest_refit_large_translation():
    """Repro from the round-1 advisor: a +100 translation refit must move the
    ROOT boxes, not just the leaves, so traversal still finds the mesh."""
    tris = np.array([[[i, 0, 0], [i + 0.5, 0, 0], [i, 0.5, 0]]
                     for i in range(8)], np.float32)
    v0, v1, v2 = tris[:, 0], tris[:, 1], tris[:, 2]
    weights = np.ones((24, 1), np.float32)    # one bone owns every vertex
    faces = np.arange(24).reshape(8, 3)
    forest = bb.build_bone_forest(v0, v1, v2, weights, faces)
    shift = np.float32(100.0)
    refit = bvhmod.refit_bvh(forest.bvh, jnp.asarray(v0 + shift),
                             jnp.asarray(v1 + shift), jnp.asarray(v2 + shift))
    lo = np.asarray(refit.bbox_min)
    hi = np.asarray(refit.bbox_max)
    # every node (root included) must now live at >= 99
    assert (lo >= 99.0).all() and (hi >= 99.0).all()
    # and a ray aimed at the moved mesh must hit through the forest
    rays = make_rays(jnp.asarray([[100.25, 100.1, 105.0]], jnp.float32),
                     jnp.asarray([[0.0, 0.0, -1.0]], jnp.float32))
    # stored normal -z so dot(d, n) >= 0 passes the backface-only quirk
    nrm = np.tile(np.array([[0, 0, -1]], np.float32), (8, 1))
    bt, bp = bvhmod.traverse_bvh(refit, jnp.asarray(v0 + shift),
                                 jnp.asarray(v1 + shift),
                                 jnp.asarray(v2 + shift), jnp.asarray(nrm),
                                 rays, 1e-3, 3.4e38, Quirks.reference())
    assert int(bp[0]) >= 0


def test_keyframe_track():
    track = make_track([
        (0, (0, 0, 0), (0, 0, 0), (1, 1, 1)),
        (10, (10, 0, 0), (0, 90, 0), (2, 2, 2)),
        (20, (10, 10, 0), (0, 90, 90), (1, 1, 1)),
    ])
    t5 = evaluate(track, 5)
    np.testing.assert_allclose(t5.position, [5, 0, 0], atol=1e-5)
    np.testing.assert_allclose(t5.rotation, [0, 45, 0], atol=1e-5)
    np.testing.assert_allclose(t5.scale, [1.5, 1.5, 1.5], atol=1e-5)
    # clamped past the end (animationData.h:70-74)
    t99 = evaluate(track, 99)
    np.testing.assert_allclose(t99.position, [10, 10, 0], atol=1e-5)
    # batched evaluation
    tb = evaluate(track, jnp.asarray([0.0, 15.0]))
    np.testing.assert_allclose(tb.position[1], [10, 5, 0], atol=1e-4)


def test_empty_forest_is_loud():
    """No bone claims any triangle + orphans='drop' must raise a clear
    ValueError, not a bare assert/obscure concatenate failure."""
    import pytest
    from cudaraytracer_tpu.ops.bone_bvh import build_bone_forest
    v0 = np.asarray([[0, 0, 0], [1, 0, 0]], np.float32)
    v1 = np.asarray([[1, 0, 0], [2, 0, 0]], np.float32)
    v2 = np.asarray([[0, 1, 0], [1, 1, 0]], np.float32)
    weights = np.zeros((6, 2), np.float32)     # nobody weighted to anything
    faces = np.asarray([[0, 1, 2], [3, 4, 5]], np.int32)
    with pytest.raises(ValueError, match="bone forest"):
        build_bone_forest(v0, v1, v2, weights, faces, orphans="drop")
