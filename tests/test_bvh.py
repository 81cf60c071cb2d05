"""BVH build/refit/traversal tests: equivalence with brute force."""

import jax
import jax.numpy as jnp
import numpy as np

from cudaraytracer_tpu.config import Quirks
from cudaraytracer_tpu.core.rays import make_rays
from cudaraytracer_tpu.models.scene import SceneBuilder
from cudaraytracer_tpu.ops import bvh as bvhmod
from cudaraytracer_tpu.ops import intersect as isect


def _random_mesh(rng, n_tri=60, spread=4.0, z_off=-8.0):
    c = rng.uniform(-spread, spread, size=(n_tri, 3)) + np.array([0, 0, z_off])
    a = c + rng.normal(scale=0.4, size=(n_tri, 3))
    b = c + rng.normal(scale=0.4, size=(n_tri, 3))
    d = c + rng.normal(scale=0.4, size=(n_tri, 3))
    n = np.cross(b - a, d - a)
    n = n / np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-20)
    return (a.astype(np.float32), b.astype(np.float32), d.astype(np.float32),
            n.astype(np.float32))


def _random_rays(rng, n=128):
    o = rng.normal(scale=0.5, size=(n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d[:, 2] = -np.abs(d[:, 2]) - 0.3
    return make_rays(jnp.asarray(o), jnp.asarray(d))


def test_build_structure():
    rng = np.random.default_rng(0)
    v0, v1, v2, _ = _random_mesh(rng, 33)
    bvh = bvhmod.build_triangle_bvh(v0, v1, v2)
    nb = bvh.n_nodes
    is_leaf = np.asarray(bvh.is_leaf)
    skip = np.asarray(bvh.skip)
    p0 = np.asarray(bvh.prim0)
    p1 = np.asarray(bvh.prim1)
    # every prim appears exactly once across leaves
    prims = []
    for i in np.nonzero(is_leaf)[0]:
        prims.append(p0[i])
        if p1[i] != p0[i]:
            prims.append(p1[i])
    assert sorted(prims) == list(range(33))
    # skip links are monotonically forward and within bounds
    assert ((skip > np.arange(nb)) & (skip <= nb)).all()
    # root box contains all triangle bounds
    lo, hi = bvhmod.triangle_bounds(v0, v1, v2)
    assert (np.asarray(bvh.bbox_min[0]) <= lo.min(0) + 1e-5).all()
    assert (np.asarray(bvh.bbox_max[0]) >= hi.max(0) - 1e-5).all()


def test_traversal_matches_bruteforce():
    rng = np.random.default_rng(1)
    v0, v1, v2, nrm = _random_mesh(rng, 120)
    rays = _random_rays(rng, 256)
    for quirks in [Quirks.reference(), Quirks.fixed()]:
        bvh = bvhmod.build_triangle_bvh(v0, v1, v2)
        bt, bp = bvhmod.traverse_bvh(bvh, jnp.asarray(v0), jnp.asarray(v1),
                                     jnp.asarray(v2), jnp.asarray(nrm), rays,
                                     1e-3, 3.4e38, quirks)
        valid, t, _, _ = isect.triangle_candidates(
            rays.origin, rays.direction, jnp.asarray(v0), jnp.asarray(v1),
            jnp.asarray(v2), jnp.asarray(nrm), 1e-3, 3.4e38, quirks)
        ref_t = np.where(np.asarray(valid), np.asarray(t), np.inf).min(axis=1)
        hit_ref = np.isfinite(ref_t)
        got_hit = np.asarray(bp) >= 0
        np.testing.assert_array_equal(got_hit, hit_ref)
        np.testing.assert_allclose(np.asarray(bt)[got_hit], ref_t[hit_ref],
                                   rtol=1e-5)


def test_refit_tracks_moved_vertices():
    rng = np.random.default_rng(2)
    v0, v1, v2, nrm = _random_mesh(rng, 50)
    bvh = bvhmod.build_triangle_bvh(v0, v1, v2)
    # move the mesh and refit
    delta = np.array([10.0, -3.0, 5.0], np.float32)
    w0, w1, w2 = v0 + delta, v1 + delta, v2 + delta
    refit = bvhmod.refit_bvh(bvh, jnp.asarray(w0), jnp.asarray(w1), jnp.asarray(w2))
    # all boxes shift by exactly delta (pure translation)
    np.testing.assert_allclose(np.asarray(refit.bbox_min),
                               np.asarray(bvh.bbox_min) + delta, rtol=1e-4,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(refit.bbox_max),
                               np.asarray(bvh.bbox_max) + delta, rtol=1e-4,
                               atol=1e-4)
    # traversal on the refitted tree matches brute force on moved mesh
    rays = _random_rays(rng, 64)
    rays = rays._replace(origin=rays.origin + jnp.asarray(delta))
    quirks = Quirks.reference()
    bt, bp = bvhmod.traverse_bvh(refit, jnp.asarray(w0), jnp.asarray(w1),
                                 jnp.asarray(w2), jnp.asarray(nrm), rays,
                                 1e-3, 3.4e38, quirks)
    valid, t, _, _ = isect.triangle_candidates(
        rays.origin, rays.direction, jnp.asarray(w0), jnp.asarray(w1),
        jnp.asarray(w2), jnp.asarray(nrm), 1e-3, 3.4e38, quirks)
    ref_t = np.where(np.asarray(valid), np.asarray(t), np.inf).min(axis=1)
    got_hit = np.asarray(bp) >= 0
    np.testing.assert_array_equal(got_hit, np.isfinite(ref_t))
    np.testing.assert_allclose(np.asarray(bt)[got_hit], ref_t[np.isfinite(ref_t)],
                               rtol=1e-5)


def test_refit_deforming_mesh():
    """Non-rigid deformation (the skinning case): refit boxes must still
    bound every triangle and traversal must agree with brute force."""
    rng = np.random.default_rng(3)
    v0, v1, v2, nrm = _random_mesh(rng, 80)
    bvh = bvhmod.build_triangle_bvh(v0, v1, v2)
    w0 = v0 + rng.normal(scale=0.5, size=v0.shape).astype(np.float32)
    w1 = v1 + rng.normal(scale=0.5, size=v1.shape).astype(np.float32)
    w2 = v2 + rng.normal(scale=0.5, size=v2.shape).astype(np.float32)
    refit = bvhmod.refit_bvh(bvh, jnp.asarray(w0), jnp.asarray(w1), jnp.asarray(w2))
    lo, hi = bvhmod.triangle_bounds(w0, w1, w2)
    # root box bounds everything
    assert (np.asarray(refit.bbox_min[0]) <= lo.min(0) + 1e-4).all()
    assert (np.asarray(refit.bbox_max[0]) >= hi.max(0) - 1e-4).all()

    rays = _random_rays(rng, 128)
    quirks = Quirks.reference()
    bt, bp = bvhmod.traverse_bvh(refit, jnp.asarray(w0), jnp.asarray(w1),
                                 jnp.asarray(w2), jnp.asarray(nrm), rays,
                                 1e-3, 3.4e38, quirks)
    valid, t, _, _ = isect.triangle_candidates(
        rays.origin, rays.direction, jnp.asarray(w0), jnp.asarray(w1),
        jnp.asarray(w2), jnp.asarray(nrm), 1e-3, 3.4e38, quirks)
    ref_t = np.where(np.asarray(valid), np.asarray(t), np.inf).min(axis=1)
    got_hit = np.asarray(bp) >= 0
    np.testing.assert_array_equal(got_hit, np.isfinite(ref_t))
    np.testing.assert_allclose(np.asarray(bt)[got_hit], ref_t[np.isfinite(ref_t)],
                               rtol=1e-5)


def test_scene_intersect_bvh_matches_bruteforce():
    rng = np.random.default_rng(4)
    b = SceneBuilder()
    m = b.materials
    mat = m.lambertian(color=(0.7, 0.2, 0.2))
    v0, v1, v2, nrm = _random_mesh(rng, 40)
    pts = np.stack([v0, v1, v2], axis=1).reshape(-1, 3)
    idx = np.arange(120).reshape(40, 3)
    b.add_mesh(pts, idx, mat, normals=nrm, reverse_winding=False)
    b.add_sphere((0, 0, -5), 0.8, m.metal((0.9, 0.9, 0.9), 0.0))
    b.add_rect(mat, flip=False, position=(0, 0, -12))
    scene = b.build()
    bvh = bvhmod.build_triangle_bvh(np.asarray(scene.triangles.v0),
                                    np.asarray(scene.triangles.v1),
                                    np.asarray(scene.triangles.v2))
    rays = _random_rays(rng, 200)
    h_bf = isect.intersect_scene(scene, rays)
    h_bvh = isect.intersect_scene_bvh(scene, rays, bvh)
    np.testing.assert_array_equal(np.asarray(h_bf.hit), np.asarray(h_bvh.hit))
    np.testing.assert_array_equal(np.asarray(h_bf.prim), np.asarray(h_bvh.prim))
    hit = np.asarray(h_bf.hit)
    np.testing.assert_allclose(np.asarray(h_bf.t)[hit],
                               np.asarray(h_bvh.t)[hit], rtol=1e-5)


def test_single_triangle_bvh():
    v0 = np.asarray([[-1, -1, -3]], np.float32)
    v1 = np.asarray([[1, -1, -3]], np.float32)
    v2 = np.asarray([[0, 1, -3]], np.float32)
    nrm = np.asarray([[0, 0, -1]], np.float32)
    bvh = bvhmod.build_triangle_bvh(v0, v1, v2)
    assert bvh.n_nodes == 1
    rays = make_rays(jnp.zeros((1, 3), jnp.float32),
                     jnp.asarray([[0, 0, -1.0]], jnp.float32))
    bt, bp = bvhmod.traverse_bvh(bvh, jnp.asarray(v0), jnp.asarray(v1),
                                 jnp.asarray(v2), jnp.asarray(nrm), rays,
                                 1e-3, 3.4e38, Quirks.reference())
    assert int(bp[0]) == 0
    np.testing.assert_allclose(bt[0], 3.0, rtol=1e-5)


def test_build_bvh_rejects_wide_leaves():
    """FlatBVH leaves hold at most 2 primitives; wider must be a loud error
    (middle primitives would silently vanish from traversal)."""
    import pytest
    rng = np.random.default_rng(0)
    lo = rng.uniform(-1, 0, (16, 3)).astype(np.float32)
    hi = lo + rng.uniform(0.1, 0.5, (16, 3)).astype(np.float32)
    with pytest.raises(ValueError, match="leaf_size"):
        bvhmod.build_bvh(lo, hi, leaf_size=4)
