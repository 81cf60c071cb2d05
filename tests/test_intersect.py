"""Intersection tests vs the NumPy oracle, including reference quirks."""

import jax
import jax.numpy as jnp
import numpy as np

from cudaraytracer_tpu.config import Quirks
from cudaraytracer_tpu.core.rays import make_rays
from cudaraytracer_tpu.models.scene import SceneBuilder
from cudaraytracer_tpu.ops import intersect as isect

import oracle


def _rays(origins, directions):
    return make_rays(jnp.asarray(origins, jnp.float32),
                     jnp.asarray(directions, jnp.float32))


def test_sphere_hit_matches_oracle():
    b = SceneBuilder()
    mat = b.materials.lambertian(color=(1, 0, 0))
    b.add_sphere((0, 0, -2), 0.5, mat)
    b.add_sphere((0.2, 0, -5), 1.0, mat)
    scene = b.build()

    origins = [[0, 0, 0]] * 4
    dirs = [[0, 0, -1], [0.1, 0.05, -1], [1, 0, 0], [0.05, 0, -1]]
    hits = isect.intersect_scene(scene, _rays(origins, dirs))

    world = oracle.HitList([
        oracle.Sphere((0, 0, -2), 0.5, 0),
        oracle.Sphere((0.2, 0, -5), 1.0, 0)])
    for i in range(4):
        rec = world.hit(np.asarray(origins[i], float), np.asarray(dirs[i], float),
                        1e-3, oracle.FLT_MAX)
        assert bool(hits.hit[i]) == (rec is not None), i
        if rec:
            np.testing.assert_allclose(hits.t[i], rec["t"], rtol=1e-5)
            np.testing.assert_allclose(hits.p[i], rec["p"], rtol=1e-4, atol=1e-5)
            np.testing.assert_allclose(hits.normal[i], rec["normal"],
                                       rtol=1e-4, atol=1e-5)


def test_sphere_inside_hit_second_root():
    """From inside the sphere only the far root is in range (sphere.h:44-51)."""
    b = SceneBuilder()
    mat = b.materials.dielectric(1.5)
    b.add_sphere((0, 0, 0), 1.0, mat)
    scene = b.build()
    hits = isect.intersect_scene(scene, _rays([[0, 0, 0]], [[0, 0, -1]]))
    assert bool(hits.hit[0])
    np.testing.assert_allclose(hits.t[0], 1.0, rtol=1e-5)
    # outward geometric normal at exit point (object normal p/r)
    np.testing.assert_allclose(hits.normal[0], [0, 0, -1], atol=1e-6)


def test_triangle_backface_quirk():
    """triangle.h:61 — a ray facing the stored normal (dot<0) misses."""
    b = SceneBuilder()
    mat = b.materials.lambertian(color=(1, 1, 1))
    # normal +z; ray going -z has dot(d, n) < 0 -> compat: miss
    b.add_triangle((-1, -1, -3), (1, -1, -3), (0, 1, -3), mat, normal=(0, 0, 1))
    scene = b.build()
    r = _rays([[0, 0, 0]], [[0, 0, -1]])

    compat = isect.intersect_scene(scene, r, quirks=Quirks.reference())
    assert not bool(compat.hit[0])

    fixed = isect.intersect_scene(scene, r, quirks=Quirks.fixed())
    assert bool(fixed.hit[0])
    np.testing.assert_allclose(fixed.t[0], 3.0, rtol=1e-5)

    # flip the stored normal: dot(d, n) > 0 -> compat hit (back face renders)
    b2 = SceneBuilder()
    m2 = b2.materials.lambertian(color=(1, 1, 1))
    b2.add_triangle((-1, -1, -3), (1, -1, -3), (0, 1, -3), m2, normal=(0, 0, -1))
    s2 = b2.build()
    compat2 = isect.intersect_scene(s2, r, quirks=Quirks.reference())
    assert bool(compat2.hit[0])
    np.testing.assert_allclose(compat2.t[0], 3.0, rtol=1e-5)


def test_triangle_negative_t_quirk():
    """triangle.h:92-94 — no t range check: triangle BEHIND the origin hits
    in compat mode (t negative), misses in fixed mode."""
    b = SceneBuilder()
    mat = b.materials.lambertian(color=(1, 1, 1))
    b.add_triangle((-1, -1, 3), (1, -1, 3), (0, 1, 3), mat, normal=(0, 0, -1))
    scene = b.build()
    r = _rays([[0, 0, 0]], [[0, 0, -1]])  # triangle at z=+3, ray to -z

    compat = isect.intersect_scene(scene, r, quirks=Quirks.reference())
    assert bool(compat.hit[0])
    np.testing.assert_allclose(compat.t[0], -3.0, rtol=1e-5)

    fixed = isect.intersect_scene(scene, r, quirks=Quirks.fixed())
    assert not bool(fixed.hit[0])


def test_triangle_barycentric_uv():
    b = SceneBuilder()
    mat = b.materials.lambertian(color=(1, 1, 1))
    b.add_triangle((0, 0, -2), (1, 0, -2), (0, 1, -2), mat, normal=(0, 0, -1))
    scene = b.build()
    r = _rays([[0.25, 0.25, 0]], [[0, 0, -1]])
    hits = isect.intersect_scene(scene, r, quirks=Quirks.reference())
    assert bool(hits.hit[0])
    np.testing.assert_allclose(hits.u[0], 0.25, rtol=1e-5)
    np.testing.assert_allclose(hits.v[0], 0.25, rtol=1e-5)


def test_closest_hit_ordering():
    """hitable_list.h:76-91 — nearest of several wins; first wins ties."""
    b = SceneBuilder()
    mat = b.materials.lambertian(color=(1, 1, 1))
    b.add_sphere((0, 0, -5), 0.5, mat)
    b.add_sphere((0, 0, -3), 0.5, mat)   # nearer
    b.add_sphere((0, 0, -8), 0.5, mat)
    scene = b.build()
    hits = isect.intersect_scene(scene, _rays([[0, 0, 0]], [[0, 0, -1]]))
    assert int(hits.prim[0]) == 1
    np.testing.assert_allclose(hits.t[0], 2.5, rtol=1e-5)


def test_prim_chunking_consistent():
    """Chunked reduction must agree with single-chunk for many prims."""
    rng = np.random.default_rng(3)
    b = SceneBuilder()
    mat = b.materials.lambertian(color=(1, 1, 1))
    for _ in range(57):
        c = rng.uniform(-3, 3, size=3) + np.array([0, 0, -8])
        b.add_sphere(c, rng.uniform(0.1, 0.7), mat)
    scene = b.build()
    n = 64
    o = np.zeros((n, 3))
    d = rng.normal(size=(n, 3))
    d[:, 2] = -np.abs(d[:, 2]) - 0.5
    r = _rays(o, d)
    h1 = isect.intersect_scene(scene, r, prim_chunk=8)
    h2 = isect.intersect_scene(scene, r, prim_chunk=1024)
    np.testing.assert_array_equal(np.asarray(h1.hit), np.asarray(h2.hit))
    # different chunkings fuse differently; tiny fp divergence is expected
    np.testing.assert_allclose(np.asarray(h1.t), np.asarray(h2.t), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(h1.prim), np.asarray(h2.prim))


def test_rect_intersection():
    """rectangle.h:22-44 — unit rect at z=0 scaled/translated via TRS."""
    b = SceneBuilder()
    mat = b.materials.lambertian(color=(1, 1, 1))
    b.add_rect(mat, flip=False, position=(0, 0, -4), scale=(2, 2, 1))
    scene = b.build()

    # Rect normal +z; ray to -z has dot(d,n) < 0 -> front face, hits.
    # Reference quirk (transform.h:50-54): ScaleRay divides only the DIRECTION
    # by scale, not the origin — so scale does NOT widen the rect; the
    # intersectable region stays |x|,|y| <= 0.5 in ray-origin space.
    r = _rays([[0.5, 0.5, 0], [0.75, 0, 0], [0, 0, 0]],
              [[0, 0, -1], [0, 0, -1], [0, 0, 1]])
    hits = isect.intersect_scene(scene, r)
    got = np.asarray(hits.hit)
    assert got[0]           # exactly on the +x,+y corner boundary
    assert not got[1]       # outside |x| <= 0.5
    assert not got[2]       # wrong direction
    np.testing.assert_allclose(hits.t[0], 4.0, rtol=1e-5)
    np.testing.assert_allclose(hits.u[0], 1.0, rtol=1e-4)  # x=0.5 -> u=1


def test_mixed_scene_types():
    b = SceneBuilder()
    mat = b.materials.lambertian(color=(1, 1, 1))
    b.add_sphere((0, 0, -6), 1.0, mat)
    b.add_triangle((-2, -2, -4), (2, -2, -4), (0, 2, -4), mat, normal=(0, 0, -1))
    b.add_rect(mat, flip=False, position=(0, 0, -2))
    scene = b.build()
    # ray through all three: rect at z=-2 (in unit bounds only near center)
    hits = isect.intersect_scene(scene, _rays([[0, 0, 0]], [[0, 0, -1]]))
    assert bool(hits.hit[0])
    np.testing.assert_allclose(hits.t[0], 2.0, rtol=1e-5)  # rect is nearest
    assert int(hits.prim[0]) == 2  # global id: sphere 0, tri 1, rect 2
