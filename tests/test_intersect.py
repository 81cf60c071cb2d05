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


def test_rect_sphere_occlusion_unnormalized_dirs():
    """Regression (round-1 advisor): rect t was measured along the normalized
    ScaleRay'd direction while sphere t used the raw direction, so occlusion
    between them depended on |direction|.  A rect at z=3 in front of a sphere
    at z=0 (camera at z=8) must win at EVERY |d| — camera rays are
    deliberately unnormalized with |d| ~ focus_dist."""
    b = SceneBuilder()
    mat = b.materials.lambertian(color=(1, 1, 1))
    b.add_sphere((0, 0, 0), 1.0, mat)
    b.add_rect(mat, flip=False, position=(0, 0, 3))
    scene = b.build()

    for dlen in (1.0, 10.0, 0.1):
        r = _rays([[0, 0, 8]], [[0, 0, -dlen]])
        hits = isect.intersect_scene(scene, r)
        assert int(hits.prim[0]) == 1, f"|d|={dlen}: sphere shone through rect"
        # t in raw-direction parameterization: world distance 5 / |d|
        np.testing.assert_allclose(hits.t[0], 5.0 / dlen, rtol=1e-5)
    # and with the rect BEHIND the sphere the sphere must win at every |d|
    b2 = SceneBuilder()
    m2 = b2.materials.lambertian(color=(1, 1, 1))
    b2.add_sphere((0, 0, 3), 1.0, m2)
    b2.add_rect(m2, flip=False, position=(0, 0, 0))
    s2 = b2.build()
    for dlen in (1.0, 10.0):
        r = _rays([[0, 0, 8]], [[0, 0, -dlen]])
        hits = isect.intersect_scene(s2, r)
        assert int(hits.prim[0]) == 0, f"|d|={dlen}: rect won behind sphere"


def test_rect_scaled_t_parameterization():
    """Scaled rect occluding a sphere: ScaleRay leaves the ray ORIGIN
    unscaled (transform.h:50-54 quirk), so a uniformly scaled rect's plane
    stays at world z=position.z and its native t is a true distance along a
    unit vector — the rescaled t must equal world distance / |d| regardless
    of the scale factor, and occlusion must be |d|-independent."""
    b = SceneBuilder()
    mat = b.materials.lambertian(color=(1, 1, 1))
    b.add_sphere((0, 0, 0), 1.0, mat)
    b.add_rect(mat, flip=False, position=(0, 0, 4.5), scale=(4, 4, 4))
    scene = b.build()
    for dlen in (1.0, 10.0):
        r = _rays([[0.2, 0.2, 8]], [[0, 0, -dlen]])
        hits = isect.intersect_scene(scene, r, quirks=Quirks.reference())
        assert bool(hits.hit[0])
        assert int(hits.prim[0]) == 1, f"|d|={dlen}"
        np.testing.assert_allclose(hits.t[0], 3.5 / dlen, rtol=1e-5)


def test_triangle_back_culling_flag():
    """triangle.h:74 — with backCulling=true a NEGATIVE determinant ray
    misses; with the reference's cull=false (createScene.h:185) it hits, and
    the unconditional two-sided epsilon test (triangle.h:77-78) still
    applies.  Pinned against the oracle."""
    # backface_only off so the determinant path is reachable from both sides
    q_nocull = Quirks(triangle_backface_only=False)
    q_cull = Quirks(triangle_backface_only=False, triangle_back_culling=True)

    b = SceneBuilder()
    mat = b.materials.lambertian(color=(1, 1, 1))
    # For this winding, a -z ray gives a = dot(e1, d x e2) = +4 (front
    # determinant) and a +z ray gives a = -4 (back determinant).
    b.add_triangle((-1, -1, -3), (1, -1, -3), (0, 1, -3), mat, normal=(0, 0, 1))
    scene = b.build()
    r_neg = _rays([[0, 0, -6]], [[0, 0, 1]])    # a < 0: culled when flag set
    r_pos = _rays([[0, 0, 0]], [[0, 0, -1]])    # a > 0: hits in both modes

    for r, o, d in ((r_neg, [0, 0, -6], [0, 0, 1]),
                    (r_pos, [0, 0, 0], [0, 0, -1])):
        for q, cull in ((q_nocull, False), (q_cull, True)):
            got = isect.intersect_scene(scene, r, quirks=q)
            tri = oracle.Triangle((-1, -1, -3), (1, -1, -3), (0, 1, -3),
                                  (0, 0, 1), 0, backface_only=False,
                                  back_culling=cull)
            rec = tri.hit(np.asarray(o, float), np.asarray(d, float),
                          1e-3, oracle.FLT_MAX)
            assert bool(got.hit[0]) == (rec is not None), (cull, o)
    # sanity: the flag actually flips the negative-determinant outcome
    assert bool(isect.intersect_scene(scene, r_neg, quirks=q_nocull).hit[0])
    assert not bool(isect.intersect_scene(scene, r_neg, quirks=q_cull).hit[0])
    assert bool(isect.intersect_scene(scene, r_pos, quirks=q_cull).hit[0])


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


def test_intersect_gradients_finite_with_degenerate_rays():
    """Regression: the jnp-path 1/a (triangles) and plane division (rects)
    were unguarded — a ray exactly parallel to a triangle's plane or
    edge-on to a rect leaked inf into the backward pass (0 * inf = NaN)."""
    b = SceneBuilder()
    mat = b.materials.lambertian(color=(0.5, 0.5, 0.5))
    # axis-aligned triangle in the xz-plane + a rect in the xy-plane
    b.add_triangle((-1, 0, -3), (1, 0, -3), (0, 0, -5), mat,
                   normal=(0, 1, 0))
    b.add_rect(mat, position=(0, 0, -4))
    scene = b.build()
    o = jnp.asarray([[0.0, 1.0, 0.0],    # hits the rect region head-on
                     [0.0, 0.5, 0.0],    # parallel to the triangle plane
                     [5.0, 0.0, -4.0]])  # edge-on to the rect (d_z == 0)
    d = jnp.asarray([[0.0, -0.25, -1.0],
                     [0.0, 0.0, -1.0],
                     [-1.0, 0.0, 0.0]])

    def loss(v0):
        s = scene._replace(triangles=scene.triangles._replace(v0=v0))
        hits = isect.intersect_scene(s, make_rays(o, d))
        return jnp.sum(jnp.where(hits.hit, hits.t, 0.0)) + jnp.sum(hits.u)

    g = np.asarray(jax.grad(loss)(scene.triangles.v0))
    assert np.isfinite(g).all()

    def loss_o(oo):
        hits = isect.intersect_scene(scene, make_rays(oo, d))
        return jnp.sum(jnp.where(hits.hit, hits.t, 0.0))

    g2 = np.asarray(jax.grad(loss_o)(o))
    assert np.isfinite(g2).all()


def test_fuzz_random_scenes_match_oracle():
    """Randomized sweep: mixed sphere+triangle scenes, random rays, both
    quirk profiles — intersect_scene must agree with the float64 oracle's
    linear closest-hit scan.  Deterministic seed; rays whose top-two oracle
    candidates are closer than 1e-3 are skipped (f32 tie flips)."""
    rng = np.random.default_rng(42)
    for scene_i in range(3):
        n_s, n_t = 6, 8
        centers = rng.uniform(-3, 3, (n_s, 3))
        radii = rng.uniform(0.3, 1.2, n_s)
        tv = rng.uniform(-3, 3, (n_t, 3, 3))
        tv[:, 1] = tv[:, 0] + rng.uniform(-1.5, 1.5, (n_t, 3))
        tv[:, 2] = tv[:, 0] + rng.uniform(-1.5, 1.5, (n_t, 3))
        nrm = np.cross(tv[:, 1] - tv[:, 0], tv[:, 2] - tv[:, 0])
        nrm /= np.maximum(np.linalg.norm(nrm, axis=1, keepdims=True), 1e-12)

        for quirks in (Quirks.reference(), Quirks.fixed()):
            b = SceneBuilder()
            mat = b.materials.lambertian(color=(1, 1, 1))
            for c, r in zip(centers, radii):
                b.add_sphere(c, float(r), mat)
            for t3, nn in zip(tv, nrm):
                b.add_triangle(t3[0], t3[1], t3[2], mat, normal=nn)
            scene = b.build()

            items = ([oracle.Sphere(c, float(r), 0)
                      for c, r in zip(centers, radii)]
                     + [oracle.Triangle(
                         t3[0], t3[1], t3[2], nn, 1,
                         backface_only=quirks.triangle_backface_only,
                         no_t_clip=quirks.triangle_no_t_clip)
                        for t3, nn in zip(tv, nrm)])
            hl = oracle.HitList(items)

            n_rays = 128
            o = rng.uniform(-6, 6, (n_rays, 3))
            d = rng.normal(size=(n_rays, 3))
            d *= rng.uniform(0.5, 4.0, (n_rays, 1))   # unnormalized
            hits = isect.intersect_scene(
                b.build(), make_rays(jnp.asarray(o, jnp.float32),
                                     jnp.asarray(d, jnp.float32)),
                t_min=1e-3, t_max=oracle.FLT_MAX, quirks=quirks)

            n_checked = n_skipped = 0
            for i in range(n_rays):
                cands = sorted(
                    r["t"] for r in (it.hit(o[i], d[i], 1e-3, oracle.FLT_MAX)
                                     for it in items) if r is not None)
                if len(cands) >= 2 and cands[1] - cands[0] < 1e-3:
                    n_skipped += 1
                    continue               # near-tie: f32 winner may flip
                if cands and cands[0] < 1e-2 and quirks.triangle_no_t_clip:
                    n_skipped += 1
                    continue               # near-origin/negative-t knife edge
                rec = hl.hit(o[i], d[i], 1e-3, oracle.FLT_MAX)
                got = bool(hits.hit[i])
                if rec is None:
                    assert not got, (scene_i, i, float(hits.t[i]))
                else:
                    assert got, (scene_i, i, rec["t"])
                    np.testing.assert_allclose(
                        float(hits.t[i]), rec["t"],
                        rtol=2e-4, atol=1e-4,
                        err_msg=f"scene {scene_i} ray {i}")
                n_checked += 1
            assert n_checked > n_rays // 2, (n_checked, n_skipped)


def test_fuzz_cross_engine_consistency():
    """Same random scenes through the jnp brute path and the Pallas sweeps
    (coherent/culled AND incoherent): hit flags and t must agree to f32
    tolerance (identical math, different schedules; > 128 tris so the
    tiled-AABB culled kernel engages)."""
    from cudaraytracer_tpu.ops.intersect import intersect_scene_pallas

    rng = np.random.default_rng(7)
    for quirks in (Quirks.reference(), Quirks.fixed()):
        n_s, n_t = 5, 200   # > 128 tris so the culled kernel engages
        centers = rng.uniform(-4, 4, (n_s, 3))
        radii = rng.uniform(0.3, 1.0, n_s)
        base = rng.uniform(-4, 4, (n_t, 3))
        tv = np.stack([base, base + rng.uniform(-1, 1, (n_t, 3)),
                       base + rng.uniform(-1, 1, (n_t, 3))], axis=1)
        nrm = np.cross(tv[:, 1] - tv[:, 0], tv[:, 2] - tv[:, 0])
        nrm /= np.maximum(np.linalg.norm(nrm, axis=1, keepdims=True), 1e-12)

        b = SceneBuilder()
        mat = b.materials.lambertian(color=(1, 1, 1))
        for c, r in zip(centers, radii):
            b.add_sphere(c, float(r), mat)
        for t3, nn in zip(tv, nrm):
            b.add_triangle(t3[0], t3[1], t3[2], mat, normal=nn)
        scene = b.build()

        n_rays = 512
        o = rng.uniform(-6, 6, (n_rays, 3)).astype(np.float32)
        d = (rng.normal(size=(n_rays, 3))
             * rng.uniform(0.5, 3.0, (n_rays, 1))).astype(np.float32)
        rays = make_rays(jnp.asarray(o), jnp.asarray(d))

        ref = isect.intersect_scene(scene, rays, quirks=quirks)
        engines = {
            "pallas_coh": intersect_scene_pallas(scene, rays, quirks=quirks,
                                                 coherent=True),
            "pallas_inc": intersect_scene_pallas(scene, rays, quirks=quirks,
                                                 coherent=False),
        }
        for name, got in engines.items():
            np.testing.assert_array_equal(np.asarray(ref.hit),
                                          np.asarray(got.hit), err_msg=name)
            hit = np.asarray(ref.hit)
            np.testing.assert_allclose(np.asarray(got.t)[hit],
                                       np.asarray(ref.t)[hit],
                                       rtol=1e-5, atol=1e-5, err_msg=name)


def test_prim_rows_consolidated_vs_split_forms():
    """_prim_rows' backend-specialized forms (TPU: mat packed as a 13th f32
    column, one gather; CPU: separate int32 mat table) must be
    value-identical, and finalize_hits must produce identical hit records
    through either (SCALING_r03 fix; see models/materials.decode_materials
    for the same pattern)."""
    import numpy as np
    from cudaraytracer_tpu.models.scene import SceneBuilder
    from cudaraytracer_tpu.ops import intersect as isect

    b = SceneBuilder()
    m = b.materials
    b.add_sphere((0, -100.5, -1), 100.0, m.lambertian(color=(0.5, 0.5, 0.5)))
    b.add_sphere((0, 0, -1), 0.5, m.metal((0.8, 0.6, 0.2), 0.1))
    b.add_triangle((-1, 0, -2), (1, 0, -2), (0, 1, -2),
                   m.lambertian(color=(0.8, 0.2, 0.2)))
    scene = b.build()

    cons, mat_c = isect._prim_rows(scene, consolidate=True)
    split, mat_s = isect._prim_rows(scene, consolidate=False)
    assert mat_c is None
    np.testing.assert_array_equal(np.asarray(cons[:, :-1]), np.asarray(split))
    np.testing.assert_array_equal(np.asarray(cons[:, -1]).astype(np.int32),
                                  np.asarray(mat_s))


def test_fold_dec_path_matches_separate_decode():
    """The TPU-default dec folding (finalize_hits gathers geometry AND the
    packed decode_table columns in ONE winner-row gather, Hits.dec) must
    render bit-identically to the separate decode_materials gather, and
    Hits.dec itself must equal decode_materials(hits.mat) on hit lanes.
    CPU never takes the fold by default (consolidate follows the backend),
    so this test forces it via the isect.CONSOLIDATE hook."""
    import dataclasses
    import cudaraytracer_tpu as crt
    from cudaraytracer_tpu.models import materials as M
    from cudaraytracer_tpu.models import presets
    from cudaraytracer_tpu.ops.render import pallas_intersector, render_pixels

    rng = np.random.default_rng(11)
    b = SceneBuilder()
    m = b.materials
    mats = [m.lambertian(m.textures.checker((.8, .8, .8), (.1, .2, .1))),
            m.metal((0.8, 0.6, 0.2), 0.2), m.dielectric(1.5),
            m.diffuse_light(color=(4, 3, 2)),
            m.lambertian(tex_id=m.textures.image(
                rng.integers(0, 256, (6, 5, 3), dtype=np.uint8)))]
    b.add_sphere((0, -100.5, -2), 100.0, mats[0])
    for k in range(8):
        b.add_sphere(rng.uniform(-2, 2, 3) - [0, 0, 4],
                     float(rng.uniform(0.3, 0.8)), mats[k % 5])
    for k in range(4):
        v0 = rng.uniform(-2, 2, 3) - [0, 0, 4]
        b.add_triangle(v0, v0 + rng.uniform(-1, 1, 3),
                       v0 + rng.uniform(-1, 1, 3), mats[k % 5])
    scene = b.build()
    cfg = crt.RenderConfig(width=32, height=16, samples=2, max_depth=4,
                           integrator="path", gamma=False)

    _, cam = presets.three_spheres(aspect=2.0)

    def render2(fold):
        isect.FOLD_DEC = fold
        jax.clear_caches()
        try:
            return np.asarray(render_pixels(scene, cam, jax.random.key(2),
                                            cfg, None,
                                            pallas_intersector(cfg)))
        finally:
            isect.FOLD_DEC = True

    isect.CONSOLIDATE = True
    try:
        img_fold = render2(True)
        img_sep = render2(False)
        np.testing.assert_array_equal(img_fold, img_sep)

        # Hits.dec equals decode_materials on hit lanes
        r = _rays([[0, 0.2, 0]] * 64,
                  np.stack([np.linspace(-0.6, 0.6, 64),
                            np.linspace(-0.3, 0.5, 64),
                            -np.ones(64)], 1))
        hits = isect.intersect_scene_pallas(scene, r, quirks=Quirks.reference())
        assert hits.dec is not None
        ref_dec = M.decode_materials(scene.materials, scene.textures,
                                     hits.mat, consolidate=True)
        hm = np.asarray(hits.hit)
        for got, want in zip(hits.dec, ref_dec):
            np.testing.assert_array_equal(np.asarray(got)[hm],
                                          np.asarray(want)[hm])
    finally:
        isect.CONSOLIDATE = None
        jax.clear_caches()

    # scenes with rect/TRS prims fold too: the xform rows carry the same
    # decode columns, merged per lane — dec must match decode_materials
    # for sphere AND rect winners
    b2 = SceneBuilder()
    m2 = b2.materials
    b2.add_sphere((0, 0, -3), 0.5, m2.lambertian(color=(0.5, 0.5, 0.5)))
    b2.add_rect(m2.diffuse_light(color=(2, 1, 1)), position=(0, 2, -3),
                rotation=(0, 0, 0), scale=(3, 3, 1))
    b2.add_sphere((1.2, 0, -3), 0.4, m2.metal((0.9, 0.8, 0.7), 0.05),
                  scale=(1.0, 1.4, 1.0))
    s2 = b2.build()
    assert s2.n_rects == 1 and s2.n_t_spheres == 1
    isect.CONSOLIDATE = True
    try:
        # a fan from the origin (plain + TRS sphere winners) plus
        # perpendicular rays from the y=2 plane (rect winners — the
        # unscaled-origin TransformRay quirk makes oblique aim tricky)
        dirs = np.stack([np.repeat(np.linspace(-0.2, 0.6, 6), 4),
                         np.tile(np.linspace(-0.15, 0.3, 4), 6),
                         -np.ones(24)], 1)
        o = np.concatenate([np.zeros((24, 3)),
                            np.stack([np.linspace(-1.2, 1.2, 24),
                                      np.full(24, 2.0),
                                      np.zeros(24)], 1)])
        d = np.concatenate([dirs, np.tile([[0.0, 0.0, -1.0]], (24, 1))])
        r2 = _rays(o, d)
        h2 = isect.intersect_scene_pallas(s2, r2, quirks=Quirks.reference())
        assert h2.dec is not None
        prims = np.asarray(h2.prim)
        assert (prims == 1).any() and (prims == 2).any(), prims  # rect+TRS
        ref2 = M.decode_materials(s2.materials, s2.textures, h2.mat,
                                  consolidate=True)
        hm2 = np.asarray(h2.hit)
        for got, want in zip(h2.dec, ref2):
            np.testing.assert_array_equal(np.asarray(got)[hm2],
                                          np.asarray(want)[hm2])
    finally:
        isect.CONSOLIDATE = None
        jax.clear_caches()


def test_sphere_attrs_path_matches_finalize():
    """The pure-sphere attrs-carrying kernel path (cfg.wavefront_kernel_attrs) must
    produce bit-identical hit records, radiance, AND gradients to the
    winner-row-gather path — same candidate math, same tie rules."""
    import dataclasses
    import cudaraytracer_tpu as crt
    from cudaraytracer_tpu.models import presets
    from cudaraytracer_tpu.ops.render import pallas_intersector, render_pixels
    from cudaraytracer_tpu.ops.integrators import integrate
    from cudaraytracer_tpu.core.camera import generate_pixel_rays

    rng = np.random.default_rng(7)
    b = SceneBuilder()
    m = b.materials
    mats = [m.lambertian(m.textures.checker((.7, .7, .2), (.1, .1, .3))),
            m.metal((0.9, 0.7, 0.5), 0.15), m.dielectric(1.5),
            m.diffuse_light(color=(3, 2, 1))]
    b.add_sphere((0, -100.5, -3), 100.0, mats[0])
    for k in range(12):
        b.add_sphere(rng.uniform(-2.5, 2.5, 3) - [0, 0, 4],
                     float(rng.uniform(0.3, 0.8)), mats[k % 4])
    scene = b.build()
    _, cam = presets.three_spheres(aspect=2.0)
    cfg = crt.RenderConfig(width=32, height=16, samples=2, max_depth=4,
                           integrator="path", gamma=False)
    rays = generate_pixel_rays(cam, 32, 16, 2, jax.random.key(3))

    def run(kernel_attrs):
        c = dataclasses.replace(cfg, wavefront_kernel_attrs=kernel_attrs)
        jax.clear_caches()
        img = np.asarray(integrate(scene, rays, jax.random.key(1), c,
                                   pallas_intersector(c)))

        def loss(p):
            s = scene._replace(
                spheres=scene.spheres._replace(center=p["c"]),
                textures=scene.textures._replace(color0=p["a"]))
            return jnp.mean(integrate(s, rays, jax.random.key(1), c,
                                      pallas_intersector(c)))

        g = jax.grad(loss)({"c": scene.spheres.center,
                            "a": scene.textures.color0})
        return img, g

    isect.CONSOLIDATE = True
    try:
        img_a, g_a = run(True)
        img_f, g_f = run(False)
    finally:
        isect.CONSOLIDATE = None
        jax.clear_caches()
    np.testing.assert_array_equal(img_a, img_f)
    for k in ("c", "a"):
        np.testing.assert_allclose(np.asarray(g_a[k]), np.asarray(g_f[k]),
                                   rtol=1e-5, atol=1e-7)
    assert np.isfinite(np.asarray(g_a["c"])).all()

    # direct hit-record equality incl. dec
    r = _rays([[0, 0.3, 0]] * 64,
              np.stack([np.linspace(-0.7, 0.7, 64),
                        np.linspace(-0.4, 0.3, 64), -np.ones(64)], 1))
    isect.CONSOLIDATE = True
    try:
        h_a = isect.intersect_scene_pallas(scene, r, quirks=Quirks.reference(),
                                           kernel_attrs=True)
        h_f = isect.intersect_scene_pallas(scene, r, quirks=Quirks.reference())
    finally:
        isect.CONSOLIDATE = None
        jax.clear_caches()
    assert h_a.dec is not None and h_f.dec is not None
    hm = np.asarray(h_a.hit)
    assert hm.any()
    np.testing.assert_array_equal(np.asarray(h_a.prim), np.asarray(h_f.prim))
    np.testing.assert_array_equal(np.asarray(h_a.t), np.asarray(h_f.t))
    np.testing.assert_array_equal(np.asarray(h_a.normal)[hm],
                                  np.asarray(h_f.normal)[hm])
    np.testing.assert_array_equal(np.asarray(h_a.mat), np.asarray(h_f.mat))
    for got, want in zip(h_a.dec, h_f.dec):
        np.testing.assert_array_equal(np.asarray(got)[hm],
                                      np.asarray(want)[hm])


def test_fold_dec_matrix_lambert_normal():
    """All three integrators render identically with the dec folding on and
    off (CONSOLIDATE forced so CPU exercises the TPU form); the 'normal'
    integrator routes through fold_dec=False (it never reads materials) and
    must not be affected either way."""
    import dataclasses
    import cudaraytracer_tpu as crt
    from cudaraytracer_tpu.models import presets
    from cudaraytracer_tpu.ops.render import pallas_intersector, render_pixels

    scene, cam = presets.light_box(aspect=2.0)
    base = crt.RenderConfig(width=32, height=16, samples=2, max_depth=3,
                            gamma=False)
    isect_cache = {}
    try:
        for integrator in ("path", "lambert", "normal"):
            cfg = dataclasses.replace(base, integrator=integrator)
            outs = {}
            for fold in (True, False):
                isect.CONSOLIDATE = True
                isect.FOLD_DEC = fold
                jax.clear_caches()
                outs[fold] = np.asarray(render_pixels(
                    scene, cam, jax.random.key(4), cfg, None,
                    pallas_intersector(cfg)))
            np.testing.assert_array_equal(outs[True], outs[False])
    finally:
        isect.CONSOLIDATE = None
        isect.FOLD_DEC = True
        jax.clear_caches()
