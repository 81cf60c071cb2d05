"""Runtime-TRS spheres/triangles vs the float64 oracle's exact reference
transform chain (hitable.h:29-38 + transform.h:11-14 incl. the unscaled-origin
and negated-Z-rotation quirks)."""

import jax
import jax.numpy as jnp
import numpy as np

from cudaraytracer_tpu.config import Quirks, RenderConfig
from cudaraytracer_tpu.core.rays import make_rays
from cudaraytracer_tpu.models.scene import SceneBuilder
from cudaraytracer_tpu.ops import intersect as isect

import oracle


def _rays(origins, directions):
    return make_rays(jnp.asarray(origins, jnp.float32),
                     jnp.asarray(directions, jnp.float32))


def test_rotated_scaled_sphere_matches_oracle():
    b = SceneBuilder()
    mat = b.materials.lambertian(color=(1, 1, 1))
    h = b.add_sphere((0.3, -0.2, -4), 1.0, mat,
                     rotation=(20, 45, 70), scale=(1.5, 0.8, 2.0))
    assert h < 0                      # routed to the runtime-TRS table
    scene = b.build()
    assert scene.n_t_spheres == 1 and scene.n_spheres == 0

    ref = oracle.TransformedSphere((0.3, -0.2, -4), (20, 45, 70),
                                   (1.5, 0.8, 2.0), 1.0, 0)
    rng = np.random.default_rng(0)
    o = rng.normal(scale=0.5, size=(64, 3))
    # aim through the inverse of the quirky chain so ~half the rays hit:
    # d2 = R @ unit(d / scale) must point from (R @ o - pos) toward 0, so
    # d = scale * (R^T @ (pos - R @ o + jitter))
    pos = np.array([0.3, -0.2, -4.0])
    scale = np.array([1.5, 0.8, 2.0])
    R = np.stack([oracle.rotate(e, (20, 45, 70))
                  for e in np.eye(3).T], axis=1)    # column map: R @ v
    d = np.empty((64, 3))
    for i in range(64):
        target = pos - R @ o[i] + rng.normal(scale=1.2, size=3)
        d[i] = (R.T @ target) * scale
    d /= np.linalg.norm(d, axis=1, keepdims=True)   # |d|=1: t == native t
    hits = isect.intersect_scene(scene, _rays(o, d))
    n_hit = 0
    for i in range(64):
        rec = ref.hit(o[i], d[i], 1e-3, oracle.FLT_MAX)
        assert bool(hits.hit[i]) == (rec is not None), i
        if rec is not None:
            n_hit += 1
            np.testing.assert_allclose(hits.t[i], rec["t"], rtol=1e-4)
            np.testing.assert_allclose(hits.p[i], rec["p"], rtol=1e-3,
                                       atol=1e-4)
            np.testing.assert_allclose(hits.normal[i], rec["normal"],
                                       rtol=1e-3, atol=1e-4)
    assert n_hit >= 5


def test_transformed_triangle_matches_oracle():
    v0, v1, v2 = (-1, -1, 0), (1, -1, 0), (0, 1, 0)
    # stored normal -z: the transformed (mostly -z) directions then satisfy
    # the backface-only quirk (dot(d', n) >= 0), so the reference profile hits
    nrm = (0, 0, -1)
    b = SceneBuilder()
    mat = b.materials.lambertian(color=(1, 1, 1))
    h = b.add_triangle(v0, v1, v2, mat, normal=nrm,
                       position=(0.5, 0, -5), rotation=(0, 30, 10),
                       scale=(2, 1, 1))
    assert h < 0
    scene = b.build()
    assert scene.n_t_triangles == 1 and scene.n_triangles == 0

    for quirks, bf, clip in [(Quirks.reference(), True, True),
                             (Quirks.fixed(), False, False)]:
        ref = oracle.TransformedTriangle(v0, v1, v2, nrm, (0.5, 0, -5),
                                         (0, 30, 10), (2, 1, 1), 0,
                                         backface_only=bf, no_t_clip=clip)
        rng = np.random.default_rng(1)
        o = rng.normal(scale=0.4, size=(64, 3))
        d = rng.normal(size=(64, 3))
        d[:, 2] = -np.abs(d[:, 2]) - 0.4
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        hits = isect.intersect_scene(scene, _rays(o, d), quirks=quirks)
        n_hit = 0
        for i in range(64):
            rec = ref.hit(o[i], d[i], 1e-3, oracle.FLT_MAX)
            assert bool(hits.hit[i]) == (rec is not None), (i, bf)
            if rec is not None:
                n_hit += 1
                np.testing.assert_allclose(hits.t[i], rec["t"], rtol=1e-4)
                np.testing.assert_allclose(hits.normal[i], rec["normal"],
                                           rtol=1e-3, atol=1e-4)
        assert n_hit >= 3, (bf, n_hit)


def test_mixed_transformed_and_plain_occlusion():
    """A runtime-TRS sphere in front of a plain sphere must occlude it
    consistently for any |direction| (commensurable rescaled t)."""
    b = SceneBuilder()
    mat = b.materials.lambertian(color=(1, 1, 1))
    b.add_sphere((0, 0, -6), 1.0, mat)                       # plain, behind
    b.add_sphere((0, 0, -3), 0.5, mat, rotation=(0, 0, 45))  # TRS, in front
    scene = b.build()
    for dlen in (1.0, 10.0):
        hits = isect.intersect_scene(scene, _rays([[0, 0, 0]],
                                                  [[0, 0, -dlen]]))
        assert bool(hits.hit[0])
        # global ids: plain sphere 0; t-sphere appended after rects -> 1
        assert int(hits.prim[0]) == 1, dlen
        np.testing.assert_allclose(hits.t[0], 2.5 / dlen, rtol=1e-4)


def _trs_showcase_scene():
    """Mixed scene exercising every TRS-in-kernel path: two runtime-TRS
    spheres (one checker-textured), a runtime-TRS metal triangle, a plain
    ground sphere, and a rect (tie-break ordering vs the TRS tables)."""
    b = SceneBuilder()
    ground = b.materials.lambertian(color=(0.5, 0.7, 0.3))
    red = b.materials.lambertian(color=(0.9, 0.2, 0.2))
    chk = b.materials.lambertian(
        b.materials.textures.checker((0.9, 0.9, 0.1), (0.1, 0.1, 0.1)))
    met = b.materials.metal((0.8, 0.6, 0.2), 0.1)
    light = b.materials.diffuse_light(color=(2.0, 2.0, 2.0))
    b.add_sphere((0, -100.5, -3), 100.0, ground)
    b.add_sphere((0, 0, -3), 0.8, red, rotation=(0, 30, 0), scale=(1, 2, 1))
    b.add_sphere((-1.8, 0, -3), 0.6, chk, rotation=(20, 0, 45))
    b.add_triangle((-0.8, -0.4, 0), (0.8, -0.4, 0), (0, 0.9, 0), met,
                   position=(1.9, 0, -2.5), rotation=(0, -25, 0),
                   scale=(1, 1.3, 1))
    b.add_rect(light, position=(0, 2.5, -3), rotation=(90, 0, 0),
               scale=(3, 3, 1))
    return b.build()


def test_transformed_render_megakernel_matches_wavefront():
    """Runtime-TRS primitives run IN-KERNEL (tsph_sweep/ttri_sweep through
    the shared trs_ray TransformRay chain) — all three integrators match the
    wavefront engine on the same injected stream, under both quirk
    profiles."""
    import dataclasses
    from cudaraytracer_tpu.core.camera import make_camera
    from cudaraytracer_tpu.ops import megakernel as mk
    from cudaraytracer_tpu.ops.render import render_image

    scene = _trs_showcase_scene()
    assert scene.n_t_spheres == 2 and scene.n_t_triangles == 1
    assert mk.megakernel_supported(scene)
    cam = make_camera((0, 0.3, 1), (0, 0, -3), vfov=55, aspect=2.0,
                      focus_dist=4.0)
    for quirks in (Quirks.reference(), Quirks.fixed()):
        for integ in ("path", "lambert", "normal"):
            cfg = RenderConfig(width=64, height=32, samples=1, max_depth=4,
                               integrator=integ, quirks=quirks)
            cfg_m = dataclasses.replace(cfg, engine="mega")
            img = np.asarray(render_image(scene, cam, jax.random.key(0),
                                          cfg))
            img_m = np.asarray(render_image(scene, cam, jax.random.key(0),
                                            cfg_m))
            assert np.isfinite(img_m).all()
            assert img.std() > 0.05
            np.testing.assert_allclose(img_m, img, atol=3e-4,
                                       err_msg=f"{integ} {quirks}")


def test_trs_beyond_old_cap_matches_wavefront():
    """Round 5 lifted the fused engine's rect/TRS ceiling from 64 (unrolled
    per-row sweeps) to MAX_TRS_PRIMS=1024 (chunked table sweeps).  Pin a
    scene ABOVE the old cap in every class — 100 TRS spheres, 80 TRS
    triangles, 72 rects — against the wavefront on the same stream (multi-
    chunk fori_loop path + pad-row tie-break + winner-id offsets all in
    play).  One quirk profile / integrator: the combinatorial coverage
    lives in test_transformed_render_megakernel_matches_wavefront."""
    import dataclasses
    from cudaraytracer_tpu.core.camera import make_camera
    from cudaraytracer_tpu.ops import megakernel as mk
    from cudaraytracer_tpu.ops.render import render_image

    rng = np.random.default_rng(3)
    b = SceneBuilder()
    ground = b.materials.lambertian(color=(0.5, 0.7, 0.3))
    red = b.materials.lambertian(color=(0.9, 0.2, 0.2))
    met = b.materials.metal((0.8, 0.6, 0.2), 0.1)
    light = b.materials.diffuse_light(color=(2.0, 2.0, 2.0))
    b.add_sphere((0, -100.5, -3), 100.0, ground)
    for i in range(100):
        p = rng.uniform([-3, -0.3, -6], [3, 1.2, -2])
        b.add_sphere(p, rng.uniform(0.08, 0.2),
                     red if i % 3 else met,
                     rotation=tuple(rng.uniform(-90, 90, 3)),
                     scale=tuple(rng.uniform(0.6, 1.6, 3)))
    for i in range(80):
        p = rng.uniform([-3, -0.3, -6], [3, 1.2, -2])
        b.add_triangle((-0.15, -0.1, 0), (0.15, -0.1, 0), (0, 0.2, 0),
                       red, position=tuple(p),
                       rotation=tuple(rng.uniform(-90, 90, 3)),
                       scale=tuple(rng.uniform(0.7, 1.4, 3)))
    for i in range(72):
        p = rng.uniform([-3, 1.4, -6], [3, 2.2, -2])
        b.add_rect(light if i % 9 == 0 else red, position=tuple(p),
                   rotation=tuple(rng.uniform(-90, 90, 3)),
                   scale=(0.3, 0.3, 1.0))
    scene = b.build()
    assert scene.n_t_spheres == 100 and scene.n_t_triangles == 80 \
        and scene.n_rects == 72
    assert mk.megakernel_supported(scene)        # above-64 now supported
    cam = make_camera((0, 0.3, 1), (0, 0.3, -3), vfov=60, aspect=2.0,
                      focus_dist=4.0)
    cfg = RenderConfig(width=48, height=24, samples=1, max_depth=3,
                       integrator="path", quirks=Quirks.fixed())
    cfg_m = dataclasses.replace(cfg, engine="mega")
    img = np.asarray(render_image(scene, cam, jax.random.key(0), cfg))
    img_m = np.asarray(render_image(scene, cam, jax.random.key(0), cfg_m))
    assert np.isfinite(img_m).all()
    assert img.std() > 0.03
    np.testing.assert_allclose(img_m, img, atol=3e-4)


def test_transformed_mega_diff_falls_back():
    """engine='mega_diff' has no replay form for TRS scenes — it must route
    to the wavefront integrator (same image, and gradients must flow)."""
    from cudaraytracer_tpu.core.camera import make_camera
    from cudaraytracer_tpu.ops.render import render_image

    scene = _trs_showcase_scene()
    cam = make_camera((0, 0.3, 1), (0, 0, -3), vfov=55, aspect=2.0,
                      focus_dist=4.0)
    cfg = RenderConfig(width=32, height=16, samples=1, max_depth=3,
                       integrator="path")
    import dataclasses
    cfg_d = dataclasses.replace(cfg, engine="mega_diff")
    img = np.asarray(render_image(scene, cam, jax.random.key(0), cfg))
    img_d = np.asarray(render_image(scene, cam, jax.random.key(0), cfg_d))
    np.testing.assert_allclose(img_d, img, atol=1e-6)

    def loss(radius):
        s = scene._replace(
            t_spheres=scene.t_spheres._replace(radius=radius))
        return jnp.mean(render_image(s, cam, jax.random.key(0), cfg_d))

    g = jax.grad(loss)(scene.t_spheres.radius)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).max()) > 0.0


def test_trs_sphere_uv_not_clobbered_by_rects():
    """Regression: finalize_hits' rect block lacked an upper index bound, so
    a winning t_sphere (index >= n_s+n_t+n_r) also matched ``is_r`` and
    inherited the last rect's u/v (and object-space p) — garbage uv for any
    textured/emissive TRS sphere in a scene that also contains rects."""
    b = SceneBuilder()
    mat = b.materials.lambertian(color=(1, 1, 1))
    # rect far off to the side (never hit by the ray below)
    b.add_rect(mat, position=(50, 0, -3), scale=(9, 9, 1))
    b.add_sphere((0, 0, -3), 1.0, mat, rotation=(0, 0, 45))
    scene = b.build()
    assert scene.n_rects == 1 and scene.n_t_spheres == 1

    hits = isect.intersect_scene(scene, _rays([[0, 0, 0]], [[0, 0, -1.0]]))
    assert bool(hits.hit[0])
    np.testing.assert_allclose(hits.t[0], 2.0, rtol=1e-5)
    np.testing.assert_allclose(hits.normal[0], [0, 0, 1], atol=1e-5)
    # get_sphere_uv of normal (0,0,1): u = 1 - (pi/2 + pi)/(2pi), v = 1
    np.testing.assert_allclose(hits.u[0], 0.25, atol=1e-5)
    np.testing.assert_allclose(hits.v[0], 1.0, atol=1e-5)
    # static sphere at the same geometry agrees (uv defined identically)
    b2 = SceneBuilder()
    mat2 = b2.materials.lambertian(color=(1, 1, 1))
    b2.add_sphere((0, 0, -3), 1.0, mat2)
    hits2 = isect.intersect_scene(b2.build(),
                                  _rays([[0, 0, 0]], [[0, 0, -1.0]]))
    np.testing.assert_allclose(hits.u[0], hits2.u[0], atol=1e-5)
    np.testing.assert_allclose(hits.v[0], hits2.v[0], atol=1e-5)
