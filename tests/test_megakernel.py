"""Megakernel (fused path tracer) golden tests vs the wavefront integrator.

On CPU the kernel runs in interpret mode with the injected sample stream
derived from the SAME threefry key the wavefront path uses internally, so
results must agree to float32-reassociation tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np

from cudaraytracer_tpu.config import Quirks, RenderConfig
from cudaraytracer_tpu.core import camera as cam_mod
from cudaraytracer_tpu.models import presets
from cudaraytracer_tpu.models.scene import SceneBuilder
from cudaraytracer_tpu.ops import integrators as integ
from cudaraytracer_tpu.ops import megakernel as mk
from cudaraytracer_tpu.ops import render as render_ops
from cudaraytracer_tpu.ops.pallas_intersect import morton_order


def _cfg(**kw):
    kw.setdefault("width", 64)
    kw.setdefault("height", 32)
    kw.setdefault("samples", 2)
    kw.setdefault("max_depth", 8)
    kw.setdefault("integrator", "path")
    return RenderConfig(**kw)


def _mixed_scene():
    """Spheres + triangles, all four materials, checker texture."""
    b = SceneBuilder()
    m = b.materials
    chk = m.lambertian(m.textures.checker((0.9, 0.9, 0.9), (0.1, 0.2, 0.1)))
    red = m.lambertian(color=(0.9, 0.2, 0.2))
    met = m.metal((0.8, 0.7, 0.3), fuzz=0.2)
    glass = m.dielectric(1.5)
    light = m.diffuse_light(color=(4.0, 4.0, 4.0))
    b.add_sphere((0, -100.5, -3), 100.0, chk)
    b.add_sphere((-1.1, 0, -3), 0.5, glass)
    b.add_sphere((1.1, 0, -3), 0.5, met)
    pts = np.array([[0, 0, -3], [0.5, 0, -2.6], [-0.5, 0, -2.6],
                    [0, 0.8, -2.8]], np.float32)
    for tri in [(0, 1, 3), (1, 2, 3), (2, 0, 3), (0, 2, 1)]:
        v = pts[list(tri)]
        b.add_triangle(v[0], v[1], v[2], red)
    b.add_triangle((-1, 2.0, -2.5), (1, 2.0, -2.5), (0, 2.0, -4), light,
                   normal=(0, -1, 0))
    scene = b.build()
    cam = cam_mod.make_camera((0, 0.4, 2), (0, 0.2, -3), vfov=45, aspect=2.0,
                              focus_dist=5.0)
    return scene, cam


def _rays(scene_cam, cfg, key):
    _, cam = scene_cam
    return cam_mod.generate_pixel_rays(cam, cfg.width, cfg.height,
                                       cfg.samples, key)


def test_mega_matches_wavefront_three_spheres():
    scene, cam = presets.three_spheres(aspect=2.0)
    cfg = _cfg()
    rays = cam_mod.generate_pixel_rays(cam, cfg.width, cfg.height,
                                       cfg.samples, jax.random.key(0))
    ref = np.asarray(integ.trace_path(scene, rays, jax.random.key(7), cfg))
    got = np.asarray(mk.trace_path_mega(scene, rays, jax.random.key(7), cfg))
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-4)


def test_mega_matches_wavefront_mixed_both_quirks():
    sc = _mixed_scene()
    scene, _ = sc
    order = morton_order(np.asarray(scene.triangles.v0),
                         np.asarray(scene.triangles.v1),
                         np.asarray(scene.triangles.v2))
    for quirks in (Quirks.reference(), Quirks.fixed()):
        cfg = _cfg(quirks=quirks)
        rays = _rays(sc, cfg, jax.random.key(3))
        n = rays.origin.shape[0]
        stream = integ.stream_from_key(jax.random.key(9), n, cfg.max_depth)
        ref = np.asarray(integ.trace_path(scene, rays, jax.random.key(9),
                                          cfg, samples=stream))
        tables = mk.build_mega_tables(scene, tri_order=order)
        got = np.asarray(mk.trace_path_mega(scene, rays, jax.random.key(9),
                                            cfg, tables=tables,
                                            samples=stream))
        np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-4)


def test_mega_single_type_scenes():
    """Sphere-only and triangle-only scenes exercise the has_sph/has_tri
    static specializations."""
    cfg = _cfg()
    # triangle-only
    b = SceneBuilder()
    m2 = b.materials.lambertian(color=(0.4, 0.6, 0.9))
    pts = np.array([[0, 0, -3], [0.5, 0, -2.6], [-0.5, 0, -2.6],
                    [0, 0.8, -2.8]], np.float32)
    for tri in [(0, 1, 3), (1, 2, 3), (2, 0, 3), (0, 2, 1)]:
        v = pts[list(tri)]
        b.add_triangle(v[0], v[1], v[2], m2)
    s_tri = b.build()
    cam = cam_mod.make_camera((0, 0.4, 2), (0, 0.2, -3), vfov=45, aspect=2.0,
                              focus_dist=5.0)
    rays = cam_mod.generate_pixel_rays(cam, cfg.width, cfg.height,
                                       cfg.samples, jax.random.key(1))
    ref = np.asarray(integ.trace_path(s_tri, rays, jax.random.key(2), cfg))
    got = np.asarray(mk.trace_path_mega(s_tri, rays, jax.random.key(2), cfg))
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-4)

    # sphere-only (three_spheres covers it, but check an empty-triangle build)
    scene, _ = presets.three_spheres(aspect=2.0)
    assert scene.n_triangles == 0
    assert mk.megakernel_supported(scene)


def test_mega_engine_render_image_and_fallback():
    """cfg.engine='mega' renders full images through the standard driver and
    matches engine='wavefront'; scenes with rects fall back automatically."""
    scene, cam = presets.three_spheres(aspect=2.0)
    cfg_wave = _cfg(samples=1)
    cfg_mega = _cfg(samples=1, engine="mega")
    img_w = np.asarray(render_ops.render_image(scene, cam, jax.random.key(5),
                                               cfg_wave))
    img_m = np.asarray(render_ops.render_image(scene, cam, jax.random.key(5),
                                               cfg_mega))
    np.testing.assert_allclose(img_m, img_w, atol=3e-4)

    # image textures can't gather in-kernel -> the engine routes to the
    # fused sweep + DEFERRED texture replay (trace_path_mega_tex), which
    # matches the wavefront to replay-recompute tolerance
    b = SceneBuilder()
    tex = b.materials.textures.image(
        np.arange(48, dtype=np.uint8).reshape(4, 4, 3))
    mat = b.materials.lambertian(tex_id=tex)
    b.add_sphere((0, 0, -3), 1.0, mat)
    scene2 = b.build()
    assert not mk.megakernel_supported(scene2)
    assert mk.mega_tex_supported(scene2)
    cam2 = cam_mod.make_camera((0, 0, 1), (0, 0, -3), vfov=50, aspect=2.0,
                               focus_dist=4.0)
    img2_w = np.asarray(render_ops.render_image(scene2, cam2,
                                                jax.random.key(6), cfg_wave))
    img2_m = np.asarray(render_ops.render_image(scene2, cam2,
                                                jax.random.key(6), cfg_mega))
    np.testing.assert_allclose(img2_m, img2_w, atol=3e-4)


def test_mega_rect_scenes():
    """Rects run in-kernel (unrolled reference TransformRay chain).  A
    rect-heavy scene matches the wavefront engine on the injected stream for
    every ray; light_box allows a couple of t_min-grazing outliers (the
    scattered ray re-hits the huge floor sphere at t ~ 1e-3, where f32
    summation order flips hit/miss in either engine)."""
    b = SceneBuilder()
    m = b.materials
    light = m.diffuse_light(color=(3, 3, 3))
    red = m.lambertian(color=(0.8, 0.2, 0.2))
    b.add_sphere((0, -100.5, -3), 100.0,
                 m.lambertian(m.textures.checker((.8, .8, .8), (.2, .2, .2))))
    b.add_rect(light, flip=False, position=(0, 1.5, -3), rotation=(90, 0, 0),
               scale=(2, 2, 1))
    b.add_rect(red, flip=True, position=(0, 0.5, -5), scale=(3, 2, 1))
    b.add_sphere((0.6, 0, -3), 0.4, m.metal((0.9, 0.8, 0.7), 0.1))
    scene = b.build()
    assert mk.megakernel_supported(scene)
    cam = cam_mod.make_camera((0, 0.5, 1), (0, 0.4, -3), vfov=55, aspect=2.0,
                              focus_dist=4.0)
    cfg = _cfg()
    rays = cam_mod.generate_pixel_rays(cam, cfg.width, cfg.height,
                                       cfg.samples, jax.random.key(1))
    n = rays.origin.shape[0]
    stream = integ.stream_from_key(jax.random.key(5), n, cfg.max_depth)
    ref = np.asarray(integ.trace_path(scene, rays, jax.random.key(5), cfg,
                                      samples=stream))
    got = np.asarray(mk.trace_path_mega(scene, rays, jax.random.key(5), cfg,
                                        samples=stream))
    np.testing.assert_allclose(got, ref, atol=3e-4, rtol=1e-4)

    # light_box across all three integrators
    scene2, cam2 = presets.light_box(aspect=2.0)
    assert mk.megakernel_supported(scene2)
    for integrator in ("path", "lambert", "normal"):
        cfg_i = _cfg(integrator=integrator)
        rays2 = cam_mod.generate_pixel_rays(cam2, cfg_i.width, cfg_i.height,
                                            cfg_i.samples, jax.random.key(2))
        n2 = rays2.origin.shape[0]
        stream2 = integ.stream_from_key(jax.random.key(8), n2,
                                        cfg_i.max_depth)
        kw = dict(samples=stream2) if integrator == "path" else {}
        ref2 = np.asarray(integ.integrate(scene2, rays2, jax.random.key(8),
                                          cfg_i, **kw))
        got2 = np.asarray(mk.trace_path_mega(scene2, rays2, jax.random.key(8),
                                             cfg_i, **kw))
        d = np.abs(ref2 - got2).max(axis=1)
        n_bad = int((d > 1e-3).sum())
        assert n_bad <= max(2, n2 // 1000), (integrator, n_bad, d.max())


def test_mega_streaming_large_mesh():
    """> MAX_VMEM_PRIMS triangles: the table stays in HBM and streams through
    VMEM scratch by in-kernel DMA with per-segment culling; results must
    match the jnp brute-force path exactly."""
    from cudaraytracer_tpu.core.rays import make_rays

    n = 72   # 72x72 quads = 10368 tris > 8192
    xs = np.linspace(-5, 5, n + 1)
    zs = np.linspace(-10, 0, n + 1)
    X, Z = np.meshgrid(xs, zs)
    Y = 0.3 * np.sin(X * 1.3) * np.cos(Z * 1.1)
    b = SceneBuilder()
    mat = b.materials.lambertian(color=(0.7, 0.5, 0.3))
    P = np.stack([X, Y, Z], axis=-1).astype(np.float32)
    v0 = P[:-1, :-1].reshape(-1, 3)
    v1 = P[:-1, 1:].reshape(-1, 3)
    v2 = P[1:, :-1].reshape(-1, 3)
    v3 = P[1:, 1:].reshape(-1, 3)
    tris = np.concatenate([np.stack([v0, v1, v3], 1),
                           np.stack([v0, v3, v2], 1)])
    nrm = np.cross(tris[:, 1] - tris[:, 0], tris[:, 2] - tris[:, 0])
    nrm /= np.maximum(np.linalg.norm(nrm, axis=1, keepdims=True), 1e-20)
    nrm[nrm[:, 1] > 0] *= -1.0      # face down: visible under backface quirk
    for t, nn in zip(tris, nrm):
        b.add_triangle(t[0], t[1], t[2], mat, normal=nn)
    b.add_sphere((0, 2.0, -5), 0.8, b.materials.metal((0.9, 0.9, 0.9), 0.1))
    scene = b.build()
    assert scene.n_triangles > mk.MAX_VMEM_PRIMS
    assert mk.megakernel_supported(scene)

    rng = np.random.default_rng(0)
    nr = 512
    o = np.tile(np.array([[0, 4.0, 2.0]], np.float32), (nr, 1))
    d = np.stack([rng.uniform(-0.6, 0.6, nr), -np.ones(nr),
                  rng.uniform(-1.6, -0.4, nr)], 1).astype(np.float32)
    rays = make_rays(jnp.asarray(o), jnp.asarray(d))
    cfg = _cfg(width=16, height=32, samples=1, max_depth=4)
    stream = integ.stream_from_key(jax.random.key(5), nr, cfg.max_depth)
    ref = np.asarray(integ.trace_path(scene, rays, jax.random.key(5), cfg,
                                      samples=stream))
    order = morton_order(np.asarray(scene.triangles.v0),
                         np.asarray(scene.triangles.v1),
                         np.asarray(scene.triangles.v2))
    tables = mk.build_mega_tables(scene, tri_order=order)
    assert tables.tri.shape[0] % mk.SEG_T == 0
    got = np.asarray(mk.trace_path_mega(scene, rays, jax.random.key(5), cfg,
                                        tables=tables, samples=stream))
    assert ref.mean() > 0.01      # rays actually hit the terrain
    np.testing.assert_allclose(got, ref, atol=3e-4, rtol=1e-4)
    # front-to-back SEGMENT shells reorder the streamed visits only
    import dataclasses
    f2b = np.asarray(mk.trace_path_mega(
        scene, rays, jax.random.key(5),
        dataclasses.replace(cfg, mega_f2b_shells=4), tables=tables,
        samples=stream))
    np.testing.assert_array_equal(f2b, got)
    # cfg.compact_auto: integrate() switches big streamed scenes to phased
    # octant compaction — a pure lane reorder, still exact (threshold
    # lowered so this 10k-tri scene qualifies)
    auto_saved = mk.AUTO_COMPACT_TRIS
    mk.AUTO_COMPACT_TRIS = 1 << 10
    try:
        auto = np.asarray(integ.integrate(
            scene, rays, jax.random.key(5),
            dataclasses.replace(cfg, engine="mega"), aux=tables,
            samples=stream))
    finally:
        mk.AUTO_COMPACT_TRIS = auto_saved
    np.testing.assert_array_equal(auto, got)


def test_mega_streaming_mxu():
    """cfg.mega_mxu: the streamed triangle sweep runs as per-sublane-row
    (n_q*SUPER_T, 10) @ (10, 128) MXU matmuls.  a/t/u/v come from matmul-
    accumulated bilinear forms instead of the VPU's fused chain, so results
    match the wavefront integrator to f32-rounding tolerance (not
    bit-exactly) under BOTH quirk profiles — reference quirks additionally
    exercise the d.n backface block and the no-t-clip window."""
    from cudaraytracer_tpu.core.rays import make_rays
    import dataclasses

    n = 72   # 72x72 quads = 10368 tris > MAX_VMEM_PRIMS
    xs = np.linspace(-5, 5, n + 1)
    zs = np.linspace(-10, 0, n + 1)
    X, Z = np.meshgrid(xs, zs)
    Y = 0.3 * np.sin(X * 1.3) * np.cos(Z * 1.1)
    b = SceneBuilder()
    mat = b.materials.lambertian(color=(0.7, 0.5, 0.3))
    P = np.stack([X, Y, Z], axis=-1).astype(np.float32)
    v0 = P[:-1, :-1].reshape(-1, 3)
    v1 = P[:-1, 1:].reshape(-1, 3)
    v2 = P[1:, :-1].reshape(-1, 3)
    v3 = P[1:, 1:].reshape(-1, 3)
    tris = np.concatenate([np.stack([v0, v1, v3], 1),
                           np.stack([v0, v3, v2], 1)])
    nrm = np.cross(tris[:, 1] - tris[:, 0], tris[:, 2] - tris[:, 0])
    nrm /= np.maximum(np.linalg.norm(nrm, axis=1, keepdims=True), 1e-20)
    nrm[nrm[:, 1] > 0] *= -1.0
    for t, nn in zip(tris, nrm):
        b.add_triangle(t[0], t[1], t[2], mat, normal=nn)
    b.add_sphere((0, 2.0, -5), 0.8, b.materials.metal((0.9, 0.9, 0.9), 0.1))
    scene = b.build()
    assert scene.n_triangles > mk.MAX_VMEM_PRIMS

    rng = np.random.default_rng(1)
    nr = 512
    o = np.tile(np.array([[0, 4.0, 2.0]], np.float32), (nr, 1))
    d = np.stack([rng.uniform(-0.6, 0.6, nr), -np.ones(nr),
                  rng.uniform(-1.6, -0.4, nr)], 1).astype(np.float32)
    rays = make_rays(jnp.asarray(o), jnp.asarray(d))
    order = morton_order(np.asarray(scene.triangles.v0),
                         np.asarray(scene.triangles.v1),
                         np.asarray(scene.triangles.v2))
    tables = mk.build_mega_tables(scene, tri_order=order, mxu=True)
    assert tables.tri_coef.shape[0] == mk.N_Q * tables.tri.shape[0]
    for quirks in (Quirks.fixed(), Quirks.reference()):
        cfg = _cfg(width=16, height=32, samples=1, max_depth=4,
                   quirks=quirks, mega_mxu=True)
        stream = integ.stream_from_key(jax.random.key(5), nr, cfg.max_depth)
        ref = np.asarray(integ.trace_path(scene, rays, jax.random.key(5),
                                          cfg, samples=stream))
        got = np.asarray(mk.trace_path_mega(scene, rays, jax.random.key(5),
                                            cfg, tables=tables,
                                            samples=stream))
        assert ref.mean() > 0.01
        # matmul rounding can flip a grazing winner: allow rare outliers
        dmax = np.abs(got - ref).max(axis=1)
        n_bad = int((dmax > 1e-3).sum())
        assert n_bad <= max(2, nr // 500), (str(quirks), n_bad,
                                            float(dmax.max()))
        # phased compaction composes with the MXU sweep (pure lane reorder)
        cfg_c = dataclasses.replace(cfg, engine="mega", compact_every=2)
        phased = np.asarray(integ.integrate(scene, rays, jax.random.key(5),
                                            cfg_c, aux=tables,
                                            samples=stream))
        np.testing.assert_array_equal(phased, got)
    # missing coefficient tables is a loud error, not silent garbage
    plain = mk.build_mega_tables(scene, tri_order=order)
    cfg = _cfg(width=16, height=32, samples=1, max_depth=2, mega_mxu=True)
    try:
        mk.trace_path_mega(scene, rays, jax.random.key(0), cfg,
                           tables=plain)
        assert False, "expected ValueError for coef-less tables"
    except ValueError as e:
        assert "mxu=True" in str(e)


def test_mega_tables_refit_flow():
    """Rebuilding tables from updated vertices (animation) changes results
    without recompilation — tables are traced operands."""
    sc = _mixed_scene()
    scene, cam = sc
    cfg = _cfg(samples=1)
    rays = _rays(sc, cfg, jax.random.key(4))
    n = rays.origin.shape[0]
    stream = integ.stream_from_key(jax.random.key(11), n, cfg.max_depth)

    calls = {"n": 0}

    @jax.jit
    def render(tables, scene):
        calls["n"] += 1
        return mk.trace_path_mega(scene, rays, jax.random.key(11), cfg,
                                  tables=tables, samples=stream)

    t0 = mk.build_mega_tables(scene)
    r0 = render(t0, scene)
    # shift the pyramid up by 0.4: rebuild tables from the updated scene
    tr = scene.triangles
    shift = jnp.asarray([0.0, 0.4, 0.0])
    scene2 = scene.with_triangle_vertices(tr.v0 + shift, tr.v1 + shift,
                                          tr.v2 + shift)
    t1 = mk.build_mega_tables(scene2)
    r1 = render(t1, scene2)
    assert calls["n"] == 1          # same trace, no recompilation
    assert np.abs(np.asarray(r0) - np.asarray(r1)).max() > 1e-3
    ref = np.asarray(integ.trace_path(scene2, rays, jax.random.key(11), cfg,
                                      samples=stream))
    np.testing.assert_allclose(np.asarray(r1), ref, atol=2e-4, rtol=1e-4)


def test_mega_lambert_and_normal_integrators():
    """The megakernel also fuses the reference's ACTIVE LambertShade
    (render.h:70-87) and shade_normal (render.h:90-103) — deterministic, so
    exact parity with the wavefront integrators in both quirk profiles."""
    sc = _mixed_scene()
    scene, _ = sc
    for integrator in ("lambert", "normal"):
        for quirks in (Quirks.reference(), Quirks.fixed()):
            cfg = _cfg(samples=1, integrator=integrator, quirks=quirks)
            rays = _rays(sc, cfg, jax.random.key(2))
            ref = np.asarray(integ.INTEGRATOR_FNS[integrator](
                scene, rays, jax.random.key(1), cfg))
            got = np.asarray(mk.trace_path_mega(scene, rays,
                                                jax.random.key(1), cfg))
            np.testing.assert_allclose(got, ref, atol=2e-5,
                                       err_msg=integrator)


def test_mega_diff_gradients_match_wavefront():
    """engine='mega_diff': megakernel forward + wavefront backward on one
    injected stream must produce the same value AND gradients as the pure
    wavefront path with that stream."""
    import dataclasses

    scene, cam = presets.three_spheres(aspect=2.0)
    cfg = _cfg(samples=1, max_depth=6)
    rays = cam_mod.generate_pixel_rays(cam, cfg.width, cfg.height,
                                       cfg.samples, jax.random.key(0))
    key = jax.random.key(4)

    def loss(params, engine_cfg):
        s = scene._replace(
            spheres=scene.spheres._replace(center=params["centers"]),
            textures=scene.textures._replace(color0=params["albedo"]))
        from cudaraytracer_tpu.ops.integrators import integrate
        cols = integrate(s, rays, key, engine_cfg)
        return jnp.mean(cols)

    params = {"centers": scene.spheres.center,
              "albedo": scene.textures.color0}
    cfg_w = cfg
    cfg_d = dataclasses.replace(cfg, engine="mega_diff")
    v_w, g_w = jax.value_and_grad(lambda p: loss(p, cfg_w))(params)
    v_d, g_d = jax.value_and_grad(lambda p: loss(p, cfg_d))(params)
    np.testing.assert_allclose(float(v_d), float(v_w), rtol=1e-5)
    for k in params:
        gw = np.asarray(g_w[k])
        gd = np.asarray(g_d[k])
        assert np.abs(gw).max() > 0, k      # gradients actually flow
        np.testing.assert_allclose(gd, gw, rtol=1e-3, atol=1e-5, err_msg=k)


def test_mega_diff_fit_converges():
    """A few SGD steps through engine='mega_diff' reduce pixel loss."""
    import dataclasses

    scene, cam = presets.three_spheres(aspect=2.0)
    cfg = dataclasses.replace(_cfg(samples=1, max_depth=4, gamma=False),
                              engine="mega_diff")
    rays = cam_mod.generate_pixel_rays(cam, cfg.width, cfg.height,
                                       cfg.samples, jax.random.key(0))
    key = jax.random.key(1)
    from cudaraytracer_tpu.ops.integrators import integrate
    target = integrate(scene, rays, key, cfg)

    a0 = scene.textures.color0 * 0.5 + 0.2   # perturbed albedos

    @jax.jit
    def step(albedo):
        def loss(a):
            s = scene._replace(textures=scene.textures._replace(color0=a))
            return jnp.mean((integrate(s, rays, key, cfg) - target) ** 2)
        l, g = jax.value_and_grad(loss)(albedo)
        return l, albedo - 1.0 * g

    losses = []
    a = a0
    for _ in range(8):
        l, a = step(a)
        losses.append(float(l))
    assert losses[-1] < losses[0] * 0.7, losses


def test_mega_compaction_exact():
    """Wavefront compaction (sort dead-last + Morton, resume in a second
    fused kernel) only reorders lanes: results are bit-identical to the
    single-kernel megakernel for any split point."""
    sc = _mixed_scene()
    scene, _ = sc
    cfg = _cfg()
    rays = _rays(sc, cfg, jax.random.key(3))
    n = rays.origin.shape[0]
    stream = integ.stream_from_key(jax.random.key(9), n, cfg.max_depth)
    ref = np.asarray(mk.trace_path_mega(scene, rays, jax.random.key(9), cfg,
                                        samples=stream))
    for ps in (1, 3):
        got = np.asarray(mk.trace_path_mega_compact(
            scene, rays, jax.random.key(9), cfg, primary_steps=ps,
            samples=stream))
        np.testing.assert_array_equal(got, ref, err_msg=f"split {ps}")
    # and through the engine knob
    import dataclasses
    cfg_c = dataclasses.replace(cfg, engine="mega", compact_after=1)
    got = np.asarray(integ.integrate(scene, rays, jax.random.key(9), cfg_c,
                                     samples=stream))
    np.testing.assert_array_equal(got, ref)
    # out-of-range split is a clear config error (phase B needs >= 1 step),
    # not a trace-time assert
    import pytest
    with pytest.raises(ValueError, match="compact_after"):
        mk.trace_path_mega_compact(scene, rays, jax.random.key(9), cfg,
                                   primary_steps=cfg.max_depth + 1,
                                   samples=stream)


def test_mega_phased_partition_exact():
    """Stable-partition compaction (trace_path_mega_phased) only reorders
    lanes: bit-identical to the single-kernel megakernel for any window size,
    and the partition permutation is a true alive-first stable permutation."""
    sc = _mixed_scene()
    scene, _ = sc
    cfg = _cfg()
    rays = _rays(sc, cfg, jax.random.key(3))
    n = rays.origin.shape[0]
    stream = integ.stream_from_key(jax.random.key(9), n, cfg.max_depth)
    ref = np.asarray(mk.trace_path_mega(scene, rays, jax.random.key(9), cfg,
                                        samples=stream))
    for ce in (1, 3):
        got = np.asarray(mk.trace_path_mega_phased(
            scene, rays, jax.random.key(9), cfg, compact_every=ce,
            samples=stream))
        np.testing.assert_array_equal(got, ref, err_msg=f"window {ce}")
    # engine knob
    import dataclasses
    cfg_c = dataclasses.replace(cfg, engine="mega", compact_every=2)
    got = np.asarray(integ.integrate(scene, rays, jax.random.key(9), cfg_c,
                                     samples=stream))
    np.testing.assert_array_equal(got, ref)
    # octant sort (cfg.compact_octants): still a pure lane reorder
    cfg_o = dataclasses.replace(cfg_c, compact_octants=True)
    got = np.asarray(integ.integrate(scene, rays, jax.random.key(9), cfg_o,
                                     samples=stream))
    np.testing.assert_array_equal(got, ref)
    # the permutation itself: alive lanes first, both groups in stable order
    alive = np.asarray([1., 0., 0., 1., 1., 0., 1., 0.], np.float32)
    order = np.asarray(mk._partition_alive_first(jnp.asarray(alive)))
    assert order.tolist() == [0, 3, 4, 6, 1, 2, 5, 7]


def test_mega_morton_ordered_tables_match():
    """Morton-permuted sphere+triangle tables (the bench/app fast path) are
    an internal layout choice only: same image as builder-order tables up to
    closest-hit ties (first-wins flips to the permuted order on EXACT t
    ties, which the mixed scene does not contain)."""
    sc = _mixed_scene()
    scene, _ = sc
    cfg = _cfg()
    rays = _rays(sc, cfg, jax.random.key(11))
    n = rays.origin.shape[0]
    stream = integ.stream_from_key(jax.random.key(12), n, cfg.max_depth)
    tr = scene.triangles
    t_ord = morton_order(np.asarray(tr.v0), np.asarray(tr.v1),
                         np.asarray(tr.v2))
    s_ord = mk.mega_sphere_order(scene.spheres.center)
    assert sorted(s_ord.tolist()) == list(range(scene.n_spheres))
    ref = np.asarray(mk.trace_path_mega(scene, rays, jax.random.key(12), cfg,
                                        samples=stream))
    got = np.asarray(mk.trace_path_mega(
        scene, rays, jax.random.key(12), cfg,
        tables=mk.build_mega_tables(scene, t_ord, s_ord), samples=stream))
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)


def test_mega_sphere_two_level_cull():
    """>SPH_SUPER_MIN spheres switch the sphere sweep to the two-level cull
    (per-SUPER_T super boxes + repeat-last padding); results must match the
    wavefront integrator on the injected stream like any other scene."""
    rng = np.random.default_rng(3)
    b = SceneBuilder()
    m = b.materials
    b.add_sphere((0, -1000, -3), 999.6, m.lambertian(color=(0.5, 0.5, 0.5)))
    for i in range(mk.SPH_SUPER_MIN + 40):
        pos = (float(rng.uniform(-6, 6)), float(rng.uniform(-0.3, 1.5)),
               float(rng.uniform(-8, -2)))
        mat = (m.lambertian(color=tuple(rng.uniform(0.1, 0.9, 3).tolist()))
               if i % 3 else m.metal((0.8, 0.8, 0.8), 0.05))
        b.add_sphere(pos, 0.25, mat)
    scene = b.build()
    assert (scene.n_spheres > mk.SPH_SUPER_MIN
            and mk.megakernel_supported(scene))
    cam = cam_mod.make_camera((0, 0.6, 2), (0, 0.3, -4), vfov=50, aspect=2.0,
                              focus_dist=6.0)
    cfg = _cfg(width=48, height=24, samples=1, max_depth=4)
    rays = cam_mod.generate_pixel_rays(cam, cfg.width, cfg.height,
                                       cfg.samples, jax.random.key(4))
    n = rays.origin.shape[0]
    stream = integ.stream_from_key(jax.random.key(7), n, cfg.max_depth)
    ref = np.asarray(integ.trace_path(scene, rays, jax.random.key(7), cfg,
                                      samples=stream))
    s_ord = mk.mega_sphere_order(scene.spheres.center)
    got = np.asarray(mk.trace_path_mega(
        scene, rays, jax.random.key(7), cfg,
        tables=mk.build_mega_tables(scene, sph_order=s_ord), samples=stream))
    d = np.abs(ref - got).max(axis=1)
    n_bad = int((d > 1e-3).sum())
    assert n_bad <= max(2, n // 1000), (n_bad, float(d.max()))


def test_mesh_path_reference_quirk_self_hit_degeneracy():
    """Quirks.reference() mesh PATH tracing is (faithfully) degenerate.

    triangle.h:92-94 never tests Moller-Trumbore t against t_min/t_max, so a
    scattered ray whose origin lies ON a triangle re-hits that same triangle
    at t ~ 0 (its u,v are interior and backface_only passes since
    dot(n + ball, n) > 0): the path gets stuck on the surface, never reaches
    the sky, and terminates at the depth-exhaustion ambient floor
    (render.h:61).  The reference never renders this configuration — its path
    tracer is commented out (render.h:119) and its ACTIVE BVH pipeline prunes
    behind-the-ray boxes via the AABB t-window (aabb.h:30-43 clamps to
    [t_min, t_max]; bvh.h:165) — but the list-pipeline semantics we reproduce
    admit it.  Under Quirks.fixed() the triangle t-window excludes the
    self-hit and the bounce escapes to the sky.  Both engines must agree per
    profile: the quirk is reproduced, never silently fixed."""
    b = SceneBuilder()
    red = b.materials.lambertian(color=(0.6, 0.6, 0.6))
    # big triangle at z=-2, normal (0,0,-1) pointing AWAY from the camera so
    # the backface_only quirk lets primary rays (d ~ -z) hit it
    b.add_triangle((-50, -50, -2), (50, -50, -2), (0, 50, -2), red,
                   normal=(0, 0, -1))
    scene = b.build()
    cam = cam_mod.make_camera((0, 0, 0), (0, 0, -2), vfov=45, aspect=2.0,
                              focus_dist=2.0)
    means = {}
    for name, quirks in (("reference", Quirks.reference()),
                         ("fixed", Quirks.fixed())):
        cfg = _cfg(width=16, height=8, samples=2, max_depth=8, quirks=quirks)
        rays = cam_mod.generate_pixel_rays(cam, cfg.width, cfg.height,
                                           cfg.samples, jax.random.key(2))
        n = rays.origin.shape[0]
        stream = integ.stream_from_key(jax.random.key(5), n, cfg.max_depth)
        ref = np.asarray(integ.trace_path(scene, rays, jax.random.key(5),
                                          cfg, samples=stream))
        got = np.asarray(mk.trace_path_mega(scene, rays, jax.random.key(5),
                                            cfg, samples=stream))
        np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-4)
        means[name] = float(ref.mean())
    # reference: stuck paths -> ambient * albedo^8 ~ 1.7e-3 radiance
    assert means["reference"] < 0.01, means
    # fixed: first bounce escapes to the sky -> bright
    assert means["fixed"] > 0.1, means


def test_mega_f2b_shells_exact():
    """cfg.mega_f2b_shells only REORDERS top-level box visits (front-to-back
    distance shells around the tile's origin centroid) — each box is still
    visited exactly once, and the closest-hit merge is order-independent, so
    results must be bit-identical to the in-order sweep for any shell count,
    under both quirk profiles."""
    import dataclasses
    sc = _mixed_scene()
    scene, _ = sc
    order = morton_order(np.asarray(scene.triangles.v0),
                         np.asarray(scene.triangles.v1),
                         np.asarray(scene.triangles.v2))
    tables = mk.build_mega_tables(scene, tri_order=order)
    for quirks in (Quirks.reference(), Quirks.fixed()):
        cfg0 = _cfg(quirks=quirks)
        rays = _rays(sc, cfg0, jax.random.key(3))
        n = rays.origin.shape[0]
        stream = integ.stream_from_key(jax.random.key(9), n, cfg0.max_depth)
        ref = np.asarray(mk.trace_path_mega(scene, rays, jax.random.key(9),
                                            cfg0, tables=tables,
                                            samples=stream))
        for shells in (2, 4):
            cfg = dataclasses.replace(cfg0, mega_f2b_shells=shells)
            got = np.asarray(mk.trace_path_mega(
                scene, rays, jax.random.key(9), cfg, tables=tables,
                samples=stream))
            np.testing.assert_array_equal(got, ref)


def test_mega_diff_nonpath_falls_back_differentiably():
    """engine='mega_diff' + integrator='lambert' must route to the
    differentiable wavefront lambert_shade (the fused lambert kernel is
    forward-only): value matches engine='wavefront' and gradients flow.

    The scene is a triangle whose stored normal points WITH the view rays
    so the backface-only quirk hits AND LambertShade's t = dot(d, n) > 0
    (sphere hits give t = 0 — front-facing normals — so their albedo
    gradient is legitimately zero and would not exercise this)."""
    import dataclasses
    from cudaraytracer_tpu.core.camera import make_camera

    b = SceneBuilder()
    mat = b.materials.lambertian(color=(0.6, 0.3, 0.2))
    b.add_triangle((-2, -2, -3), (2, -2, -3), (0, 2.5, -3), mat,
                   normal=(0, 0, -1))
    scene = b.build()
    assert mk.megakernel_supported(scene)   # must exercise the mega branch
    cam = make_camera((0, 0, 1), (0, 0, -3), (0, 1, 0), 60.0, 2.0, 0.0, 4.0)
    cfg_w = _cfg(samples=1, max_depth=4, integrator="lambert")
    cfg_d = dataclasses.replace(cfg_w, engine="mega_diff")
    rays = cam_mod.generate_pixel_rays(cam, cfg_w.width, cfg_w.height,
                                       cfg_w.samples, jax.random.key(0))
    key = jax.random.key(4)

    def loss(albedo, cfg):
        s = scene._replace(textures=scene.textures._replace(color0=albedo))
        return jnp.mean(integ.integrate(s, rays, key, cfg))

    v_w, g_w = jax.value_and_grad(loss)(scene.textures.color0, cfg_w)
    v_d, g_d = jax.value_and_grad(loss)(scene.textures.color0, cfg_d)
    np.testing.assert_allclose(float(v_d), float(v_w), rtol=1e-6)
    assert np.abs(np.asarray(g_d)).max() > 0
    np.testing.assert_allclose(np.asarray(g_d), np.asarray(g_w), rtol=1e-5)


def test_mega_diff_honors_prebuilt_tables():
    """Prebuilt MegaTables passed as aux reach the mega_diff forward (they
    were silently dropped before); value and gradients are unchanged
    (tables are just a packing of the same scene)."""
    scene, cam = presets.three_spheres(aspect=2.0)
    cfg = _cfg(samples=1, max_depth=4)
    import dataclasses
    cfg = dataclasses.replace(cfg, engine="mega_diff")
    rays = cam_mod.generate_pixel_rays(cam, cfg.width, cfg.height,
                                       cfg.samples, jax.random.key(0))
    key = jax.random.key(4)
    order = mk.mega_sphere_order(scene.spheres.center)

    def loss(centers, aux):
        s = scene._replace(spheres=scene.spheres._replace(center=centers))
        t = (mk.build_mega_tables(s, sph_order=order)
             if aux else None)
        return jnp.mean(integ.integrate(s, rays, key, cfg, aux=t))

    v0, g0 = jax.value_and_grad(loss)(scene.spheres.center, False)
    v1, g1 = jax.value_and_grad(loss)(scene.spheres.center, True)
    np.testing.assert_allclose(float(v1), float(v0), rtol=1e-5)
    assert np.abs(np.asarray(g0)).max() > 0
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0), rtol=1e-4,
                               atol=1e-6)


def test_fuzz_mega_matches_wavefront_random_scenes():
    """Randomized gate: random sphere+triangle+rect scenes with all four
    materials, one injected sample stream, both quirk profiles — the fused
    megakernel and the wavefront integrator must produce the same image to
    f32 tolerance (rare winner flips on near-ties excepted)."""
    rng = np.random.default_rng(11)
    for scene_i in range(2):
        b = SceneBuilder()
        mats = [b.materials.lambertian(color=tuple(rng.uniform(0.2, 0.9, 3))),
                b.materials.metal(tuple(rng.uniform(0.5, 1.0, 3)),
                                  float(rng.uniform(0, 0.3))),
                b.materials.dielectric(1.5),
                b.materials.diffuse_light(color=(3.0, 3.0, 3.0))]
        for k in range(6):
            b.add_sphere(rng.uniform(-3, 3, 3) - [0, 0, 5],
                         float(rng.uniform(0.3, 1.0)), mats[k % 4])
        for k in range(10):
            v0 = rng.uniform(-3, 3, 3) - [0, 0, 5]
            v1 = v0 + rng.uniform(-1.5, 1.5, 3)
            v2 = v0 + rng.uniform(-1.5, 1.5, 3)
            n = np.cross(v1 - v0, v2 - v0)
            n /= max(np.linalg.norm(n), 1e-12)
            b.add_triangle(v0, v1, v2, mats[k % 3], normal=n)
        b.add_rect(mats[3], position=(0, 4.0, -5), rotation=(90, 0, 0),
                   scale=(3, 3, 1))
        scene = b.build()
        assert mk.megakernel_supported(scene)

        n_rays = 1024
        o = np.tile(np.array([[0, 0.5, 2.0]], np.float32), (n_rays, 1))
        d = np.stack([rng.uniform(-0.8, 0.8, n_rays),
                      rng.uniform(-0.6, 0.8, n_rays),
                      -np.ones(n_rays)], 1).astype(np.float32)
        from cudaraytracer_tpu.core.rays import make_rays
        rays = make_rays(jnp.asarray(o), jnp.asarray(d))
        stream = integ.stream_from_key(jax.random.key(3), n_rays, 6)
        for quirks in (Quirks.reference(), Quirks.fixed()):
            cfg = _cfg(samples=1, max_depth=6, quirks=quirks)
            ref, wref = integ.trace_path(scene, rays, jax.random.key(3),
                                         cfg, samples=stream,
                                         return_winners=True)
            ref = np.asarray(ref)
            got, wmega = mk.trace_path_mega(scene, rays, jax.random.key(3),
                                            cfg, samples=stream,
                                            want_winners=True)
            got = np.asarray(got)
            assert ref.mean() > 0.01
            dmax = np.abs(got - ref).max(axis=1)
            n_bad = int((dmax > 1e-3).sum())
            assert n_bad <= max(2, n_rays // 200), (
                scene_i, str(quirks), n_bad, float(dmax.max()))
            # recorded winners agree too (same near-tie budget: one flipped
            # bounce diverges that ray's remaining recording)
            mism = float((np.asarray(wref) != np.asarray(wmega)).mean())
            assert mism <= 0.005, (scene_i, str(quirks), mism)


def test_mega_streaming_large_sphere_field():
    """> MAX_VMEM_PRIMS spheres: the sphere table stays in HBM and streams
    through VMEM scratch by in-kernel DMA with per-segment culling (round
    4 — parity with triangle streaming; the reference's sphere scenes are
    bounded only by device heap, createScene.h:31-38).  Results must match
    the jnp brute-force path."""
    from cudaraytracer_tpu.core.rays import make_rays

    rng = np.random.default_rng(3)
    nx, nz = 96, 96                      # 9216 spheres > 8192
    xs = np.linspace(-12, 12, nx)
    zs = np.linspace(-24, -2, nz)
    X, Z = np.meshgrid(xs, zs)
    Y = 0.25 * np.sin(X * 0.9) * np.cos(Z * 0.7)
    centers = np.stack([X.ravel(), Y.ravel(), Z.ravel()], 1).astype(
        np.float32)
    b = SceneBuilder()
    m = b.materials
    mats = [m.lambertian(color=(0.7, 0.3, 0.3)),
            m.metal((0.9, 0.9, 0.9), 0.05),
            m.lambertian(m.textures.checker((0.9, 0.9, 0.9),
                                            (0.1, 0.1, 0.1)))]
    for i, c in enumerate(centers):
        b.add_sphere(c, 0.11, mats[i % 3])
    scene = b.build()
    assert scene.n_spheres > mk.MAX_VMEM_PRIMS
    assert mk.megakernel_supported(scene)

    nr = 512
    o = np.tile(np.array([[0, 3.0, 2.0]], np.float32), (nr, 1))
    d = np.stack([rng.uniform(-0.8, 0.8, nr), -np.ones(nr),
                  rng.uniform(-2.0, -0.5, nr)], 1).astype(np.float32)
    rays = make_rays(jnp.asarray(o), jnp.asarray(d))
    cfg = _cfg(width=16, height=32, samples=1, max_depth=4)
    stream = integ.stream_from_key(jax.random.key(5), nr, cfg.max_depth)
    ref = np.asarray(integ.trace_path(scene, rays, jax.random.key(5), cfg,
                                      samples=stream))
    tables = mk.build_mega_tables(scene,
                                  sph_order=mk.mega_sphere_order(
                                      scene.spheres.center))
    assert tables.sph.shape[0] % mk.SEG_T == 0
    got = np.asarray(mk.trace_path_mega(scene, rays, jax.random.key(5), cfg,
                                        tables=tables, samples=stream))
    assert ref.mean() > 0.01      # rays actually hit the field
    np.testing.assert_allclose(got, ref, atol=3e-4, rtol=1e-4)
