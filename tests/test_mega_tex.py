"""Deferred texturing (trace_path_mega_tex) — image-texture scenes through
the fused megakernel.

Texture values never affect path structure (scatter directions and
continue/absorb events are texture-independent in all four reference
materials), so the fused kernel runs with a placeholder albedo, DUMPS
per-bounce winner/term/hit-point planes (want_tex), and a light XLA pass
multiplies the image-texel factors back in.  These tests pin (a) value
parity with the wavefront integrator on image-textured scenes under both
quirk profiles, (b) that the engine router sends such scenes to the fused
path for both 'mega' and 'mega_diff', (c) gradient parity with the
wavefront VJP (trace_path_mega_tex_diff pairs the want_tex forward with
the replay backward), and (d) the no-image bookkeeping identity
(reconstruction == in-kernel accumulation).
"""

import jax
import jax.numpy as jnp
import numpy as np

from cudaraytracer_tpu.config import Quirks
from cudaraytracer_tpu.core import camera as cam_mod
from cudaraytracer_tpu.models.scene import SceneBuilder
from cudaraytracer_tpu.ops import integrators as integ
from cudaraytracer_tpu.ops import megakernel as mk

from test_megakernel import _cfg


def _image_scene():
    """Image-textured lambert sphere + image-textured diffuse-light rect
    (real uv-dependent emission, texture.h:65-76) + every other material."""
    b = SceneBuilder()
    m = b.materials
    rng = np.random.default_rng(7)
    img_lam = rng.integers(0, 256, (8, 6, 3), dtype=np.uint8)
    img_emit = rng.integers(64, 256, (5, 9, 3), dtype=np.uint8)
    t_lam = m.textures.image(img_lam)
    t_emit = m.textures.image(img_emit)
    b.add_sphere((0, -100.5, -3), 100.0,
                 m.lambertian(m.textures.checker((.8, .8, .8), (.2, .2, .2))))
    b.add_sphere((-1.1, 0, -3), 0.5, m.lambertian(tex_id=t_lam))
    b.add_sphere((1.1, 0, -3), 0.5, m.metal((0.8, 0.7, 0.3), fuzz=0.15))
    b.add_sphere((0, 0, -2.4), 0.35, m.dielectric(1.5))
    # image-textured light, directly visible: emission samples the image at
    # the rect's REAL (u, v), unlike lambertian attenuation (material.h:63
    # samples at (0,0)), so a uv-plumbing bug would break this scene
    b.add_rect(m.diffuse_light(tex_id=t_emit), position=(0, 1.6, -3.2),
               rotation=(60, 0, 0), scale=(2.0, 1.2, 1.0))
    scene = b.build()
    cam = cam_mod.make_camera((0, 0.5, 2), (0, 0.3, -3), vfov=50, aspect=2.0,
                              focus_dist=5.0)
    return scene, cam


def _rays(cam, cfg, key):
    return cam_mod.generate_pixel_rays(cam, cfg.width, cfg.height,
                                       cfg.samples, key)


def test_mega_tex_matches_wavefront_both_quirks():
    scene, cam = _image_scene()
    assert not mk.megakernel_supported(scene)
    assert mk.mega_tex_supported(scene)
    for quirks in (Quirks.reference(), Quirks.fixed()):
        cfg = _cfg(quirks=quirks)
        rays = _rays(cam, cfg, jax.random.key(3))
        n = rays.origin.shape[0]
        stream = integ.stream_from_key(jax.random.key(9), n, cfg.max_depth)
        ref = integ.trace_path(scene, rays, jax.random.key(9), cfg,
                               samples=stream)
        got = mk.trace_path_mega_tex(scene, rays, jax.random.key(9), cfg,
                                     samples=stream)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-4, rtol=1e-4)
        # the image light must actually shine with uv-varying emission:
        # direct-hit lanes of the rect should show more than one texel color
        assert np.asarray(ref).max() > 0.3


def test_mega_tex_key_only_matches_wavefront():
    """Without an injected stream, trace_path_mega_tex derives the wavefront
    integrator's exact internal draws from `key`, so key-only calls agree."""
    scene, cam = _image_scene()
    cfg = _cfg()
    rays = _rays(cam, cfg, jax.random.key(1))
    ref = integ.trace_path(scene, rays, jax.random.key(4), cfg)
    got = mk.trace_path_mega_tex(scene, rays, jax.random.key(4), cfg)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-4, rtol=1e-4)


def test_integrate_routes_image_scenes_to_mega_tex(monkeypatch):
    """engine='mega' and engine='mega_diff' both route image scenes through
    trace_path_mega_tex (not the wavefront fallback)."""
    scene, cam = _image_scene()
    calls = []
    real = mk.trace_path_mega_tex

    def spy(*a, **k):
        calls.append(1)
        return real(*a, **k)

    monkeypatch.setattr(mk, "trace_path_mega_tex", spy)
    cfg = _cfg()
    rays = _rays(cam, cfg, jax.random.key(1))
    ref = integ.trace_path(scene, rays, jax.random.key(2), cfg)
    for engine in ("mega", "mega_diff"):
        cfg_e = _cfg(engine=engine)
        got = integ.integrate(scene, rays, jax.random.key(2), cfg_e)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-4, rtol=1e-4)
    assert len(calls) == 2


def test_mega_tex_gradients_match_wavefront():
    """Gradients through trace_path_mega_tex_diff (want_tex forward +
    replay backward) equal the full wavefront VJP for material and geometry
    parameters of an image-textured scene."""
    scene, cam = _image_scene()
    cfg = _cfg(width=32, height=16, samples=1, max_depth=4)
    rays = _rays(cam, cfg, jax.random.key(5))
    n = rays.origin.shape[0]
    stream = integ.stream_from_key(jax.random.key(8), n, cfg.max_depth)
    target = jnp.zeros((n, 3), jnp.float32)

    def loss_wave(centers, c0):
        sc = scene._replace(
            spheres=scene.spheres._replace(center=centers),
            textures=scene.textures._replace(color0=c0))
        img = integ.trace_path(sc, rays, jax.random.key(8), cfg,
                               samples=stream)
        return jnp.mean((img - target) ** 2)

    def loss_tex(centers, c0):
        sc = scene._replace(
            spheres=scene.spheres._replace(center=centers),
            textures=scene.textures._replace(color0=c0))
        img = mk.trace_path_mega_tex_diff(sc, rays, jax.random.key(8), cfg,
                                          samples=stream)
        return jnp.mean((img - target) ** 2)

    args = (scene.spheres.center, scene.textures.color0)
    g_ref = jax.grad(loss_wave, argnums=(0, 1))(*args)
    g_got = jax.grad(loss_tex, argnums=(0, 1))(*args)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_got)):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(a).max(), 1e-6)
        np.testing.assert_allclose(b, a, atol=3e-4 * scale, rtol=2e-3)
        assert np.abs(a).max() > 0.0   # gradients actually flow


def test_mega_tex_trs_scene():
    """Runtime-TRS + image-texture scenes render fused too: the TRS sweeps
    record winners, replay_hits recomputes their TransformRay'd t, and the
    deferred replay applies the image texture."""
    b = SceneBuilder()
    m = b.materials
    tex = m.textures.image(np.arange(48, dtype=np.uint8).reshape(4, 4, 3))
    b.add_sphere((0, -100.5, -3), 100.0, m.lambertian(color=(.6, .6, .6)))
    b.add_sphere((0, 0, -3), 1.0, m.lambertian(tex_id=tex),
                 rotation=(0, 30, 0), scale=(1.0, 1.4, 1.0))
    b.add_triangle((-1.2, -0.5, 0), (1.2, -0.5, 0), (0, 1.0, 0),
                   m.lambertian(color=(0.8, 0.3, 0.2)),
                   position=(1.6, 0.2, -3.5), rotation=(0, -25, 0))
    scene = b.build()
    assert scene.n_t_spheres == 1 and scene.n_t_triangles == 1
    assert mk.mega_tex_supported(scene)
    cam = cam_mod.make_camera((0, 0, 1), (0, 0, -3), vfov=50, aspect=2.0,
                              focus_dist=4.0)
    cfg = _cfg()
    rays = _rays(cam, cfg, jax.random.key(0))
    ref = integ.trace_path(scene, rays, jax.random.key(1), cfg)
    got = integ.integrate(scene, rays, jax.random.key(1),
                          _cfg(engine="mega"))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-4, rtol=1e-4)


def test_lambertian_zero_uv_quirk():
    """material.h:67 samples lambertian textures at u = v = 0 (reference) —
    an image-textured lambertian is EXACTLY a constant-textured one of the
    (0,0) texel (i = 0, j = ny-1 after the (1-v)*ny-0.001 flip).
    Quirks.fixed() samples the real (u, v) and the renders must differ."""
    img = np.arange(48, dtype=np.uint8).reshape(4, 4, 3)
    texel00 = img[3, 0].astype(np.float32) / 255.0   # u=v=0 -> (i=0, j=ny-1)

    def build(use_image):
        b = SceneBuilder()
        m = b.materials
        if use_image:
            mat = m.lambertian(tex_id=m.textures.image(img))
        else:
            mat = m.lambertian(color=tuple(texel00))
            m.textures.image(img)   # keep texture-table shapes identical
        b.add_sphere((0, -100.5, -3), 100.0, m.lambertian(color=(.6, .6, .6)))
        b.add_sphere((0, 0, -3), 1.0, mat)
        return b.build()

    cam = cam_mod.make_camera((0, 0, 1), (0, 0, -3), vfov=50, aspect=2.0,
                              focus_dist=4.0)
    cfg_ref = _cfg(samples=2, max_depth=3)
    cfg_fix = _cfg(samples=2, max_depth=3, quirks=Quirks.fixed())
    rays = _rays(cam, cfg_ref, jax.random.key(2))
    n = rays.origin.shape[0]
    stream = integ.stream_from_key(jax.random.key(3), n, cfg_ref.max_depth)
    img_i = np.asarray(integ.trace_path(build(True), rays, jax.random.key(3),
                                        cfg_ref, samples=stream))
    img_c = np.asarray(integ.trace_path(build(False), rays, jax.random.key(3),
                                        cfg_ref, samples=stream))
    np.testing.assert_allclose(img_i, img_c, atol=1e-6)
    fix_i = np.asarray(integ.trace_path(build(True), rays, jax.random.key(3),
                                        cfg_fix, samples=stream))
    fix_c = np.asarray(integ.trace_path(build(False), rays, jax.random.key(3),
                                        cfg_fix, samples=stream))
    assert np.abs(fix_i - fix_c).max() > 0.05   # real (u,v) sampling differs


def test_mega_tex_planes_match_plain_mega_without_images():
    """Bookkeeping identity: with no image textures every texture factor is
    1 and the deferred reconstruction L = sum_i (em_i + other_i) * 1 must
    equal the kernel's own in-kernel accumulation up to fp reassociation
    (the kernel computes thr*(em+amb+sky) fused; the planes split it)."""
    from test_megakernel import _mixed_scene, _rays as _mk_rays

    sc = _mixed_scene()
    scene, _ = sc
    for quirks in (Quirks.reference(), Quirks.fixed()):
        cfg = _cfg(quirks=quirks)
        rays = _mk_rays(sc, cfg, jax.random.key(3))
        n = rays.origin.shape[0]
        stream = integ.stream_from_key(jax.random.key(9), n, cfg.max_depth)
        plain = mk.trace_path_mega(scene, rays, jax.random.key(9), cfg,
                                   samples=stream)
        tex = mk.trace_path_mega_tex(scene, rays, jax.random.key(9), cfg,
                                     samples=stream)
        np.testing.assert_allclose(np.asarray(tex), np.asarray(plain),
                                   atol=2e-6, rtol=1e-5)


def test_fuzz_mega_tex_matches_wavefront_random_scenes():
    """Randomized gate for deferred texturing: random scenes mixing
    image-textured lambertians, an image-textured light, checker/constant
    materials, metal/dielectric, runtime-TRS prims, and rects — one
    injected stream, both quirk profiles; integrate(engine='mega') (routed
    to trace_path_mega_tex) must match the wavefront to f32 tolerance with
    a small near-tie/texel-boundary budget."""
    import dataclasses
    from cudaraytracer_tpu.core.rays import make_rays

    rng = np.random.default_rng(23)
    for scene_i in range(2):
        b = SceneBuilder()
        m = b.materials
        t_img1 = m.textures.image(rng.integers(0, 256, (7, 9, 3),
                                               dtype=np.uint8))
        t_img2 = m.textures.image(rng.integers(32, 256, (12, 5, 3),
                                               dtype=np.uint8))
        mats = [m.lambertian(tex_id=t_img1),
                m.lambertian(m.textures.checker((.8, .8, .8), (.2, .3, .2))),
                m.metal(tuple(rng.uniform(0.5, 1.0, 3)),
                        float(rng.uniform(0, 0.3))),
                m.dielectric(1.5),
                m.diffuse_light(tex_id=t_img2)]
        for k in range(6):
            b.add_sphere(rng.uniform(-3, 3, 3) - [0, 0, 5],
                         float(rng.uniform(0.3, 1.0)), mats[k % 4])
        for k in range(6):
            v0 = rng.uniform(-3, 3, 3) - [0, 0, 5]
            v1 = v0 + rng.uniform(-1.5, 1.5, 3)
            v2 = v0 + rng.uniform(-1.5, 1.5, 3)
            n = np.cross(v1 - v0, v2 - v0)
            n /= max(np.linalg.norm(n), 1e-12)
            b.add_triangle(v0, v1, v2, mats[k % 4], normal=n)
        # image-textured light rect + a runtime-TRS image sphere/triangle
        b.add_rect(mats[4], position=(0, 4.0, -5), rotation=(90, 0, 0),
                   scale=(3, 3, 1))
        b.add_sphere((0.5, 0.4, -4.0), 0.5, mats[0],
                     rotation=(0, 40, 0), scale=(1.0, 1.3, 1.0))
        b.add_triangle((-0.8, -0.4, 0.2), (0.8, -0.4, 0.25), (0, 0.7, 0.31),
                       mats[0], position=(-1.2, 0.3, -4.2),
                       rotation=(10, -30, 0))
        scene = b.build()
        assert not mk.megakernel_supported(scene)
        assert mk.mega_tex_supported(scene)

        n_rays = 1024
        o = np.tile(np.array([[0, 0.5, 2.0]], np.float32), (n_rays, 1))
        d = np.stack([rng.uniform(-0.8, 0.8, n_rays),
                      rng.uniform(-0.6, 0.8, n_rays),
                      -np.ones(n_rays)], 1).astype(np.float32)
        rays = make_rays(jnp.asarray(o), jnp.asarray(d))
        stream = integ.stream_from_key(jax.random.key(3), n_rays, 6)
        for quirks in (Quirks.reference(), Quirks.fixed()):
            cfg = _cfg(samples=1, max_depth=6, quirks=quirks,
                       engine="mega")
            ref = np.asarray(integ.trace_path(
                scene, rays, jax.random.key(3),
                dataclasses.replace(cfg, engine="wavefront"),
                samples=stream))
            got = np.asarray(integ.integrate(scene, rays, jax.random.key(3),
                                             cfg, samples=stream))
            assert ref.mean() > 0.01
            dmax = np.abs(got - ref).max(axis=1)
            # budget: winner near-ties + texel-boundary flips on the random
            # (noise) textures, both O(1) on a flipped lane
            n_bad = int((dmax > 1e-3).sum())
            assert n_bad <= max(4, n_rays // 100), (
                scene_i, str(quirks), n_bad, float(dmax.max()))


def test_tex_chunked_reconstruction_matches_unchunked(monkeypatch):
    """_deferred_texture_radiance's lax.map chunked path (n > _TEX_CHUNK):
    shrink the module chunk size so a small render crosses the boundary and
    exercises the pad + reassembly — results must match the unchunked form
    up to fp reassociation across the chunk boundary (ADVICE r3)."""
    scene, cam = _image_scene()
    cfg = _cfg(width=48, height=24, samples=2)   # 2304 lanes
    rays = _rays(cam, cfg, jax.random.key(2))
    n = rays.origin.shape[0]
    stream = integ.stream_from_key(jax.random.key(6), n, cfg.max_depth)
    ref = mk.trace_path_mega_tex(scene, rays, jax.random.key(6), cfg,
                                 samples=stream)
    # chunk size NOT a multiple of n: exercises the zero-pad tail too.
    # The multi-chunk path defaults to LANE COMPACTION (round 5), so this
    # also pins compacted == single-chunk.
    monkeypatch.setattr(mk, "_TEX_CHUNK", 1000)
    got = mk.trace_path_mega_tex(scene, rays, jax.random.key(6), cfg,
                                 samples=stream)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)


def test_tex_compact_reconstruction_matches_uncompacted(monkeypatch):
    """The round-5 compact path (per-(step, chunk) skip: per-step lax.cond
    inside each chunk + outer never-hit-chunk cond) must equal the plain
    chunked map EXACTLY: per-lane math is identical (reductions run along
    steps within a lane, in the same sequential order) and a no-hit cell
    reduces to acc + F * (em + other) with f = g = 1 identically.
    Checked on the want_tex planes directly so both forms see the same
    kernel output."""
    scene, cam = _image_scene()
    cfg = _cfg(width=48, height=24, samples=2)   # 2304 lanes
    rays = _rays(cam, cfg, jax.random.key(2))
    n = rays.origin.shape[0]
    stream = integ.stream_from_key(jax.random.key(6), n, cfg.max_depth)
    tables = mk.build_mega_tables(scene)
    flat = mk._mega_tex_planes(scene, rays, jax.random.key(6), cfg, tables,
                               stream, padded=True)
    monkeypatch.setattr(mk, "_TEX_CHUNK", 768)
    plain = mk._deferred_texture_radiance(scene, tables, flat,
                                          cfg.max_depth + 1, cfg.quirks,
                                          compact=False)
    comp = mk._deferred_texture_radiance(scene, tables, flat,
                                         cfg.max_depth + 1, cfg.quirks,
                                         compact=True)
    np.testing.assert_array_equal(np.asarray(comp), np.asarray(plain))

    # the per-STEP cheap branch must actually be exercised here: some hit
    # chunk has at least one no-hit step (alive decay), else this test
    # only covers the all-expensive and all-cheap extremes
    CH = 768
    steps = cfg.max_depth + 1
    npad = flat.shape[1]
    k = npad // CH
    w = np.asarray(flat[3:3 + 10 * steps].reshape(steps, 10, npad)
                   [:, 0, : k * CH].reshape(steps, k, CH))
    hit = (w >= 0.0).any(axis=2)                     # (steps, k)
    chunk_hit = hit.any(axis=0)
    assert chunk_hit.any() and (~hit[:, chunk_hit]).any(), (
        "fixture no longer exercises the per-step cheap branch")

    # ALL-MISS edge: rays straight up see only sky, so every chunk takes
    # the cheap sum(em + other) branch — must still equal the full body
    import dataclasses
    from cudaraytracer_tpu.core.rays import Rays
    up = Rays(rays.origin + jnp.asarray([0.0, 50.0, 0.0]),
              jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0]),
                               rays.direction.shape),
              rays.time)
    flat_m = mk._mega_tex_planes(scene, up, jax.random.key(6), cfg, tables,
                                 stream, padded=True)
    plain_m = mk._deferred_texture_radiance(scene, tables, flat_m,
                                            cfg.max_depth + 1, cfg.quirks,
                                            compact=False)
    comp_m = mk._deferred_texture_radiance(scene, tables, flat_m,
                                           cfg.max_depth + 1, cfg.quirks,
                                           compact=True)
    np.testing.assert_array_equal(np.asarray(comp_m), np.asarray(plain_m))
    # sanity: those lanes really did all miss (radiance == sky only)
    w = flat_m[3:3 + 10 * (cfg.max_depth + 1)].reshape(-1, 10,
                                                       flat_m.shape[1])
    assert float(jnp.max(w[:, 0])) < 0.0


def test_mega_tex_lambert_matches_wavefront_both_quirks():
    """Image-texture scenes under integrator='lambert' (the reference's
    ACTIVE integrator, render.h:119-120) render fused via the two
    pseudo-step deferred reconstruction — must match the wavefront
    lambert_shade.  Covers image-textured lambertians AND lights (whose
    att term, scatter's lam_att, also picks up the texel factor)."""
    import dataclasses
    scene, cam = _image_scene()
    for quirks in (Quirks.reference(), Quirks.fixed()):
        cfg = _cfg(quirks=quirks, integrator="lambert")
        rays = _rays(cam, cfg, jax.random.key(3))
        ref = integ.lambert_shade(scene, rays, jax.random.key(9), cfg)
        got = mk.trace_path_mega_tex(scene, rays, jax.random.key(9), cfg)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-4, rtol=1e-4)
        # engine routing: integrate() must pick the fused path
        mcfg = dataclasses.replace(cfg, engine="mega")
        via_router = integ.integrate(scene, rays, jax.random.key(9), mcfg)
        np.testing.assert_allclose(np.asarray(via_router), np.asarray(ref),
                                   atol=2e-4, rtol=1e-4)


def test_mega_normal_image_scene_matches_wavefront():
    """integrator='normal' never reads textures, so image-texture scenes
    run the PLAIN fused kernel (no deferred pass) — must match the
    wavefront shade_normal, and integrate() must route there."""
    import dataclasses
    scene, cam = _image_scene()
    cfg = _cfg(integrator="normal")
    rays = _rays(cam, cfg, jax.random.key(5))
    ref = integ.shade_normal(scene, rays, jax.random.key(2), cfg)
    mcfg = dataclasses.replace(cfg, engine="mega")
    got = integ.integrate(scene, rays, jax.random.key(2), mcfg)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-4, rtol=1e-4)
