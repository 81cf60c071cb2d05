"""Replay backward (engine='mega_diff' + cfg.mega_replay_bwd) tests.

The megakernel forward records each bounce's winning primitive id
(trace_path_mega want_winners); the custom VJP then differentiates a REPLAY
of the bounce loop that gathers only those winners
(ops/intersect.replay_hits) instead of re-sweeping every primitive.  These
tests pin the three legs: the replay reproduces the recording render, the
kernel's recorded winners equal the wavefront's, and gradients through the
replay equal the full wavefront gradients.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from cudaraytracer_tpu.config import Quirks, RenderConfig
from cudaraytracer_tpu.models.scene import SceneBuilder
from cudaraytracer_tpu.ops import integrators as integ
from cudaraytracer_tpu.ops import megakernel as mk
from cudaraytracer_tpu.ops.pallas_intersect import morton_order

from test_megakernel import _cfg, _mixed_scene, _rays


def _orders(scene):
    tri = morton_order(np.asarray(scene.triangles.v0),
                       np.asarray(scene.triangles.v1),
                       np.asarray(scene.triangles.v2))
    sph = mk.mega_sphere_order(scene.spheres.center)
    return tri, sph


def test_wavefront_replay_reproduces_recording():
    """trace_path(return_winners) -> trace_path(winners=...) is the identity
    on the radiance (same continuous math, just gathered instead of swept)
    under both quirk profiles."""
    sc = _mixed_scene()
    scene, _ = sc
    for quirks in (Quirks.reference(), Quirks.fixed()):
        cfg = _cfg(quirks=quirks)
        rays = _rays(sc, cfg, jax.random.key(3))
        n = rays.origin.shape[0]
        stream = integ.stream_from_key(jax.random.key(9), n, cfg.max_depth)
        ref, winners = integ.trace_path(scene, rays, jax.random.key(9), cfg,
                                        samples=stream, return_winners=True)
        assert winners.shape == (cfg.max_depth + 1, n)
        assert winners.dtype == jnp.int32
        # dead/miss lanes record -1; every recorded id is in range
        w = np.asarray(winners)
        n_prims = scene.n_spheres + scene.n_triangles + scene.n_rects
        assert w.min() >= -1 and w.max() < n_prims
        assert (w == -1).any()          # sky rays exist in this framing
        replay = integ.trace_path(scene, rays, jax.random.key(9), cfg,
                                  samples=stream, winners=winners)
        np.testing.assert_allclose(np.asarray(replay), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)


def test_mega_recorded_winners_match_wavefront():
    """The kernel's winner ids — through the Morton table permutations and
    padding of BOTH prim types plus in-kernel rects — land in the exact
    Hits.prim index space the wavefront records."""
    sc = _mixed_scene()
    scene, _ = sc
    tri_order, sph_order = _orders(scene)
    for quirks in (Quirks.reference(), Quirks.fixed()):
        cfg = _cfg(quirks=quirks)
        rays = _rays(sc, cfg, jax.random.key(3))
        n = rays.origin.shape[0]
        stream = integ.stream_from_key(jax.random.key(9), n, cfg.max_depth)
        ref, wref = integ.trace_path(scene, rays, jax.random.key(9), cfg,
                                     samples=stream, return_winners=True)
        tables = mk.build_mega_tables(scene, tri_order=tri_order,
                                      sph_order=sph_order)
        got, wmega = mk.trace_path_mega(scene, rays, jax.random.key(9), cfg,
                                        tables=tables, samples=stream,
                                        want_winners=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-4, rtol=1e-4)
        np.testing.assert_array_equal(np.asarray(wmega), np.asarray(wref))


def test_mega_winners_rect_scene():
    """Rect winners come back as scene rect indices (offset past spheres and
    triangles), not raw in-kernel rect slots."""
    b = SceneBuilder()
    m = b.materials
    b.add_sphere((0, -100.5, -3), 100.0, m.lambertian(color=(0.5, 0.5, 0.5)))
    b.add_rect(m.lambertian(color=(0.8, 0.2, 0.2)),
               position=(0.0, 0.5, -3.0), scale=(2.0, 2.0, 1.0))
    scene = b.build()
    from cudaraytracer_tpu.core import camera as cam_mod
    cam = cam_mod.make_camera((0, 0.5, 2), (0, 0.5, -3), vfov=40, aspect=2.0,
                              focus_dist=5.0)
    cfg = _cfg(max_depth=3)
    rays = cam_mod.generate_pixel_rays(cam, cfg.width, cfg.height,
                                       cfg.samples, jax.random.key(0))
    n = rays.origin.shape[0]
    stream = integ.stream_from_key(jax.random.key(2), n, cfg.max_depth)
    _, wref = integ.trace_path(scene, rays, jax.random.key(2), cfg,
                               samples=stream, return_winners=True)
    _, wmega = mk.trace_path_mega(scene, rays, jax.random.key(2), cfg,
                                  samples=stream, want_winners=True)
    np.testing.assert_array_equal(np.asarray(wmega), np.asarray(wref))
    # the rect's scene id (n_spheres + n_triangles) is actually recorded
    assert (np.asarray(wmega) == scene.n_spheres + scene.n_triangles).any()


def test_mega_winners_streamed_scene():
    """Winner recording through the HBM-streaming path: per-segment DMA ids
    are still global table rows, so the scene remap holds above
    MAX_VMEM_PRIMS."""
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
    nrm[nrm[:, 1] > 0] *= -1.0
    for t, nn in zip(tris, nrm):
        b.add_triangle(t[0], t[1], t[2], mat, normal=nn)
    scene = b.build()
    assert scene.n_triangles > mk.MAX_VMEM_PRIMS

    rng = np.random.default_rng(0)
    nr = 256
    o = np.tile(np.array([[0, 4.0, 2.0]], np.float32), (nr, 1))
    d = np.stack([rng.uniform(-0.6, 0.6, nr), -np.ones(nr),
                  rng.uniform(-1.6, -0.4, nr)], 1).astype(np.float32)
    rays = make_rays(jnp.asarray(o), jnp.asarray(d))
    cfg = _cfg(width=16, height=16, samples=1, max_depth=3)
    stream = integ.stream_from_key(jax.random.key(5), nr, cfg.max_depth)
    _, wref = integ.trace_path(scene, rays, jax.random.key(5), cfg,
                               samples=stream, return_winners=True)
    order = morton_order(np.asarray(scene.triangles.v0),
                         np.asarray(scene.triangles.v1),
                         np.asarray(scene.triangles.v2))
    tables = mk.build_mega_tables(scene, tri_order=order)
    _, wmega = mk.trace_path_mega(scene, rays, jax.random.key(5), cfg,
                                  tables=tables, samples=stream,
                                  want_winners=True)
    assert (np.asarray(wref) >= 0).any()
    np.testing.assert_array_equal(np.asarray(wmega), np.asarray(wref))


def test_replay_gradients_match_full_wavefront():
    """grad through mega_diff with the replay backward == grad through the
    full wavefront sweeps (same stream), for material AND geometry
    parameters, under both quirk profiles."""
    sc = _mixed_scene()
    scene, _ = sc
    tri_order, sph_order = _orders(scene)
    for quirks in (Quirks.reference(), Quirks.fixed()):
        cfg = _cfg(quirks=quirks, max_depth=6)
        rays = _rays(sc, cfg, jax.random.key(3))
        n = rays.origin.shape[0]
        stream = integ.stream_from_key(jax.random.key(9), n, cfg.max_depth)
        wts = jax.random.uniform(jax.random.key(1), (n, 3))

        def run(engine_fn, params):
            s = scene._replace(
                spheres=scene.spheres._replace(center=params["centers"],
                                               radius=params["radius"]),
                triangles=scene.triangles._replace(v0=params["v0"]),
                textures=scene.textures._replace(color0=params["albedo"]))
            return jnp.sum(engine_fn(s) * wts)

        def wavefront(s):
            return integ.trace_path(s, rays, jax.random.key(9), cfg,
                                    samples=stream)

        def mega(s):
            return mk.trace_path_mega_diff(
                s, rays, jax.random.key(9), cfg, samples=stream,
                tables=mk.build_mega_tables(s, tri_order=tri_order,
                                            sph_order=sph_order))

        params = {"centers": scene.spheres.center,
                  "radius": scene.spheres.radius,
                  "v0": scene.triangles.v0,
                  "albedo": scene.textures.color0}
        v_w, g_w = jax.value_and_grad(
            lambda p: run(wavefront, p))(params)
        v_m, g_m = jax.value_and_grad(lambda p: run(mega, p))(params)
        np.testing.assert_allclose(float(v_m), float(v_w), rtol=1e-4)
        for k in params:
            gw, gm = np.asarray(g_w[k]), np.asarray(g_m[k])
            if k == "v0" and quirks.triangle_no_t_clip:
                # structurally ZERO under reference quirks: triangle-
                # scattered rays self-hit their own triangle at t ~ 0
                # (triangle.h:92-94 no-t-clip) until depth exhaustion, so
                # every triangle path ends in the constant ambient and the
                # stored-normal/const-texture chain detaches the vertices.
                # Both engines must agree on that zero.
                np.testing.assert_array_equal(gw, 0.0)
                np.testing.assert_array_equal(gm, 0.0)
                continue
            assert np.abs(gw).max() > 0, k
            scale = np.abs(gw).max()
            np.testing.assert_allclose(gm / scale, gw / scale,
                                       atol=2e-4, err_msg=k)


def test_replay_flag_off_restores_full_backward():
    """cfg.mega_replay_bwd=False re-runs the full wavefront backward — same
    gradients, so the flag is a pure performance switch."""
    sc = _mixed_scene()
    scene, _ = sc
    cfg = _cfg(max_depth=4)
    cfg_off = dataclasses.replace(cfg, mega_replay_bwd=False)
    rays = _rays(sc, cfg, jax.random.key(3))
    n = rays.origin.shape[0]
    stream = integ.stream_from_key(jax.random.key(9), n, cfg.max_depth)

    def loss(c, cfg_):
        s = scene._replace(spheres=scene.spheres._replace(center=c))
        return jnp.mean(mk.trace_path_mega_diff(s, rays, jax.random.key(9),
                                                cfg_, samples=stream))

    c0 = scene.spheres.center
    g_on = jax.grad(lambda c: loss(c, cfg))(c0)
    g_off = jax.grad(lambda c: loss(c, cfg_off))(c0)
    np.testing.assert_allclose(np.asarray(g_on), np.asarray(g_off),
                               rtol=1e-4, atol=1e-7)


def test_replay_distributed_fit_step_matches_wavefront():
    """engine='mega_diff' (replay backward) inside the sharded fit step —
    shard_map over ('dp','tp') with the PER-BOUNCE overlapped gradient
    all-reduce (cfg.grad_sync_axes rides the replay's bounce scan too) —
    produces the same loss and updated params as the wavefront engine."""
    import cudaraytracer_tpu as crt
    from cudaraytracer_tpu.models import presets
    from cudaraytracer_tpu.ops.render import render_image
    from cudaraytracer_tpu.parallel.mesh import make_mesh
    from cudaraytracer_tpu.parallel.train import make_fit_step

    scene, cam = presets.three_spheres(aspect=2.0)
    cfg_w = crt.RenderConfig(width=32, height=16, samples=1, max_depth=4,
                             integrator="path", gamma=False,
                             ray_chunk=1 << 20)
    cfg_m = dataclasses.replace(cfg_w, engine="mega_diff")
    mesh = make_mesh(8, tp=2)
    params = {"centers": scene.spheres.center,
              "albedo": scene.textures.color0}
    target = jnp.asarray(np.asarray(
        render_image(scene, cam, jax.random.key(9), cfg_w)).reshape(-1, 3))
    step_w = make_fit_step(scene, cam, cfg_w, mesh, lr=0.1)
    step_m = make_fit_step(scene, cam, cfg_m, mesh, lr=0.1)
    lw, pw = step_w(params, target, jax.random.key(3))
    lm, pm = step_m(params, target, jax.random.key(3))
    np.testing.assert_allclose(float(lm), float(lw), rtol=1e-4)
    for k in params:
        np.testing.assert_allclose(np.asarray(pm[k]), np.asarray(pw[k]),
                                   rtol=1e-3, atol=1e-6, err_msg=k)


def _trs_scene():
    """Static sphere + rect + runtime-TRS sphere AND triangle (all four
    winner classes the TRS-aware replay must cover)."""
    b = SceneBuilder()
    m = b.materials
    b.add_sphere((0, -100.5, -3), 100.0, m.lambertian(color=(.6, .6, .6)))
    b.add_sphere((-1.2, 0, -3), 0.5, m.metal((0.8, 0.7, 0.3), fuzz=0.1))
    b.add_sphere((0, 0.1, -3), 0.6, m.lambertian(color=(0.2, 0.4, 0.8)),
                 rotation=(0, 30, 0), scale=(1.0, 1.5, 1.0))
    # checker albedo: attenuation = checker(rec.p) gives the TRS triangle a
    # DIRECT gradient path v0 -> t -> p (with a constant color, v0 grads can
    # be legitimately zero when the continuation ray misses).  The vertices
    # are tilted OFF the object z=0 plane: on it, sin(10 * pz) sits exactly
    # on a checker boundary and kernel-vs-jnp fp noise flips lanes.
    b.add_triangle((-1.0, -0.5, 0.31), (1.0, -0.5, 0.37), (0, 0.9, 0.44),
                   m.lambertian(m.textures.checker((.9, .3, .2), (.1, .6, .8))),
                   position=(1.4, 0.2, -3.4), rotation=(0, -25, 10))
    b.add_rect(m.diffuse_light(color=(3, 3, 3)), position=(0, 1.8, -3),
               rotation=(90, 0, 0), scale=(2, 2, 1))
    scene = b.build()
    from cudaraytracer_tpu.core import camera as cam_mod
    cam = cam_mod.make_camera((0, 0.4, 1.5), (0, 0.2, -3), vfov=50,
                              aspect=2.0, focus_dist=4.5)
    return scene, cam


def test_mega_winners_and_replay_trs_scene():
    """TRS sweeps record winners in the extended scene index space
    ([... | t_spheres | t_triangles]); the replay reproduces the recording
    radiance through replay_hits' TransformRay'd t recompute."""
    sc = _trs_scene()
    scene, _ = sc
    assert scene.n_t_spheres == 1 and scene.n_t_triangles == 1
    for quirks in (Quirks.reference(), Quirks.fixed()):
        cfg = _cfg(quirks=quirks)
        rays = _rays(sc, cfg, jax.random.key(3))
        n = rays.origin.shape[0]
        stream = integ.stream_from_key(jax.random.key(9), n, cfg.max_depth)
        ref, wref = integ.trace_path(scene, rays, jax.random.key(9), cfg,
                                     samples=stream, return_winners=True)
        got, wmega = mk.trace_path_mega(scene, rays, jax.random.key(9), cfg,
                                        samples=stream, want_winners=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-4, rtol=1e-4)
        np.testing.assert_array_equal(np.asarray(wmega), np.asarray(wref))
        base = scene.n_spheres + scene.n_triangles + scene.n_rects
        w = np.asarray(wref)
        assert (w == base).any(), "TRS sphere never won a bounce"
        assert (w == base + 1).any(), "TRS triangle never won a bounce"
        replay = integ.trace_path(scene, rays, jax.random.key(9), cfg,
                                  samples=stream, winners=wref)
        np.testing.assert_allclose(np.asarray(replay), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)


def test_mega_diff_trs_gradients_match_wavefront():
    """engine='mega_diff' (replay backward) now covers runtime-TRS scenes:
    gradients wrt TRS position/radius and object-space vertices equal the
    wavefront VJP."""
    sc = _trs_scene()
    scene, _ = sc
    cfg = _cfg(width=32, height=16, samples=1, max_depth=4)
    rays = _rays(sc, cfg, jax.random.key(5))
    n = rays.origin.shape[0]
    stream = integ.stream_from_key(jax.random.key(8), n, cfg.max_depth)
    target = jnp.zeros((n, 3), jnp.float32)

    def build(pos, rad, tv0):
        return scene._replace(
            t_spheres=scene.t_spheres._replace(
                trs=scene.t_spheres.trs._replace(position=pos), radius=rad),
            t_triangles=scene.t_triangles._replace(v0=tv0))

    def loss_wave(pos, rad, tv0):
        img = integ.trace_path(build(pos, rad, tv0), rays, jax.random.key(8),
                               cfg, samples=stream)
        return jnp.mean((img - target) ** 2)

    def loss_mega(pos, rad, tv0):
        img = mk.trace_path_mega_diff(build(pos, rad, tv0), rays,
                                      jax.random.key(8), cfg, samples=stream)
        return jnp.mean((img - target) ** 2)

    args = (scene.t_spheres.trs.position, scene.t_spheres.radius,
            scene.t_triangles.v0)
    g_ref = jax.grad(loss_wave, argnums=(0, 1, 2))(*args)
    g_got = jax.grad(loss_mega, argnums=(0, 1, 2))(*args)
    for a, b_ in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_got)):
        a, b_ = np.asarray(a), np.asarray(b_)
        assert np.isfinite(a).all() and np.isfinite(b_).all()
        scale = max(np.abs(a).max(), 1e-6)
        np.testing.assert_allclose(b_, a, atol=3e-4 * scale, rtol=2e-3)
        assert np.abs(a).max() > 0.0
