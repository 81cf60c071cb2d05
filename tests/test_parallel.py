"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import cudaraytracer_tpu as crt
from cudaraytracer_tpu.models import presets
from cudaraytracer_tpu.ops.render import render_image
from cudaraytracer_tpu.parallel.mesh import make_mesh, pad_to_multiple
from cudaraytracer_tpu.parallel.render import render_image_sharded
from cudaraytracer_tpu.parallel.train import (apply_sphere_params,
                                              make_fit_step)


def _cfg(**kw):
    base = dict(width=32, height=16, samples=1, max_depth=3,
                integrator="normal", ray_chunk=1 << 20)
    base.update(kw)
    return crt.RenderConfig(**base)


def test_mesh_shapes():
    m = make_mesh(8, tp=2)
    assert dict(m.shape) == {"dp": 4, "tp": 2}
    m = make_mesh(4, tp=1)
    assert dict(m.shape) == {"dp": 4, "tp": 1}
    with pytest.raises(AssertionError):
        make_mesh(6, tp=4)


def test_pad_to_multiple():
    x = np.arange(10)
    y = pad_to_multiple(x, 4)
    assert y.shape == (12,) and (y[10:] == x[0]).all()
    assert pad_to_multiple(x, 5) is x


def test_sharded_render_matches_single_device():
    """'normal' integrator is deterministic given rays; camera jitter uses
    per-dp-tile keys, so compare with samples=1 and a jitter-insensitive
    metric: the sharded and single-device renders must agree on the set of
    sphere pixels to sub-pixel tolerance."""
    scene, cam = presets.three_spheres(aspect=2.0)
    cfg = _cfg()
    single = np.asarray(render_image(scene, cam, jax.random.key(0), cfg))
    # tp=2 exercises the sharded-primitive combine; tp=4 added ~75 s of
    # SPMD compile for no extra code path (suite wall-clock, VERDICT r3 #9)
    for tp in [1, 2]:
        mesh = make_mesh(8, tp=tp)
        sharded = np.asarray(render_image_sharded(scene, cam,
                                                  jax.random.key(0), cfg, mesh))
        assert sharded.shape == single.shape
        # hit masks (sky is blueish; normals colorful): compare mean images
        assert abs(sharded.mean() - single.mean()) < 0.02, tp
        assert np.isfinite(sharded).all()


def test_tp_intersection_exact():
    """With a FIXED ray set (bypassing camera jitter), tp-sharded
    intersection must match the single-device brute force exactly."""
    from cudaraytracer_tpu.core.rays import make_rays
    from cudaraytracer_tpu.ops import intersect as isect
    from cudaraytracer_tpu.parallel import intersect as tpi
    from cudaraytracer_tpu.parallel.render import shard_scene
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    rng = np.random.default_rng(0)
    b = crt.SceneBuilder()
    m = b.materials
    mats = [m.lambertian(color=rng.uniform(size=3)) for _ in range(4)]
    for i in range(37):
        b.add_sphere(rng.uniform(-3, 3, 3) + [0, 0, -8],
                     rng.uniform(0.2, 0.8), mats[i % 4])
    # a few triangles too
    for i in range(11):
        c = rng.uniform(-2, 2, 3) + [0, 0, -5]
        b.add_triangle(c, c + rng.normal(scale=0.5, size=3),
                       c + rng.normal(scale=0.5, size=3), mats[i % 4])
    scene = b.build()

    n = 64
    o = np.zeros((n, 3), np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d[:, 2] = -np.abs(d[:, 2]) - 0.3
    rays = make_rays(jnp.asarray(o), jnp.asarray(d))

    ref = isect.intersect_scene(scene, rays)

    # 4-device mesh: the tp=4 combine is identical, the 8-device SPMD
    # program compiled ~2x slower (suite wall-clock, VERDICT r3 #9)
    tp = 4
    mesh = make_mesh(4, tp=tp)
    padded, n_s, n_t = shard_scene(scene, tp)

    def local(sph, tri, rest):
        sl = rest._replace(spheres=sph, triangles=tri)
        tp_i = jax.lax.axis_index("tp")
        return tpi.intersect_scene_tp(
            sl, rays, "tp", tp_i * sph.radius.shape[0],
            tp_i * tri.mat.shape[0], 1e-3, 3.4e38, crt.Quirks.reference(),
            n_s, n_t)

    sph_spec = jax.tree.map(lambda _: P("tp"), padded.spheres)
    tri_spec = jax.tree.map(lambda _: P("tp"), padded.triangles)
    rest_spec = jax.tree.map(lambda _: P(), padded)
    got = shard_map(local, mesh=mesh,
                    in_specs=(sph_spec, tri_spec, rest_spec),
                    out_specs=jax.tree.map(lambda _: P(), ref),
                    check_vma=False)(padded.spheres, padded.triangles, padded)

    np.testing.assert_array_equal(np.asarray(got.hit), np.asarray(ref.hit))
    hit = np.asarray(ref.hit)
    # sharded compute fuses differently; allow fp-level divergence
    np.testing.assert_allclose(np.asarray(got.t)[hit], np.asarray(ref.t)[hit],
                               rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(got.prim), np.asarray(ref.prim))
    np.testing.assert_allclose(np.asarray(got.normal)[hit],
                               np.asarray(ref.normal)[hit], rtol=1e-4,
                               atol=1e-4)
    np.testing.assert_array_equal(np.asarray(got.mat), np.asarray(ref.mat))


def test_fit_step_decreases_albedo_error():
    scene, cam = presets.three_spheres(aspect=1.5)
    cfg = _cfg(width=24, height=16, samples=2, integrator="path", gamma=False)
    target = render_image(scene, cam, jax.random.key(5), cfg)
    true_albedo = np.asarray(scene.textures.color0)
    params = {"albedo": jnp.asarray(
        np.clip(true_albedo + 0.2, 0, 1).astype(np.float32))}
    mesh = make_mesh(8, tp=2)
    step = make_fit_step(scene, cam, cfg, mesh, lr=1.0)
    tflat = jnp.asarray(np.asarray(target).reshape(-1, 3))
    err0 = np.abs(true_albedo - np.asarray(params["albedo"])).mean()
    for i in range(20):
        loss, params = step(params, tflat, jax.random.key(i))
        assert np.isfinite(float(loss))
    err1 = np.abs(true_albedo - np.asarray(params["albedo"])).mean()
    assert err1 < err0 * 0.8, (err0, err1)


def test_gradients_flow_to_geometry():
    """d(loss)/d(center) is nonzero — geometry is differentiable."""
    from cudaraytracer_tpu.parallel.train import pixel_loss
    scene, cam = presets.three_spheres(aspect=1.5)
    cfg = _cfg(width=16, height=8, samples=1, integrator="path", gamma=False)
    target = jnp.zeros((16 * 8, 3))
    params = {"centers": scene.spheres.center,
              "albedo": scene.textures.color0}
    g = jax.grad(lambda p: pixel_loss(scene, p, cam, jax.random.key(0), cfg,
                                      jnp.arange(16 * 8, dtype=jnp.int32),
                                      target))(params)
    assert np.isfinite(np.asarray(g["centers"])).all()
    assert np.abs(np.asarray(g["centers"])).max() > 1e-6
    assert np.abs(np.asarray(g["albedo"])).max() > 1e-6


def test_sample_parallel_render():
    """spp sharded over 'dp' with pmean combine; matches single-device
    statistics at the combined sample count."""
    from cudaraytracer_tpu.parallel.render import render_image_sample_sharded
    scene, cam = presets.three_spheres(aspect=2.0)
    cfg = _cfg(samples=2, integrator="path", max_depth=4)
    mesh = make_mesh(8, tp=2)  # dp=4 x 2spp = 8 effective spp
    img = np.asarray(render_image_sample_sharded(scene, cam, jax.random.key(0),
                                                 cfg, mesh))
    assert img.shape == (16, 32, 3)
    assert np.isfinite(img).all()
    ref = np.asarray(render_image(scene, cam, jax.random.key(1),
                                  _cfg(samples=8, integrator="path",
                                       max_depth=4)))
    assert abs(img.mean() - ref.mean()) < 0.02


def test_overlapped_grad_allreduce_matches_posthoc():
    """Per-bounce bucketed pmean inside the backward scan (grad_sync_axes)
    must produce the same loss and gradients as the post-hoc tree pmean —
    the reduction is linear, so bucketing changes scheduling, not math."""
    scene, cam = presets.three_spheres(aspect=2.0)
    cfg = _cfg(integrator="path", samples=1, max_depth=4)
    mesh = make_mesh(8, tp=2)
    params = {"centers": scene.spheres.center,
              "albedo": scene.textures.color0}
    target = np.asarray(render_image(scene, cam, jax.random.key(9), cfg)
                        ).reshape(-1, 3)
    step_post = make_fit_step(scene, cam, cfg, mesh, lr=0.1,
                              overlap_grads=False)
    step_over = make_fit_step(scene, cam, cfg, mesh, lr=0.1,
                              overlap_grads=True)
    l0, p0 = step_post(params, jnp.asarray(target), jax.random.key(3))
    l1, p1 = step_over(params, jnp.asarray(target), jax.random.key(3))
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    for k in params:
        np.testing.assert_allclose(np.asarray(p0[k]), np.asarray(p1[k]),
                                   rtol=1e-5, atol=1e-7, err_msg=k)


def test_megakernel_inside_shard_map():
    """cfg.engine='mega' routes through the Pallas megakernel inside
    shard_map (interpret mode on CPU with the jnp path's exact injected
    stream), so sharded mega must equal sharded wavefront to fp tolerance —
    same keys, same streams, different engine."""
    scene, cam = presets.three_spheres(aspect=2.0)
    # 4-device mesh + depth 4: same code paths, ~2x less SPMD compile
    mesh = make_mesh(4, tp=1)
    cfg_w = _cfg(integrator="path", samples=1, max_depth=4)
    cfg_m = _cfg(integrator="path", samples=1, max_depth=4, engine="mega")
    img_w = np.asarray(render_image_sharded(scene, cam, jax.random.key(4),
                                            cfg_w, mesh))
    img_m = np.asarray(render_image_sharded(scene, cam, jax.random.key(4),
                                            cfg_m, mesh))
    np.testing.assert_allclose(img_m, img_w, atol=3e-4)


def test_megakernel_shard_map_tp2_full_scene():
    """REGRESSION (round 5): with tp>1 the mega engine used to receive the
    tp-SHARDED primitive tables — it bypasses the tp intersect combine, so
    each tp member silently rendered a 1/tp slice of the scene and
    out_specs picked one member's wrong image unchecked (caught by the
    round-5 dryrun equality assert; MULTICHIP_r01-r04 all ran dp4 x tp2
    mega legs through this).  The fix replicates the tables for the
    mega-family engines; sharded mega must equal sharded wavefront on the
    same keys at ANY tp."""
    scene, cam = presets.three_spheres(aspect=2.0)
    mesh = make_mesh(4, tp=2)
    cfg_w = _cfg(integrator="path", samples=1, max_depth=3)
    cfg_m = _cfg(integrator="path", samples=1, max_depth=3, engine="mega")
    img_w = np.asarray(render_image_sharded(scene, cam, jax.random.key(4),
                                            cfg_w, mesh))
    img_m = np.asarray(render_image_sharded(scene, cam, jax.random.key(4),
                                            cfg_m, mesh))
    np.testing.assert_allclose(img_m, img_w, atol=3e-4)


def test_megakernel_streaming_inside_shard_map(monkeypatch):
    """HBM-streamed triangle tables (> MAX_VMEM_PRIMS -> in-kernel segment
    DMA, incl. the per-segment chunk-box DMA) must work under shard_map the
    same as on a single device: sharded mega == sharded wavefront on the
    same keys/streams.

    The streaming THRESHOLDS are monkeypatched down (512-prim VMEM ceiling,
    256-tri segments) so a ~1,400-tri scene exercises the same multi-segment
    DMA code paths at a fraction of the interpret-mode cost — the original
    8,450-tri scene spent 152 s mostly in CPU interpret sweeps (suite
    wall-clock, VERDICT r3 #9)."""
    from cudaraytracer_tpu.models.scene import SceneBuilder
    from cudaraytracer_tpu.ops import megakernel as mk
    from cudaraytracer_tpu.core.camera import make_camera

    monkeypatch.setattr(mk, "MAX_VMEM_PRIMS", 512)
    monkeypatch.setattr(mk, "SEG_T", 256)     # == SUPER_T: 1 super/segment
    n = 26   # 26x26 quads = 1352 tris > the patched 512 ceiling
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
    cam = make_camera((0, 4.0, 2.0), (0, 0, -5), (0, 1, 0), 55.0, 2.0,
                      0.0, 8.0)
    mesh = make_mesh(4, tp=1)
    cfg_w = _cfg(width=32, height=16, integrator="path", samples=1,
                 max_depth=3)
    cfg_m = _cfg(width=32, height=16, integrator="path", samples=1,
                 max_depth=3, engine="mega")
    img_w = np.asarray(render_image_sharded(scene, cam, jax.random.key(4),
                                            cfg_w, mesh))
    img_m = np.asarray(render_image_sharded(scene, cam, jax.random.key(4),
                                            cfg_m, mesh))
    np.testing.assert_allclose(img_m, img_w, atol=3e-4)


def test_sharded_render_jit_with_tp():
    """Regression: shard_scene used np.asarray, so the jitted sharded render
    crashed with TracerArrayConversionError whenever tp > 1."""
    from cudaraytracer_tpu.parallel.render import render_image_sharded_jit
    scene, cam = presets.three_spheres(aspect=2.0)
    cfg = _cfg()
    mesh = make_mesh(8, tp=2)
    out = np.asarray(render_image_sharded_jit(scene, cam, jax.random.key(0),
                                              cfg, mesh))
    ref = np.asarray(render_image(scene, cam, jax.random.key(0), cfg))
    assert out.shape == ref.shape
    assert np.isfinite(out).all()
    assert abs(out.mean() - ref.mean()) < 0.02


def test_sample_sharded_bright_scene_unclipped_mean():
    """Regression: per-member renders were clipped to [0,1] BEFORE the
    pmean, darkening bright scenes vs the documented single-device render
    at the combined spp.  With a 4x emitter the sharded mean must match the
    combined-spp reference closely (identical pixels where radiance > 1)."""
    from cudaraytracer_tpu.parallel.render import render_image_sample_sharded
    scene, cam = presets.light_box(aspect=2.0)
    cfg = _cfg(samples=2, integrator="path", max_depth=4)
    mesh = make_mesh(8, tp=1)   # dp=8 x 2spp = 16 effective spp
    img = np.asarray(render_image_sample_sharded(scene, cam,
                                                 jax.random.key(0), cfg, mesh))
    ref = np.asarray(render_image(scene, cam, jax.random.key(1),
                                  _cfg(samples=16, integrator="path",
                                       max_depth=4)))
    assert np.isfinite(img).all()
    # the emitter region renders at the clip ceiling in both
    assert (img == 1.0).any() and (ref == 1.0).any()
    assert abs(img.mean() - ref.mean()) < 0.02


def test_mega_tex_inside_shard_map():
    """Image-texture scenes route to the fused deferred-texturing path
    (trace_path_mega_tex) inside shard_map too: sharded mega == sharded
    wavefront on the same keys (the winner-recording kernel + the replay
    both run per-shard)."""
    from cudaraytracer_tpu.models.scene import SceneBuilder
    from cudaraytracer_tpu.core.camera import make_camera
    from cudaraytracer_tpu.ops import megakernel as mk

    b = SceneBuilder()
    m = b.materials
    tex = m.textures.image(
        (np.arange(192) * 77 % 256).astype(np.uint8).reshape(8, 8, 3))
    b.add_sphere((0, -100.5, -3), 100.0, m.lambertian(color=(.6, .6, .6)))
    b.add_sphere((0, 0, -3), 1.0, m.lambertian(tex_id=tex))
    b.add_rect(m.diffuse_light(tex_id=tex), position=(0, 1.8, -3),
               rotation=(90, 0, 0), scale=(2, 2, 1))
    scene = b.build()
    assert not mk.megakernel_supported(scene)
    assert mk.mega_tex_supported(scene)
    cam = make_camera((0, 0.3, 1), (0, 0, -3), (0, 1, 0), 50.0, 2.0,
                      0.0, 4.0)
    # 4-device mesh, ONE quirk profile, depth 3: this test proves the
    # sharding COMPOSITION only — both quirk profiles and deeper paths are
    # covered single-device in test_mega_tex.py, and the 8-device dual-
    # profile version spent 533 s compiling (suite wall-clock, VERDICT #9).
    # reference() keeps the lambertian_zero_uv att00 path in scope here.
    mesh = make_mesh(4, tp=1)
    for quirks in (crt.Quirks.reference(),):
        cfg_w = _cfg(integrator="path", samples=1, max_depth=3,
                     quirks=quirks)
        cfg_m = _cfg(integrator="path", samples=1, max_depth=3,
                     engine="mega", quirks=quirks)
        img_w = np.asarray(render_image_sharded(scene, cam,
                                                jax.random.key(4), cfg_w,
                                                mesh))
        img_m = np.asarray(render_image_sharded(scene, cam,
                                                jax.random.key(4), cfg_m,
                                                mesh))
        np.testing.assert_allclose(img_m, img_w, atol=3e-4)
