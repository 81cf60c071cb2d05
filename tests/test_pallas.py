"""Pallas kernel equivalence + custom-VJP gradient tests (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

import cudaraytracer_tpu as crt
from cudaraytracer_tpu.config import Quirks
from cudaraytracer_tpu.core.rays import make_rays
from cudaraytracer_tpu.models import presets
from cudaraytracer_tpu.models.scene import SceneBuilder
from cudaraytracer_tpu.ops import intersect as isect
from cudaraytracer_tpu.ops import pallas_intersect as pk


def _rand_rays(rng, n=300, origin=(13, 2, 3)):
    o = (np.asarray([origin], np.float32)
         + rng.normal(scale=0.2, size=(n, 3)).astype(np.float32))
    d = (-np.asarray([origin], np.float32)
         + rng.normal(scale=1.5, size=(n, 3))).astype(np.float32)
    return make_rays(jnp.asarray(o), jnp.asarray(d))


def test_sphere_kernel_matches_jnp():
    scene, _ = presets.random_spheres(aspect=2.0)
    rays = _rand_rays(np.random.default_rng(0))
    ref = isect.intersect_scene(scene, rays)
    got = isect.intersect_scene_pallas(scene, rays)
    np.testing.assert_array_equal(np.asarray(got.hit), np.asarray(ref.hit))
    np.testing.assert_array_equal(np.asarray(got.prim), np.asarray(ref.prim))
    hit = np.asarray(ref.hit)
    np.testing.assert_allclose(np.asarray(got.t)[hit], np.asarray(ref.t)[hit],
                               rtol=1e-4, atol=1e-4)
    # near-tangent hits amplify fp-level t differences into the normal
    np.testing.assert_allclose(np.asarray(got.normal)[hit],
                               np.asarray(ref.normal)[hit], atol=1e-2)


def test_triangle_kernel_matches_jnp():
    rng = np.random.default_rng(1)
    b = SceneBuilder()
    mat = b.materials.lambertian(color=(1, 0, 0))
    c = rng.uniform(-3, 3, (150, 3)) + [0, 0, -8]
    a_ = c + rng.normal(scale=0.5, size=(150, 3))
    d_ = c + rng.normal(scale=0.5, size=(150, 3))
    for k in range(150):
        b.add_triangle(c[k], a_[k], d_[k], mat)
    scene = b.build()
    rays = _rand_rays(rng, 256, origin=(0, 0, 0))
    for quirks in [Quirks.reference(), Quirks.fixed()]:
        ref = isect.intersect_scene(scene, rays, quirks=quirks)
        got = isect.intersect_scene_pallas(scene, rays, quirks=quirks)
        np.testing.assert_array_equal(np.asarray(got.hit), np.asarray(ref.hit))
        np.testing.assert_array_equal(np.asarray(got.prim), np.asarray(ref.prim))
        hit = np.asarray(ref.hit)
        np.testing.assert_allclose(np.asarray(got.t)[hit],
                                   np.asarray(ref.t)[hit], rtol=1e-4, atol=1e-4)


def test_mixed_scene_pallas():
    b = SceneBuilder()
    m = b.materials
    mat = m.lambertian(color=(1, 1, 1))
    b.add_sphere((0, 0, -6), 1.0, mat)
    b.add_triangle((-2, -2, -4), (2, -2, -4), (0, 2, -4), mat, normal=(0, 0, -1))
    b.add_rect(mat, flip=False, position=(0, 0, -2))
    scene = b.build()
    rays = make_rays(jnp.zeros((3, 3), jnp.float32),
                     jnp.asarray([[0, 0, -1.0], [0.3, 0, -1], [1, 0, 0]],
                                 jnp.float32))
    ref = isect.intersect_scene(scene, rays)
    got = isect.intersect_scene_pallas(scene, rays)
    np.testing.assert_array_equal(np.asarray(got.hit), np.asarray(ref.hit))
    np.testing.assert_array_equal(np.asarray(got.prim), np.asarray(ref.prim))


def test_sphere_vjp_matches_jnp_gradient():
    """Gradient of sum(best_t) w.r.t. centers: pallas custom-vjp vs the
    differentiable jnp path."""
    b = SceneBuilder()
    mat = b.materials.lambertian(color=(1, 1, 1))
    b.add_sphere((0, 0, -4), 1.0, mat)
    b.add_sphere((1.5, 0, -6), 1.0, mat)
    scene = b.build()
    rng = np.random.default_rng(2)
    n = 64
    o = np.zeros((n, 3), np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d[:, 2] = -np.abs(d[:, 2]) - 0.5

    def loss_pallas(centers):
        t, i = pk.sphere_best_hit(jnp.asarray(o), jnp.asarray(d), centers,
                                  scene.spheres.radius, 1e-3, 3.4e38)
        return jnp.sum(jnp.where(i >= 0, t, 0.0))

    def loss_jnp(centers):
        valid, t = isect.sphere_candidates(jnp.asarray(o), jnp.asarray(d),
                                           centers, scene.spheres.radius,
                                           jnp.float32(1e-3), jnp.float32(3.4e38))
        tbest = jnp.min(jnp.where(valid, t, isect.BIG), axis=1)
        return jnp.sum(jnp.where(tbest < 1e30, tbest, 0.0))

    g_p = jax.grad(loss_pallas)(scene.spheres.center)
    g_j = jax.grad(loss_jnp)(scene.spheres.center)
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_j), rtol=1e-3,
                               atol=1e-4)


def test_sphere_vjp_finite_difference():
    b = SceneBuilder()
    mat = b.materials.lambertian(color=(1, 1, 1))
    b.add_sphere((0.2, -0.1, -5), 1.3, mat)
    scene = b.build()
    o = jnp.zeros((8, 3), jnp.float32)
    d = jnp.asarray(np.array(
        [[0.05 * k, 0.02, -1.0] for k in range(8)], np.float32))

    def loss(center):
        t, i = pk.sphere_best_hit(o, d, center[None], scene.spheres.radius,
                                  1e-3, 3.4e38)
        return jnp.sum(jnp.where(i >= 0, t, 0.0))

    c0 = jnp.asarray([0.2, -0.1, -5.0])
    g = np.asarray(jax.grad(loss)(c0))
    eps = 1e-3
    for k in range(3):
        e = np.zeros(3, np.float32)
        e[k] = eps
        fd = (float(loss(c0 + e)) - float(loss(c0 - e))) / (2 * eps)
        np.testing.assert_allclose(g[k], fd, rtol=1e-2, atol=1e-3)


def test_triangle_vjp_finite_difference():
    v0 = jnp.asarray([[-1.0, -1.0, -3.0]])
    v1 = jnp.asarray([[1.0, -1.0, -3.0]])
    v2 = jnp.asarray([[0.0, 1.0, -3.2]])
    nrm = jnp.asarray([[0.0, 0.0, -1.0]])
    o = jnp.zeros((4, 3), jnp.float32)
    d = jnp.asarray([[0.1, 0.0, -1.0], [0.0, 0.1, -1.0],
                     [-0.1, -0.1, -1.0], [0.05, -0.2, -1.0]])
    q = crt.Quirks.reference()

    def loss(v2x):
        vv2 = v2.at[0, 2].set(v2x)
        t, i = pk.triangle_best_hit(o, d, v0, v1, vv2, nrm, 1e-3, 3.4e38, q)
        return jnp.sum(jnp.where(i >= 0, t, 0.0))

    x0 = jnp.float32(-3.2)
    g = float(jax.grad(loss)(x0))
    eps = 1e-3
    fd = (float(loss(x0 + eps)) - float(loss(x0 - eps))) / (2 * eps)
    np.testing.assert_allclose(g, fd, rtol=1e-2, atol=1e-3)


def test_pallas_render_matches_bruteforce_render():
    from cudaraytracer_tpu.ops.render import (pallas_intersector,
                                              render_image)
    scene, cam = presets.three_spheres(aspect=2.0)
    cfg = crt.RenderConfig(width=32, height=16, samples=1, max_depth=4,
                           integrator="normal", ray_chunk=1 << 20)
    a = np.asarray(render_image(scene, cam, jax.random.key(0), cfg))
    b = np.asarray(render_image(scene, cam, jax.random.key(0), cfg,
                                pallas_intersector(cfg)))
    np.testing.assert_allclose(a, b, atol=2e-4)


def test_multi_segment_tables():
    """Primitive tables larger than SEG_PRIMS run as multiple grid segments
    with output revisiting; results must match the single-segment jnp path."""
    rng = np.random.default_rng(0)
    nt = 3 * pk.SEG_PRIMS  # forces 3 segments
    c = rng.uniform(-5, 5, (nt, 3)).astype(np.float32) + [0, 0, -10]
    v0 = jnp.asarray(c)
    v1 = jnp.asarray(c + rng.normal(scale=0.2, size=(nt, 3)).astype(np.float32))
    v2 = jnp.asarray(c + rng.normal(scale=0.2, size=(nt, 3)).astype(np.float32))
    nrm = np.cross(np.asarray(v1 - v0), np.asarray(v2 - v0))
    nrm = jnp.asarray((nrm / np.maximum(
        np.linalg.norm(nrm, axis=-1, keepdims=True), 1e-20)).astype(np.float32))
    n = 256
    o = jnp.asarray(rng.normal(scale=0.3, size=(n, 3)).astype(np.float32))
    d = np.asarray(rng.normal(size=(n, 3)).astype(np.float32))
    d[:, 2] = -np.abs(d[:, 2]) - 0.3
    d = jnp.asarray(d)
    q = Quirks.reference()
    valid, t, _, _ = isect.triangle_candidates(
        o, d, v0, v1, v2, nrm, jnp.float32(1e-3), jnp.float32(3.4e38), q)
    ref_t = np.where(np.asarray(valid), np.asarray(t), np.inf).min(axis=1)
    for cull in [True, False]:
        tt, ii = pk.triangle_best_hit_raw(o, d, v0, v1, v2, nrm, 1e-3, 3.4e38,
                                          q, cull=cull)
        hit = np.asarray(ii) >= 0
        np.testing.assert_array_equal(hit, np.isfinite(ref_t))
        np.testing.assert_allclose(np.asarray(tt)[hit],
                                   ref_t[np.isfinite(ref_t)], rtol=1e-4)

    ns = 2 * pk.SEG_PRIMS + 37
    ctr = jnp.asarray(rng.uniform(-5, 5, (ns, 3)).astype(np.float32)
                      + [0, 0, -10])
    rad = jnp.asarray(rng.uniform(0.05, 0.3, (ns,)).astype(np.float32))
    sv, st_ = isect.sphere_candidates(o, d, ctr, rad, jnp.float32(1e-3),
                                      jnp.float32(3.4e38))
    ref_ts = np.where(np.asarray(sv), np.asarray(st_), np.inf).min(axis=1)
    for cull in [True, False]:
        tt, ii = pk.sphere_best_hit_raw(o, d, ctr, rad, 1e-3, 3.4e38, cull)
        hit = np.asarray(ii) >= 0
        np.testing.assert_array_equal(hit, np.isfinite(ref_ts))
        np.testing.assert_allclose(np.asarray(tt)[hit],
                                   ref_ts[np.isfinite(ref_ts)], rtol=1e-4)


def test_sphere_bwd_second_root_gradient():
    """Gradient attribution when the SECOND quadratic root wins (ray origin
    inside the sphere): the backward pass must re-evaluate the kernel's exact
    root-selection rule, not a tolerance match on t.  Checked against central
    finite differences."""
    center = jnp.asarray([[0.0, 0.0, -2.0]])
    radius = jnp.asarray([1.5])
    origin = jnp.asarray([[0.2, -0.1, -2.3]])      # inside the sphere
    direction = jnp.asarray([[0.3, 0.1, -1.0]])

    def t_of(c):
        t, _ = pk.sphere_best_hit(origin, direction, c, radius, 1e-3,
                                  3.4e38)
        return t[0]

    g = jax.grad(t_of)(center)
    eps = 1e-3
    for k in range(3):
        cp = center.at[0, k].add(eps)
        cm = center.at[0, k].add(-eps)
        fd = (t_of(cp) - t_of(cm)) / (2 * eps)
        np.testing.assert_allclose(g[0, k], fd, rtol=5e-2, atol=1e-4)


def test_triangle_bwd_no_nan_from_miss_rays():
    """Regression: a ray that misses everything pairs with triangle 0 in the
    backward (safe index); if it is parallel to that triangle the unguarded
    1/a produced NaN that poisoned ALL gradients via the scatter-add."""
    from cudaraytracer_tpu.ops.pallas_intersect import triangle_best_hit
    from cudaraytracer_tpu.config import Quirks

    v0 = jnp.asarray([[-1.0, 0.0, -3.0], [2.0, 0.0, -5.0]])
    v1 = jnp.asarray([[1.0, 0.0, -3.0], [3.0, 0.0, -5.0]])
    v2 = jnp.asarray([[0.0, 1.5, -3.0], [2.5, 1.5, -5.0]])
    nrm = jnp.asarray([[0.0, 0.0, -1.0], [0.0, 0.0, -1.0]])
    # ray 0 hits triangle 0; ray 1 runs parallel to both planes (a == 0)
    o = jnp.asarray([[0.0, 0.5, 0.0], [10.0, 0.0, 0.0]])
    d = jnp.asarray([[0.0, 0.0, -1.0], [1.0, 0.0, 0.0]])

    def loss(vs):
        a0, a1, a2 = vs
        t, idx = triangle_best_hit(o, d, a0, a1, a2, nrm, 1e-3, 1e9,
                                   Quirks.fixed())
        return jnp.sum(jnp.where(idx >= 0, t, 0.0))

    g0, g1, g2 = jax.grad(loss)((v0, v1, v2))
    for g in (g0, g1, g2):
        assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g0)).max() > 0   # hit ray's grads still flow


def test_wavefront_compact_bit_exact_and_grads():
    """cfg.wavefront_compact (alive-first inter-bounce partition feeding the
    alive-masked sweeps) is a pure permutation: values AND gradients must be
    bit-identical to the unpartitioned wavefront under an injected stream,
    on both the jnp and Pallas intersector paths."""
    import dataclasses
    from cudaraytracer_tpu.models import presets
    from cudaraytracer_tpu.ops import integrators as integ
    from cudaraytracer_tpu.ops.render import pallas_intersector_pair
    from cudaraytracer_tpu.core.camera import generate_pixel_rays

    scene, cam = presets.three_spheres(aspect=2.0)
    cfg = crt.RenderConfig(width=64, height=32, samples=2, max_depth=8,
                           integrator="path", gamma=False)
    ccfg = dataclasses.replace(cfg, wavefront_compact=True)
    rays = generate_pixel_rays(cam, 64, 32, 2, jax.random.key(0))
    n = rays.origin.shape[0]
    stream = integ.stream_from_key(jax.random.key(7), n, cfg.max_depth)

    ref = np.asarray(integ.trace_path(scene, rays, jax.random.key(7), cfg,
                                      samples=stream))
    got = np.asarray(integ.trace_path(scene, rays, jax.random.key(7), ccfg,
                                      samples=stream))
    np.testing.assert_array_equal(got, ref)

    p_ref = np.asarray(integ.trace_path(
        scene, rays, jax.random.key(7), cfg, samples=stream,
        intersect_fn=pallas_intersector_pair(cfg)))
    p_got = np.asarray(integ.trace_path(
        scene, rays, jax.random.key(7), ccfg, samples=stream,
        intersect_fn=pallas_intersector_pair(ccfg)))
    np.testing.assert_array_equal(p_got, p_ref)

    def loss(c0, cfgx):
        s = scene._replace(textures=scene.textures._replace(color0=c0))
        return jnp.mean(integ.trace_path(s, rays, jax.random.key(7), cfgx,
                                         samples=stream))

    g1 = np.asarray(jax.grad(loss)(scene.textures.color0, cfg))
    g2 = np.asarray(jax.grad(loss)(scene.textures.color0, ccfg))
    np.testing.assert_array_equal(g1, g2)
    assert np.abs(g1).max() > 1e-3


def test_scatter_draws_pallas_cpu_semantics():
    """cfg.wavefront_tpu_prng (round 5): the hardware-PRNG draws kernel is
    TPU-only — on CPU it must refuse loudly (pltpu.prng has no interpret
    lowering), and the integrator's gate must leave CPU renders
    BIT-IDENTICAL with the knob on or off (threefry keeps running)."""
    import dataclasses
    import pytest
    from cudaraytracer_tpu.ops import pallas_intersect as pk
    from cudaraytracer_tpu.models import presets
    from cudaraytracer_tpu.ops.render import render_pixels

    with pytest.raises(NotImplementedError):
        pk.scatter_draws_pallas(jax.random.key(0), 256)

    scene, cam = presets.three_spheres(aspect=2.0)
    base = crt.RenderConfig(width=24, height=12, samples=1, max_depth=3,
                            integrator="path", gamma=False,
                            ray_chunk=1 << 20)
    on = np.asarray(render_pixels(
        scene, cam, jax.random.key(2),
        dataclasses.replace(base, wavefront_tpu_prng=True)))
    off = np.asarray(render_pixels(
        scene, cam, jax.random.key(2),
        dataclasses.replace(base, wavefront_tpu_prng=False)))
    np.testing.assert_array_equal(on, off)
