"""Sample-sequence injection: the deterministic cross-renderer parity harness
(SURVEY.md §7 hard part 3; BASELINE.md acceptance gate).

One injected SampleStream drives a STOCHASTIC scene (lambertian ball scatter,
metal fuzz, dielectric coin flips) through every renderer — jnp brute force,
BVH traversal, Pallas sweeps, megakernel — and the float64 oracle; all must
produce the same image.
"""

import jax
import jax.numpy as jnp
import numpy as np

from cudaraytracer_tpu.config import Quirks, RenderConfig
from cudaraytracer_tpu.core.rays import make_rays
from cudaraytracer_tpu.models.scene import SceneBuilder
from cudaraytracer_tpu.ops import bvh as bvhmod
from cudaraytracer_tpu.ops import integrators as integ
from cudaraytracer_tpu.ops import megakernel as mk
from cudaraytracer_tpu.ops import render as render_ops

import oracle

PTS = np.array([[0, 0, -3], [0.7, 0, -2.5], [-0.7, 0, -2.5],
                [0, 1.0, -2.7]], np.float32)
TRIS = [(0, 1, 3), (1, 2, 3), (2, 0, 3), (0, 2, 1)]


def _stochastic_scene():
    b = SceneBuilder()
    m = b.materials
    chk = m.lambertian(m.textures.checker((0.8, 0.8, 0.8), (0.2, 0.3, 0.2)))
    red = m.lambertian(color=(0.9, 0.2, 0.2))
    met = m.metal((0.8, 0.7, 0.3), fuzz=0.4)      # fuzz -> uses ball draw
    glass = m.dielectric(1.5)                      # uses prob draw
    light = m.diffuse_light(color=(3.0, 3.0, 3.0))
    b.add_sphere((0, -100.5, -3), 100.0, chk)
    b.add_sphere((-1.2, 0, -3), 0.5, glass)
    b.add_sphere((1.2, 0, -3), 0.5, met)
    for tri in TRIS:
        v = PTS[list(tri)]
        b.add_triangle(v[0], v[1], v[2], red)
    b.add_triangle((-1, 2.2, -2.2), (1, 2.2, -2.2), (0, 2.2, -4.2), light,
                   normal=(0, -1, 0))
    return b.build()


def _oracle_world():
    w = [
        oracle.Sphere((0, -100.5, -3), 100.0, oracle.Lambertian(
            oracle.checker_texture((0.8, 0.8, 0.8), (0.2, 0.3, 0.2)))),
        oracle.Sphere((-1.2, 0, -3), 0.5, oracle.Dielectric(1.5)),
        oracle.Sphere((1.2, 0, -3), 0.5, oracle.Metal((0.8, 0.7, 0.3), 0.4)),
    ]
    red = oracle.Lambertian((0.9, 0.2, 0.2))
    for tri in TRIS:
        v = PTS[list(tri)].astype(np.float64)
        n = np.cross(v[1] - v[0], v[2] - v[0])
        n = n / np.linalg.norm(n)
        w.append(oracle.Triangle(v[0], v[1], v[2], n, red))
    w.append(oracle.Triangle((-1, 2.2, -2.2), (1, 2.2, -2.2), (0, 2.2, -4.2),
                             (0, -1, 0), oracle.DiffuseLight((3, 3, 3))))
    return oracle.HitList(w)


def _grid_rays(n_x=16, n_y=8):
    """Deterministic unnormalized camera-style rays (no jitter/defocus so the
    scatter stream is the ONLY stochastic input)."""
    xs, ys = np.meshgrid(np.linspace(-1.5, 1.5, n_x),
                         np.linspace(-0.6, 1.2, n_y))
    n = n_x * n_y
    o = np.tile(np.array([[0.0, 0.4, 2.0]], np.float32), (n, 1))
    d = np.stack([xs.ravel(), ys.ravel() - 0.4, -5.0 * np.ones(n)],
                 axis=1).astype(np.float32)
    return make_rays(jnp.asarray(o), jnp.asarray(d))


def test_all_renderers_agree_on_injected_stream():
    scene = _stochastic_scene()
    # triangle_no_t_clip is disabled here: behind-the-origin triangle hits
    # (the quirk's effect) are reachable by LIST scans but not by ANY BVH —
    # the reference's own BVH pipeline culls them via the AABB slab test's
    # t_min (aabb.h:30-43) — so cross-pipeline identity only holds with the
    # forward t-window.  All other reference quirks stay on.
    cfg = RenderConfig(width=16, height=8, samples=1, max_depth=8,
                       integrator="path",
                       quirks=Quirks(triangle_no_t_clip=False))
    rays = _grid_rays()
    n = rays.origin.shape[0]
    stream = integ.stream_from_key(jax.random.key(42), n, cfg.max_depth)
    key = jax.random.key(42)

    results = {}
    results["jnp"] = integ.trace_path(scene, rays, key, cfg, samples=stream)

    tr = scene.triangles
    flat = bvhmod.build_triangle_bvh(np.asarray(tr.v0), np.asarray(tr.v1),
                                     np.asarray(tr.v2))
    results["bvh"] = integ.trace_path(
        scene, rays, key, cfg,
        intersect_fn=render_ops.bvh_intersector(cfg), aux=flat,
        samples=stream)

    results["pallas"] = integ.trace_path(
        scene, rays, key, cfg,
        intersect_fn=render_ops.pallas_intersector(cfg), samples=stream)

    results["mega"] = mk.trace_path_mega(scene, rays, key, cfg,
                                         samples=stream)

    ref = np.asarray(results["jnp"])
    assert np.std(ref) > 0.01      # actually a stochastic, structured image
    for name, got in results.items():
        np.testing.assert_allclose(np.asarray(got), ref, atol=3e-4,
                                   rtol=1e-4, err_msg=name)


def test_injected_stream_matches_float64_oracle():
    """Full stochastic-path match against the scalar float64 oracle — not
    just deterministic components (round-1 gap)."""
    scene = _stochastic_scene()
    world = _oracle_world()
    cfg = RenderConfig(width=16, height=8, samples=1, max_depth=8,
                       integrator="path")
    rays = _grid_rays()
    n = rays.origin.shape[0]
    stream = integ.stream_from_key(jax.random.key(42), n, cfg.max_depth)
    got = np.asarray(integ.trace_path(scene, rays, jax.random.key(42), cfg,
                                      samples=stream))
    ball = np.asarray(stream.ball)    # (depth+1, n, 3)
    prob = np.asarray(stream.prob)
    o = np.asarray(rays.origin, np.float64)
    d = np.asarray(rays.direction, np.float64)
    for i in range(n):
        sampler = oracle.InjectedSampler(ball[:, i], prob[:, i],
                                         cfg.max_depth)
        want = oracle.shade(world, o[i], d[i], cfg.max_depth, sampler,
                            ambient=0.1)
        np.testing.assert_allclose(got[i], want, atol=2e-3, rtol=2e-3,
                                   err_msg=f"ray {i}")


def test_stream_from_key_equals_internal_draws():
    """samples=stream_from_key(key) reproduces the key-only render exactly."""
    scene = _stochastic_scene()
    cfg = RenderConfig(width=16, height=8, samples=1, max_depth=8,
                       integrator="path")
    rays = _grid_rays()
    n = rays.origin.shape[0]
    key = jax.random.key(3)
    a = integ.trace_path(scene, rays, key, cfg)
    b = integ.trace_path(scene, rays, key, cfg,
                         samples=integ.stream_from_key(key, n, cfg.max_depth))
    # identical draws; only XLA fusion/reassociation noise may differ
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
