"""Integrator tests: deterministic golden paths vs the NumPy oracle."""

import jax
import jax.numpy as jnp
import numpy as np

from cudaraytracer_tpu.config import Quirks, RenderConfig
from cudaraytracer_tpu.core.rays import make_rays
from cudaraytracer_tpu.models.scene import SceneBuilder
from cudaraytracer_tpu.ops import integrators as integ

import oracle


def _metal_scene():
    """Fully deterministic world: fuzz-0 metals + a light; no randomness in
    any scatter, so JAX and oracle paths agree exactly."""
    b = SceneBuilder()
    m = b.materials
    mirror = m.metal((0.9, 0.8, 0.7), fuzz=0.0)
    light = m.diffuse_light(color=(2.0, 1.5, 1.0))
    b.add_sphere((0, 0, -3), 1.0, mirror)
    b.add_sphere((0, 52, -3), 50.0, mirror)  # big ceiling mirror
    b.add_sphere((3, 0, -3), 0.5, light)
    scene = b.build()

    world = oracle.HitList([
        oracle.Sphere((0, 0, -3), 1.0, oracle.Metal((0.9, 0.8, 0.7), 0.0)),
        oracle.Sphere((0, 52, -3), 50.0, oracle.Metal((0.9, 0.8, 0.7), 0.0)),
        oracle.Sphere((3, 0, -3), 0.5, oracle.DiffuseLight((2.0, 1.5, 1.0))),
    ])
    return scene, world


def test_path_matches_oracle_deterministic():
    scene, world = _metal_scene()
    cfg = RenderConfig(width=8, height=8, samples=1, max_depth=8,
                       integrator="path")
    rng = np.random.default_rng(5)
    o = np.zeros((32, 3))
    d = rng.normal(size=(32, 3))
    d[:, 2] = -np.abs(d[:, 2]) - 0.3
    rays = make_rays(jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32))
    got = integ.trace_path(scene, rays, jax.random.key(0), cfg)
    sampler = oracle.ZeroSampler()
    for i in range(32):
        want = oracle.shade(world, o[i], d[i], cfg.max_depth, sampler, ambient=0.1)
        np.testing.assert_allclose(got[i], want, rtol=2e-4, atol=2e-4)


def test_path_miss_gives_sky():
    b = SceneBuilder()
    b.materials.lambertian(color=(1, 1, 1))
    scene = b.build()
    d = np.array([[0.2, 0.4, -1.0]])
    rays = make_rays(jnp.zeros((1, 3), jnp.float32), jnp.asarray(d, jnp.float32))
    cfg = RenderConfig(width=1, height=1, samples=1, integrator="path")
    got = integ.trace_path(scene, rays, jax.random.key(0), cfg)
    np.testing.assert_allclose(got[0], oracle.background_sky(d[0]), rtol=1e-5)


def _mirror_pingpong_scene():
    """Two fuzz-0 metal spheres facing each other: a ray from the origin along
    -z ping-pongs between them forever, halving throughput each bounce."""
    b = SceneBuilder()
    m = b.materials
    mirror = m.metal((0.5, 0.5, 0.5), fuzz=0.0)
    b.add_sphere((0, 0, -10), 1.0, mirror)
    b.add_sphere((0, 0, 10), 1.0, mirror)
    return b.build()


def test_ambient_on_depth_exhaustion():
    """After max_depth recursions the reference returns emitted + 0.1
    (render.h:61); total radiance = 0.5^depth * 0.1 for the ping-pong ray."""
    scene = _mirror_pingpong_scene()
    rays = make_rays(jnp.zeros((1, 3), jnp.float32),
                     jnp.asarray([[0, 0, -1.0]], jnp.float32))
    for depth in [0, 1, 3, 8]:
        cfg = RenderConfig(width=1, height=1, samples=1, max_depth=depth,
                           integrator="path")
        got = integ.trace_path(scene, rays, jax.random.key(0), cfg)
        want = 0.1 * 0.5 ** depth
        np.testing.assert_allclose(got[0], [want] * 3, rtol=1e-4, atol=1e-6)


def test_no_ambient_in_fixed_mode():
    scene = _mirror_pingpong_scene()
    rays = make_rays(jnp.zeros((1, 3), jnp.float32),
                     jnp.asarray([[0, 0, -1.0]], jnp.float32))
    cfg = RenderConfig(width=1, height=1, samples=1, max_depth=2,
                       integrator="path", quirks=Quirks.fixed())
    got = integ.trace_path(scene, rays, jax.random.key(0), cfg)
    np.testing.assert_allclose(got[0], [0, 0, 0], atol=1e-6)


def test_lambert_shade_matches_oracle():
    scene, world = _metal_scene()
    cfg = RenderConfig(width=1, height=1, samples=1, integrator="lambert")
    rng = np.random.default_rng(9)
    o = np.zeros((16, 3))
    d = rng.normal(size=(16, 3))
    d[:, 2] = -np.abs(d[:, 2]) - 0.3
    rays = make_rays(jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32))
    got = integ.lambert_shade(scene, rays, jax.random.key(0), cfg)
    sampler = oracle.ZeroSampler()
    for i in range(16):
        want = oracle.lambert_shade(world, o[i], d[i], sampler)
        np.testing.assert_allclose(got[i], want, rtol=2e-4, atol=2e-4)


def test_shade_normal():
    b = SceneBuilder()
    mat = b.materials.lambertian(color=(1, 1, 1))
    b.add_sphere((0, 0, -3), 1.0, mat)
    scene = b.build()
    cfg = RenderConfig(width=1, height=1, samples=1, integrator="normal")
    rays = make_rays(jnp.zeros((2, 3), jnp.float32),
                     jnp.asarray([[0, 0, -1.0], [0, 1.0, 0]], jnp.float32))
    got = integ.shade_normal(scene, rays, jax.random.key(0), cfg)
    np.testing.assert_allclose(got[0], [0, 0, 1.0], atol=1e-5)   # front pole
    np.testing.assert_allclose(got[1], oracle.background_sky([0, 1, 0]), rtol=1e-5)


def test_emissive_termination():
    """Hitting a light adds emitted and stops (DiffuseLight never scatters)."""
    b = SceneBuilder()
    m = b.materials
    light = m.diffuse_light(color=(5, 4, 3))
    b.add_sphere((0, 0, -3), 1.0, light)
    scene = b.build()
    rays = make_rays(jnp.zeros((1, 3), jnp.float32),
                     jnp.asarray([[0, 0, -1.0]], jnp.float32))
    cfg = RenderConfig(width=1, height=1, samples=1, max_depth=8,
                       integrator="path")
    got = integ.trace_path(scene, rays, jax.random.key(0), cfg)
    # emitted + ambient 0.1 (scatter failed branch, render.h:61)
    np.testing.assert_allclose(got[0], [5.1, 4.1, 3.1], rtol=1e-5)
