"""Core math / camera / rng tests against the NumPy oracle."""

import math

import jax
import jax.numpy as jnp
import numpy as np

from cudaraytracer_tpu.core import camera as cam
from cudaraytracer_tpu.core import rng as crng
from cudaraytracer_tpu.core import vec as v3

import oracle


def test_dot_cross_unit():
    a = jnp.asarray([[1.0, 2.0, 3.0], [0.0, 1.0, 0.0]])
    b = jnp.asarray([[4.0, -5.0, 6.0], [1.0, 0.0, 0.0]])
    np.testing.assert_allclose(v3.dot(a, b), [12.0, 0.0], rtol=1e-6)
    np.testing.assert_allclose(v3.cross(a, b)[0], np.cross([1, 2, 3], [4, -5, 6]))
    u = v3.unit_vector(a)
    np.testing.assert_allclose(np.linalg.norm(u, axis=-1), 1.0, rtol=1e-6)


def test_rotate_matches_reference_formula():
    # vec3.h:200-217 (negated Z quirk): verify against a direct scalar port.
    def ref_rotate(v, rot):
        rx = math.radians(rot[0]); ry = math.radians(rot[1]); rz = -math.radians(rot[2])
        sx, cx = math.sin(rx), math.cos(rx)
        sy, cy = math.sin(ry), math.cos(ry)
        sz, cz = math.sin(rz), math.cos(rz)
        rows = [
            [cy * cz, -cy * sz, sy],
            [sx * sy * cz + cx * sz, -sx * sy * sz + cx * cz, -sx * cy],
            [-cx * sy * cz + sx * sz, cx * sy * sz + sx * cz, cx * cy],
        ]
        return np.array([np.dot(v, r) for r in rows])

    rng = np.random.default_rng(1)
    for _ in range(5):
        v = rng.normal(size=3)
        rot = rng.uniform(-180, 180, size=3)
        got = v3.rotate(jnp.asarray(v, jnp.float32), jnp.asarray(rot, jnp.float32))
        np.testing.assert_allclose(got, ref_rotate(v, rot), rtol=1e-4, atol=1e-5)


def test_reflect_refract_schlick():
    v = jnp.asarray([[1.0, -1.0, 0.0]])
    n = jnp.asarray([[0.0, 1.0, 0.0]])
    np.testing.assert_allclose(v3.reflect(v, n)[0], [1.0, 1.0, 0.0], atol=1e-6)

    ok, refr = v3.refract(v, n, jnp.asarray([1.0 / 1.5]))
    ok_o, refr_o = oracle.refract(np.array([1.0, -1.0, 0.0]),
                                  np.array([0.0, 1.0, 0.0]), 1 / 1.5)
    assert bool(ok[0]) == ok_o
    np.testing.assert_allclose(refr[0], refr_o, rtol=1e-5)

    np.testing.assert_allclose(v3.schlick(jnp.asarray(0.5), jnp.asarray(1.5)),
                               oracle.schlick(0.5, 1.5), rtol=1e-5)


def test_slerp_endpoints():
    a = jnp.asarray([1.0, 0.0, 0.0])
    b = jnp.asarray([0.0, 2.0, 0.0])
    np.testing.assert_allclose(v3.slerp(a, b, 0.0), a, atol=1e-6)
    np.testing.assert_allclose(v3.slerp(a, b, 1.0), b, atol=1e-6)


def test_camera_matches_oracle():
    # Active config: createScene.h:160.
    c = cam.make_camera((0, 100, 1000), (0, 150, 0), (0, 1, 0), 40.0,
                        1024 / 512, 0.0, 10.0)
    oc = oracle.Camera((0, 100, 1000), (0, 150, 0), (0, 1, 0), 40.0,
                       1024 / 512, 0.0, 10.0)
    np.testing.assert_allclose(c.origin, oc.origin, rtol=1e-5)
    np.testing.assert_allclose(c.lower_left_corner, oc.lower_left, rtol=1e-5)
    np.testing.assert_allclose(c.horizontal, oc.horizontal, rtol=1e-5)
    np.testing.assert_allclose(c.vertical, oc.vertical, rtol=1e-5)

    # aperture 0 => deterministic ray for given (s, t)
    s = jnp.asarray([0.25, 0.75])
    t = jnp.asarray([0.5, 0.1])
    rays = cam.get_rays(c, s, t, jax.random.key(0))
    for i in range(2):
        o, d = oc.get_ray(float(s[i]), float(t[i]))
        np.testing.assert_allclose(rays.origin[i], o, rtol=1e-5)
        np.testing.assert_allclose(rays.direction[i], d, rtol=1e-4, atol=1e-3)


def test_rng_distributions():
    key = jax.random.key(42)
    ball = crng.random_in_unit_sphere(key, (4096,))
    r = np.linalg.norm(np.asarray(ball), axis=-1)
    assert (r <= 1.0 + 1e-6).all()
    # uniform ball: E[r] = 3/4
    assert abs(r.mean() - 0.75) < 0.02

    disk = crng.random_in_unit_disk(key, (4096,))
    d = np.asarray(disk)
    assert np.allclose(d[:, 2], 0)
    rr = np.linalg.norm(d[:, :2], axis=-1)
    assert (rr <= 1.0 + 1e-6).all()
    # uniform disk: E[r] = 2/3
    assert abs(rr.mean() - 2 / 3) < 0.02


def test_background_sky():
    from cudaraytracer_tpu.ops.integrators import background_sky
    d = jnp.asarray([[0.3, -1.2, 0.5], [0.0, 1.0, 0.0]])
    got = background_sky(d)
    for i in range(2):
        np.testing.assert_allclose(got[i], oracle.background_sky(np.asarray(d[i])),
                                   rtol=1e-5)


def test_keyframe_slerp_guarded():
    """Regression: slerp between identical keys (held pose) or with a zero
    key (default rotation) used to produce NaN; it must fall back to lerp
    with finite values and gradients."""
    import jax
    from cudaraytracer_tpu.models.animation import evaluate, make_track
    track = make_track([
        (0, (1, 0, 0), (0, 0, 0), (1, 1, 1)),      # zero rotation key
        (10, (1, 0, 0), (0, 0, 0), (1, 1, 1)),     # identical -> held pose
        (20, (0, 2, 0), (90, 0, 0), (2, 2, 2)),
    ])
    for f in (0.0, 5.0, 15.0, 20.0):
        trs = evaluate(track, f, slerp=True)
        for arr in trs:
            assert np.isfinite(np.asarray(arr)).all(), f

    def loss(pos):
        t2 = track._replace(position=pos)
        trs = evaluate(t2, 15.0, slerp=True)
        return jnp.sum(trs.position)

    g = np.asarray(jax.grad(loss)(track.position))
    assert np.isfinite(g).all()
