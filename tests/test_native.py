"""Native C++ BVH builder: layout identity with the Python builder."""

import numpy as np
import pytest

from cudaraytracer_tpu.native import get_lib
from cudaraytracer_tpu.ops import bvh as bvhmod


@pytest.mark.skipif(get_lib() is None, reason="no native toolchain")
def test_native_matches_python_builder():
    rng = np.random.default_rng(0)
    for n in [1, 2, 3, 7, 100, 2000]:
        c = rng.uniform(-5, 5, (n, 3)).astype(np.float32)
        lo = c - rng.uniform(0.01, 0.4, (n, 3)).astype(np.float32)
        hi = c + rng.uniform(0.01, 0.4, (n, 3)).astype(np.float32)
        b_nat = bvhmod.build_bvh(lo, hi, backend="native")
        b_py = bvhmod.build_bvh(lo, hi, backend="python")
        assert b_nat.n_nodes == b_py.n_nodes, n
        for name in ["bbox_min", "bbox_max", "is_leaf", "skip", "prim0",
                     "prim1", "child_l", "child_r"]:
            a = np.asarray(getattr(b_nat, name))
            b = np.asarray(getattr(b_py, name))
            if a.dtype.kind == "f":
                np.testing.assert_allclose(a, b, atol=1e-5, err_msg=name)
            else:
                np.testing.assert_array_equal(a, b, err_msg=name)
        assert len(b_nat.levels) == len(b_py.levels)
        for la, lb in zip(b_nat.levels, b_py.levels):
            np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


@pytest.mark.skipif(get_lib() is None, reason="no native toolchain")
def test_native_traversal_consistency():
    """A render-path check: BVH built natively traverses identically."""
    import jax.numpy as jnp
    from cudaraytracer_tpu.config import Quirks
    from cudaraytracer_tpu.core.rays import make_rays

    rng = np.random.default_rng(1)
    n = 300
    c = rng.uniform(-3, 3, (n, 3)).astype(np.float32) + [0, 0, -8]
    v0 = c
    v1 = c + rng.normal(scale=0.4, size=(n, 3)).astype(np.float32)
    v2 = c + rng.normal(scale=0.4, size=(n, 3)).astype(np.float32)
    nrm = np.cross(v1 - v0, v2 - v0)
    nrm = (nrm / np.maximum(np.linalg.norm(nrm, axis=-1, keepdims=True),
                            1e-20)).astype(np.float32)
    lo, hi = bvhmod.triangle_bounds(v0, v1, v2)
    b_nat = bvhmod.build_bvh(lo, hi, backend="native")
    b_py = bvhmod.build_bvh(lo, hi, backend="python")

    o = np.zeros((64, 3), np.float32)
    d = rng.normal(size=(64, 3)).astype(np.float32)
    d[:, 2] = -np.abs(d[:, 2]) - 0.3
    rays = make_rays(jnp.asarray(o), jnp.asarray(d))
    q = Quirks.reference()
    t1, p1 = bvhmod.traverse_bvh(b_nat, jnp.asarray(v0), jnp.asarray(v1),
                                 jnp.asarray(v2), jnp.asarray(nrm), rays,
                                 1e-3, 3.4e38, q)
    t2, p2 = bvhmod.traverse_bvh(b_py, jnp.asarray(v0), jnp.asarray(v1),
                                 jnp.asarray(v2), jnp.asarray(nrm), rays,
                                 1e-3, 3.4e38, q)
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))
    np.testing.assert_allclose(np.asarray(t1), np.asarray(t2), rtol=1e-6)
