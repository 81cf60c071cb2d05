"""Blind-spot closer (VERDICT r4 weak #5): force the PRODUCTION fit path —
the Pallas sweep pair + attrs kernel — through interpret mode on the CPU
mesh, and pin it against the brute-force jnp path the other CPU guards
watch.

Why this exists: make_fit_step builds the Pallas pair only on TPU (the
interpret-mode pair would bog the virtual-mesh suites), so SCALING's fit
ratios and test_perf_guard guard the brute jnp intersect — a path
production fits no longer run.  The round-1-to-4 fit bug (fits silently on
the brute intersect for three rounds, 31x — ROUND4_NOTES §20) lived in
exactly this kind of gap.  This test is the one place the production pair
runs under the CPU mesh; shapes are tiny because interpret-mode pallas is
~100x compiled pallas.
"""

import jax
import jax.numpy as jnp
import numpy as np

import cudaraytracer_tpu as crt
from cudaraytracer_tpu.models import presets
from cudaraytracer_tpu.parallel.mesh import make_mesh
from cudaraytracer_tpu.parallel.train import make_fit_step
from cudaraytracer_tpu.ops.render import render_image


def test_fit_step_pallas_pair_matches_brute_on_cpu():
    scene, cam = presets.three_spheres(aspect=1.5)
    cfg = crt.RenderConfig(width=24, height=16, samples=1, max_depth=3,
                           integrator="path", gamma=False,
                           ray_chunk=1 << 20)
    target = render_image(scene, cam, jax.random.key(5), cfg)
    tflat = jnp.asarray(np.asarray(target).reshape(-1, 3))
    params = {"albedo": scene.textures.color0 * 0.7 + 0.1,
              "centers": scene.spheres.center + 0.03}
    mesh = make_mesh(2, tp=1)

    step_pallas = make_fit_step(scene, cam, cfg, mesh, lr=0.5,
                                use_pallas=True)
    step_brute = make_fit_step(scene, cam, cfg, mesh, lr=0.5,
                               use_pallas=False)
    lp, pp = step_pallas(params, tflat, jax.random.key(7))
    lb, pb = step_brute(params, tflat, jax.random.key(7))

    assert np.isfinite(float(lp)) and np.isfinite(float(lb))
    # same hits, same shading, same estimator — the pair must agree with the
    # brute intersect to fp noise (both run the identical detached-discrete
    # + attached-continuous gradient construction)
    np.testing.assert_allclose(float(lp), float(lb), rtol=1e-5, atol=1e-6)
    for k in params:
        np.testing.assert_allclose(np.asarray(pp[k]), np.asarray(pb[k]),
                                   rtol=1e-4, atol=1e-5, err_msg=k)
    # and the step must have MOVED the params (a zero-grad pair would pass
    # the equality check trivially if brute also broke)
    assert np.abs(np.asarray(pp["albedo"]) -
                  np.asarray(params["albedo"])).max() > 1e-7
