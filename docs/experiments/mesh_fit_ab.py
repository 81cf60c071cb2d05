"""Mesh-scale fit A/B: bunny VERTEX fit, wavefront+pallas vs mega_diff."""
import sys, time, dataclasses
import os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
import jax, jax.numpy as jnp
import cudaraytracer_tpu as crt
from cudaraytracer_tpu.ops.integrators import integrate
from cudaraytracer_tpu.ops.render import pallas_intersector_pair
from cudaraytracer_tpu.core.camera import generate_pixel_rays
from bench import _mesh_scene

scene, cam = _mesh_scene(512, 256)
cfg0 = crt.RenderConfig(width=512, height=256, samples=2, max_depth=4,
                        gamma=False, quirks=crt.Quirks.fixed())
rays = generate_pixel_rays(cam, 512, 256, 2, jax.random.key(0))
key = jax.random.key(1)
target = integrate(scene, rays, key, cfg0)

def fit_time(engine, isect_kind, n_steps=4):
    cfg = dataclasses.replace(cfg0, engine=engine,
                              wavefront_kernel_attrs=True)
    isect = pallas_intersector_pair(cfg) if isect_kind == "P" else None

    def loss(p):
        s = scene.with_triangle_vertices(*p)
        return jnp.mean((integrate(s, rays, key, cfg, isect) - target) ** 2)

    p0 = (scene.triangles.v0 + 0.002, scene.triangles.v1,
          scene.triangles.v2)

    @jax.jit
    def run(p):
        def body(p, _):
            l, g = jax.value_and_grad(loss)(p)
            return jax.tree.map(lambda x, gx: x - 0.1 * gx, p, g), l
        p, ls = jax.lax.scan(body, p, None, length=n_steps)
        return ls[-1]
    float(run(p0))
    t0 = time.perf_counter()
    l = float(run(p0))
    assert l == l
    return (time.perf_counter() - t0) / n_steps

for name, engine, kind in (("wavefront brute", "wavefront", None),
                           ("wavefront pallas", "wavefront", "P"),
                           ("mega_diff", "mega_diff", None)):
    try:
        dt = fit_time(engine, kind)
        print(f"bunny vertex fit {name:17s}: {dt:.4f} s/step", flush=True)
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)
