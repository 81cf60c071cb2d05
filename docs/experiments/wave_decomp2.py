import sys, time, dataclasses
import os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
import jax, jax.numpy as jnp
import cudaraytracer_tpu as crt
from cudaraytracer_tpu.ops.render import render_image, pallas_intersector
from cudaraytracer_tpu.ops import intersect as isect_mod
from bench import _build_scene

W, H, SPP = 1920, 1080, 16
scene, cam = _build_scene("random_spheres", W, H)
cfg = crt.RenderConfig(width=W, height=H, samples=SPP, max_depth=8,
                       integrator="path", ray_chunk=1 << 17,
                       engine="wavefront")

def timed(name, isect):
    @jax.jit
    def frame(s, key):
        return jnp.mean(render_image(s, cam, key, cfg, isect))
    float(frame(scene, jax.random.key(0)))
    t0 = time.perf_counter()
    v = float(frame(scene, jax.random.key(1)))
    print(f"{name}: {time.perf_counter()-t0:.3f}s  mean={v:.5f}", flush=True)

timed("full (morton cull)", pallas_intersector(cfg))

# glue only: always-miss intersect -> scan + RNG + decode(miss rows) + sky
def miss_fn(scene, rays, aux, alive=None):
    n = rays.origin.shape[0]
    t = jnp.full((n,), isect_mod.BIG)
    i = jnp.full((n,), -1, jnp.int32)
    return isect_mod.finalize_hits(scene, rays, t, i, cfg.t_min, cfg.t_max,
                                   cfg.quirks)
timed("glue (always miss)", miss_fn)

# sweep-only proxy: intersect but produce hits that immediately die
# (throughput*0): miss after real sweep -> sweep + glue, no live shading
real = pallas_intersector(cfg)
def sweep_then_miss(scene, rays, aux, alive=None):
    h = real(scene, rays, aux, alive=alive)
    n = rays.origin.shape[0]
    t = jnp.full((n,), isect_mod.BIG) + 0.0 * h.t  # keep sweep live
    i = jnp.full((n,), -1, jnp.int32) + 0 * h.prim
    return isect_mod.finalize_hits(scene, rays, t, i, cfg.t_min, cfg.t_max,
                                   cfg.quirks)
timed("sweep+miss-glue   ", sweep_then_miss)
