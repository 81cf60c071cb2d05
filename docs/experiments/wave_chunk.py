import sys, time, dataclasses
import os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
import jax, jax.numpy as jnp
import cudaraytracer_tpu as crt
from cudaraytracer_tpu.ops.render import render_image, pallas_intersector
from bench import _build_scene

W, H, SPP = 1920, 1080, 16
scene, cam = _build_scene("random_spheres", W, H)

for lg in (17, 18, 19, 20, 21):
    cfg = crt.RenderConfig(width=W, height=H, samples=SPP, max_depth=8,
                           integrator="path", ray_chunk=1 << lg,
                           engine="wavefront")
    isect = pallas_intersector(cfg)
    @jax.jit
    def frame(s, key, cfg=cfg, isect=isect):
        return jnp.mean(render_image(s, cam, key, cfg, isect))
    try:
        t0 = time.perf_counter(); float(frame(scene, jax.random.key(0)))
        comp = time.perf_counter() - t0
        t0 = time.perf_counter()
        v = float(frame(scene, jax.random.key(1)))
        dt = time.perf_counter() - t0
        print(f"wavefront chunk=2^{lg}: {dt:.3f}s ({W*H*SPP/dt/1e6:.2f}M) "
              f"mean={v:.5f} (compile {comp:.0f}s)", flush=True)
    except Exception as e:
        print(f"chunk=2^{lg}: FAILED {type(e).__name__}: {e}", flush=True)

# mega too
for lg in (17, 19, 20):
    cfg = crt.RenderConfig(width=W, height=H, samples=SPP, max_depth=8,
                           integrator="path", ray_chunk=1 << lg,
                           engine="mega")
    from bench import _mega_tables
    aux = _mega_tables(scene)
    @jax.jit
    def frame(s, a, key, cfg=cfg):
        return jnp.mean(render_image(s, cam, key, cfg, None, a))
    try:
        float(frame(scene, aux, jax.random.key(0)))
        t0 = time.perf_counter()
        v = float(frame(scene, aux, jax.random.key(1)))
        dt = time.perf_counter() - t0
        print(f"mega      chunk=2^{lg}: {dt:.3f}s ({W*H*SPP/dt/1e6:.2f}M) "
              f"mean={v:.5f}", flush=True)
    except Exception as e:
        print(f"mega chunk=2^{lg}: FAILED {type(e).__name__}: {e}", flush=True)
