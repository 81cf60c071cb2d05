import sys, time
import os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
import jax, jax.numpy as jnp
import cudaraytracer_tpu.ops.pallas_intersect as pk

for tr in (32, 16, 8):
    pk.TILE_ROWS = tr
    jax.clear_caches()
    import importlib
    import cudaraytracer_tpu as crt
    from cudaraytracer_tpu.ops.render import render_image, pallas_intersector
    from bench import _build_scene
    scene, cam = _build_scene("random_spheres", 1920, 1080)
    cfg = crt.RenderConfig(width=1920, height=1080, samples=16, max_depth=8,
                           integrator="path", ray_chunk=1 << 17,
                           engine="wavefront")
    isect = pallas_intersector(cfg)
    @jax.jit
    def frame(s, key, isect=isect):
        return jnp.mean(render_image(s, cam, key, cfg, isect))
    try:
        float(frame(scene, jax.random.key(0)))
        t0 = time.perf_counter()
        v = float(frame(scene, jax.random.key(1)))
        dt = time.perf_counter() - t0
        print(f"TILE_ROWS={tr}: {dt:.3f}s ({1920*1080*16/dt/1e6:.2f}M) "
              f"mean={v:.5f}", flush=True)
    except Exception as e:
        print(f"TILE_ROWS={tr}: FAILED {type(e).__name__}: {e}", flush=True)
pk.TILE_ROWS = 32
