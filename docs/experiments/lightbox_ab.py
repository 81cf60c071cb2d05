import sys, time
import os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
import jax, jax.numpy as jnp
import cudaraytracer_tpu as crt
from cudaraytracer_tpu.models import presets
from cudaraytracer_tpu.ops import intersect as I
from cudaraytracer_tpu.ops.render import render_image, pallas_intersector

scene, cam = presets.light_box(aspect=16 / 9)
cfg = crt.RenderConfig(width=1280, height=720, samples=16, max_depth=8,
                       integrator="path", ray_chunk=1 << 17,
                       engine="wavefront")
for fold in (True, False, True):
    I.FOLD_DEC = fold
    jax.clear_caches()
    isect = pallas_intersector(cfg)
    @jax.jit
    def frame(s, key, isect=isect):
        return jnp.mean(render_image(s, cam, key, cfg, isect))
    float(frame(scene, jax.random.key(0)))
    t0 = time.perf_counter()
    v = float(frame(scene, jax.random.key(1)))
    dt = time.perf_counter() - t0
    print(f"light_box wavefront fold={fold}: {dt:.3f}s "
          f"({1280*720*16/dt/1e6:.2f}M rays/s) mean={v:.5f}", flush=True)
