"""Round-5 wavefront dispatch-overhead probe (VERDICT r4 #2 precursor).

Hypothesis: the wavefront's remaining 1.45x gap to the megakernel is NOT
sweep math (ROUND3 §7 showed 2.6% glue) but per-bounce per-ray-chunk
pallas_call dispatch + state round-trips: at ray_chunk=2^17 the headline
runs 253 ray chunks x 9 bounces ~= 2,277 kernel launches where the mega
runs 253.  If true, larger ray chunks should close part of the gap
without touching the kernels.

Sweep ray_chunk on the headline wavefront workload (1920x1080x16spp
path-8 random_spheres).  Run SOLO on the TPU.
"""
import sys, time, dataclasses
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
import cudaraytracer_tpu as crt
from cudaraytracer_tpu.models import presets
from cudaraytracer_tpu.ops.render import render_image, pallas_intersector

W, H, SPP = 1920, 1080, 16
scene, cam = presets.random_spheres(aspect=W / H)
print(f"{scene.n_spheres} spheres", flush=True)

for ch_log in (17, 18, 19, 20):
    cfg = crt.RenderConfig(width=W, height=H, samples=SPP, max_depth=8,
                           integrator="path", ray_chunk=1 << ch_log,
                           engine="wavefront")
    isect = pallas_intersector(cfg)

    @jax.jit
    def bench(scene, key):
        def body(acc, i):
            img = render_image(scene, cam, jax.random.fold_in(key, i), cfg,
                               isect, None)
            return acc + jnp.mean(img), None
        tot, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(2))
        return tot

    t0 = time.perf_counter()
    float(bench(scene, jax.random.key(0)))
    t_compile = time.perf_counter() - t0
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        s = float(bench(scene, jax.random.key(123)))
        best = min(best, (time.perf_counter() - t0) / 2)
    assert s == s
    print(f"ray_chunk=2^{ch_log}: {best:.3f}s/frame "
          f"({W*H*SPP/best/1e6:.2f}M rays/s, compile {t_compile:.0f}s)",
          flush=True)
