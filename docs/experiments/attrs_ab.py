import sys, time, dataclasses
import os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
import jax, jax.numpy as jnp
import cudaraytracer_tpu as crt
from cudaraytracer_tpu.ops import intersect as I
from cudaraytracer_tpu.ops.render import render_image, pallas_intersector
from cudaraytracer_tpu.ops.integrators import integrate
from cudaraytracer_tpu.core.camera import generate_pixel_rays
from bench import _build_scene, _fit_step_times

W, H, SPP = 1920, 1080, 16
scene, cam = _build_scene("random_spheres", W, H)
cfg = crt.RenderConfig(width=W, height=H, samples=SPP, max_depth=8,
                       integrator="path", ray_chunk=1 << 17,
                       engine="wavefront")
gcfg = dataclasses.replace(cfg, width=512, height=256, samples=4,
                           max_depth=4, gamma=False)
grays = generate_pixel_rays(cam, 512, 256, 4, jax.random.key(0))

for ka in (True, False, True):
    acfg = dataclasses.replace(cfg, wavefront_kernel_attrs=ka)
    jax.clear_caches()
    isect = pallas_intersector(acfg)
    @jax.jit
    def frame(s, key, isect=isect):
        return jnp.mean(render_image(s, cam, key, cfg, isect))
    float(frame(scene, jax.random.key(0)))
    t0 = time.perf_counter()
    v = float(frame(scene, jax.random.key(1)))
    dt = time.perf_counter() - t0
    gisect = pallas_intersector(
        dataclasses.replace(gcfg, wavefront_kernel_attrs=ka))
    def loss(p, gisect=gisect):
        s = scene._replace(spheres=scene.spheres._replace(center=p))
        return jnp.mean(integrate(s, grays, jax.random.key(1), gcfg, gisect))
    g = jax.jit(jax.grad(loss))
    jax.block_until_ready(g(scene.spheres.center))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(jnp.sum(g(scene.spheres.center)[0]))
        ts.append(time.perf_counter() - t0)
    print(f"attrs={ka}: frame {dt:.3f}s ({W*H*SPP/dt/1e6:.2f}M) "
          f"mean={v:.5f} grad min={min(ts):.4f}s", flush=True)

w, m = _fit_step_times()
print(f"fit_step wavefront={w:.4f} mega_diff={m:.4f}", flush=True)
