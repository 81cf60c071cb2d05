"""Decompose the PLANE-DUMP mega_tex (want_tex) on TPU — run solo."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
import cudaraytracer_tpu as crt
from cudaraytracer_tpu.core.camera import generate_pixel_rays
from cudaraytracer_tpu.models import presets
from cudaraytracer_tpu.ops import megakernel as mk
from bench import _mega_tables

def timed(name, fn, *args, iters=2):
    @jax.jit
    def run(*a):
        def body(acc, i):
            return acc + fn(i, *a), None
        tot, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(iters))
        return tot
    t0 = time.perf_counter(); float(run(*args))
    comp = time.perf_counter() - t0
    t0 = time.perf_counter(); s = float(run(*args))
    dt = (time.perf_counter() - t0) / iters
    assert s == s
    print(f"{name}: {dt:.4f} s/iter (compile {comp:.1f}s)", flush=True)

w, h, spp = 960, 540, 8
scene, cam = presets.random_spheres(aspect=w / h, textured=True)
cfg = crt.RenderConfig(width=w, height=h, samples=spp, max_depth=8,
                       integrator="path", engine="mega")
tables = _mega_tables(scene)
rays = generate_pixel_rays(cam, w, h, spp, jax.random.key(0))
print(f"{rays.origin.shape[0]} rays", flush=True)

timed("A mega plain", lambda i, sc, tb: jnp.mean(mk.trace_path_mega(
    sc, rays, jax.random.fold_in(jax.random.key(1), i), cfg, tb)),
    scene, tables)

timed("P want_tex planes only", lambda i, sc, tb: jnp.mean(
    mk._mega_tex_planes(sc, rays, jax.random.fold_in(jax.random.key(1), i),
                        cfg, tb, None)), scene, tables)

flat = jax.jit(lambda sc, tb: mk._mega_tex_planes(
    sc, rays, jax.random.key(1), cfg, tb, None))(scene, tables)

timed("R reconstruction only", lambda i, sc, tb, fl: jnp.mean(
    mk._deferred_texture_radiance(sc, tb, fl, cfg.max_depth + 1,
                                  cfg.quirks)), scene, tables, flat)

timed("E mega_tex full", lambda i, sc, tb: jnp.mean(mk.trace_path_mega_tex(
    sc, rays, jax.random.fold_in(jax.random.key(1), i), cfg, tables=tb)),
    scene, tables)
