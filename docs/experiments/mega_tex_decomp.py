"""Decompose trace_path_mega_tex cost on TPU (run solo: one TPU process).

Legs, each timed as K iterations inside one jitted scan + scalar fetch:
  A  trace_path_mega, in-kernel PRNG (the plain fused frame)
  B  stream_from_key alone (threefry for rays x depth x 4 draws)
  C  trace_path_mega want_winners + injected stream (the recording sweep)
  D  the replay: trace_path(samples=stream, winners=w), winners precomputed
  E  full trace_path_mega_tex (= B + C + D fused in one jit)
  W  wavefront engine (per-bounce pallas sweeps) for reference

Usage: python docs/experiments/mega_tex_decomp.py [width height spp iters]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

import cudaraytracer_tpu as crt
from cudaraytracer_tpu.core.camera import generate_pixel_rays
from cudaraytracer_tpu.models import presets
from cudaraytracer_tpu.ops import integrators as integ
from cudaraytracer_tpu.ops import megakernel as mk
from cudaraytracer_tpu.ops.render import pallas_intersector
from bench import _mega_tables


def timed(name, fn, *args, iters=2):
    @jax.jit
    def run(*a):
        def body(acc, i):
            return acc + fn(i, *a), None
        tot, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(iters))
        return tot
    t0 = time.perf_counter()
    float(run(*args))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    s = float(run(*args))
    dt = (time.perf_counter() - t0) / iters
    assert s == s, f"NaN in {name}"
    print(f"{name}: {dt:.4f} s/iter (compile {compile_s:.1f}s)", flush=True)
    return dt


def main():
    w, h, spp, iters = (int(x) for x in (sys.argv[1:] + ["960", "540", "8",
                                                         "2"])[:4])
    scene, cam = presets.random_spheres(aspect=w / h, textured=True)
    cfg = crt.RenderConfig(width=w, height=h, samples=spp, max_depth=8,
                           integrator="path", engine="mega")
    tables = _mega_tables(scene)
    rays = generate_pixel_rays(cam, w, h, spp, jax.random.key(0))
    n = rays.origin.shape[0]
    print(f"{w}x{h}x{spp} = {n} rays, {scene.n_spheres} spheres", flush=True)

    timed("A mega (in-kernel PRNG)",
          lambda i, sc, tb: jnp.mean(mk.trace_path_mega(
              sc, rays, jax.random.fold_in(jax.random.key(1), i), cfg, tb)),
          scene, tables, iters=iters)

    timed("B stream_from_key",
          lambda i, _sc, _tb: sum(
              jnp.mean(x) for x in jax.tree.leaves(integ.stream_from_key(
                  jax.random.fold_in(jax.random.key(1), i), n,
                  cfg.max_depth))),
          scene, tables, iters=iters)

    stream = integ.stream_from_key(jax.random.key(2), n, cfg.max_depth)

    def rec(i, sc, tb, st):
        out, win = mk.trace_path_mega(sc, rays, jax.random.key(1), cfg, tb,
                                      samples=st, want_winners=True)
        return jnp.mean(out) + jnp.mean(win.astype(jnp.float32))
    timed("C mega want_winners (injected)", rec, scene, tables, stream,
          iters=iters)

    _, winners = jax.jit(lambda sc, tb, st: mk.trace_path_mega(
        sc, rays, jax.random.key(1), cfg, tb, samples=st,
        want_winners=True))(scene, tables, stream)

    timed("D replay only",
          lambda i, sc, st, wn: jnp.mean(integ.trace_path(
              sc, rays, jax.random.key(1), cfg, samples=st, winners=wn)),
          scene, stream, winners, iters=iters)

    timed("E mega_tex full",
          lambda i, sc, tb: jnp.mean(mk.trace_path_mega_tex(
              sc, rays, jax.random.fold_in(jax.random.key(1), i), cfg,
              tables=tb)),
          scene, tables, iters=iters)

    wcfg = crt.RenderConfig(width=w, height=h, samples=spp, max_depth=8,
                            integrator="path", engine="wavefront")
    isect = pallas_intersector(wcfg)
    timed("W wavefront (pallas sweeps)",
          lambda i, sc: jnp.mean(integ.trace_path(
              sc, rays, jax.random.fold_in(jax.random.key(1), i), wcfg,
              intersect_fn=isect)),
          scene, iters=iters)


if __name__ == "__main__":
    main()
