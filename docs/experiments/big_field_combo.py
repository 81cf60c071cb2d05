"""124k-tri field (path-8, fixed quirks): compaction x f2b combinations.

Round 2 measured ce=2+octants 8.21 s vs mono 13.67 s, and f2b=8 mono
12.80 s; this A/Bs the untried combinations (f2b reorders segment visits
INSIDE each compaction window).  Run solo on the TPU.
"""
import sys, time, dataclasses
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
import cudaraytracer_tpu as crt
from cudaraytracer_tpu.ops.render import render_image
from bench import _big_field_scene, _mega_tables

scene, cam = _big_field_scene()
print(f"{scene.n_triangles} tris", flush=True)
tables = _mega_tables(scene)
base = crt.RenderConfig(width=1280, height=720, samples=8, max_depth=8,
                        integrator="path", engine="mega", ray_chunk=1 << 17,
                        quirks=crt.Quirks.fixed(), compact_auto=False)

def timed(name, cfg, iters=1):
    @jax.jit
    def run(sc, tb, key):
        def body(acc, i):
            img = render_image(sc, cam, jax.random.fold_in(key, i), cfg,
                               None, tb)
            return acc + jnp.mean(img), None
        tot, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(iters))
        return tot
    t0 = time.perf_counter(); float(run(scene, tables, jax.random.key(0)))
    comp = time.perf_counter() - t0
    t0 = time.perf_counter()
    s = float(run(scene, tables, jax.random.key(1)))
    dt = (time.perf_counter() - t0) / iters
    assert s == s
    print(f"{name}: {dt:.3f} s/frame (compile {comp:.0f}s)", flush=True)

timed("ce2+oct (round-2 best)", dataclasses.replace(
    base, compact_every=2, compact_octants=True))
timed("ce2+oct+f2b4", dataclasses.replace(
    base, compact_every=2, compact_octants=True, mega_f2b_shells=4))
timed("ce2+oct+f2b8", dataclasses.replace(
    base, compact_every=2, compact_octants=True, mega_f2b_shells=8))
timed("ce3+oct", dataclasses.replace(
    base, compact_every=3, compact_octants=True))
