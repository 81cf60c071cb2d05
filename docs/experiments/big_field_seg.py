"""124k-tri field (path-8, fixed): segment-size + compaction-key sweep.

The union-of-work floor (PERF.md honest weak spots) says per-segment lane
utilization is ~0.2%: every reachable SEG_T-triangle segment sweeps all
4096 tile lanes for the ~8 lanes that need it.  Finer segments waste
proportionally less math per reachable segment (at more slab tests + DMA
descriptors); finer octant-compaction cells group rays into tiles whose
reachable-segment sets are smaller.  This sweeps both knobs.  Run solo on
the TPU (one process at a time — PERF.md measurement hygiene).
"""
import sys, time, dataclasses
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
import cudaraytracer_tpu as crt
from cudaraytracer_tpu.ops import megakernel as mk
from cudaraytracer_tpu.ops.render import render_image
from bench import _big_field_scene, _mega_tables

scene, cam = _big_field_scene()
print(f"{scene.n_triangles} tris", flush=True)
base = crt.RenderConfig(width=1280, height=720, samples=8, max_depth=8,
                        integrator="path", engine="mega", ray_chunk=1 << 17,
                        quirks=crt.Quirks.fixed(), compact_auto=False)


def timed(name, cfg, seg_t=2048, coarse_shift=18, iters=1):
    mk.SEG_T = seg_t
    mk._OCT_COARSE_SHIFT = coarse_shift
    tables = _mega_tables(scene)

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
    return dt


ce2 = dataclasses.replace(base, compact_every=2, compact_octants=True,
                          mega_f2b_shells=8)
timed("ce2+oct+f2b8 seg2048 (r3 best)", ce2, seg_t=2048)
timed("ce2+oct+f2b8 seg1024", ce2, seg_t=1024)
timed("ce2+oct+f2b8 seg512", ce2, seg_t=512)
timed("ce2+oct+f2b8 seg256", ce2, seg_t=256)
timed("ce2+oct+f2b8 seg2048 cell32", ce2, seg_t=2048, coarse_shift=15)
timed("ce2+oct+f2b8 seg512 cell32", ce2, seg_t=512, coarse_shift=15)
ce1 = dataclasses.replace(base, compact_every=1, compact_octants=True,
                          mega_f2b_shells=8)
timed("ce1+oct+f2b8 seg512", ce1, seg_t=512)
