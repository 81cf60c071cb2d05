import sys, time, glob, gzip, json, collections
import os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
import jax, jax.numpy as jnp
import cudaraytracer_tpu as crt
from cudaraytracer_tpu.ops.render import render_image
from bench import _build_scene, _mega_tables

W, H, SPP = 1920, 1080, 16
scene, cam = _build_scene("random_spheres", W, H)
cfg = crt.RenderConfig(width=W, height=H, samples=SPP, max_depth=8,
                       integrator="path", ray_chunk=1 << 17, engine="mega")
aux = _mega_tables(scene)

@jax.jit
def frame(s, a, key):
    return jnp.mean(render_image(s, cam, key, cfg, None, a))

float(frame(scene, aux, jax.random.key(0)))
t0 = time.perf_counter()
v = float(frame(scene, aux, jax.random.key(1)))
print(f"mega headline: {time.perf_counter()-t0:.3f}s mean={v:.5f}", flush=True)

# depth scaling: cost per bounce
import dataclasses
for depth in (0, 2, 4, 8):
    dcfg = dataclasses.replace(cfg, max_depth=depth)
    @jax.jit
    def fr(s, a, key, dcfg=dcfg):
        return jnp.mean(render_image(s, cam, key, dcfg, None, a))
    float(fr(scene, aux, jax.random.key(0)))
    t0 = time.perf_counter()
    float(fr(scene, aux, jax.random.key(1)))
    print(f"  depth={depth}: {time.perf_counter()-t0:.3f}s", flush=True)

# builder-order tables: how much is the Morton+cull worth now?
from cudaraytracer_tpu.ops import megakernel as mk
aux_b = mk.build_mega_tables(scene)
float(frame(scene, aux_b, jax.random.key(0)))
t0 = time.perf_counter()
float(frame(scene, aux_b, jax.random.key(1)))
print(f"builder-order tables: {time.perf_counter()-t0:.3f}s", flush=True)

with jax.profiler.trace("/tmp/prof_mega"):
    float(frame(scene, aux, jax.random.key(2)))
fs = glob.glob("/tmp/prof_mega/**/*.trace.json.gz", recursive=True)
ev = json.load(gzip.open(sorted(fs)[-1]))["traceEvents"]
tot = collections.Counter()
for e in ev:
    if e.get("ph") == "X" and e.get("dur") and "name" in e:
        tot[e["name"]] += e["dur"]
for nm, us in tot.most_common(15):
    if us > 5000:
        print(f"  {us/1e6:8.4f}s  {nm}", flush=True)
