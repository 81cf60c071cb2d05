"""Where does the Morton-culled wavefront headline frame (2.95 s) go?
The megakernel runs the same scene at 1.62 s with identical chunk/tile
granularity — profile the wavefront frame and attribute the gap
(sweep kernel vs finalize/decode vs RNG/shade vs scan plumbing)."""
import sys, time, glob, gzip, json, collections
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
import cudaraytracer_tpu as crt
from cudaraytracer_tpu.ops.render import render_image, pallas_intersector
from bench import _build_scene

W, H, SPP = 1920, 1080, 16
scene, cam = _build_scene("random_spheres", W, H)
cfg = crt.RenderConfig(width=W, height=H, samples=SPP, max_depth=8,
                       integrator="path", ray_chunk=1 << 17,
                       engine="wavefront")
isect = pallas_intersector(cfg)

@jax.jit
def frame(s, key):
    return jnp.mean(render_image(s, cam, key, cfg, isect))

float(frame(scene, jax.random.key(0)))
t0 = time.perf_counter()
float(frame(scene, jax.random.key(1)))
print(f"frame: {time.perf_counter()-t0:.3f}s", flush=True)

outdir = "/tmp/prof_wave"
with jax.profiler.trace(outdir):
    float(frame(scene, jax.random.key(2)))
fs = glob.glob(outdir + "/**/*.trace.json.gz", recursive=True)
ev = json.load(gzip.open(sorted(fs)[-1]))["traceEvents"]
tot = collections.Counter()
for e in ev:
    if e.get("ph") == "X" and e.get("dur") and "name" in e:
        tot[e["name"]] += e["dur"]
print("top ops (one frame):", flush=True)
for nm, us in tot.most_common(40):
    if us > 3000:
        print(f"  {us/1e6:8.4f}s  {nm}", flush=True)
