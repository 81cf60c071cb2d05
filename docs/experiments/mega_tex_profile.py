"""mega_tex composition overhead: kernel 0.29s + reconstruction 0.36s but
0.92-1.06s composed (ROUND3_NOTES backlog #2) — profile the composed frame
and attribute the gap.  Run solo on the TPU."""
import sys, time, glob, gzip, json, collections
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
import cudaraytracer_tpu as crt
from cudaraytracer_tpu.ops import megakernel as mk
from cudaraytracer_tpu.core.camera import generate_pixel_rays
from cudaraytracer_tpu.ops.render import _swizzled_pixels
from bench import _tex_scene, _mega_tables

W, H, SPP = 1280, 720, 8
scene, cam = _tex_scene(W / H)
tables = _mega_tables(scene)
cfg = crt.RenderConfig(width=W, height=H, samples=SPP, max_depth=8,
                       integrator="path", engine="mega", ray_chunk=1 << 17,
                       quirks=crt.Quirks.fixed())
pix = _swizzled_pixels(W, H)
rays = generate_pixel_rays(cam, W, H, SPP, jax.random.key(0), pix)
n = rays.origin.shape[0]
print(f"{scene.n_triangles} tris, {n} rays", flush=True)


def timeit(fn, *a, iters=2):
    float(jnp.sum(jnp.asarray(jax.tree.leaves(fn(*a))[0], jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*a)
    float(jnp.sum(jnp.asarray(jax.tree.leaves(out)[0], jnp.float32)))
    return (time.perf_counter() - t0) / iters


# leg 1: kernel only (padded plane dump, no reconstruction)
planes_fn = jax.jit(lambda s, tb: mk._mega_tex_planes(
    s, rays, jax.random.key(3), cfg, tb, None, padded=True))
t_k = timeit(planes_fn, scene, tables)
flat = planes_fn(scene, tables)
print(f"kernel (plane dump): {t_k:.3f}s  flat {flat.shape}", flush=True)

# leg 2: reconstruction only, from a materialized flat
recon_fn = jax.jit(lambda s, tb, f: mk._deferred_texture_radiance(
    s, tb, f, cfg.max_depth + 1, cfg.quirks))
t_r = timeit(recon_fn, scene, tables, flat)
print(f"reconstruction only: {t_r:.3f}s", flush=True)

# leg 3: composed
comp_fn = jax.jit(lambda s, tb: mk.trace_path_mega_tex(
    s, rays, jax.random.key(3), cfg, tables=tb))
t_c = timeit(comp_fn, scene, tables)
print(f"composed: {t_c:.3f}s  (gap {t_c - t_k - t_r:+.3f}s)", flush=True)

# profile the composed frame
outdir = "/tmp/prof_megatex"
with jax.profiler.trace(outdir):
    out = comp_fn(scene, tables)
    float(jnp.sum(out))
fs = glob.glob(outdir + "/**/*.trace.json.gz", recursive=True)
ev = json.load(gzip.open(sorted(fs)[-1]))["traceEvents"]
tot = collections.Counter()
for e in ev:
    if e.get("ph") == "X" and e.get("dur") and "name" in e:
        tot[e["name"]] += e["dur"]
print("top ops (one composed frame):", flush=True)
for nm, us in tot.most_common(25):
    if us > 3000:
        print(f"  {us/1e6:8.4f}s  {nm}", flush=True)
