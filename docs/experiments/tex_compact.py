"""A/B the round-5 deferred-texturing LANE COMPACTION (VERDICT r4 #1):
stable-partition ever-hit lanes first + cheap-branch dead chunks in
_deferred_texture_radiance, vs the plain chunk map.  Run SOLO on the TPU.

Workload: the bench tex leg (image-textured bunny, 1280x720x8 path-8
fixed quirks).  Also writes /tmp/tex_compact.png for visual verification.
"""
import sys, time
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


def timeit(fn, *a, iters=3):
    float(jnp.sum(jnp.asarray(jax.tree.leaves(fn(*a))[0], jnp.float32)))
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*a)
        float(jnp.sum(jnp.asarray(jax.tree.leaves(out)[0], jnp.float32)))
        best = min(best, time.perf_counter() - t0)
    return best


# kernel-only leg (shared by both forms)
planes_fn = jax.jit(lambda s, tb: mk._mega_tex_planes(
    s, rays, jax.random.key(3), cfg, tb, None, padded=True))
t_k = timeit(planes_fn, scene, tables)
flat = planes_fn(scene, tables)
ever = np.asarray(jnp.any(
    flat[3:3 + 10 * 9].reshape(9, 10, -1)[:, 0, :] >= 0.0, axis=0))
print(f"kernel (plane dump): {t_k:.3f}s  flat {flat.shape}  "
      f"ever-hit lanes: {ever.mean():.1%}", flush=True)

for compact in (False, True):
    recon_fn = jax.jit(lambda s, tb, f, c=compact: mk._deferred_texture_radiance(
        s, tb, f, cfg.max_depth + 1, cfg.quirks, compact=c))
    t_r = timeit(recon_fn, scene, tables, flat)
    print(f"reconstruction compact={compact}: {t_r:.3f}s", flush=True)

# chunk-size sweep under the flag form: skipping changes the optimum
for ch_log in (13, 14, 15, 16, 17):
    mk._TEX_CHUNK = 1 << ch_log
    recon_fn = jax.jit(lambda s, tb, f, _v=ch_log: mk._deferred_texture_radiance(
        s, tb, f, cfg.max_depth + 1, cfg.quirks, compact=True))
    t_r = timeit(recon_fn, scene, tables, flat)
    print(f"reconstruction compact CH=2^{ch_log}: {t_r:.3f}s", flush=True)
# isolate flag effect from chunk size: plain map at the small chunk
for ch_log in (15, 16):
    mk._TEX_CHUNK = 1 << ch_log
    recon_fn = jax.jit(lambda s, tb, f, _v=ch_log: mk._deferred_texture_radiance(
        s, tb, f, cfg.max_depth + 1, cfg.quirks, compact=False))
    t_r = timeit(recon_fn, scene, tables, flat)
    print(f"reconstruction PLAIN CH=2^{ch_log}: {t_r:.3f}s", flush=True)
mk._TEX_CHUNK = 1 << 18

# composed A/B (the bench-visible number); compact is the default
comp_fn = jax.jit(lambda s, tb: mk.trace_path_mega_tex(
    s, rays, jax.random.key(3), cfg, tables=tb))
t_c = timeit(comp_fn, scene, tables)
print(f"composed (compact default): {t_c:.3f}s", flush=True)

out = np.asarray(comp_fn(scene, tables))        # (n_rays, 3) swizzled
img = np.zeros((W * H, 3), np.float32)
img[np.asarray(pix)] = out.reshape(-1, SPP, 3).mean(1)
img = np.clip(np.sqrt(np.clip(img, 0, None)), 0, 1)   # gamma
from cudaraytracer_tpu.utils.image import write_png
write_png("/tmp/tex_compact.png", img.reshape(H, W, 3))
print("wrote /tmp/tex_compact.png", flush=True)
