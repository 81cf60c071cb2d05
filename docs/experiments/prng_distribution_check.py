"""TPU check: in-kernel PRNG vs injected-stream render statistics agree
(guards the signed->unsigned bit handling in draw_samples).  Run on TPU."""
import sys
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
import cudaraytracer_tpu as crt
from cudaraytracer_tpu.models import presets
from cudaraytracer_tpu.core.camera import get_rays
from cudaraytracer_tpu.ops.integrators import stream_from_key
from cudaraytracer_tpu.ops.megakernel import trace_path_mega, build_mega_tables

scene, cam = presets.three_spheres(aspect=2.0)
W, H, S, D = 256, 128, 16, 8
cfg = crt.RenderConfig(width=W, height=H, samples=S, max_depth=D,
                       integrator="path", engine="mega")
key = jax.random.key(7)
xs = (jnp.arange(W * S) // S).reshape(1, -1).repeat(H, 0).reshape(-1)
ys = jnp.arange(H).reshape(-1, 1).repeat(W * S, 1).reshape(-1)
jit = jax.random.uniform(jax.random.key(1), (2, xs.shape[0]))
s = (xs + jit[0]) / W
t = (ys + jit[1]) / H
rays = get_rays(cam, s, t, jax.random.key(2))
tables = build_mega_tables(scene)

n = rays.origin.shape[0]
stream = stream_from_key(jax.random.key(5), n, D)
a = np.asarray(trace_path_mega(scene, rays, key, cfg, tables=tables,
                               samples=stream))
b = np.asarray(trace_path_mega(scene, rays, key, cfg, tables=tables))
print("injected  mean %.4f" % a.mean(), flush=True)
print("in-kernel mean %.4f" % b.mean(), flush=True)
print("rel diff %.2f%%" % (100 * abs(a.mean() - b.mean()) / a.mean()),
      flush=True)
# per-channel too (dielectric bias showed up as global brightness shift)
for c, name in enumerate("rgb"):
    print("  %s: inj %.4f ker %.4f" % (name, a[:, c].mean(), b[:, c].mean()),
          flush=True)
