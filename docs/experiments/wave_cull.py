"""Wavefront bounce-sweep culling A/B on the headline workload (VERDICT r3
#6: push the wavefront past 13M rays/s).

Hypothesis: the round-1 'chunk-box culling loses 15% on bounce rays'
measurement is stale — it predates (a) the alive-mask vote exclusion (dead
lanes with stale directions used to force every chunk visit) and (b) any
spatially compact sphere order (random_spheres builder order gives long
thin grid-strip chunks).  The megakernel's 2x win over the wavefront on the
SAME scene comes precisely from per-chunk slab culling over Morton-ordered
chunks, so the wavefront should inherit most of it.

Variants (1920x1080x16spp path-8 random_spheres, 484 spheres):
  plain        — official leg today: single intersector, no culling at all
  pair         — culled primary pass, plain bounce sweeps
  allcull      — chunk-box culling on every bounce, builder order
  m_allcull    — ditto, scene spheres permuted into Morton order
  m_pair       — Morton + culled primary only (order control)
"""
import os, sys, time, dataclasses
sys.path.insert(0, "/root/repo")
import numpy as np
import jax

if os.environ.get("WC_CPU"):          # CPU smoke: tiny shapes, interpret mode
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import cudaraytracer_tpu as crt
from cudaraytracer_tpu.ops.render import (render_image, pallas_intersector,
                                          pallas_intersector_pair)
from bench import _build_scene

W = int(os.environ.get("WC_W", 1920))
H = int(os.environ.get("WC_H", 1080))
SPP = int(os.environ.get("WC_SPP", 16))
DEPTH = int(os.environ.get("WC_DEPTH", 8))

scene, cam = _build_scene("random_spheres", W, H)
cfg = crt.RenderConfig(width=W, height=H, samples=SPP, max_depth=DEPTH,
                       integrator="path", ray_chunk=1 << 17,
                       engine="wavefront")


def morton_scene(sc):
    c = np.asarray(sc.spheres.center)
    lo = c.min(0)
    span = np.maximum(c.max(0) - lo, 1e-20)
    q = np.clip((c - lo) / span * 1023.0, 0, 1023).astype(np.uint64)

    def spread(x):
        x = (x | (x << 16)) & 0x030000FF
        x = (x | (x << 8)) & 0x0300F00F
        x = (x | (x << 4)) & 0x030C30C3
        x = (x | (x << 2)) & 0x09249249
        return x

    code = (spread(q[:, 0]) << 2) | (spread(q[:, 1]) << 1) | spread(q[:, 2])
    order = np.argsort(code, kind="stable")
    sp = sc.spheres
    return sc._replace(spheres=sp._replace(
        center=jnp.asarray(np.asarray(sp.center)[order]),
        radius=jnp.asarray(np.asarray(sp.radius)[order]),
        mat=jnp.asarray(np.asarray(sp.mat)[order])))


def timed(name, sc, isect):
    @jax.jit
    def run(s, key):
        return jnp.mean(render_image(s, cam, key, cfg, isect))
    t0 = time.perf_counter(); float(run(sc, jax.random.key(0)))
    comp = time.perf_counter() - t0
    t0 = time.perf_counter()
    v = float(run(sc, jax.random.key(1)))
    dt = time.perf_counter() - t0
    assert v == v
    print(f"{name}: {dt:.3f}s ({W*H*SPP/dt/1e6:.2f}M rays/s) "
          f"(compile {comp:.0f}s) mean={v:.6f}", flush=True)


mscene = morton_scene(scene)
old = dataclasses.replace(cfg, wavefront_sphere_cull="primary")
timed("r3_official (no cull)   ", scene, pallas_intersector(old))
timed("pair (culled primary)   ", scene, pallas_intersector_pair(old))
timed("morton (production)     ", scene, pallas_intersector(cfg))
timed("host-sorted allcull ctrl", mscene, pallas_intersector(old, coherent=True))

# gradient cost of the trace-level permutation (gather VJP, once per call):
# 484-sphere center grads at fit-like shapes, old vs production.
from cudaraytracer_tpu.ops.integrators import integrate
from cudaraytracer_tpu.core.camera import generate_pixel_rays
gcfg = dataclasses.replace(cfg, width=512, height=256, samples=4,
                           max_depth=4, gamma=False)
grays = generate_pixel_rays(cam, 512, 256, 4, jax.random.key(0))
for name, cfgx in (("grad centers (primary/old)",
                    dataclasses.replace(gcfg, wavefront_sphere_cull="primary")),
                   ("grad centers (morton/prod)", gcfg)):
    isect = pallas_intersector(cfgx)

    def loss(p):
        s = scene._replace(spheres=scene.spheres._replace(center=p))
        return jnp.mean(integrate(s, grays, jax.random.key(1), cfgx, isect))

    g = jax.jit(jax.grad(loss))
    jax.block_until_ready(g(scene.spheres.center))
    t0 = time.perf_counter()
    float(jnp.sum(g(scene.spheres.center)[0]))
    print(f"{name}: {time.perf_counter()-t0:.4f}s", flush=True)
