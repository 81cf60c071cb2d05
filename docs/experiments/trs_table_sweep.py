"""Round-5 TRS table sweep validation on TPU (VERDICT r4 #3): the fused
engine's rect/runtime-TRS prims were unrolled per row and capped at 64;
now chunked table sweeps (megakernel trs_ray_chunk/_trs_table_sweep) with
MAX_TRS_PRIMS=1024.  Equality-pin vs the wavefront at ~1k TRS prims on
the REAL TPU (compiled Mosaic, not interpret) and time both engines.
Run SOLO.
"""
import sys, time, dataclasses
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
import cudaraytracer_tpu as crt
from cudaraytracer_tpu.config import Quirks
from cudaraytracer_tpu.core.camera import make_camera
from cudaraytracer_tpu.ops import megakernel as mk
from cudaraytracer_tpu.ops.render import render_image, pallas_intersector

rng = np.random.default_rng(3)
b = crt.SceneBuilder()
ground = b.materials.lambertian(color=(0.5, 0.7, 0.3))
red = b.materials.lambertian(color=(0.9, 0.2, 0.2))
met = b.materials.metal((0.8, 0.6, 0.2), 0.1)
light = b.materials.diffuse_light(color=(2.0, 2.0, 2.0))
b.add_sphere((0, -100.5, -3), 100.0, ground)
for i in range(960):
    p = rng.uniform([-6, -0.3, -9], [6, 1.6, -2])
    b.add_sphere(p, rng.uniform(0.05, 0.14), red if i % 3 else met,
                 rotation=tuple(rng.uniform(-90, 90, 3)),
                 scale=tuple(rng.uniform(0.6, 1.6, 3)))
for i in range(500):
    p = rng.uniform([-6, -0.3, -9], [6, 1.6, -2])
    b.add_triangle((-0.12, -0.08, 0), (0.12, -0.08, 0), (0, 0.16, 0), red,
                   position=tuple(p), rotation=tuple(rng.uniform(-90, 90, 3)),
                   scale=tuple(rng.uniform(0.7, 1.4, 3)))
for i in range(200):
    p = rng.uniform([-6, 1.8, -9], [6, 2.6, -2])
    b.add_rect(light if i % 9 == 0 else red, position=tuple(p),
               rotation=tuple(rng.uniform(-90, 90, 3)), scale=(0.25, 0.25, 1))
scene = b.build()
print(f"tsph={scene.n_t_spheres} ttri={scene.n_t_triangles} "
      f"rects={scene.n_rects} mega_ok={mk.megakernel_supported(scene)}",
      flush=True)
cam = make_camera((0, 0.6, 1.5), (0, 0.4, -4), vfov=60, aspect=16 / 9,
                  focus_dist=5.0)

W, H, SPP = 640, 360, 4
cfg = crt.RenderConfig(width=W, height=H, samples=SPP, max_depth=4,
                       integrator="path", quirks=Quirks.fixed(),
                       ray_chunk=1 << 17)
cfg_m = dataclasses.replace(cfg, engine="mega")


def timed(fn, *a, iters=2):
    t0 = time.perf_counter()
    jax.block_until_ready(fn(*a))
    compile_s = time.perf_counter() - t0
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*a)
        float(jnp.mean(out))
        best = min(best, time.perf_counter() - t0)
    return out, best, compile_s


isect = pallas_intersector(cfg)
wf = jax.jit(lambda s, k: render_image(s, cam, k, cfg, isect, None))
img_w, t_w, c_w = timed(wf, scene, jax.random.key(0))
print(f"wavefront: {t_w:.3f}s/frame (compile {c_w:.0f}s)", flush=True)

tables = mk.build_mega_tables(scene)
mg = jax.jit(lambda s, tb, k: render_image(s, cam, k, cfg_m, None, tb))
img_m, t_m, c_m = timed(mg, scene, tables, jax.random.key(0))
print(f"mega:      {t_m:.3f}s/frame (compile {c_m:.0f}s)", flush=True)

# path: on TPU the engines draw from DIFFERENT RNGs (in-kernel PRNG vs
# threefry), so per-pixel equality is impossible — compare image means
# (exact equality is pinned on CPU interpret with the injected stream:
# test_trs_beyond_old_cap_matches_wavefront)
mw, mm = float(np.asarray(img_w).mean()), float(np.asarray(img_m).mean())
print(f"path means: wavefront {mw:.4f} mega {mm:.4f} "
      f"(stochastic; diff {abs(mw - mm):.4f})", flush=True)
assert abs(mw - mm) < 0.01, (mw, mm)

# DETERMINISTIC integrators on TPU: the fused Mosaic TRS sweep and the
# wavefront's XLA TRS candidates contract fp differently (FMA), so a ray
# GRAZING a primitive can flip hit/miss — a few tenths of a percent of
# pixels, all on silhouettes.  Measured round 5 (solo v5e, lambert
# 640x360x4): plain 960-sphere scene 0.0000% diff (those kernels are
# bit-equal across engines); 200-TRS-sphere scene 0.28% diff, 99.4% on
# edges; and the OLD unrolled r4 form showed the SAME behavior (64 TRS
# spheres: 0.045%, 99.0% on edges) — pre-existing contraction class, not
# the round-5 rewrite.  Exact per-pixel equality is pinned on CPU
# interpret (test_trs_beyond_old_cap_matches_wavefront); here assert the
# TPU invariants: tiny diff fraction, silhouette-local.
import scipy.ndimage as ni
for integ in ("lambert", "normal"):
    cfg_i = dataclasses.replace(cfg, integrator=integ)
    cfg_im = dataclasses.replace(cfg_i, engine="mega")
    iw = np.asarray(render_image(scene, cam, jax.random.key(1), cfg_i,
                                 pallas_intersector(cfg_i), None))
    im = np.asarray(render_image(scene, cam, jax.random.key(1), cfg_im,
                                 None, tables))
    d = (np.abs(iw - im).max(-1) > 1e-3)
    g = iw.max(-1)
    edge = (ni.maximum_filter(g, 3) - ni.minimum_filter(g, 3)) > 0.05
    on_edge = d[edge].sum() / max(d.sum(), 1)
    print(f"{integ}: diff {d.mean():.4%}  of-which-on-edges {on_edge:.1%}",
          flush=True)
    # 1,660 tiny prims blanket the frame in silhouettes — the measured
    # flip rate here is 2.66% of all pixels (98% on edges), consistent
    # with the 200-prim probe's 0.28% scaled by prim density
    assert d.mean() < 0.04 and (d.sum() == 0 or on_edge > 0.9), \
        (integ, d.mean(), on_edge)

from cudaraytracer_tpu.utils.image import write_png
write_png("/tmp/trs_1k.png", np.asarray(img_m))
print("wrote /tmp/trs_1k.png", flush=True)
