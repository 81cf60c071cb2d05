"""Hybrid sweep form: kernel carries ONLY [center,radius,mat] (5 attrs,
cheap), hit record geometry builds gather-free, dec comes from the one
decode-row gather.  vs: full 21-attr form (fwd -6%) and row-gather form."""
import sys, time, dataclasses
import os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
import jax, jax.numpy as jnp
import cudaraytracer_tpu as crt
from cudaraytracer_tpu.ops import intersect as I
from cudaraytracer_tpu.ops import pallas_intersect as pk
from cudaraytracer_tpu.models import materials as M
from cudaraytracer_tpu.ops.render import render_image, pallas_intersector
from bench import _build_scene

W, H, SPP = 1920, 1080, 16
scene, cam = _build_scene("random_spheres", W, H)
cfg = crt.RenderConfig(width=W, height=H, samples=SPP, max_depth=8,
                       integrator="path", ray_chunk=1 << 17,
                       engine="wavefront")

def attrs5_fn(s, rays, aux, alive=None):
    sp = s.spheres
    order = pk.morton_argsort(sp.center)
    center = sp.center[order]
    radius = sp.radius[order]
    mat_s = sp.mat[order]
    attr_tbl = jnp.concatenate([center.T, radius[None],
                                mat_s.astype(jnp.float32)[None]], axis=0)
    st, si, attrs = pk.sphere_best_hit_attrs(
        rays.origin, rays.direction, center, radius, attr_tbl,
        cfg.t_min, cfg.t_max, True, alive)
    hit = si >= 0
    t = jnp.where(hit, st, I.BIG)
    p = rays.point_at(t)
    s_norm, s_u, s_v = I._sphere_record(p, hit, attrs[:, 0:3], attrs[:, 3])
    u = jnp.where(hit, s_u, 0.0)
    vv = jnp.where(hit, s_v, 0.0)
    normal = jnp.where(hit[..., None], s_norm, 0.0)
    mat = jnp.where(hit, attrs[:, 4].astype(jnp.int32), 0)
    dec = M.decode_materials(s.materials, s.textures, mat, consolidate=True)
    return I.Hits(hit, t, p, normal, u, vv, mat, si, dec)

for name, isect in (
        ("row-gather (prod fwd)", pallas_intersector(cfg)),
        ("attrs21 (prod grad)  ", pallas_intersector(
            dataclasses.replace(cfg, wavefront_kernel_attrs=True))),
        ("attrs5 hybrid        ", attrs5_fn)):
    jax.clear_caches()
    @jax.jit
    def frame(s, key, isect=isect):
        return jnp.mean(render_image(s, cam, key, cfg, isect))
    float(frame(scene, jax.random.key(0)))
    t0 = time.perf_counter()
    v = float(frame(scene, jax.random.key(1)))
    dt = time.perf_counter() - t0
    print(f"{name}: {dt:.3f}s ({W*H*SPP/dt/1e6:.2f}M) mean={v:.5f}",
          flush=True)
