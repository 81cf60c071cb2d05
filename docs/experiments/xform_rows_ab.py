"""A/B for the _xform_rows finalize/replay consolidation (round 3).

Before the change, finalize_hits re-ran the FULL rect/TRS candidate sweeps
(O(rays x prims) broadcast transforms) plus ~12 separate small-table
gathers per bounce just to reconstruct the winner's u/v/p/normal/mat, and
replay_hits did the same for the rect leg.  After, all three
transform-tested classes gather ONE packed row per winner
(ops/intersect._xform_rows) and recompute on a per-lane TransformRay'd ray
— O(rays) per bounce.

Workloads (v5e, one chip):
  1. wavefront render, 960x540x8 path-8, rect/TRS field (48 rects +
     48 TRS spheres + 48 TRS triangles + 2 plain spheres).
  2. mega_diff fit step (replay backward) on the same scene, 512x256x4
     depth-4, gradients to TRS position + albedo.

Run from each tree:   python docs/experiments/xform_rows_ab.py
"""
import os
import sys
import time

here = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.abspath(os.path.join(here, "..", "..")))

import numpy as np
import jax
import jax.numpy as jnp

import cudaraytracer_tpu as crt
from cudaraytracer_tpu.core.camera import make_camera, generate_pixel_rays
from cudaraytracer_tpu.ops.integrators import integrate
from cudaraytracer_tpu.ops.render import render_image, pallas_intersector


def build_scene():
    rng = np.random.default_rng(3)
    b = crt.SceneBuilder()
    m = b.materials
    floor = m.lambertian(tex_id=m.textures.checker((0.1, 0.1, 0.1),
                                                   (0.9, 0.9, 0.9)))
    light = m.diffuse_light(color=(3.0, 3.0, 3.0))
    b.add_sphere((0, -1000, 0), 1000.0, floor)
    b.add_sphere((0, 1.2, 0), 1.0, m.metal((0.9, 0.9, 0.9), 0.05))
    b.add_rect(light, flip=True, position=(0, 6, 0), rotation=(90, 0, 0),
               scale=(8, 8, 1))
    for i in range(47):
        pos = (float(rng.uniform(-6, 6)), float(rng.uniform(0.2, 2.5)),
               float(rng.uniform(-6, 6)))
        rot = tuple(float(r) for r in rng.uniform(0, 360, 3))
        col = tuple(float(c) for c in rng.uniform(0.2, 0.9, 3))
        b.add_rect(m.lambertian(color=col), position=pos, rotation=rot,
                   scale=(0.8, 0.8, 1))
    for i in range(48):
        pos = (float(rng.uniform(-6, 6)), float(rng.uniform(0.2, 2.5)),
               float(rng.uniform(-6, 6)))
        rot = tuple(float(r) for r in rng.uniform(0, 360, 3))
        col = tuple(float(c) for c in rng.uniform(0.2, 0.9, 3))
        b.add_sphere(pos, 0.3, m.lambertian(color=col),
                     rotation=rot, scale=(1.0, 0.6, 1.0))
    for i in range(48):
        pos = (float(rng.uniform(-6, 6)), float(rng.uniform(0.2, 2.5)),
               float(rng.uniform(-6, 6)))
        rot = tuple(float(r) for r in rng.uniform(0, 360, 3))
        col = tuple(float(c) for c in rng.uniform(0.2, 0.9, 3))
        v = rng.uniform(-0.5, 0.5, (3, 3)).astype(np.float32)
        b.add_triangle(v[0], v[1], v[2], m.lambertian(color=col),
                       position=pos, rotation=rot)
    cam = make_camera((0, 4, 12), (0, 1, 0), (0, 1, 0), 45.0,
                      960 / 540, 0.0, 10.0)
    return b.build(), cam


def timed_render(scene, cam, cfg, isect_fn, n_iters=3):
    @jax.jit
    def bench_n(scene, key):
        def body(acc, i):
            img = render_image(scene, cam, jax.random.fold_in(key, i), cfg,
                               isect_fn, None)
            return acc + jnp.mean(img), None
        tot, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(n_iters))
        return tot
    float(bench_n(scene, jax.random.key(0)))
    t0 = time.perf_counter()
    s = float(bench_n(scene, jax.random.key(123)))
    assert s == s
    return (time.perf_counter() - t0) / n_iters


def fit_step_time(scene, cam, n_steps=4):
    import dataclasses
    cfg = crt.RenderConfig(width=512, height=256, samples=4, max_depth=4,
                           gamma=False, engine="mega_diff")
    rays = generate_pixel_rays(cam, cfg.width, cfg.height, cfg.samples,
                               jax.random.key(0))
    key = jax.random.key(1)
    target = integrate(scene, rays, key, dataclasses.replace(cfg))
    p0 = {"albedo": scene.textures.color0 * 0.6 + 0.1,
          "tpos": scene.t_spheres.trs.position + 0.05}

    def loss(p):
        s = scene._replace(
            t_spheres=scene.t_spheres._replace(
                trs=scene.t_spheres.trs._replace(position=p["tpos"])),
            textures=scene.textures._replace(color0=p["albedo"]))
        return jnp.mean((integrate(s, rays, key, cfg) - target) ** 2)

    @jax.jit
    def run(p):
        def body(p, _):
            l, g = jax.value_and_grad(loss)(p)
            return jax.tree.map(lambda x, gx: x - 0.5 * gx, p, g), l
        p, ls = jax.lax.scan(body, p, None, length=n_steps)
        return ls[-1]

    float(run(p0))
    t0 = time.perf_counter()
    l = float(run(p0))
    assert l == l
    return (time.perf_counter() - t0) / n_steps


def main():
    scene, cam = build_scene()
    print(f"scene: {scene.n_spheres} sph, {scene.n_rects} rects, "
          f"{scene.n_t_spheres} tsph, {scene.n_t_triangles} ttri",
          flush=True)
    cfg = crt.RenderConfig(width=960, height=540, samples=8, max_depth=8,
                           integrator="path", engine="wavefront",
                           ray_chunk=1 << 17)
    dt = timed_render(scene, cam, cfg, pallas_intersector(cfg))
    print(f"wavefront render: {dt:.4f} s/frame", flush=True)
    ft = fit_step_time(scene, cam)
    print(f"mega_diff fit step: {ft:.4f} s/step", flush=True)


if __name__ == "__main__":
    main()
