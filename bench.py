"""Benchmark harness — prints ONE JSON line for the driver.

Headline metric (BASELINE.md): camera rays/sec/chip on a 1080p path-traced
render at depth 8 on the "One Weekend" random-spheres scene (~500 spheres,
BASELINE config[1] geometry at config[4] resolution).  rays = width * height *
samples (camera samples; each traces up to max_depth+1 bounces).

vs_baseline: ratio against the self-measured value recorded in
BASELINE_SELF.json (the reference publishes no numbers — BASELINE.md); 1.0
when no prior record exists (first round records it).

Env knobs: BENCH_SPP (default 16), BENCH_WIDTH/HEIGHT, BENCH_CHUNK,
BENCH_SCENE (random_spheres|three_spheres|mesh).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def main() -> int:
    import jax

    import cudaraytracer_tpu as crt
    from cudaraytracer_tpu.models import presets
    from cudaraytracer_tpu.ops.render import pallas_intersector, render_image

    width = int(os.environ.get("BENCH_WIDTH", 1920))
    height = int(os.environ.get("BENCH_HEIGHT", 1080))
    spp = int(os.environ.get("BENCH_SPP", 16))
    chunk = int(os.environ.get("BENCH_CHUNK", 1 << 17))
    scene_name = os.environ.get("BENCH_SCENE", "random_spheres")

    if scene_name == "three_spheres":
        scene, cam = presets.three_spheres(aspect=width / height)
    elif scene_name == "mesh":
        # BASELINE config[2]: repo OBJ mesh (~5k tris) via the pallas sweep
        import cudaraytracer_tpu as _crt
        from cudaraytracer_tpu.core.camera import make_camera
        from cudaraytracer_tpu.utils.obj_loader import face_normals, load_obj
        pts, faces = load_obj(
            "/root/reference/CudaTest/objects/small_bunny.obj")
        pts *= 10.0
        b = _crt.SceneBuilder()
        mat = b.materials.lambertian(color=(0.65, 0.05, 0.05))
        b.add_mesh(pts, faces, mat, normals=face_normals(pts, faces),
                   reverse_winding=True)
        scene = b.build()
        cam = make_camera((0, 0.4, 2.6), (0, 0.3, 0), (0, 1, 0), 40.0,
                          width / height, 0.0, 10.0)
    else:
        scene, cam = presets.random_spheres(aspect=width / height)

    cfg = crt.RenderConfig(width=width, height=height, samples=spp,
                           max_depth=8, integrator="path", ray_chunk=chunk)
    # fused Pallas sweep kernels by default (interpret-mode on CPU);
    # BENCH_INTERSECT=bruteforce selects the jnp path
    use_pallas = os.environ.get("BENCH_INTERSECT", "pallas") == "pallas"
    isect_fn = pallas_intersector(cfg) if use_pallas else None

    key = jax.random.key(0)

    # Timing note: on the remote-tunnel TPU backend block_until_ready can
    # return before execution finishes, so we time K renders inside ONE jitted
    # scan and fetch a single scalar — the host round-trip brackets the real
    # device work.
    import jax.numpy as jnp

    n_iters = int(os.environ.get("BENCH_ITERS", 2))

    @jax.jit
    def bench_n(key):
        def body(acc, i):
            img = render_image(scene, cam, jax.random.fold_in(key, i), cfg,
                               isect_fn)
            return acc + jnp.mean(img), None
        tot, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(n_iters))
        return tot

    float(bench_n(key))  # warmup/compile
    t0 = time.perf_counter()
    s = float(bench_n(jax.random.fold_in(key, 123)))
    dt = (time.perf_counter() - t0) / n_iters
    assert s == s, "NaN render"
    rays = width * height * spp
    value = rays / dt

    # secondary metric (BASELINE.md): backward/forward time ratio, measured
    # on a smaller tile so the grad program compiles quickly; recorded in
    # BASELINE_SELF.json, not printed (stdout stays one JSON line).
    bwd_fwd_ratio = None
    if os.environ.get("BENCH_BWD", "0") == "1":  # opt-in: slow compile
        import dataclasses
        from cudaraytracer_tpu.ops.render import render_pixels
        gcfg = dataclasses.replace(cfg, width=256, height=256, samples=4,
                                   gamma=False, ray_chunk=1 << 17)
        pix = jnp.arange(gcfg.width * gcfg.height, dtype=jnp.int32)
        gkey = jax.random.key(5)

        @jax.jit
        def fwd(albedo):
            s2 = scene._replace(
                textures=scene.textures._replace(color0=albedo))
            return jnp.mean(render_pixels(s2, cam, gkey, gcfg, pix))

        grad_fn = jax.jit(jax.grad(fwd))
        a0 = scene.textures.color0
        float(fwd(a0))
        float(grad_fn(a0).sum())
        t0 = time.perf_counter(); float(fwd(a0)); t_f = time.perf_counter() - t0
        t0 = time.perf_counter(); float(grad_fn(a0).sum())
        t_b = time.perf_counter() - t0
        # grad_fn runs fwd+bwd; bwd alone ~ total - fwd
        bwd_fwd_ratio = max(t_b - t_f, 0.0) / max(t_f, 1e-9)

    baseline_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 "BASELINE_SELF.json")
    vs = 1.0
    record = {}
    if os.path.exists(baseline_path):
        try:
            with open(baseline_path) as f:
                record = json.load(f)
            prior = record.get("camera_rays_per_sec")
            if prior:
                vs = value / float(prior)
        except Exception:
            pass
    changed = False
    if "camera_rays_per_sec" not in record:
        record.update({"camera_rays_per_sec": value,
                       "config": f"{width}x{height}x{spp}spp depth8 {scene_name}",
                       "backend": jax.devices()[0].platform})
        changed = True
    if bwd_fwd_ratio is not None and "bwd_fwd_ratio" not in record:
        record["bwd_fwd_ratio"] = round(bwd_fwd_ratio, 3)
        changed = True
    if changed:
        try:
            with open(baseline_path, "w") as f:
                json.dump(record, f, indent=2)
        except Exception:
            pass

    print(json.dumps({
        "metric": "camera_rays_per_sec_1080p_path8",
        "value": round(value, 1),
        "unit": "rays/s",
        "vs_baseline": round(vs, 4),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
