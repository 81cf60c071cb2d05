"""A/B the streamed megakernel triangle sweep: VPU chunks vs MXU matmuls
(cfg.mega_mxu) on the 124k-tri bunny field, path-8 fixed quirks, 1280x720x8.

Usage: python docs/experiments/mega_mxu_bench.py [--big] [--width ...]
  --big  adds the 1,043,280-tri (210-bunny) ceiling workload.

Results are recorded in docs/ROUND2_NOTES.md ("MXU ray-triangle
determinants") and docs/PERF.md.
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))

import numpy as np


def field_scene(nx: int, nz: int):
    import cudaraytracer_tpu as crt
    from cudaraytracer_tpu.core.camera import make_camera
    from cudaraytracer_tpu.utils.obj_loader import face_normals, load_obj

    pts, faces = load_obj("/root/reference/CudaTest/objects/small_bunny.obj")
    pts *= 10.0
    ext = pts.max(0) - pts.min(0)
    b = crt.SceneBuilder()
    mat = b.materials.lambertian(color=(0.65, 0.05, 0.05))
    nrm = face_normals(pts, faces)
    for i in range(nx):
        for j in range(nz):
            off = np.array([(i - nx // 2) * 1.15 * ext[0], 0.0,
                            -j * 1.3 * ext[2]], np.float32)
            b.add_mesh(pts + off, faces, mat, normals=nrm,
                       reverse_winding=True)
    cam = make_camera((0, 2.2, 3.2), (0.0, 0.35, float(-(nz // 2) * 1.3
                                                       * ext[2])),
                      (0, 1, 0), 50.0, 1280 / 720, 0.0, 10.0)
    return b.build(), cam


def timed(scene, cam, cfg, aux, iters=2) -> float:
    import jax
    import jax.numpy as jnp
    from cudaraytracer_tpu.ops.render import render_image

    @jax.jit
    def bench_n(scene, aux, key):
        def body(acc, i):
            img = render_image(scene, cam, jax.random.fold_in(key, i), cfg,
                               None, aux)
            return acc + jnp.mean(img), None
        tot, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(iters))
        return tot

    t0 = time.perf_counter()
    float(bench_n(scene, aux, jax.random.key(0)))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    s = float(bench_n(scene, aux, jax.random.key(123)))
    dt = (time.perf_counter() - t0) / iters
    assert s == s, "NaN render"
    return dt, compile_s


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--big", action="store_true")
    ap.add_argument("--width", type=int, default=1280)
    ap.add_argument("--height", type=int, default=720)
    ap.add_argument("--spp", type=int, default=8)
    args = ap.parse_args()

    import cudaraytracer_tpu as crt
    from cudaraytracer_tpu.ops import megakernel as mk
    from cudaraytracer_tpu.ops.pallas_intersect import morton_order

    workloads = [("124k field", 5, 5)]
    if args.big:
        workloads.append(("1M field", 14, 15))

    for name, nx, nz in workloads:
        scene, cam = field_scene(nx, nz)
        tr = scene.triangles
        order = morton_order(np.asarray(tr.v0), np.asarray(tr.v1),
                             np.asarray(tr.v2))
        tables = mk.build_mega_tables(scene, tri_order=order, mxu=True)
        base = crt.RenderConfig(
            width=args.width, height=args.height, samples=args.spp,
            max_depth=8, integrator="path", ray_chunk=1 << 17,
            engine="mega", quirks=crt.Quirks.fixed())
        print(f"--- {name}: {scene.n_triangles} tris ---", flush=True)
        for label, cfg in [
            ("vpu mono      ", dataclasses.replace(base, compact_auto=False)),
            ("mxu mono      ", dataclasses.replace(base, compact_auto=False,
                                                   mega_mxu=True)),
            ("vpu ce2+octant", dataclasses.replace(base, compact_every=2,
                                                   compact_octants=True)),
            ("mxu ce2+octant", dataclasses.replace(base, compact_every=2,
                                                   compact_octants=True,
                                                   mega_mxu=True)),
        ]:
            dt, cs = timed(scene, cam, cfg, tables)
            rays = args.width * args.height * args.spp
            print(f"{label}: {dt:8.3f} s/frame  "
                  f"({rays / dt / 1e6:6.2f} Mrays/s, compile {cs:.0f}s)",
                  flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
