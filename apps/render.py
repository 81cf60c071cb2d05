"""Still-image rendering CLI — render a preset scene or an OBJ mesh to PNG.

Examples:
  python apps/render.py --scene three_spheres --width 480 --height 270 --spp 16
  python apps/render.py --obj /root/reference/CudaTest/objects/small_bunny.obj \
      --scale 10 --width 512 --height 512 --integrator lambert --accel bvh
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--scene", default="three_spheres",
                    choices=["three_spheres", "random_spheres", "light_box",
                             "textured_globe"])
    ap.add_argument("--obj", default=None, help="render an OBJ mesh instead")
    ap.add_argument("--scale", type=float, default=1.0, help="OBJ scale")
    ap.add_argument("--width", type=int, default=480)
    ap.add_argument("--height", type=int, default=270)
    ap.add_argument("--spp", type=int, default=16)
    ap.add_argument("--max-depth", type=int, default=8)
    ap.add_argument("--integrator", default="path",
                    choices=["path", "lambert", "normal"])
    ap.add_argument("--accel", default="auto",
                    choices=["auto", "bruteforce", "bvh", "pallas", "mega"])
    ap.add_argument("--compact-after", type=int, default=0,
                    help="mega engine: sort the wavefront after N bounces")
    ap.add_argument("--quirks", default="reference",
                    choices=["reference", "fixed"])
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="out.png")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    import cudaraytracer_tpu as crt
    from cudaraytracer_tpu.core.camera import make_camera
    from cudaraytracer_tpu.models import presets
    from cudaraytracer_tpu.ops import bvh as bvhmod
    from cudaraytracer_tpu.ops.render import (bvh_intersector,
                                              pallas_intersector, render_image)
    from cudaraytracer_tpu.utils.image import write_png
    from cudaraytracer_tpu.utils.obj_loader import face_normals, load_obj

    aspect = args.width / args.height
    if args.obj:
        pts, faces = load_obj(args.obj)
        pts *= args.scale
        b = crt.SceneBuilder()
        mat = b.materials.lambertian(color=(0.65, 0.05, 0.05))
        b.add_mesh(pts, faces, mat, normals=face_normals(pts, faces),
                   reverse_winding=True)
        scene = b.build()
        ext = pts.max(0) - pts.min(0)
        c = pts.mean(0)
        cam = make_camera(c + [0, 0.1 * ext[1], 2.2 * ext.max()], c,
                          (0, 1, 0), 40.0, aspect, 0.0, 10.0)
    else:
        scene, cam = getattr(presets, args.scene)(aspect=aspect)

    quirks = (crt.Quirks.reference() if args.quirks == "reference"
              else crt.Quirks.fixed())
    accel = args.accel
    if accel == "auto":
        # megakernel handles every supported scene fastest (image-texture
        # scenes render fused via deferred texturing — integrate() routes
        # path renders to trace_path_mega_tex); only size-ceiling scenes
        # fall back to the wavefront engine
        from cudaraytracer_tpu.ops.megakernel import (mega_tex_supported,
                                                      megakernel_supported)
        accel = ("mega" if megakernel_supported(scene)
                 or (mega_tex_supported(scene) and args.integrator == "path")
                 else "pallas")
    cfg = crt.RenderConfig(width=args.width, height=args.height,
                           samples=args.spp, max_depth=args.max_depth,
                           integrator=args.integrator, quirks=quirks,
                           engine="mega" if accel == "mega" else "wavefront",
                           compact_after=args.compact_after)

    isect_fn, aux = None, None
    if accel == "mega" and (scene.n_triangles or scene.n_spheres):
        from cudaraytracer_tpu.ops.megakernel import (build_mega_tables,
                                                      mega_sphere_order)
        from cudaraytracer_tpu.ops.pallas_intersect import morton_order
        tr = scene.triangles
        tri_order = (morton_order(np.asarray(tr.v0), np.asarray(tr.v1),
                                  np.asarray(tr.v2))
                     if scene.n_triangles else None)
        sph_order = (mega_sphere_order(scene.spheres.center)
                     if scene.n_spheres else None)
        aux = build_mega_tables(scene, tri_order, sph_order)
    elif accel == "bvh" and scene.n_triangles:
        aux = bvhmod.build_triangle_bvh(np.asarray(scene.triangles.v0),
                                        np.asarray(scene.triangles.v1),
                                        np.asarray(scene.triangles.v2))
        isect_fn = bvh_intersector(cfg)
    elif accel == "pallas":
        isect_fn = pallas_intersector(cfg)

    # label what actually ran: an accel whose preconditions failed (e.g.
    # --accel bvh on a triangle-free scene) falls back to brute force
    accel_used = accel
    if isect_fn is None and aux is None and accel not in ("bruteforce",):
        accel_used = f"{accel}->bruteforce"

    t0 = time.time()
    img = np.asarray(render_image(scene, cam, jax.random.key(args.seed), cfg,
                                  isect_fn, aux))
    dt = time.time() - t0
    write_png(args.out, img)
    rays = args.width * args.height * args.spp
    print(f"rendered {args.width}x{args.height}x{args.spp}spp "
          f"({args.integrator}, {accel_used}) in {dt:.2f}s "
          f"[{rays / dt / 1e6:.2f} Mrays/s] -> {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
