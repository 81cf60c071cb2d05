"""Animated-mesh rendering driver — the reference ``main()`` pipeline.

Reproduces kernel.cu:41-110 + render.h:191-237 end to end:
  load FBX (skinned character)  ->  build scene + BVH (timed)  ->
  per frame: skin -> BVH refit (timed as 'update') -> render (timed as
  'rendering') -> PNG images/<tag>/picture_<frame>.png -> output.csv with
  header `frame,rendering,update,build`.

Pipelines (kernel.cu:93-97 menu, a flag here instead of comments; all
pipelines produce the same quirk-gated images — pick by speed or by
structural parity with the reference):
  bvh    — single BVH over the mesh, refit per frame (ACTIVE in the reference)
  list   — no acceleration structure (renderListAnimation)
  fused  — skin+refit+render in ONE jit call per frame (BVH path fused)
  pallas — fused Pallas brute-force sweep kernels, no BVH; 'update' then
           reports the skinning time alone
  mega   — the fused MEGAKERNEL (ops/megakernel.py): intersect + shade (+ the
           whole bounce loop for --integrator path) in ONE Pallas call per
           frame, with HBM-streamed per-segment culling above 8k triangles —
           the fastest TPU pipeline
  bonebvh — per-bone BVH forest (renderBoneBVHAnimation, kernel.cu:5-21):
           one tree per skeleton bone, whole forest refit each frame;
           orphan triangles are dropped exactly as the reference does

Usage: python apps/animate.py [--fbx PATH] [--frames N] [--width W] ...
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--fbx", default="/root/reference/CudaTest/objects/low_walking.fbx")
    ap.add_argument("--out", default="images/moveTest")
    ap.add_argument("--csv", default="output.csv")
    ap.add_argument("--width", type=int, default=1024)      # kernel.cu:44
    ap.add_argument("--height", type=int, default=512)      # kernel.cu:45
    ap.add_argument("--samples", type=int, default=4)       # kernel.cu:49
    ap.add_argument("--max-depth", type=int, default=8)     # kernel.cu:48
    ap.add_argument("--integrator", default="lambert",       # render.h:120 active
                    choices=["path", "lambert", "normal"])
    # default: the fused megakernel — same quirk-gated semantics as the
    # reference-parity pipelines (tests pin all engines to the same images),
    # ~20x faster on TPU; --pipeline bvh selects the reference's ACTIVE
    # structure (BVH refit + traversal) for structural parity runs
    ap.add_argument("--pipeline", default="mega",
                    choices=["bvh", "list", "fused", "pallas", "bonebvh",
                             "mega"])
    ap.add_argument("--begin-frame", type=int, default=0)   # kernel.cu:50
    ap.add_argument("--frames", type=int, default=None,
                    help="limit frame count (default: animation length)")
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    ap.add_argument("--no-png", action="store_true")
    ap.add_argument("--resume", action="store_true",
                    help="skip frames whose PNG already exists in --out")
    ap.add_argument("--retries", type=int, default=2,
                    help="per-frame retries on transient device failures "
                         "(TPU worker crash); 0 disables elastic recovery")
    ap.add_argument("--retry-backoff", type=float, default=20.0,
                    help="seconds before the first retry (doubles each)")
    args = ap.parse_args(argv)

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    import cudaraytracer_tpu as crt
    from cudaraytracer_tpu.models import presets
    from cudaraytracer_tpu.models.mesh import device_mesh, scene_with_frame
    from cudaraytracer_tpu.ops import bvh as bvhmod
    from cudaraytracer_tpu.ops.render import (bvh_intersector,
                                              pallas_intersector, render_image)
    from cudaraytracer_tpu.utils.csvlog import MetricsLog
    from cudaraytracer_tpu.utils.fbx_loader import load_skinned_mesh
    from cudaraytracer_tpu.utils.image import write_png
    from cudaraytracer_tpu.utils.stopwatch import StopWatch

    t0 = time.time()
    mesh = load_skinned_mesh(args.fbx)
    print(f"loaded {args.fbx}: {mesh.n_points} points, {mesh.n_triangles} tris, "
          f"{mesh.n_bones} bones, {mesh.frame_count} frames "
          f"({time.time() - t0:.1f}s)")

    # endFrame = frame_count - 1 (FbxLoader.h:114 overrides main's default 30)
    end_frame = mesh.frame_count - 1
    if args.frames is not None:
        end_frame = min(end_frame, args.begin_frame + args.frames - 1)

    cfg = crt.RenderConfig(width=args.width, height=args.height,
                           samples=args.samples, max_depth=args.max_depth,
                           integrator=args.integrator)
    camera = presets.fbx_walk_camera(aspect=cfg.aspect)  # createScene.h:160
    dm = device_mesh(mesh)

    # scene: one Triangle per face, one shared red lambertian
    # (add_mesh_withNormal, createScene.h:175-190)
    builder = crt.SceneBuilder()
    mat = builder.materials.lambertian(color=(0.65, 0.05, 0.05))
    builder.add_mesh(mesh.points, mesh.faces, mat, normals=mesh.normals,
                     reverse_winding=True)
    scene0 = builder.build()

    log = MetricsLog(config_note=(
        f"{args.width}x{args.height}x{args.samples}spp depth{args.max_depth} "
        f"integrator={args.integrator} pipeline={args.pipeline} "
        f"asset={os.path.basename(args.fbx)} "
        f"backend={jax.default_backend()}"))
    sw = StopWatch()
    key = jax.random.key(0)

    # --- build (timed; kernel.cu:29-38) ---
    sw.Reset(); sw.Start()
    scene_f0 = scene_with_frame(scene0, dm, jnp.int32(args.begin_frame))
    bvh = None
    if args.pipeline in ("bvh", "fused"):
        bvh = bvhmod.build_triangle_bvh(np.asarray(scene_f0.triangles.v0),
                                        np.asarray(scene_f0.triangles.v1),
                                        np.asarray(scene_f0.triangles.v2))
    elif args.pipeline == "bonebvh":
        # createBoneBVH (createScene.h:253-306): partition by bone, one tree
        # per bone, built from the begin-frame pose
        from cudaraytracer_tpu.ops.bone_bvh import build_bone_forest
        forest = build_bone_forest(np.asarray(scene_f0.triangles.v0),
                                   np.asarray(scene_f0.triangles.v1),
                                   np.asarray(scene_f0.triangles.v2),
                                   mesh.weights, mesh.faces)
        bvh = forest.bvh
        if forest.n_dropped:
            print(f"bonebvh: {forest.n_dropped} orphan triangles dropped "
                  f"(reference behavior)")
    # scalar fetch, not block_until_ready: the TPU backend can return from
    # block_until_ready before execution finishes (CLAUDE.md)
    float(jnp.sum(scene_f0.triangles.v0))
    sw.Stop()
    log.log_build(sw.GetTime())
    print(f"BVH build: {sw.GetTime():.4f}s")

    # --- jitted per-frame steps ---
    @jax.jit
    def update_skin(scene, frame):
        return scene_with_frame(scene, dm, frame)

    @jax.jit
    def update_step(scene, bvh, frame):
        s = scene_with_frame(scene, dm, frame)
        b = bvhmod.refit_bvh(bvh, s.triangles.v0, s.triangles.v1,
                             s.triangles.v2)
        return s, b

    isect = bvh_intersector(cfg)
    isect_pallas = pallas_intersector(cfg)

    import dataclasses
    from cudaraytracer_tpu.ops import megakernel as megamod
    from cudaraytracer_tpu.ops.pallas_intersect import morton_order
    cfg_mega = dataclasses.replace(cfg, engine="mega")
    # static Morton permutation from the BIND pose: chunk/segment boxes stay
    # compact across the animation and jit caches survive per-frame refits
    mega_order = (morton_order(np.asarray(scene0.triangles.v0),
                               np.asarray(scene0.triangles.v1),
                               np.asarray(scene0.triangles.v2))
                  if scene0.n_triangles else None)

    # mega/pallas steps take the ALREADY-SKINNED scene: do_frame times the
    # skin separately (the reference's 'update' metric), and re-skinning
    # inside the render jit would both double the work and fold update time
    # into the rendering column
    @jax.jit
    def mega_step(s, fkey):
        tables = megamod.build_mega_tables(s, tri_order=mega_order)
        return render_image(s, camera, fkey, cfg_mega, None, tables)

    @jax.jit
    def fused_step(scene, bvh, frame, fkey):
        s = scene_with_frame(scene, dm, frame)
        b = bvhmod.refit_bvh(bvh, s.triangles.v0, s.triangles.v1,
                             s.triangles.v2)
        return render_image(s, camera, fkey, cfg, isect, b)

    @jax.jit
    def pallas_step(s, fkey):
        return render_image(s, camera, fkey, cfg, isect_pallas, None)

    # --- elastic recovery (utils/recovery.py): the TPU worker can crash
    # under load and recovers in ~1 min.  Keep host snapshots of all device
    # state; on a transient failure re-upload + retrace and retry the frame.
    # (The reference aborts the whole run on any device error, kernel.cu:24.)
    from cudaraytracer_tpu.utils.recovery import retry_transient
    state_h = jax.tree.map(np.asarray, (scene0, dm, bvh))

    def _restore(attempt, err):
        nonlocal scene0, dm, bvh
        print(f"transient device failure (retry {attempt}/{args.retries}): "
              f"{err}\nre-uploading device state...", flush=True)
        jax.clear_caches()
        scene0, dm, bvh = jax.tree.map(jnp.asarray, state_h)

    def do_frame(frame, fkey):
        nonlocal bvh
        if args.pipeline in ("pallas", "mega"):
            sw.Reset(); sw.Start()
            scene_f = update_skin(scene0, jnp.int32(frame))
            float(jnp.sum(scene_f.triangles.v0))   # scalar-fetch sync
            sw.Stop()
            update_t = sw.GetTime()
            step = mega_step if args.pipeline == "mega" else pallas_step
            sw.Reset(); sw.Start()
            img = np.asarray(step(scene_f, fkey))
            sw.Stop()
            render_t = sw.GetTime()
        elif args.pipeline == "fused":
            sw.Reset(); sw.Start()
            img = fused_step(scene0, bvh, jnp.int32(frame), fkey)
            img = np.asarray(img)
            sw.Stop()
            render_t, update_t = sw.GetTime(), 0.0
        elif args.pipeline in ("bvh", "bonebvh"):
            # update (skin + refit), timed as the reference's Update_BVH
            sw.Reset(); sw.Start()
            scene_f, bvh = update_step(scene0, bvh, jnp.int32(frame))
            float(jnp.sum(bvh.bbox_min))           # scalar-fetch sync
            sw.Stop()
            update_t = sw.GetTime()
            sw.Reset(); sw.Start()
            img = np.asarray(render_image(scene_f, camera, fkey, cfg, isect, bvh))
            sw.Stop()
            render_t = sw.GetTime()
        else:  # list
            scene_f = scene_with_frame(scene0, dm, jnp.int32(frame))
            sw.Reset(); sw.Start()
            img = np.asarray(render_image(scene_f, camera, fkey, cfg))
            sw.Stop()
            render_t, update_t = sw.GetTime(), 0.0
        return img, render_t, update_t

    os.makedirs(args.out, exist_ok=True)
    begin = args.begin_frame
    if args.resume:
        from cudaraytracer_tpu.utils.checkpoint import next_frame
        begin = next_frame(args.out, args.begin_frame)
        if begin > args.begin_frame:
            print(f"resuming at frame {begin}")
            if os.path.exists(args.csv):
                # preserve the prior run's rows (incl. its build row) —
                # write_csv rewrites the file, so starting empty would
                # silently destroy the already-rendered frames' metrics
                prior = MetricsLog.read_csv(args.csv)
                keep = [r for r in prior.rows[1:]
                        if not r[0] or int(r[0]) < begin]
                log.rows = [list(log.rows[0])] + keep
    for frame in range(begin, end_frame + 1):
        fkey = jax.random.fold_in(key, frame)
        img, render_t, update_t = retry_transient(
            lambda: do_frame(frame, fkey), retries=args.retries,
            backoff_s=args.retry_backoff, on_retry=_restore)
        log.log_frame(frame, render_t, update_t)
        if not args.no_png:
            write_png(os.path.join(args.out, f"picture_{frame}.png"), img)
        print(f"frame {frame}: render {render_t:.4f}s update {update_t:.4f}s")

    log.write_csv(args.csv)
    print(f"wrote {args.csv}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
