"""Render the showcase gallery on TPU -> docs/gallery/*.png.

One command regenerates every judge-facing image (run on the TPU host;
~2-4 min total).  Scenes/cameras come from the bench harness so the
pictures match the measured configurations.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

import cudaraytracer_tpu as crt
from cudaraytracer_tpu.config import Quirks
from cudaraytracer_tpu.models import presets
from cudaraytracer_tpu.ops.render import render_image
from cudaraytracer_tpu.utils.image import write_png
from bench import _mega_tables, _mesh_scene

OUT = "/root/repo/docs/gallery"


def shoot(name, scene, cam, w, h, spp, depth=8, integrator="path",
          quirks=None, flip_rows=False):
    cfg = crt.RenderConfig(width=w, height=h, samples=spp, max_depth=depth,
                           integrator=integrator, engine="mega",
                           ray_chunk=1 << 17,
                           quirks=quirks or Quirks.reference())
    aux = _mega_tables(scene)
    t0 = time.perf_counter()
    img = np.asarray(render_image(scene, cam, jax.random.key(7), cfg, None,
                                  aux))
    print(f"{name}: {time.perf_counter() - t0:.1f}s", flush=True)
    write_png(f"{OUT}/{name}.png", img[::-1] if flip_rows else img)


def main():
    s, c = presets.three_spheres(aspect=640 / 360)
    shoot("three_spheres_path8", s, c, 640, 360, 64)
    s, c = presets.light_box(aspect=2.0)
    shoot("light_box_path8", s, c, 640, 320, 64)
    s, c = presets.random_spheres(aspect=16 / 9)
    shoot("random_spheres_path8", s, c, 800, 450, 32)
    # image textures through the fused deferred-texturing path; fixed quirks
    # so the lambertian samples its image at the real (u, v) — under
    # Quirks.reference() material.h:67 pins u = v = 0 and the globe renders
    # as one texel color
    s, c = presets.textured_globe(aspect=16 / 9)
    shoot("textured_globe_path8", s, c, 800, 450, 64, quirks=Quirks.fixed())
    s, c = _mesh_scene(640, 360)
    shoot("bunny_path8", s, c, 640, 360, 16)
    s, c = _mesh_scene(1280, 720)
    # _mesh_scene's camera convention produces flipped rows vs the presets
    shoot("bunny_path8_fixed", s, c, 1280, 720, 64, quirks=Quirks.fixed(),
          flip_rows=True)

    # reference workload frame (skinned walk, lambert)
    from cudaraytracer_tpu.models.mesh import device_mesh, scene_with_frame
    from cudaraytracer_tpu.utils.fbx_loader import load_skinned_mesh
    mesh = load_skinned_mesh(
        "/root/reference/CudaTest/objects/low_walking.fbx")
    dm = device_mesh(mesh)
    b = crt.SceneBuilder()
    mat = b.materials.lambertian(color=(0.65, 0.05, 0.05))
    b.add_mesh(mesh.points, mesh.faces, mat, normals=mesh.normals,
               reverse_winding=True)
    scene_f = scene_with_frame(b.build(), dm, jnp.int32(20))
    shoot("low_walking_frame20_lambert", scene_f,
          presets.fbx_walk_camera(aspect=2.0), 1024, 512, 4,
          integrator="lambert")

    # round-5 additions — the two features that round changed most:
    # tex_bunny_path8_fixed.png: the image-textured bunny through fused
    #   deferred texturing + dead-chunk skip (the bench tex leg's frame) —
    #   regenerate via docs/experiments/tex_compact.py (/tmp/tex_compact.png).
    # trs_1660prims_path4.png: 1,660 runtime-TRS prims + rects through the
    #   chunked TRS table sweeps (old cap: 64) — regenerate via
    #   docs/experiments/trs_table_sweep.py (/tmp/trs_1k.png).
    print("done")


if __name__ == "__main__":
    main()
