"""Misc parity: Box composite, image textures from PNG, motion camera,
FBX loader robustness across all repo assets."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import cudaraytracer_tpu as crt
from cudaraytracer_tpu.core import camera as cam
from cudaraytracer_tpu.core.rays import make_rays
from cudaraytracer_tpu.models.scene import SceneBuilder
from cudaraytracer_tpu.ops import intersect as isect
from cudaraytracer_tpu.utils.fbx_loader import load_skinned_mesh
from cudaraytracer_tpu.utils.image import write_png

OBJECTS = "/root/reference/CudaTest/objects"


def test_box_reference_mode_is_unhittable():
    """box.h compiled behavior: the composite's faces are commented out."""
    b = SceneBuilder()
    mat = b.materials.lambertian(color=(1, 1, 1))
    assert b.add_box((-1, -1, -3), (1, 1, -2), mat, empty=True) is None
    scene = b.build()
    assert scene.n_triangles == 0 and scene.n_rects == 0


def test_box_working_mode_renders():
    b = SceneBuilder()
    mat = b.materials.lambertian(color=(1, 1, 1))
    b.add_box((-1, -1, -4), (1, 1, -2), mat, empty=False)
    scene = b.build()
    assert scene.n_triangles == 12
    r = make_rays(jnp.zeros((2, 3), jnp.float32),
                  jnp.asarray([[0, 0, -1.0], [0, 1.0, 0]], jnp.float32))
    hits = isect.intersect_scene(scene, r, quirks=crt.Quirks.fixed())
    assert bool(hits.hit[0])
    np.testing.assert_allclose(hits.t[0], 2.0, rtol=1e-5)   # front face z=-2
    np.testing.assert_allclose(hits.normal[0], [0, 0, 1], atol=1e-6)
    assert not bool(hits.hit[1])


def test_image_texture_from_png(tmp_path):
    img = np.zeros((4, 4, 3), np.float32)
    img[:, :2] = (1, 0, 0)
    img[:, 2:] = (0, 0, 1)
    path = str(tmp_path / "tex.png")
    write_png(path, img, flip=False)

    b = SceneBuilder()
    tid = b.materials.textures.image_from_png(path)
    tex = b.materials.textures.build()
    from cudaraytracer_tpu.models.textures import eval_texture
    out = eval_texture(tex, jnp.asarray([tid, tid]),
                       jnp.asarray([0.1, 0.9]), jnp.asarray([0.5, 0.5]),
                       jnp.zeros((2, 3)))
    np.testing.assert_allclose(out[0], [1, 0, 0], atol=0.01)
    np.testing.assert_allclose(out[1], [0, 0, 1], atol=0.01)


def test_motion_camera_time_sampling():
    """MotionCamera (camera.h:56-89): rays carry time in [t0, t1]."""
    c = cam.make_camera((0, 0, 0), (0, 0, -1), vfov=40.0, aspect=1.0,
                        time0=2.0, time1=5.0)
    rays = cam.get_rays(c, jnp.full((512,), 0.5), jnp.full((512,), 0.5),
                        jax.random.key(0))
    t = np.asarray(rays.time)
    assert (t >= 2.0).all() and (t <= 5.0).all()
    assert t.std() > 0.3   # actually sampled, not constant
    # plain camera: time identically 0 (camera.h:43)
    c0 = cam.make_camera((0, 0, 0), (0, 0, -1), vfov=40.0, aspect=1.0)
    rays0 = cam.get_rays(c0, jnp.full((8,), 0.5), jnp.full((8,), 0.5),
                         jax.random.key(0))
    np.testing.assert_allclose(np.asarray(rays0.time), 0.0, atol=1e-7)


@pytest.mark.parametrize("asset,has_bones", [
    ("bunny2.fbx", False),
    ("human_light.fbx", True),
    ("HipHopDancing.fbx", True),
])
def test_fbx_assets_load(asset, has_bones):
    m = load_skinned_mesh(os.path.join(OBJECTS, asset), max_frames=2)
    assert m.n_points > 0 and m.n_triangles > 0
    assert (m.n_bones > 0) == has_bones
    assert np.isfinite(m.points).all()
    assert np.isfinite(m.vertex_transforms).all()
    if has_bones:
        np.testing.assert_allclose(m.weights.sum(1), 1.0, atol=1e-3)


def test_rotated_rect_reference_semantics():
    """A rect rotated 90 deg about X: the reference rotates the RAY by
    R(rotation) (transform.h:45-49) and the returned normal by the SAME matrix
    (hitable.h:36).  Pin the resulting world-space behavior."""
    b = SceneBuilder()
    mat = b.materials.lambertian(color=(1, 1, 1))
    b.add_rect(mat, flip=False, position=(0, -2, 0), rotation=(90, 0, 0))
    scene = b.build()
    # vec3.h:200-217 R(90,0,0) maps v -> (x, -z, y).  Object-space ray:
    # o' = R(o) - p (TranslateRay subtracts AFTER rotation), d' = R(unit d).
    # Down-ray d=(0,-1,0) -> d'=(0,0,-1); hit needs |o'.y| = |-o.z + 2| <= 0.5
    # i.e. o.z in [1.5, 2.5], and t = o'.z = o.y.
    r = make_rays(jnp.asarray([[0.2, 5.0, 0.1]], jnp.float32),
                  jnp.asarray([[0.0, -1.0, 0.0]], jnp.float32))
    hits = isect.intersect_scene(scene, r)
    assert not bool(hits.hit[0])     # o'.y = 1.9 out of bounds
    r2 = make_rays(jnp.asarray([[0.2, 5.0, 2.0]], jnp.float32),
                   jnp.asarray([[0.0, -1.0, 0.0]], jnp.float32))
    h2 = isect.intersect_scene(scene, r2)
    assert bool(h2.hit[0])
    np.testing.assert_allclose(h2.t[0], 5.0, rtol=1e-5)
    # rec.normal = R(obj_normal) = R((0,0,1)) = (0, -1, 0) (hitable.h:36 quirk:
    # rotated by the SAME world->object matrix, not its inverse)
    np.testing.assert_allclose(h2.normal[0], [0, -1, 0], atol=1e-5)


def test_accelerator_consistency_on_skinned_frame():
    """BVH traversal, pallas sweep, and jnp brute force agree on a skinned
    animation frame (the cross-accelerator gate for the FBX pipeline)."""
    import cudaraytracer_tpu as crt
    from cudaraytracer_tpu.models import presets
    from cudaraytracer_tpu.models.mesh import device_mesh, scene_with_frame
    from cudaraytracer_tpu.ops import bvh as bvhmod
    from cudaraytracer_tpu.ops.render import (bvh_intersector,
                                              pallas_intersector, render_image)

    mesh = load_skinned_mesh(os.path.join(OBJECTS, "low_walking.fbx"))
    dm = device_mesh(mesh)
    b = SceneBuilder()
    mat = b.materials.lambertian(color=(0.65, 0.05, 0.05))
    b.add_mesh(mesh.points, mesh.faces, mat, normals=mesh.normals,
               reverse_winding=True)
    scene0 = b.build()
    scene_f = scene_with_frame(scene0, dm, jnp.int32(20))
    cam = presets.fbx_walk_camera(aspect=2.0)
    cfg = crt.RenderConfig(width=96, height=48, samples=1, max_depth=1,
                           integrator="normal", ray_chunk=1 << 20)

    img_bf = np.asarray(render_image(scene_f, cam, jax.random.key(0), cfg))
    img_pl = np.asarray(render_image(scene_f, cam, jax.random.key(0), cfg,
                                     pallas_intersector(cfg)))
    bvh = bvhmod.build_triangle_bvh(np.asarray(scene_f.triangles.v0),
                                    np.asarray(scene_f.triangles.v1),
                                    np.asarray(scene_f.triangles.v2))
    img_bv = np.asarray(render_image(scene_f, cam, jax.random.key(0), cfg,
                                     bvh_intersector(cfg), bvh))
    np.testing.assert_allclose(img_pl, img_bf, atol=2e-3)
    np.testing.assert_allclose(img_bv, img_bf, atol=2e-3)
