"""OBJ loading + mesh rendering with BVH (BASELINE config[2] slice)."""

import jax
import jax.numpy as jnp
import numpy as np

from cudaraytracer_tpu.config import RenderConfig
from cudaraytracer_tpu.core.camera import make_camera
from cudaraytracer_tpu.models.scene import SceneBuilder
from cudaraytracer_tpu.ops import bvh as bvhmod
from cudaraytracer_tpu.ops.render import bvh_intersector, render_image
from cudaraytracer_tpu.utils.obj_loader import face_normals, load_obj

BUNNY = "/root/reference/CudaTest/objects/small_bunny.obj"
CBOX = "/root/reference/CudaTest/objects/cbox_smallbox.obj"


def test_load_bunny():
    pts, faces = load_obj(BUNNY)
    assert pts.shape == (2503, 3)
    assert faces.shape == (4968, 3)
    assert faces.min() == 0 and faces.max() == 2502
    # centered (obj_loader.h:93-95)
    np.testing.assert_allclose(pts.mean(axis=0), 0, atol=1e-4)


def test_load_cbox_slashed_faces():
    pts, faces = load_obj(CBOX, center=False)
    assert pts.shape == (24, 3)
    assert faces.shape == (12, 3)
    assert faces.min() == 0 and faces.max() == 23


def _bunny_scene():
    pts, faces = load_obj(BUNNY)
    pts *= 10.0  # bunny is ~0.15 units tall; scale to view comfortably
    b = SceneBuilder()
    # add_mesh_withNormal parity: one shared red lambertian
    # (createScene.h:179), reversed winding, loaded per-face normals.
    mat = b.materials.lambertian(color=(0.65, 0.05, 0.05))
    nrm = face_normals(pts, faces)
    b.add_mesh(pts, faces, mat, normals=nrm, reverse_winding=True)
    scene = b.build()
    cam = make_camera((0, 0.3, 2.5), (0, 0.3, 0), (0, 1, 0), 40.0, 1.0, 0.0, 10.0)
    return scene, cam


def test_bunny_render_bvh_matches_bruteforce():
    scene, cam = _bunny_scene()
    bvh = bvhmod.build_triangle_bvh(np.asarray(scene.triangles.v0),
                                    np.asarray(scene.triangles.v1),
                                    np.asarray(scene.triangles.v2))
    cfg = RenderConfig(width=48, height=48, samples=1, max_depth=2,
                       integrator="normal", ray_chunk=4096)
    img_bvh = np.asarray(render_image(scene, cam, jax.random.key(0), cfg,
                                      bvh_intersector(cfg), bvh))
    img_bf = np.asarray(render_image(scene, cam, jax.random.key(0), cfg))
    # normal integrator with the same camera key is deterministic:
    np.testing.assert_allclose(img_bvh, img_bf, atol=2e-5)
    # the bunny actually covers a good chunk of the frame
    sky_blue = img_bf[..., 2] > img_bf[..., 0]
    assert 0.1 < sky_blue.mean() < 0.95


def test_bunny_bvh_much_smaller_than_bruteforce_work():
    """Sanity on tree shape: depth ~ log2(T), nodes < 2T."""
    scene, _ = _bunny_scene()
    bvh = bvhmod.build_triangle_bvh(np.asarray(scene.triangles.v0),
                                    np.asarray(scene.triangles.v1),
                                    np.asarray(scene.triangles.v2))
    t = scene.n_triangles
    assert bvh.n_nodes < 2 * t
    assert len(bvh.levels) <= int(np.ceil(np.log2(t))) + 2


def test_obj_relative_indices_and_empty(tmp_path):
    """OBJ spec: negative face indices are relative to the vertices seen so
    far (-1 = most recent).  Also: a faceless OBJ yields faces (0,3), not
    a shape-(0,) array that crashes face_normals."""
    p = tmp_path / "rel.obj"
    p.write_text("v 0 0 0\nv 1 0 0\nv 0 1 0\nf -3 -2 -1\n")
    pts, fcs = load_obj(str(p), center=False)
    np.testing.assert_array_equal(fcs, [[0, 1, 2]])
    p2 = tmp_path / "points_only.obj"
    p2.write_text("v 0 0 0\nv 1 0 0\n")
    pts2, fcs2 = load_obj(str(p2), center=False)
    assert fcs2.shape == (0, 3)
    assert face_normals(pts2, fcs2).shape == (0, 3)
