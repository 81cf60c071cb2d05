"""Skinned meshes: device-side linear-blend skinning + per-frame scene update.

The reference does skinning on the HOST, one FbxMatrix-vector multiply per
vertex per frame (calcPose, createScene.h:111-123), then H2D-copies positions
and rewrites Triangle objects serially on device (update_pose,
createScene.h:99-109).  TPU-native replacement: the per-frame bone matrices
live on device as one (frames, bones, 4, 4) tensor; skinning one frame is

    M_points = weights @ bone_mats          (MXU matmul, (P,B)x(B,16))
    p'       = homogeneous(p) . M_points    (vectorized MultNormalize)

and the triangle-vertex rewrite is a pure gather — all inside the jitted
frame step, no host round-trip.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..utils.fbx_loader import SkinnedMesh
from .scene import Scene

Array = jnp.ndarray


class SkinnedMeshArrays(NamedTuple):
    """Device-resident skinning data (the FBXObject analog)."""

    points: Array             # f32[P,3] bind-pose control points
    faces: Array              # i32[T,3]
    normals: Array            # f32[T,3] loaded per-face normals (fixed, quirk)
    weights: Array            # f32[P,B]
    vertex_transforms: Array  # f32[F,B,4,4]
    bone_now_t: Array         # f32[F,B,3]
    bone_default_t: Array     # f32[B,3]

    @property
    def frame_count(self) -> int:
        return self.vertex_transforms.shape[0]


def device_mesh(mesh: SkinnedMesh) -> SkinnedMeshArrays:
    return SkinnedMeshArrays(
        jnp.asarray(mesh.points), jnp.asarray(mesh.faces),
        jnp.asarray(mesh.normals), jnp.asarray(mesh.weights),
        jnp.asarray(mesh.vertex_transforms), jnp.asarray(mesh.bone_now_t),
        jnp.asarray(mesh.bone_default_t))


def skin_points(points: Array, weights: Array, bone_mats: Array) -> Array:
    """LBS: blend per-bone matrices then apply with w-normalization.

    Mirrors the reference accumulation Σ_b w·vertexTransformMatrix
    (FbxLoader.h:166-172) and FbxMatrix::MultNormalize (createScene.h:115).
    points f32[P,3], weights f32[P,B], bone_mats f32[B,4,4] -> f32[P,3].
    """
    p, _ = points.shape
    b = bone_mats.shape[0]
    blended = (weights @ bone_mats.reshape(b, 16)).reshape(p, 4, 4)
    ph = jnp.concatenate([points, jnp.ones((p, 1), points.dtype)], axis=-1)
    out = jnp.einsum("pij,pj->pi", blended, ph)
    # MultNormalize w-divide, double-where guarded: a vertex no cluster
    # claims (unskinned mesh, or sparse weight tables) blends to the ZERO
    # matrix — 0/0 would silently NaN the whole mesh; keep it at bind pose.
    w = out[:, 3:4]
    ok = jnp.abs(w) > 1e-12
    return jnp.where(ok, out[:, :3] / jnp.where(ok, w, 1.0), points)


def skin_frame(mesh: SkinnedMeshArrays, frame: Array) -> Tuple[Array, Array, Array]:
    """Skinned triangle vertices for one frame (dynamic index).

    Triangle assembly reproduces update_pose (createScene.h:104-106): vertices
    are gathered in REVERSED face-index order {idx[2], idx[1], idx[0]}.
    Returns (v0, v1, v2) each f32[T,3].
    """
    mats = jax.lax.dynamic_index_in_dim(mesh.vertex_transforms, frame, 0,
                                        keepdims=False)
    skinned = skin_points(mesh.points, mesh.weights, mats)
    v0 = skinned[mesh.faces[:, 2]]
    v1 = skinned[mesh.faces[:, 1]]
    v2 = skinned[mesh.faces[:, 0]]
    return v0, v1, v2


def recompute_face_normals(v0: Array, v1: Array, v2: Array,
                           align_to: Array | None = None) -> Array:
    """Fresh normals from current winding (the Quirks.fixed_face_normals=False
    path; the reference keeps bind-pose normals, createScene.h:99-109).

    align_to: optional per-face reference normals (e.g. the loaded bind-pose
    normals) to SIGN-align against.  The skinned triangle gather reverses the
    face winding (update_pose parity), so the raw cross product is the
    NEGATION of the FBX outward normal — without alignment the 'fixed'
    profile would flip shading mesh-wide."""
    n = jnp.cross(v1 - v0, v2 - v0)
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-20)
    if align_to is not None:
        s = jnp.sign(jnp.sum(n * align_to, axis=-1, keepdims=True))
        n = n * jnp.where(s == 0.0, 1.0, s)
    return n


def scene_with_frame(scene: Scene, mesh: SkinnedMeshArrays, frame: Array,
                     fixed_normals: bool = True) -> Scene:
    """Scene for a given animation frame (functional update of triangles)."""
    v0, v1, v2 = skin_frame(mesh, frame)
    normal = None if fixed_normals else recompute_face_normals(
        v0, v1, v2, align_to=mesh.normals)
    return scene.with_triangle_vertices(v0, v1, v2, normal)
