"""Static-shape SoA scene representation + host-side builder.

The reference's scene graph is a device-heap web of polymorphic ``Hitable*``
(hitable.h/hitable_list.h) built by ``<<<1,1>>>`` kernels (createScene.h).  The
TPU-native design is the opposite: the scene is a pytree of flat arrays fully
resident in HBM —

  spheres    : center f32[S,3], radius f32[S], mat int32[S]
               (sphere.h stores radius + a Transform whose position is the
               center; builders bake the translation in)
  triangles  : v0/v1/v2 f32[T,3], normal f32[T,3], mat int32[T]
               (triangle.h:40-45 SetVertices mutability becomes functional
               replacement of the vertex arrays each frame)
  rectangles : TRS + flip + mat (rectangle.h — a unit XY rect at z=0 in object
               space, intersected through the reference's ray transform)

plus material/texture tables (models/materials.py, models/textures.py).

Counts are static (array shapes), so jit traces once per scene topology; vertex
*positions* can change every frame (skinning) without recompilation.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp
import numpy as np

from .materials import MaterialBuilder, MaterialTable
from .textures import TextureTable
from .transform import TRS, bake_points

Array = jnp.ndarray


class Spheres(NamedTuple):
    center: Array  # f32[S,3]
    radius: Array  # f32[S]
    mat: Array     # int32[S]


class Triangles(NamedTuple):
    v0: Array      # f32[T,3]
    v1: Array
    v2: Array
    normal: Array  # f32[T,3] per-face normal (triangle.h:21-29 loaded form)
    mat: Array     # int32[T]


class Rectangles(NamedTuple):
    trs: TRS       # position/rotation/scale, each f32[R,3]
    flip: Array    # bool[R] flipNormal (rectangle.h:23)
    mat: Array     # int32[R]


class TSpheres(NamedTuple):
    """Spheres with a runtime TRS — the reference's general Hitable form
    (sphere.h: object-space sphere AT THE ORIGIN + a Transform whose position
    is the center; hit through TransformRay, hitable.h:29-38).  Only needed
    for non-identity rotation/scale; plain translations bake into Spheres."""
    trs: TRS       # each f32[K,3]
    radius: Array  # f32[K]
    mat: Array     # int32[K]


class TTriangles(NamedTuple):
    """Triangles with a runtime TRS (object-space vertices + TransformRay)."""
    trs: TRS
    v0: Array      # f32[K,3] object space
    v1: Array
    v2: Array
    normal: Array  # f32[K,3] object-space stored normal
    mat: Array     # int32[K]


class Scene(NamedTuple):
    spheres: Spheres
    triangles: Triangles
    rects: Rectangles
    materials: MaterialTable
    textures: TextureTable
    t_spheres: TSpheres
    t_triangles: TTriangles

    @property
    def n_spheres(self) -> int:
        return self.spheres.radius.shape[0]

    @property
    def n_triangles(self) -> int:
        return self.triangles.v0.shape[0]

    @property
    def n_rects(self) -> int:
        return self.rects.flip.shape[0]

    @property
    def n_t_spheres(self) -> int:
        return self.t_spheres.radius.shape[0]

    @property
    def n_t_triangles(self) -> int:
        return self.t_triangles.mat.shape[0]

    def with_triangle_vertices(self, v0: Array, v1: Array, v2: Array,
                               normal: Optional[Array] = None) -> "Scene":
        """Functional update of mesh vertices (per-frame skinning).

        Equivalent of update_pose (createScene.h:99-109).  Per the reference
        quirk, face normals are NOT recomputed unless given explicitly
        (Quirks.fixed_face_normals).
        """
        tri = self.triangles
        normal = tri.normal if normal is None else normal
        return self._replace(triangles=Triangles(v0, v1, v2, normal, tri.mat))


class SceneBuilder:
    """Host-side scene assembly; the analog of createScene.h without kernels."""

    def __init__(self, materials: MaterialBuilder | None = None):
        self.materials = materials if materials is not None else MaterialBuilder()
        self._sph_center: list = []
        self._sph_radius: list = []
        self._sph_mat: list = []
        self._tri_v: list = []       # (3,3) world-space vertices
        self._tri_n: list = []
        self._tri_mat: list = []
        self._rect_trs: list = []
        self._rect_flip: list = []
        self._rect_mat: list = []
        self._tsph: list = []        # (trs, radius, mat)
        self._ttri: list = []        # (trs, (3,3) verts, normal, mat)

    @staticmethod
    def _is_identity_rs(rotation, scale) -> bool:
        return (np.allclose(np.asarray(rotation, np.float32), 0.0)
                and np.allclose(np.asarray(scale, np.float32), 1.0))

    # -- spheres ---------------------------------------------------------
    def add_sphere(self, center, radius: float, mat_id: int,
                   rotation=(0, 0, 0), scale=(1, 1, 1)) -> int:
        """Sphere parity (sphere.h): an origin-centered sphere + a Transform
        whose position is the center.  Pure translations bake into the fast
        table; non-identity rotation/scale routes through the runtime
        TransformRay chain (hitable.h:29-38), exactly like the reference."""
        if not self._is_identity_rs(rotation, scale):
            trs = (np.asarray(center, np.float32),
                   np.asarray(rotation, np.float32),
                   np.asarray(scale, np.float32))
            self._tsph.append((trs, float(radius), int(mat_id)))
            return -len(self._tsph)   # t-table handle (negative)
        self._sph_center.append(np.asarray(center, np.float32))
        self._sph_radius.append(float(radius))
        self._sph_mat.append(int(mat_id))
        return len(self._sph_radius) - 1

    # -- triangles -------------------------------------------------------
    def add_triangle(self, v0, v1, v2, mat_id: int, normal=None,
                     position=(0, 0, 0), rotation=(0, 0, 0),
                     scale=(1, 1, 1)) -> int:
        """Triangle ctor parity: normal from edges if not given
        (triangle.h:14-17).  A non-identity transform keeps the vertices in
        OBJECT space and intersects through the reference TransformRay chain
        (note the reference quirks: ScaleRay does not move the origin, so
        'scale' warps the ray direction rather than scaling the triangle)."""
        v0 = np.asarray(v0, np.float32)
        v1 = np.asarray(v1, np.float32)
        v2 = np.asarray(v2, np.float32)
        if normal is None:
            n = np.cross(v1 - v0, v2 - v0)
            normal = n / max(np.linalg.norm(n), 1e-20)
        if not (self._is_identity_rs(rotation, scale)
                and np.allclose(np.asarray(position, np.float32), 0.0)):
            trs = (np.asarray(position, np.float32),
                   np.asarray(rotation, np.float32),
                   np.asarray(scale, np.float32))
            self._ttri.append((trs, np.stack([v0, v1, v2]),
                               np.asarray(normal, np.float32), int(mat_id)))
            return -len(self._ttri)
        self._tri_v.append(np.stack([v0, v1, v2]))
        self._tri_n.append(np.asarray(normal, np.float32))
        self._tri_mat.append(int(mat_id))
        return len(self._tri_mat) - 1

    def add_mesh(self, points: np.ndarray, idx: np.ndarray, mat_id: int,
                 normals: np.ndarray | None = None,
                 reverse_winding: bool = True,
                 position=(0, 0, 0), rotation=(0, 0, 0), scale=(1, 1, 1)) -> None:
        """add_mesh_withNormal parity (createScene.h:175-190).

        The reference builds each triangle from points[idx[2]], points[idx[1]],
        points[idx[0]] — REVERSED index order (createScene.h:185) — with the
        loaded per-face normal.  ``reverse_winding=True`` reproduces that.
        Transforms are baked here so the hot path is transform-free.
        """
        pts = bake_points(position, rotation, scale, points)
        idx = np.asarray(idx, np.int64)
        order = idx[:, ::-1] if reverse_winding else idx
        tri = pts[order]  # (T, 3, 3)
        if normals is None:
            e1 = tri[:, 1] - tri[:, 0]
            e2 = tri[:, 2] - tri[:, 0]
            n = np.cross(e1, e2)
            normals = n / np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-20)
        for k in range(tri.shape[0]):
            self._tri_v.append(tri[k])
            self._tri_n.append(np.asarray(normals[k], np.float32))
            self._tri_mat.append(int(mat_id))

    def add_box(self, p0, p1, mat_id: int, empty: bool = True):
        """Box parity (shapes/box.h).

        The reference Box is a 6-rect composite whose face construction is
        COMMENTED OUT (box.h:33-38) — the compiled object delegates hits to an
        empty list and can never be hit.  ``empty=True`` (default) reproduces
        that: a no-op.  ``empty=False`` builds a WORKING axis-aligned box from
        12 triangles with outward normals (the commented code's intent);
        note that under Quirks.reference() triangles render backface-only, so
        the working box looks inside-out there — use Quirks.fixed().
        """
        if empty:
            return None  # box.h compiled behavior: unhittable
        p0 = np.asarray(p0, np.float32)
        p1 = np.asarray(p1, np.float32)
        x0, y0, z0 = p0
        x1, y1, z1 = p1
        quads = [
            # (4 corners CCW viewed from outside, outward normal)
            ([(x0, y0, z1), (x1, y0, z1), (x1, y1, z1), (x0, y1, z1)], (0, 0, 1)),
            ([(x1, y0, z0), (x0, y0, z0), (x0, y1, z0), (x1, y1, z0)], (0, 0, -1)),
            ([(x0, y1, z1), (x1, y1, z1), (x1, y1, z0), (x0, y1, z0)], (0, 1, 0)),
            ([(x0, y0, z0), (x1, y0, z0), (x1, y0, z1), (x0, y0, z1)], (0, -1, 0)),
            ([(x1, y0, z1), (x1, y0, z0), (x1, y1, z0), (x1, y1, z1)], (1, 0, 0)),
            ([(x0, y0, z0), (x0, y0, z1), (x0, y1, z1), (x0, y1, z0)], (-1, 0, 0)),
        ]
        for corners, normal in quads:
            a, b, cc, d = corners
            self.add_triangle(a, b, cc, mat_id, normal=normal)
            self.add_triangle(a, cc, d, mat_id, normal=normal)
        return len(self._tri_mat) - 12

    # -- rectangles ------------------------------------------------------
    def add_rect(self, mat_id: int, flip: bool = False,
                 position=(0, 0, 0), rotation=(0, 0, 0), scale=(1, 1, 1)) -> int:
        self._rect_trs.append((np.asarray(position, np.float32),
                               np.asarray(rotation, np.float32),
                               np.asarray(scale, np.float32)))
        self._rect_flip.append(bool(flip))
        self._rect_mat.append(int(mat_id))
        return len(self._rect_mat) - 1

    # -- build -----------------------------------------------------------
    def build(self) -> Scene:
        s = len(self._sph_radius)
        sph = Spheres(
            jnp.asarray(np.stack(self._sph_center) if s else np.zeros((0, 3), np.float32)),
            jnp.asarray(np.asarray(self._sph_radius, np.float32)),
            jnp.asarray(np.asarray(self._sph_mat, np.int32)))

        t = len(self._tri_mat)
        tv = np.stack(self._tri_v) if t else np.zeros((0, 3, 3), np.float32)
        tri = Triangles(
            jnp.asarray(tv[:, 0]), jnp.asarray(tv[:, 1]), jnp.asarray(tv[:, 2]),
            jnp.asarray(np.stack(self._tri_n) if t else np.zeros((0, 3), np.float32)),
            jnp.asarray(np.asarray(self._tri_mat, np.int32)))

        r = len(self._rect_mat)
        if r:
            pos = np.stack([x[0] for x in self._rect_trs])
            rot = np.stack([x[1] for x in self._rect_trs])
            scl = np.stack([x[2] for x in self._rect_trs])
        else:
            pos = rot = np.zeros((0, 3), np.float32)
            scl = np.ones((0, 3), np.float32)
        rects = Rectangles(
            TRS(jnp.asarray(pos), jnp.asarray(rot), jnp.asarray(scl)),
            jnp.asarray(np.asarray(self._rect_flip, bool)),
            jnp.asarray(np.asarray(self._rect_mat, np.int32)))

        def trs_of(entries):
            if entries:
                p = np.stack([e[0][0] for e in entries])
                r = np.stack([e[0][1] for e in entries])
                s = np.stack([e[0][2] for e in entries])
            else:
                p = r = np.zeros((0, 3), np.float32)
                s = np.ones((0, 3), np.float32)
            return TRS(jnp.asarray(p), jnp.asarray(r), jnp.asarray(s))

        tsph = TSpheres(
            trs_of(self._tsph),
            jnp.asarray(np.asarray([e[1] for e in self._tsph], np.float32)),
            jnp.asarray(np.asarray([e[2] for e in self._tsph], np.int32)))
        tv = (np.stack([e[1] for e in self._ttri]) if self._ttri
              else np.zeros((0, 3, 3), np.float32))
        ttri = TTriangles(
            trs_of(self._ttri),
            jnp.asarray(tv[:, 0]), jnp.asarray(tv[:, 1]), jnp.asarray(tv[:, 2]),
            jnp.asarray(np.stack([e[2] for e in self._ttri]) if self._ttri
                        else np.zeros((0, 3), np.float32)),
            jnp.asarray(np.asarray([e[3] for e in self._ttri], np.int32)))

        return Scene(sph, tri, rects, self.materials.build(),
                     self.materials.textures.build(), tsph, ttri)
