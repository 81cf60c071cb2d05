"""OBJ mesh loader — parity with CudaTest/src/Loader/obj_loader.h.

Parses ``v`` and ``f`` lines (`vn` is skipped, like the reference's
commented-out normal path, obj_loader.h:52-57), supports both plain
``f 1 2 3`` faces (small_bunny.obj) and ``f v//vn`` faces (cbox_smallbox.obj,
the reference's parseFaceIndex obj_loader.h:113-119), then CENTERS the mesh on
its vertex mean (obj_loader.h:93-95, computeMean/centering :120-137); the
reference's max-distance scaling (:139-146) is available but off by default,
matching the commented call at :96.

Index-base note: the reference's active parse path stores raw 1-based face
indices and would index them unadjusted (a latent off-by-one in dead code —
BuildObjMesh is commented out at :148).  We convert to 0-based, i.e. the
correct behavior the data implies.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def load_obj(path: str, center: bool = True, scale_to_unit: bool = False
             ) -> Tuple[np.ndarray, np.ndarray]:
    """Parse an OBJ file -> (points f32[P,3], faces int32[T,3], 0-based)."""
    points = []
    faces = []
    with open(path, "r") as f:
        for line in f:
            parts = line.split()
            if not parts:
                continue
            if parts[0] == "v":
                points.append([float(x) for x in parts[1:4]])
            elif parts[0] == "f":
                # supports "3", "3/1", "3//7", "3/1/7"; quads and larger
                # n-gons are FAN-triangulated (the reference truncates them
                # to the first three vertices, obj_loader.h:113-119 — a
                # silent data loss we fix, like the 1-based-index bug).
                # Negative indices are RELATIVE to the vertices seen so far
                # (-1 = most recent), per the OBJ spec.
                raw = [int(tok.split("/")[0]) for tok in parts[1:]]
                idx = [i - 1 if i > 0 else len(points) + i for i in raw]
                for k in range(1, len(idx) - 1):
                    faces.append([idx[0], idx[k], idx[k + 1]])
    pts = np.asarray(points, np.float32)
    fcs = np.asarray(faces, np.int32).reshape(-1, 3)   # (0,3) when no faces
    if center and len(pts):
        pts = pts - pts.mean(axis=0, keepdims=True)  # obj_loader.h:93-95
    if scale_to_unit and len(pts):
        # obj_loader.h:139-146 scaling(): divide by max distance from mean
        d = np.linalg.norm(pts, axis=-1).max()
        if d > 0:
            pts = pts / d
    return pts, fcs


def face_normals(points: np.ndarray, faces: np.ndarray) -> np.ndarray:
    """Per-face normals from winding (Triangle ctor, triangle.h:14-17)."""
    tri = points[faces]
    n = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    return (n / np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-20)
            ).astype(np.float32)
