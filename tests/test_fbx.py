"""FBX parsing, transform evaluation, and skinning tests (real repo assets)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cudaraytracer_tpu.models.mesh import (device_mesh, recompute_face_normals,
                                           scene_with_frame, skin_frame,
                                           skin_points)
from cudaraytracer_tpu.models.scene import SceneBuilder
from cudaraytracer_tpu.utils.fbx_loader import (FbxScene, load_skinned_mesh,
                                                matrix_to_trs, euler_matrix)
from cudaraytracer_tpu.utils.fbx_parser import parse_fbx

WALKING = "/root/reference/CudaTest/objects/low_walking.fbx"


@pytest.fixture(scope="module")
def mesh():
    return load_skinned_mesh(WALKING)


def test_container_parse():
    root = parse_fbx(WALKING)
    names = [c.name for c in root.children]
    assert "Objects" in names and "Connections" in names and "Takes" in names


def test_bind_pose_matches_transform_link():
    """Ground truth for matrix conventions: the file's Pose (bind) matrices
    must equal each cluster's TransformLink."""
    scene = FbxScene(WALKING)
    pose = [n for n in scene.by_id.values() if n.name == "Pose"][0]
    pose_mats = {}
    for pn in pose.find_all("PoseNode"):
        pose_mats[pn.find("Node").props[0]] = \
            np.asarray(pn.find("Matrix").props[0]).reshape(4, 4).T
    geom_id = [uid for uid, n in scene.by_id.items() if n.name == "Geometry"][0]
    pm = {}
    for c, p in scene.oo:
        pm.setdefault(p, []).append(c)
    skin = [u for u in pm[geom_id] if scene.by_id[u].name == "Deformer"][0]
    checked = 0
    for cuid in pm.get(skin, []):
        cn = scene.by_id[cuid]
        if cn.props[2] != "Cluster":
            continue
        link_id = next(ch for ch, p2 in scene.oo
                       if p2 == cuid and ch in scene.models)
        tl = np.asarray(cn.find("TransformLink").props[0]).reshape(4, 4).T
        if link_id in pose_mats:
            np.testing.assert_allclose(pose_mats[link_id], tl, atol=1e-10)
            checked += 1
    assert checked >= 20


def test_reference_global_init_is_mesh_bind():
    """TL @ stored cluster Transform must be constant across clusters (the
    mesh bind global) — the identity our GetTransformMatrix equivalent uses."""
    scene = FbxScene(WALKING)
    geom_id = [uid for uid, n in scene.by_id.items() if n.name == "Geometry"][0]
    pm = {}
    for c, p in scene.oo:
        pm.setdefault(p, []).append(c)
    skin = [u for u in pm[geom_id] if scene.by_id[u].name == "Deformer"][0]
    prods = []
    for cuid in pm.get(skin, []):
        cn = scene.by_id[cuid]
        if cn.props[2] != "Cluster":
            continue
        ref = np.asarray(cn.find("Transform").props[0]).reshape(4, 4).T
        tl = np.asarray(cn.find("TransformLink").props[0]).reshape(4, 4).T
        prods.append(tl @ ref)
    prods = np.stack(prods)
    assert np.abs(prods - prods[0]).max() < 1e-10


def test_mesh_extraction(mesh):
    assert mesh.n_points == 824
    assert mesh.n_triangles == 1622
    assert mesh.n_bones == 28
    assert mesh.frame_count == 58          # take span / (KTIME/60)
    assert mesh.faces.min() >= 0 and mesh.faces.max() < mesh.n_points
    # weights: every point fully weighted (sum 1)
    np.testing.assert_allclose(mesh.weights.sum(1), 1.0, atol=1e-5)
    # loaded normals are unit
    np.testing.assert_allclose(np.linalg.norm(mesh.normals, axis=-1), 1.0,
                               atol=1e-3)


def test_skinned_pose_is_plausible(mesh):
    """Frame-0 skinned character: human-sized, y-up, feet near ground."""
    W = mesh.weights.astype(np.float64)
    M = mesh.vertex_transforms[0].astype(np.float64)
    ph = np.concatenate([mesh.points, np.ones((mesh.n_points, 1), np.float32)],
                        axis=1).astype(np.float64)
    out = np.einsum("pij,pj->pi", np.einsum("pb,bij->pij", W, M), ph)
    sk = out[:, :3] / out[:, 3:4]
    lo, hi = sk.min(0), sk.max(0)
    assert 150 < hi[1] < 200       # head height
    assert lo[1] < 30              # feet near ground
    assert (hi[0] - lo[0]) < 100   # arms not in T-pose (walking)


def test_device_skinning_matches_numpy(mesh):
    dm = device_mesh(mesh)
    for f in [0, 17, 57]:
        got = np.asarray(skin_points(dm.points, dm.weights,
                                     dm.vertex_transforms[f]))
        W = mesh.weights.astype(np.float64)
        M = mesh.vertex_transforms[f].astype(np.float64)
        ph = np.concatenate([mesh.points,
                             np.ones((mesh.n_points, 1), np.float32)],
                            axis=1).astype(np.float64)
        out = np.einsum("pij,pj->pi", np.einsum("pb,bij->pij", W, M), ph)
        want = out[:, :3] / out[:, 3:4]
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-2)


def test_skin_frame_reversed_winding(mesh):
    """update_pose gathers vertices as {idx[2], idx[1], idx[0]}
    (createScene.h:104-106)."""
    dm = device_mesh(mesh)
    v0, v1, v2 = skin_frame(dm, jnp.int32(0))
    skinned = skin_points(dm.points, dm.weights, dm.vertex_transforms[0])
    f = np.asarray(mesh.faces)
    np.testing.assert_allclose(np.asarray(v0), np.asarray(skinned)[f[:, 2]],
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(v2), np.asarray(skinned)[f[:, 0]],
                               atol=1e-6)


def test_scene_with_frame_keeps_normals_fixed(mesh):
    """Reference quirk: face normals stay at bind pose across frames."""
    dm = device_mesh(mesh)
    b = SceneBuilder()
    mat = b.materials.lambertian(color=(0.65, 0.05, 0.05))
    b.add_mesh(mesh.points, mesh.faces, mat, normals=mesh.normals,
               reverse_winding=True)
    scene0 = b.build()
    s_f30 = scene_with_frame(scene0, dm, jnp.int32(30), fixed_normals=True)
    np.testing.assert_array_equal(np.asarray(s_f30.triangles.normal),
                                  np.asarray(scene0.triangles.normal))
    # vertices DID move
    assert np.abs(np.asarray(s_f30.triangles.v0)
                  - np.asarray(scene0.triangles.v0)).max() > 1.0
    # fixed mode recomputes
    s_fix = scene_with_frame(scene0, dm, jnp.int32(30), fixed_normals=False)
    assert np.abs(np.asarray(s_fix.triangles.normal)
                  - np.asarray(scene0.triangles.normal)).max() > 0.01


def test_euler_matrix_orders():
    # XYZ vs ZYX differ for non-commuting rotations
    a = euler_matrix((90, 90, 0), 0)
    b = euler_matrix((90, 90, 0), 5)
    assert np.abs(a - b).max() > 0.5
    # round-trip through matrix_to_trs for XYZ order
    m = euler_matrix((10, 20, 30), 0)
    _, r = matrix_to_trs(m)
    np.testing.assert_allclose(r, [10, 20, 30], atol=1e-5)


def test_animation_is_smooth(mesh):
    """Consecutive frames move each vertex by a small bounded amount."""
    dm = device_mesh(mesh)
    a = np.asarray(skin_points(dm.points, dm.weights, dm.vertex_transforms[10]))
    b = np.asarray(skin_points(dm.points, dm.weights, dm.vertex_transforms[11]))
    step = np.linalg.norm(a - b, axis=-1)
    assert step.max() < 15.0       # no exploding limbs
    assert step.mean() > 0.01      # but actually moving


def test_ascii_fbx_handcrafted(tmp_path):
    """ASCII FBX 7.x parses into the same tree shape as binary: a quad mesh
    (negative-terminated PolygonVertexIndex) fan-triangulates into 2 tris."""
    from cudaraytracer_tpu.utils.fbx_loader import load_skinned_mesh

    txt = """; FBX 7.4.0 project file
FBXHeaderExtension:  {
    FBXHeaderVersion: 1003
    FBXVersion: 7400
}
Objects:  {
    Geometry: 1000, "Geometry::quad", "Mesh" {
        Vertices: *12 {
            a: 0,0,0, 1,0,0, 1,1,0, 0,1,0
        }
        PolygonVertexIndex: *4 {
            a: 0,1,2,-4
        }
    }
    Model: 2000, "Model::quadModel", "Mesh" {
        Version: 232
        Properties70:  {
            P: "Lcl Translation", "Lcl Translation", "", "A",0,0,0
        }
    }
}
Connections:  {
    C: "OO",1000,2000
    C: "OO",2000,0
}
"""
    p = tmp_path / "quad_ascii.fbx"
    p.write_text(txt)
    mesh = load_skinned_mesh(str(p))
    assert mesh.points.shape == (4, 3)
    np.testing.assert_array_equal(mesh.faces,
                                  [[0, 1, 2], [0, 2, 3]])
    assert mesh.frame_count >= 1
    assert mesh.weights.shape[0] == 4
    # computed fallback normals point +z for this CCW winding
    np.testing.assert_allclose(mesh.normals, [[0, 0, 1]] * 2, atol=1e-6)


def test_ascii_fbx_roundtrip_real_geometry(tmp_path):
    """Serialize low_walking.fbx's geometry into ASCII form (wrapped value
    lines, comments) and re-parse: arrays must round-trip exactly."""
    from cudaraytracer_tpu.utils.fbx_parser import parse_fbx

    root = parse_fbx(WALKING)
    objs = root.find("Objects")
    geom = next(c for c in objs.children if c.name == "Geometry")
    verts = np.asarray(geom.find("Vertices").props[0], np.float64)
    pvi = np.asarray(geom.find("PolygonVertexIndex").props[0], np.int64)

    def fmt_array(name, arr, fmt):
        vals = ", ".join(fmt(v) for v in arr)
        # wrap lines at ~70 chars like real exporters
        out = []
        line = ""
        for tok in vals.split(" "):
            if len(line) + len(tok) > 70:
                out.append(line)
                line = ""
            line += tok + " "
        out.append(line)
        body = "\n            ".join(out)
        return (f"        {name}: *{len(arr)} {{\n"
                f"            a: {body}\n        }}\n")

    txt = ("; generated round-trip file\n"
           "FBXHeaderExtension:  {\n    FBXVersion: 7400\n}\n"
           "Objects:  {\n"
           '    Geometry: 555, "Geometry::rt", "Mesh" {\n'
           + fmt_array("Vertices", verts, lambda v: repr(float(v)))
           + fmt_array("PolygonVertexIndex", pvi, lambda v: str(int(v)))
           + "    }\n}\nConnections:  {\n    C: \"OO\",555,0\n}\n")
    p = tmp_path / "rt_ascii.fbx"
    p.write_text(txt)
    root2 = parse_fbx(str(p))
    g2 = next(c for c in root2.find("Objects").children
              if c.name == "Geometry")
    np.testing.assert_array_equal(
        np.asarray(g2.find("Vertices").props[0], np.float64), verts)
    np.testing.assert_array_equal(
        np.asarray(g2.find("PolygonVertexIndex").props[0], np.int64), pvi)


def test_euler_matrix_yzx_yxz_enum():
    """Regression: EFbxRotationOrder 2 = eEulerYZX, 3 = eEulerYXZ (the two
    were swapped).  Compose explicitly: column convention puts the
    first-applied rotation rightmost."""
    from cudaraytracer_tpu.utils.fbx_loader import _rot_axis
    rx, ry, rz = 30.0, 40.0, 50.0
    mx, my, mz = _rot_axis(rx, 0), _rot_axis(ry, 1), _rot_axis(rz, 2)
    np.testing.assert_allclose(euler_matrix((rx, ry, rz), 2),
                               mx @ mz @ my, atol=1e-12)   # Y,Z,X applied
    np.testing.assert_allclose(euler_matrix((rx, ry, rz), 3),
                               mz @ mx @ my, atol=1e-12)   # Y,X,Z applied


def test_by_polygon_normals_quad_mesh():
    """Regression: ByPolygon normal mapping must index per-POLYGON rows with
    per-triangle polygon ids — a fan-triangulated quad mesh used to index
    past the table (arange over triangles)."""
    from cudaraytracer_tpu.utils.fbx_parser import FbxNode
    from cudaraytracer_tpu.utils.fbx_loader import (_face_normals,
                                                    _triangulate)
    # two quads -> 4 triangles, but only 2 ByPolygon normals
    pvi = np.asarray([0, 1, 2, ~3, 4, 5, 6, ~7], np.int64)
    faces, first_pv, poly_id = _triangulate(pvi)
    assert len(faces) == 4
    np.testing.assert_array_equal(poly_id, [0, 0, 1, 1])
    nrm = np.asarray([[0, 0, 1], [0, 1, 0]], np.float64)
    ln = FbxNode("LayerElementNormal", [], [
        FbxNode("Normals", [nrm.reshape(-1)]),
        FbxNode("MappingInformationType", ["ByPolygon"]),
        FbxNode("ReferenceInformationType", ["Direct"]),
    ])
    geom = FbxNode("Geometry", [], [ln])
    points = np.zeros((8, 3))
    out = _face_normals(geom, first_pv, faces, points, poly_id)
    np.testing.assert_allclose(out, [[0, 0, 1], [0, 0, 1],
                                     [0, 1, 0], [0, 1, 0]])


def test_skin_points_zero_weight_stays_at_bind():
    """Regression: a vertex no cluster claims blends to the zero matrix;
    0/0 used to NaN the whole mesh — it must stay at bind pose."""
    from cudaraytracer_tpu.models.mesh import skin_points
    pts = jnp.asarray([[1.0, 2.0, 3.0], [4.0, 5.0, 6.0]])
    w = jnp.asarray([[1.0], [0.0]])            # vertex 1: zero total weight
    mats = jnp.asarray(np.eye(4)[None]) + 0.0
    mats = mats.at[0, 0, 3].set(10.0)          # bone 0: translate x+10
    out = np.asarray(skin_points(pts, w, mats))
    assert np.isfinite(out).all()
    np.testing.assert_allclose(out[0], [11.0, 2.0, 3.0], atol=1e-6)
    np.testing.assert_allclose(out[1], [4.0, 5.0, 6.0], atol=1e-6)  # bind


def test_recompute_normals_sign_aligned(mesh):
    """Regression: the reversed-winding gather negates the raw cross
    product; recomputed 'fixed' normals must sign-align with the loaded
    outward normals (bind pose: near-equal, not near-opposite)."""
    from cudaraytracer_tpu.models.mesh import (recompute_face_normals,
                                               skin_frame)
    dm = device_mesh(mesh)
    v0, v1, v2 = skin_frame(dm, jnp.int32(0))
    n = np.asarray(recompute_face_normals(v0, v1, v2, align_to=dm.normals))
    dots = (n * np.asarray(dm.normals)).sum(axis=1)
    assert (dots >= 0).mean() > 0.99           # aligned, not flipped


def test_ascii_nonfinite_literals_and_short_props():
    """Windows exporters write -1.#QNAN / 1.#INF literals; they must parse
    as one NaN/Inf value, not a number plus a stray word that shifts the
    array.  Single-valued / short Properties70 rows must not crash
    get_vec3_prop."""
    from cudaraytracer_tpu.utils.fbx_parser import (FbxNode,
                                                    _parse_ascii_values,
                                                    get_vec3_prop)
    vals = _parse_ascii_values("1.5,-1.#QNAN,2.0,1.#INF,-1.#IND000")
    assert len(vals) == 5
    assert vals[0] == 1.5 and vals[2] == 2.0
    assert np.isnan(vals[1]) and np.isinf(vals[3]) and np.isnan(vals[4])

    p70 = FbxNode("Properties70", [], [
        FbxNode("P", ["Lcl Scaling", "Lcl Scaling", "", "A", 5.0]),
        FbxNode("P", ["Lcl Translation", "Lcl Translation", "", "A",
                      1.0, 2.0]),
    ])
    node = FbxNode("Model", [], [p70])
    np.testing.assert_allclose(get_vec3_prop(node, "Lcl Scaling"),
                               [5.0, 5.0, 5.0])
    np.testing.assert_allclose(
        get_vec3_prop(node, "Lcl Translation", (9.0, 9.0, 9.0)),
        [1.0, 2.0, 9.0])
