"""OBJ loader tests vs the reference's tobj semantics (src/model.rs:24-121)."""

import numpy as np

from compute_renderer_tpu.io.obj import load_obj
from compute_renderer_tpu.io import procedural
from compute_renderer_tpu.core.types import Mesh


def write(tmp_path, text, name="m.obj"):
    p = tmp_path / name
    p.write_text(text)
    return p


def test_basic_triangle(tmp_path):
    p = write(
        tmp_path,
        """
v 0 0 0
v 1 0 0
v 0 1 0
vn 0 0 1
vt 0 0
vt 1 0
vt 0 1
f 1/1/1 2/2/1 3/3/1
""",
    )
    m = load_obj(p)
    assert m.num_vertices == 3
    assert m.num_triangles == 1
    np.testing.assert_allclose(m.positions, [[0, 0, 0], [1, 0, 0], [0, 1, 0]])
    # All three corners share the normal.
    np.testing.assert_allclose(m.normals, [[0, 0, 1]] * 3)
    # V flip: vt (0,0) -> (0,1), (1,0) -> (1,1), (0,1) -> (0,0).
    np.testing.assert_allclose(m.uvs, [[0, 1], [1, 1], [0, 0]])


def test_fan_triangulation(tmp_path):
    p = write(
        tmp_path,
        """
v 0 0 0
v 1 0 0
v 1 1 0
v 0 1 0
f 1 2 3 4
""",
    )
    m = load_obj(p)
    assert m.num_triangles == 2
    # Fan: (0,1,2), (0,2,3)
    np.testing.assert_array_equal(m.indices, [0, 1, 2, 0, 2, 3])


def test_single_index_dedup(tmp_path):
    # Two triangles sharing an edge with identical triples -> deduped.
    p = write(
        tmp_path,
        """
v 0 0 0
v 1 0 0
v 1 1 0
v 0 1 0
vn 0 0 1
f 1//1 2//1 3//1
f 1//1 3//1 4//1
""",
    )
    m = load_obj(p)
    assert m.num_vertices == 4  # shared corners deduplicated
    assert m.num_triangles == 2


def test_same_position_different_normal_not_deduped(tmp_path):
    p = write(
        tmp_path,
        """
v 0 0 0
v 1 0 0
v 0 1 0
vn 0 0 1
vn 0 1 0
f 1//1 2//1 3//1
f 1//2 2//2 3//2
""",
    )
    m = load_obj(p)
    assert m.num_vertices == 6  # distinct (v, vn) triples


def test_negative_indices(tmp_path):
    p = write(
        tmp_path,
        """
v 0 0 0
v 1 0 0
v 0 1 0
f -3 -2 -1
""",
    )
    m = load_obj(p)
    assert m.num_triangles == 1
    np.testing.assert_allclose(m.positions, [[0, 0, 0], [1, 0, 0], [0, 1, 0]])


def test_multi_object_concat_with_offset(tmp_path):
    # Two objects each with their own vertices: indices offset per sub-mesh
    # (reference src/model.rs:109-121).
    p = write(
        tmp_path,
        """
o first
v 0 0 0
v 1 0 0
v 0 1 0
f 1 2 3
o second
v 0 0 1
v 1 0 1
v 0 1 1
f 4 5 6
""",
    )
    m = load_obj(p)
    assert m.num_triangles == 2
    assert m.num_vertices == 6
    np.testing.assert_array_equal(m.indices, [0, 1, 2, 3, 4, 5])
    np.testing.assert_allclose(m.positions[3:], [[0, 0, 1], [1, 0, 1], [0, 1, 1]])


def test_missing_normals_and_uvs_zero_filled(tmp_path):
    p = write(tmp_path, "v 0 0 0\nv 1 0 0\nv 0 1 0\nf 1 2 3\n")
    m = load_obj(p)
    np.testing.assert_allclose(m.normals, np.zeros((3, 3)))
    np.testing.assert_allclose(m.uvs, np.zeros((3, 2)))


def test_mixed_missing_vt_flips_zero_fill(tmp_path):
    # A sub-mesh with some vt: corners without vt get (0, 1-0=1).
    p = write(
        tmp_path,
        """
v 0 0 0
v 1 0 0
v 0 1 0
vt 0.5 0.25
f 1/1 2 3
""",
    )
    m = load_obj(p)
    np.testing.assert_allclose(m.uvs[0], [0.5, 0.75])
    np.testing.assert_allclose(m.uvs[1], [0.0, 1.0])


def test_procedural_meshes_valid():
    for name in procedural.PROCEDURAL_MODELS:
        m = procedural.make_model(name)
        assert m.num_triangles > 0
        assert m.indices.max() < m.num_vertices
        assert np.isfinite(m.positions).all()


def test_icosphere_counts():
    m = procedural.icosphere(2)
    assert m.num_triangles == 20 * 4**2
    # Unit normals.
    n = np.linalg.norm(m.normals, axis=1)
    np.testing.assert_allclose(n, 1.0, atol=1e-5)


def test_mesh_concatenate_offsets():
    a = procedural.single_triangle()
    b = procedural.quad()
    m = Mesh.concatenate([a, b])
    assert m.num_vertices == 7
    assert m.num_triangles == 3
    assert m.indices[3:].min() >= 3


# -- material extension (load_obj(materials=True), core.materials) ----------

MTL_TEXT = """
# library
newmtl red
Ka 0.2 0.0 0.0
Kd 0.9 0.1 0.1
Ks 0.3 0.3 0.3
Ns 64
d 0.75
Ni 1.45
newmtl half green
Kd 0.1 0.8 0.2
Tr 0.25
"""

OBJ_MTL_TEXT = """
mtllib lib.mtl
v 0 0 0
v 1 0 0
v 0 1 0
v 1 1 0
usemtl red
f 1 2 3
usemtl half green
f 2 4 3
usemtl missing
f 1 3 4
f 1 2 4
"""


def test_parse_mtl(tmp_path):
    from compute_renderer_tpu.core.materials import parse_mtl

    lib = parse_mtl(write(tmp_path, MTL_TEXT, "lib.mtl"))
    assert set(lib) == {"red", "half green"}
    np.testing.assert_allclose(lib["red"].diffuse, [0.9, 0.1, 0.1])
    np.testing.assert_allclose(lib["red"].ambient, [0.2, 0.0, 0.0])
    np.testing.assert_allclose(lib["red"].specular, [0.3, 0.3, 0.3])
    assert lib["red"].shininess == 64.0
    assert lib["red"].dissolve == 0.75
    assert lib["red"].optical_density == 1.45
    # Tr = 1 - d; names may contain spaces; missing fields keep defaults.
    assert abs(lib["half green"].dissolve - 0.75) < 1e-7
    np.testing.assert_allclose(lib["half green"].ambient, [0.1, 0.1, 0.1])


def test_load_obj_materials(tmp_path):
    write(tmp_path, MTL_TEXT, "lib.mtl")
    p = write(tmp_path, OBJ_MTL_TEXT)

    # Default: reference-faithful — materials discarded.
    assert load_obj(p).face_kd is None

    m = load_obj(p, materials=True)
    assert m.face_kd is not None and m.face_kd.shape == (4, 3)
    np.testing.assert_allclose(m.face_kd[0], [0.9, 0.1, 0.1])
    np.testing.assert_allclose(m.face_kd[1], [0.1, 0.8, 0.2])
    # Unresolvable usemtl -> identity white; the run persists to face 4.
    np.testing.assert_allclose(m.face_kd[2], [1.0, 1.0, 1.0])
    np.testing.assert_allclose(m.face_kd[3], [1.0, 1.0, 1.0])
    # Geometry identical to the materials=False load.
    np.testing.assert_array_equal(m.indices, load_obj(p).indices)


def test_load_obj_materials_missing_lib(tmp_path):
    # Unreadable mtllib degrades to identity colors, not an error.
    p = write(tmp_path, OBJ_MTL_TEXT)
    m = load_obj(p, materials=True)
    np.testing.assert_allclose(m.face_kd, np.ones((4, 3), np.float32))


def test_mesh_concatenate_face_kd():
    tri = Mesh(
        positions=np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32),
        normals=np.zeros((3, 3), np.float32),
        uvs=np.zeros((3, 2), np.float32),
        indices=np.array([0, 1, 2], np.uint32),
    )
    red = Mesh(
        positions=tri.positions, normals=tri.normals, uvs=tri.uvs,
        indices=tri.indices,
        face_kd=np.array([[0.5, 0.25, 0.125]], np.float32),
    )
    # All-None stays None; mixed fills identity white for the None mesh.
    assert Mesh.concatenate([tri, tri]).face_kd is None
    both = Mesh.concatenate([tri, red])
    np.testing.assert_allclose(
        both.face_kd, [[1, 1, 1], [0.5, 0.25, 0.125]]
    )
