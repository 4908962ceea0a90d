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
