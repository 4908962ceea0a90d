"""Native C++ OBJ parser vs the pure-Python loader (its oracle)."""

import subprocess
from pathlib import Path

import numpy as np
import pytest

from compute_renderer_tpu.io import native
from compute_renderer_tpu.io.obj import load_obj

NATIVE_DIR = Path(__file__).resolve().parent.parent / "compute_renderer_tpu" / "native"


@pytest.fixture(scope="module", autouse=True)
def build_native():
    if not (NATIVE_DIR / "libobjparse.so").exists():
        subprocess.run(["make", "-C", str(NATIVE_DIR)], check=True)
    # Reset the module's cached load state in case the lib was just built.
    native._TRIED = False
    native._LIB = None
    if not native.available():
        pytest.skip("native objparse not available")


CASES = {
    "basic": """
v 0 0 0
v 1 0 0
v 0 1 0
vn 0 0 1
vt 0 0
vt 1 0
vt 0 1
f 1/1/1 2/2/1 3/3/1
""",
    "quad_fan": """
v 0 0 0
v 1 0 0
v 1 1 0
v 0 1 0
f 1 2 3 4
""",
    "dedup": """
v 0 0 0
v 1 0 0
v 1 1 0
v 0 1 0
vn 0 0 1
f 1//1 2//1 3//1
f 1//1 3//1 4//1
""",
    "negative_indices": """
v 0 0 0
v 1 0 0
v 0 1 0
f -3 -2 -1
""",
    "multi_object": """
o first
v 0 0 0
v 1 0 0
v 0 1 0
f 1 2 3
g second
v 0 0 1
v 1 0 1
v 0 1 1
f 4 5 6
""",
    "mixed_vt": """
v 0 0 0
v 1 0 0
v 0 1 0
vt 0.5 0.25
f 1/1 2 3
""",
    "comments_and_mtl": """
# a comment
mtllib foo.mtl
usemtl bar
v 0 0 0
v 1 0 0
v 0 1 0
s off
f 1 2 3
""",
}


@pytest.mark.parametrize("name", list(CASES))
def test_native_matches_python(tmp_path, name):
    p = tmp_path / f"{name}.obj"
    p.write_text(CASES[name])
    py = load_obj(p)
    nat = native.load_obj(p)
    np.testing.assert_array_equal(py.indices, nat.indices)
    np.testing.assert_array_equal(py.positions, nat.positions)
    np.testing.assert_array_equal(py.normals, nat.normals)
    np.testing.assert_array_equal(py.uvs, nat.uvs)


def test_native_matches_python_large(tmp_path):
    # Round-trip a procedurally generated mesh through OBJ text.
    from compute_renderer_tpu.io import procedural

    m = procedural.icosphere(3)
    lines = []
    for pos in m.positions:
        lines.append(f"v {pos[0]:.9g} {pos[1]:.9g} {pos[2]:.9g}")
    for n in m.normals:
        lines.append(f"vn {n[0]:.9g} {n[1]:.9g} {n[2]:.9g}")
    for uv in m.uvs:
        lines.append(f"vt {uv[0]:.9g} {uv[1]:.9g}")
    tri = m.indices.reshape(-1, 3)
    for (a, b, c) in tri:
        lines.append(
            f"f {a+1}/{a+1}/{a+1} {b+1}/{b+1}/{b+1} {c+1}/{c+1}/{c+1}"
        )
    p = tmp_path / "sphere.obj"
    p.write_text("\n".join(lines) + "\n")

    py = load_obj(p)
    nat = native.load_obj(p)
    assert nat.num_triangles == m.num_triangles
    np.testing.assert_array_equal(py.indices, nat.indices)
    np.testing.assert_allclose(py.positions, nat.positions)
    np.testing.assert_allclose(py.normals, nat.normals)
    np.testing.assert_allclose(py.uvs, nat.uvs)


def test_native_matches_python_at_scale(tmp_path):
    """San-Miguel-class parity at reduced size (the full 1M-tri / 115 MB
    run lives in scripts/bench_obj_parse.py; measured bit-identical there).

    Uses the same vectorized OBJ writer as the benchmark so the text format
    (%.9g floats, v/vt/vn/f i/i/i) matches what the timing numbers in
    BASELINE.md were recorded on.
    """
    import sys

    sys.path.insert(0, str(NATIVE_DIR.parent.parent / "scripts"))
    from bench_obj_parse import write_obj
    from compute_renderer_tpu.io import procedural

    m = procedural.uv_sphere(nu=256, nv=128)  # 65k tris, ~7 MB of text
    p = tmp_path / "big.obj"
    mb = write_obj(m, p)
    assert mb > 5.0
    py = load_obj(p)
    nat = native.load_obj(p)
    assert py.num_triangles == m.num_triangles
    np.testing.assert_array_equal(py.indices, nat.indices)
    np.testing.assert_array_equal(py.positions, nat.positions)
    np.testing.assert_array_equal(py.normals, nat.normals)
    np.testing.assert_array_equal(py.uvs, nat.uvs)


def _write_material_scene(tmp_path, with_map=True):
    (tmp_path / "lib.mtl").write_text(
        "newmtl red\nKd 0.8 0.1 0.1\n"
        + ("map_Kd tex.ppm\n" if with_map else "")
        + "newmtl two words\nKd 0.1 0.8 0.2\n"
        "newmtl blue\nKd 0.2 0.2 0.9\n"
        + ("map_Kd tex.ppm\n" if with_map else "")
    )
    if with_map:
        from compute_renderer_tpu.io.textures import write_ppm

        write_ppm(tmp_path / "tex.ppm",
                  np.arange(12, dtype=np.uint8).reshape(2, 2, 3))
    p = tmp_path / "mat.obj"
    p.write_text(
        """
mtllib lib.mtl missing.mtl
v 0 0 0
v 1 0 0
v 0 1 0
v 1 1 0
vt 0 0
vt 1 0
vt 0 1
usemtl red
f 1/1 2/2 3/3
usemtl  two   words # comment
f 2/2 4/1 3/3
o next
usemtl ghost
f 1/1 2/2 4/3
usemtl
f 1 2 3
usemtl red
f 1/1 2/2 3/3 4/1
"""
    )
    return p


@pytest.mark.parametrize("textures", [False, True])
def test_native_materials_match_python(tmp_path, textures):
    # The material extension through the native parser: usemtl runs (with
    # multi-word names, comments, re-use across sub-meshes, bare usemtl
    # clearing, unresolvable names) and the map_Kd atlas must match the
    # Python loader exactly — including on quad fan-triangulation where
    # one face emits two triangles with the same material.
    if not native.supports_materials():
        pytest.skip("native material ABI not built")
    p = _write_material_scene(tmp_path, with_map=textures)
    py = load_obj(p, materials=True, textures=textures)
    nat = native.load_obj(p, materials=True, textures=textures)
    np.testing.assert_array_equal(py.indices, nat.indices)
    np.testing.assert_array_equal(py.face_kd, nat.face_kd)
    # The fixture exercises every resolution class.
    assert len(np.unique(py.face_kd, axis=0)) >= 3
    if textures:
        np.testing.assert_array_equal(py.face_tex, nat.face_tex)
        np.testing.assert_array_equal(py.texels, nat.texels)
        np.testing.assert_array_equal(py.tex_table, nat.tex_table)
        assert (nat.face_tex >= 0).any() and (nat.face_tex == -1).any()
    else:
        assert nat.face_tex is None


def test_loaders_tolerate_trailing_comments_and_oor_indices(tmp_path):
    # Both loaders must accept what the other accepts (oracle contract).
    p = tmp_path / "messy.obj"
    p.write_text(
        """
v 0 0 0
v 1 0 0
v 0 1 0
vt 0.5 0.5
f 1/1 2/9 3 # trailing comment
"""
    )
    py = load_obj(p)
    assert py.num_triangles == 1
    # vt index 9 is out of range -> zero-filled -> V flip gives (0, 1).
    np.testing.assert_allclose(py.uvs[1], [0.0, 1.0])
    if native.available():
        nat = native.load_obj(p)
        np.testing.assert_array_equal(py.indices, nat.indices)
        np.testing.assert_allclose(py.uvs, nat.uvs)
