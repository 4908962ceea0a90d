"""Structured-OBJ synthesis: the suite's real-loader scene (VERDICT r2 #7).

The generated file must exercise the loader the way a real scan does
(multi o/g, shared indexed vertices, quads, mixed face-token forms,
negative indices, material statements) and round-trip bit-identically
through both parser implementations into a renderable mesh.
"""

import numpy as np
import pytest

from compute_renderer_tpu.io import native, objgen
from compute_renderer_tpu.io.obj import load_obj

TINY = dict(terrain_n=6, statue_nu=8, statue_nv=6, ruins=3, size=8.0)


@pytest.fixture(scope="module")
def tiny_obj(tmp_path_factory):
    path = tmp_path_factory.mktemp("objgen") / "tiny.obj"
    stats = objgen.write_structured_obj(path, **TINY)
    return path, stats


def test_triangle_count_matches_stats(tiny_obj):
    path, stats = tiny_obj
    mesh = load_obj(path)
    # terrain quads fan to 2 tris each; statue 2 per cell; ruins 12 per box;
    # banner quad fans to 2.
    expected = (2 * 6 * 6) + (2 * 8 * 6) + (12 * 3) + 2
    assert stats["triangles"] == expected
    assert mesh.num_triangles == expected


def test_vertices_shared_not_soup(tiny_obj):
    path, _ = tiny_obj
    mesh = load_obj(path)
    # Indexed topology with per-submesh dedup: far fewer output vertices
    # than 3 per triangle (a triangle-soup export would hit exactly 3T).
    assert mesh.positions.shape[0] < 1.5 * mesh.num_triangles


def test_native_parser_bitwise_parity(tiny_obj):
    if not native.available():
        pytest.skip("native parser not built")
    path, _ = tiny_obj
    py = load_obj(path)
    nat = native.load_obj(path)
    for field in ("indices", "positions", "normals", "uvs"):
        np.testing.assert_array_equal(
            getattr(py, field), getattr(nat, field), err_msg=field
        )


def test_negative_index_banner_loaded(tiny_obj):
    path, _ = tiny_obj
    mesh = load_obj(path)
    # The banner's relative-index quad references the 4 preceding verts.
    banner = np.array([[6, 3.5, 4], [7, 3.5, 4], [7, 4.5, 4], [6, 4.5, 4]],
                      np.float32)
    pos = mesh.positions
    for corner in banner:
        assert (np.abs(pos - corner).sum(axis=1) < 1e-6).any()


def test_mixed_attribute_forms(tiny_obj):
    path, _ = tiny_obj
    mesh = load_obj(path)
    nrm = np.linalg.norm(mesh.normals, axis=1)
    uvn = np.abs(mesh.uvs).sum(axis=1)
    # terrain: normals + uvs; statue: normals, no uvs; ruins: neither.
    assert (nrm > 0.5).any() and (nrm < 1e-6).any()
    assert (uvn > 1e-6).any()


def test_renders_through_real_loader(tiny_obj, tmp_path):
    import os

    from compute_renderer_tpu.engine.renderer import Renderer
    from compute_renderer_tpu.engine.scene import (
        CameraConfig, Scene, SceneConfig,
    )
    from compute_renderer_tpu.core.camera import CameraMode

    path, _ = tiny_obj
    cfg = SceneConfig(
        model_path=str(path),
        camera_config=CameraConfig(
            mode=CameraMode.FIRST_PERSON, position=(0.0, 2.0, 6.0)
        ),
    )
    scene = Scene.from_config(cfg, 96, 64)
    r = Renderer(scene.mesh, 96, 64, backend="tpu")
    img = np.asarray(r.render(scene.update(0.016)))
    assert img.shape == (64, 96, 4)
    covered = (img[..., 2] != 255).sum()
    assert covered > 50, "scene content not visible from spawn"


def test_ensure_structured_scene_cached(tmp_path):
    # Tiny stand-in of the cache contract: second call must not rewrite.
    target = tmp_path / objgen.STRUCTURED_NAME
    objgen.write_structured_obj(target, **TINY)
    mtime = target.stat().st_mtime_ns
    out = objgen.ensure_structured_scene(tmp_path)
    assert out == target
    assert target.stat().st_mtime_ns == mtime


def test_structured_scene_materials_resolve(tiny_obj):
    # The synthesized scene ships a real companion MTL: the opt-in material
    # loader must resolve ground/marble/stone into distinct per-triangle
    # diffuse rows, with the (usemtl-less) banner at identity white.
    path, stats = tiny_obj
    mesh = load_obj(path, materials=True)
    kd = mesh.face_kd
    assert kd is not None and kd.shape == (stats["triangles"], 3)
    colors = np.unique(kd, axis=0)
    for want in ((0.35, 0.45, 0.2), (0.85, 0.85, 0.8), (0.55, 0.5, 0.45)):
        assert np.isclose(colors, np.float32(want), atol=1e-6).all(
            axis=1).any(), want
    # Banner (last 2 triangles, no usemtl in its block... it inherits the
    # previous usemtl run) — contract: every row resolved, none NaN.
    assert np.isfinite(kd).all()


def test_ensure_textured_scene(tmp_path):
    # Synthesizes the textured suite asset (small structured build +
    # generated map_Kd images) and loads it through the texture extension:
    # both generated maps must land in the atlas and terrain/statue faces
    # must carry their slots (stone/banner untextured -> -1).
    path = objgen.ensure_textured_scene(tmp_path)
    assert path.exists()
    assert (tmp_path / "structured_ground.ppm").exists()
    mesh = load_obj(path, textures=True)
    assert mesh.has_textures
    assert mesh.tex_table.shape[0] == 2
    slots = np.unique(mesh.face_tex)
    assert set(slots.tolist()) == {-1, 0, 1}
    # Single-chunk on the tpu tile path (the suite-row cost contract).
    assert mesh.num_triangles < 98_000
    # Cached: second call must not rewrite.
    mtime = path.stat().st_mtime_ns
    assert objgen.ensure_textured_scene(tmp_path) == path
    assert path.stat().st_mtime_ns == mtime


def test_terrain_faces_up(tiny_obj):
    # The terrain's geometric winding must agree with its analytic
    # up-facing vn records: a down-wound terrain is back-face-culled from
    # every above-ground camera (shipped that way in v1 assets — the
    # whole ground plane silently vanished from the benchmark workload).
    path, _ = tiny_obj
    mesh = load_obj(path, materials=True)
    P = np.asarray(mesh.positions)
    tri = np.asarray(mesh.indices).reshape(-1, 3)
    ground = np.isclose(
        np.asarray(mesh.face_kd), np.float32((0.35, 0.45, 0.2)), atol=1e-6
    ).all(axis=1)
    assert ground.any()
    t = tri[ground]
    n = np.cross(P[t[:, 1]] - P[t[:, 0]], P[t[:, 2]] - P[t[:, 0]])
    assert (n[:, 1] > 0).all(), "terrain triangles must wind up-facing"


def test_stale_version_regenerates(tmp_path, monkeypatch):
    # A cached asset from an older generator (different header version)
    # must be rewritten, not trusted.
    orig = objgen.write_structured_obj
    monkeypatch.setattr(
        objgen, "write_structured_obj",
        lambda path, **kw: orig(path, **{**kw, **TINY}),
    )
    target = tmp_path / objgen.STRUCTURED_NAME
    target.write_text("# synthesized structurally-real benchmark scene\n")
    out = objgen.ensure_structured_scene(tmp_path)
    assert out == target
    with open(target, "rb") as f:
        assert f.readline().rstrip().endswith(
            b"v%d" % objgen.OBJGEN_VERSION)
    assert target.stat().st_size > 1000  # real geometry, not the stub


def test_structured_scene_mtl_refresh_and_textures(tmp_path):
    # The mega scene's MTL carries map_Kd rows (the textured-mega suite
    # row); a scene cached by an older build (MTL without map_Kd) must get
    # its library refreshed in place without rewriting the geometry.
    target = tmp_path / objgen.STRUCTURED_NAME
    objgen.write_structured_obj(target, **TINY)  # default (old-style) MTL
    mtl = tmp_path / "structured_scene.mtl"
    assert "map_Kd" not in mtl.read_text()
    mtime = target.stat().st_mtime_ns
    out = objgen.ensure_structured_scene(tmp_path)
    assert out == target
    assert target.stat().st_mtime_ns == mtime  # geometry untouched
    assert "map_Kd" in mtl.read_text()
    assert (tmp_path / "structured_ground.ppm").exists()
    mesh = load_obj(target, textures=True)
    assert mesh.has_textures
    assert set(np.unique(mesh.face_tex).tolist()) == {-1, 0, 1}
    # Kd rows unchanged: the materials suite row is unaffected.
    kd_mesh = load_obj(target, materials=True)
    colors = np.unique(kd_mesh.face_kd, axis=0)
    for want in ((0.35, 0.45, 0.2), (0.85, 0.85, 0.8), (0.55, 0.5, 0.45)):
        assert np.isclose(colors, np.float32(want), atol=1e-6).all(
            axis=1).any(), want
