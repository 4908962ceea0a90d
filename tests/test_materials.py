"""Material extension: per-triangle diffuse (Mesh.face_kd) end-to-end.

The reference has NO live material path (MaterialInfo is defined but never
bound, custom_pipeline/util.rs:35-85; MTL data discarded, model.rs:24) —
this is an opt-in extension. Contracts under test:

- default (face_kd=None) stays bitwise identical to the pre-extension
  pipeline (the kd code compiles out entirely);
- identity kd == all-ones is bitwise identical to no materials at all in
  a given backend's modulated epilogue semantics;
- xla and tpu (tile path, dense + flat layouts) agree on material scenes;
- golden oracle agrees within the usual <= 1 LSB contract.
"""

import numpy as np

from compute_renderer_tpu.backends import tpu, xla
from compute_renderer_tpu.core.camera import Camera
from compute_renderer_tpu.core.effects import EffectUniform
from compute_renderer_tpu.core.maths import F32
from compute_renderer_tpu.core.types import Mesh
from compute_renderer_tpu.golden.rasterizer import render_golden
from compute_renderer_tpu.io import procedural

W, H = 256, 64


def lights_at_camera():
    return (
        np.array([[0.0, 0.0, 5.0]], dtype=F32),
        np.array([[1.0, 0.9, 0.8]], dtype=F32),
        np.array([1.0], dtype=F32),
    )


def colored_cube():
    mesh = procedural.cube()
    T = mesh.num_triangles
    rng = np.random.default_rng(7)
    kd = rng.uniform(0.1, 1.0, size=(T, 3)).astype(F32)
    return Mesh(positions=mesh.positions, normals=mesh.normals,
                uvs=mesh.uvs, indices=mesh.indices, face_kd=kd)


def render_pair(mesh, w=W, h=H, **tpu_kw):
    camera = Camera.first_person([0, 0, 3.0], aspect=w / h)
    u = camera.uniform()
    effect = EffectUniform().as_array()
    lights = lights_at_camera()
    ref = xla.render(mesh, u, lights, effect, w, h, tile_h=8, tile_w=128)
    ours = tpu.render(mesh, u, lights, effect, w, h, **tpu_kw)
    return ref, ours, (u, lights, effect)


def test_materials_change_the_image():
    plain = procedural.cube()
    colored = colored_cube()
    ref_plain, ours_plain, _ = render_pair(plain)
    ref_col, ours_col, _ = render_pair(colored)
    assert (ref_col != ref_plain).any()
    assert (ours_col != ours_plain).any()


def test_xla_vs_tpu_materials_dense():
    ref, ours, _ = render_pair(colored_cube())
    np.testing.assert_array_equal(ours, ref)


def test_xla_vs_tpu_materials_flat(monkeypatch):
    from compute_renderer_tpu.backends import binning

    monkeypatch.setattr(binning, "DENSE_BINNING_OP_LIMIT", 0)
    ref, ours, _ = render_pair(colored_cube())
    np.testing.assert_array_equal(ours, ref)


def test_identity_kd_bitwise_matches_no_materials():
    plain = procedural.cube()
    ident = Mesh(positions=plain.positions, normals=plain.normals,
                 uvs=plain.uvs, indices=plain.indices,
                 face_kd=np.ones((plain.num_triangles, 3), dtype=F32))
    for m_plain, m_ident in ((plain, ident),):
        ref_p, ours_p, _ = render_pair(m_plain)
        ref_i, ours_i, _ = render_pair(m_ident)
        np.testing.assert_array_equal(ref_p, ref_i)
        np.testing.assert_array_equal(ours_p, ours_i)


def test_golden_vs_xla_materials():
    mesh = colored_cube()
    camera = Camera.first_person([0, 0, 3.0], aspect=W / H)
    u = camera.uniform()
    effect = EffectUniform().as_array()
    lwp, lc, li = lights_at_camera()
    gold = render_golden(
        mesh.positions, mesh.normals, mesh.uvs, mesh.indices,
        u.view_proj, u.view_position, lwp, lc, li, effect, W, H,
        face_kd=mesh.face_kd,
    )
    ref = xla.render(mesh, u, (lwp, lc, li), effect, W, H,
                     tile_h=8, tile_w=8)
    diff = np.abs(gold.astype(int) - ref.astype(int))
    assert (diff <= 1).all()


def test_tpu_render_materials_micro_path():
    # Material meshes take the micro (mega-scene) path too: the coefficient
    # stream widens to 40-row superblocks with the kd rows (pallas_micro).
    # End-to-end through the host entry with an explicit path override; the
    # red material must tint covered pixels exactly as the tile path does.
    mesh = colored_cube()
    camera = Camera.first_person([0, 0, 3.0], aspect=W / H)
    u = camera.uniform()
    effect = EffectUniform().as_array()
    micro = tpu.render(mesh, u, lights_at_camera(), effect, W, H,
                       path="micro")
    tile = tpu.render(mesh, u, lights_at_camera(), effect, W, H,
                      path="tile")
    assert micro.shape == (H, W, 4)
    # No coverage-expanding effect is active, so cell vs tile clip unions
    # are identical; only FMA contraction could differ — and both programs
    # run the same vertex-stage formulas, so coverage at least must agree.
    covered_m = micro[..., 2] != 255
    covered_t = tile[..., 2] != 255
    assert covered_m.any()
    mismatched = (covered_m != covered_t).mean()
    assert mismatched < 0.01


def test_scene_renderer_materials(tmp_path):
    from compute_renderer_tpu.engine.renderer import Renderer
    from compute_renderer_tpu.engine.scene import CameraConfig, Scene, SceneConfig

    (tmp_path / "lib.mtl").write_text("newmtl red\nKd 0.9 0.1 0.1\n")
    (tmp_path / "tri.obj").write_text(
        "mtllib lib.mtl\nv -1 -1 0\nv 1 -1 0\nv 0 1 0\n"
        "vn 0 0 1\nvn 0 0 1\nvn 0 0 1\n"
        "usemtl red\nf 1//1 2//2 3//3\n"
    )
    cfg = SceneConfig(model_path=str(tmp_path / "tri.obj"),
                      camera_config=CameraConfig.first_person((0, 0, 3.0)),
                      enable_materials=True)
    scene = Scene.from_config(cfg, 64, 48)
    assert scene.mesh.face_kd is not None

    r = Renderer(scene.mesh, 64, 48, backend="tpu",
                 **scene.renderer_options())
    img = r.render(scene.update(0.0))
    # Off-config: same scene without materials shades gray, not red.
    cfg_off = SceneConfig(model_path=cfg.model_path,
                          camera_config=cfg.camera_config)
    scene_off = Scene.from_config(cfg_off, 64, 48)
    assert scene_off.mesh.face_kd is None
    r_off = Renderer(scene_off.mesh, 64, 48, backend="tpu",
                     **scene_off.renderer_options())
    img_off = r_off.render(scene_off.update(0.0))
    covered = img[..., 2] != 255
    assert covered.any()
    # The red material shifts R above G on covered pixels; the plain render
    # keeps them equal (gray).
    assert (img[covered][:, 0] > img[covered][:, 1]).all()
    assert (img_off[covered][:, 0] == img_off[covered][:, 1]).all()


def test_cli_materials_flag(tmp_path):
    from compute_renderer_tpu.cli import build_parser, scene_config_from_args

    args = build_parser().parse_args(["--materials", "--model-path", "x.obj"])
    assert scene_config_from_args(args).enable_materials
    args = build_parser().parse_args(["--model-path", "x.obj"])
    assert not scene_config_from_args(args).enable_materials
