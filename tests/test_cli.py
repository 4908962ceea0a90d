"""CLI contract tests (reference src/main.rs flags/subcommands)."""

import numpy as np
import pytest

from compute_renderer_tpu import cli
from compute_renderer_tpu.core.camera import CameraMode
from compute_renderer_tpu.core.effects import (
    EFFECT_EDGE_MELT,
    EFFECT_MIRAGE,
    EFFECT_VOXELIZE,
    EFFECT_WAVE,
    WaveDirection,
)


def parse(argv):
    return cli.build_parser().parse_args(argv)


def test_defaults_match_reference():
    args = parse([])
    assert args.width == 1024
    assert args.height == 768
    assert args.model_path == "suzanne.obj"
    assert args.camera_mode == "first-person"
    assert args.backend_type == "custom"


def test_scene_config_defaults():
    cfg = cli.scene_config_from_args(parse([]))
    assert cfg.model_path == "suzanne.obj"
    assert cfg.normalized_backend() == "tpu"
    assert cfg.camera_config.mode is CameraMode.FIRST_PERSON
    assert cfg.effect is None
    # Default lights: warm key + cool fill (scene.rs:229-236).
    assert len(cfg.lights) == 2


def test_backend_aliases():
    for name, norm in [("custom", "tpu"), ("wgpu", "xla"), ("tpu", "tpu"),
                       ("xla", "xla")]:
        cfg = cli.scene_config_from_args(parse(["--backend-type", name]))
        assert cfg.normalized_backend() == norm


def test_invalid_backend_exits():
    with pytest.raises(SystemExit):
        cli.scene_config_from_args(parse(["--backend-type", "vulkan"]))


def test_effect_construction():
    cfg = cli.scene_config_from_args(
        parse(["effect", "--effect", "wave", "--param1", "0.5",
               "--param2", "2", "--param3", "1.5", "--param4", "2"])
    )
    assert cfg.effect.kind == EFFECT_WAVE
    assert cfg.effect.direction is WaveDirection.RADIAL
    assert cfg.effect.amplitude == 0.5

    cfg = cli.scene_config_from_args(parse(["effect", "--effect", "voxelize"]))
    assert cfg.effect.kind == EFFECT_VOXELIZE

    cfg = cli.scene_config_from_args(parse(["effect", "--effect", "edge_melt"]))
    assert cfg.effect.kind == EFFECT_EDGE_MELT

    cfg = cli.scene_config_from_args(parse(["effect", "--effect", "mirage"]))
    assert cfg.effect.kind == EFFECT_MIRAGE

    cfg = cli.scene_config_from_args(parse(["effect", "--effect", "none"]))
    assert cfg.effect is None


def test_invalid_effect_exits():
    with pytest.raises(SystemExit):
        cli.scene_config_from_args(parse(["effect", "--effect", "explode"]))


def test_invalid_wave_direction_exits():
    with pytest.raises(SystemExit):
        cli.scene_config_from_args(
            parse(["effect", "--effect", "wave", "--param4", "7"])
        )


def test_benchmarks_invalid_offset():
    rc = cli.main(["benchmarks", "--offset", "99"])
    assert rc == 1


def test_headless_render_end_to_end(tmp_path):
    out = tmp_path / "out.png"
    rc = cli.main([
        "--width", "64", "--height", "48", "--backend-type", "xla",
        "--camera-mode", "orbit", "--frames", "1",
        "--output", str(out),
    ])
    assert rc == 0
    assert out.exists()
    data = out.read_bytes()
    assert data[:8] == b"\x89PNG\r\n\x1a\n"


def test_headless_multi_frame(tmp_path):
    from compute_renderer_tpu.app.headless import run_headless
    from compute_renderer_tpu.engine.scene import CameraConfig, SceneConfig

    cfg = SceneConfig(backend_type="xla",
                      camera_config=CameraConfig(distance=3.0))
    paths = run_headless(cfg, 64, 48, frames=3,
                         output=str(tmp_path / "f.png"), dt=0.1)
    assert len(paths) == 3
    assert all(p.exists() for p in paths)


def test_png_writer_minimal(tmp_path):
    from compute_renderer_tpu.app.headless import _write_png_minimal

    rgba = np.zeros((4, 6, 4), dtype=np.uint8)
    rgba[..., 2] = 255
    p = tmp_path / "m.png"
    _write_png_minimal(p, rgba)
    data = p.read_bytes()
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    # PIL round-trip when available
    try:
        from PIL import Image

        img = np.asarray(Image.open(p))
        np.testing.assert_array_equal(img, rgba)
    except ImportError:
        pass


def test_host_cache_dir_keyed_and_stable():
    # Host-keyed compile-cache path: stable within one host, regime tag
    # separates test/CLI caches, and the path never collides with the
    # un-keyed legacy names a migrated host may have left behind.
    from compute_renderer_tpu.cache import host_cache_dir

    a = host_cache_dir("cpu_tests")
    b = host_cache_dir("cpu_tests")
    assert a == b
    assert a != host_cache_dir("cli")
    assert a.startswith("/tmp/jax_cache_cpu_tests_")
    assert a not in ("/tmp/jax_cache", "/tmp/jax_cache_cpu_tests")


def test_headless_gif_output(tmp_path):
    from compute_renderer_tpu.app.headless import run_headless
    from compute_renderer_tpu.engine.scene import CameraConfig, SceneConfig

    pytest.importorskip("PIL")
    cfg = SceneConfig(camera_config=CameraConfig(distance=3.0))
    out = tmp_path / "anim.gif"
    written = run_headless(cfg, 64, 48, frames=3, output=str(out),
                           dt=1 / 30.0)
    assert written == [out] and out.exists()
    from PIL import Image

    with Image.open(out) as im:
        assert im.format == "GIF"
        assert getattr(im, "n_frames", 1) == 3
