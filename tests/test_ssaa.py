"""SSAA extension: engine-level supersampled rendering + box resolve.

The reference has no anti-aliasing; this is a beyond-parity extension.
The resolve is backend-agnostic (it sees only the finished framebuffer),
so one mechanism covers tpu/xla/wgpu-faithful and the frame-parallel path.
"""

import numpy as np
import pytest

from compute_renderer_tpu.core.camera import Camera
from compute_renderer_tpu.core.effects import EffectUniform
from compute_renderer_tpu.core.maths import F32
from compute_renderer_tpu.engine.renderer import Renderer, box_downsample
from compute_renderer_tpu.engine.scene import FrameUniforms
from compute_renderer_tpu.io import procedural

W, H = 128, 96


def uniforms_for(w=W, h=H):
    cam = Camera.first_person([0, 0, 3.0], aspect=w / h)
    u = cam.uniform()
    return FrameUniforms(
        view_position=u.view_position, view_proj=u.view_proj,
        light_world_pos=np.array([[0, 0, 5.0]], F32),
        light_color=np.ones((1, 3), F32),
        light_intensity=np.ones((1,), F32),
        effect=EffectUniform().as_array(),
    )


def test_box_downsample_values():
    import jax.numpy as jnp

    img = np.zeros((4, 4, 4), np.uint8)
    img[0:2, 0:2] = 100              # uniform block -> itself
    img[0:2, 2:4, 0] = [10, 20]      # rows identical -> mean 15
    img[2:4, 0:2, 1] = 255           # half-covered won't happen per-block here
    img[2:4, 2:4, 2] = [[0, 1], [2, 2]]  # mean 1.25 -> rounds to 1
    out = np.asarray(box_downsample(jnp.asarray(img), 2))
    assert out.shape == (2, 2, 4)
    assert (out[0, 0] == 100).all()
    assert out[0, 1, 0] == 15
    assert out[1, 0, 1] == 255
    assert out[1, 1, 2] == 1
    # Round-half-up: mean 0.5 -> 1.
    half = np.zeros((2, 2, 4), np.uint8)
    half[0, 0] = 2
    assert np.asarray(box_downsample(jnp.asarray(half), 2))[0, 0, 0] == 1


@pytest.mark.parametrize("backend", ["tpu", "xla"])
def test_ssaa_shape_and_edges(backend):
    mesh = procedural.icosphere(1)
    uni = uniforms_for()
    img1 = Renderer(mesh, W, H, backend=backend).render(uni)
    img2 = Renderer(mesh, W, H, backend=backend, ssaa=2).render(uni)
    assert img2.shape == (H, W, 4)
    assert (img1 != img2).any()
    # SSAA must BLEND at the silhouette, not just point-sample at higher
    # resolution. At a pixel that was pure background (0,0,255) in the
    # aliased render, the resolve mixes background with the gray-ish
    # object (R ~= G ~= B): the mix keeps R > 0 (object part) while
    # pushing B far above R (background part). A point-sample regression
    # yields only pure background (R == 0) or pure object (B ~= R) there.
    bg1 = ((img1[..., 0] == 0) & (img1[..., 1] == 0)
           & (img1[..., 2] == 255))
    r = img2[..., 0].astype(int)
    b = img2[..., 2].astype(int)
    blended = bg1 & (r > 0) & (b >= r + 40) & (b < 255)
    assert blended.any()


def test_ssaa_one_is_identity():
    mesh = procedural.cube()
    uni = uniforms_for()
    a = Renderer(mesh, W, H, backend="tpu").render(uni)
    b = Renderer(mesh, W, H, backend="tpu", ssaa=1).render(uni)
    np.testing.assert_array_equal(a, b)


def test_ssaa_batch_and_overflow_retry():
    # The batch step shares the per-frame step: shapes resolve, and the
    # capacity retry (which recompiles at the RENDER resolution) survives.
    mesh = procedural.icosphere(2)
    uni = uniforms_for()
    r = Renderer(mesh, W, H, backend="tpu", ssaa=2, pair_cap=256,
                 path="micro")
    frames = np.asarray(r.render_batch_device([uni, uni]))
    assert frames.shape == (2, H, W, 4)
    single = Renderer(mesh, W, H, backend="tpu", ssaa=2,
                      path="micro").render(uni)
    np.testing.assert_array_equal(frames[0], single)


def test_ssaa_frame_parallel():
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from compute_renderer_tpu.parallel.frames import render_frames
    from compute_renderer_tpu.parallel.sharding import make_mesh

    mesh8 = make_mesh(8)
    mesh = procedural.icosphere(2)
    uni = uniforms_for()
    r = Renderer(mesh, W, H, backend="tpu", ssaa=2)
    frames = render_frames(r, [uni, uni], mesh8)
    assert frames.shape == (2, H, W, 4)
    np.testing.assert_array_equal(frames[0], r.render(uni))


def test_ssaa_scene_and_cli_wiring():
    from compute_renderer_tpu.cli import build_parser, scene_config_from_args
    from compute_renderer_tpu.engine.scene import Scene, SceneConfig

    args = build_parser().parse_args(["--ssaa", "4", "--model-path", "x.obj"])
    cfg = scene_config_from_args(args)
    assert cfg.ssaa == 4
    cfg2 = SceneConfig(ssaa=2)
    scene = Scene.from_config(cfg2, 64, 48)
    assert scene.renderer_options()["ssaa"] == 2
    r = Renderer(scene.mesh, 64, 48, backend="tpu",
                 **scene.renderer_options())
    assert r.ssaa == 2 and r.rw == 128 and r.rh == 96
    # Default configs carry no ssaa key (existing step caches unchanged).
    assert "ssaa" not in Scene.from_config(
        SceneConfig(), 64, 48).renderer_options()


def test_ssaa_invalid():
    mesh = procedural.cube()
    with pytest.raises(ValueError, match="ssaa"):
        Renderer(mesh, W, H, backend="tpu", ssaa=0)
    # The CLI rejects it at parse time (argparse usage error), before any
    # model load happens.
    from compute_renderer_tpu.cli import build_parser

    with pytest.raises(SystemExit):
        build_parser().parse_args(["--ssaa", "0"])
