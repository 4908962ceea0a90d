"""The wgpu-faithful backend: software model of the reference's HARDWARE
pipeline (wgpu_pipeline/renderer.rs + shaders.wgsl), restoring the
custom-vs-hardware A/B the reference ships.
"""

import jax.numpy as jnp
import numpy as np

from compute_renderer_tpu.backends import get_backend, wgpu_faithful, xla
from compute_renderer_tpu.core.camera import Camera
from compute_renderer_tpu.core.effects import (
    Effect, EffectUniform, WaveDirection,
)
from compute_renderer_tpu.core.types import Mesh
from compute_renderer_tpu.io import procedural

W, H = 128, 96


def frame_args(mesh, effect=None, eye=(0.0, 0.0, 3.0)):
    cam = Camera.first_person(list(eye), aspect=W / H)
    u = cam.uniform()
    eff = effect if effect is not None else EffectUniform().as_array()
    return (
        jnp.asarray(mesh.positions),
        jnp.asarray(mesh.normals),
        jnp.asarray(mesh.uvs),
        jnp.asarray(mesh.indices.astype(np.int32)).reshape(-1, 3),
        jnp.asarray(u.view_proj),
        jnp.asarray(u.view_position),
        jnp.asarray(np.array([[0.0, 0.0, 5.0]], np.float32)),
        jnp.asarray(np.ones((1, 3), np.float32)),
        jnp.asarray(np.ones((1,), np.float32)),
        jnp.asarray(eff),
    )


def test_registered_backend():
    assert get_backend("wgpu-faithful") is wgpu_faithful


def test_renders_sphere_on_blue():
    args = frame_args(procedural.icosphere(2))
    rgba, depth = wgpu_faithful.render_frame(*args, width=W, height=H)
    rgba = np.asarray(rgba)
    depth = np.asarray(depth)
    covered = depth < 1.0
    assert covered.sum() > 500
    # Background is the blue clear color; depth cleared to 1.0.
    assert tuple(rgba[0, 0]) == (0, 0, 255, 255)
    assert depth[0, 0] == 1.0
    # Covered pixels are shaded (not background).
    ys, xs = np.nonzero(covered)
    assert (rgba[ys, xs, 2] != 255).any() or (rgba[ys, xs, 0] > 0).any()


def test_effects_are_ignored():
    # The hardware pipeline has no effects (shaders.wgsl:34-44): a wave
    # uniform must change NOTHING (the custom path deforms the silhouette).
    m = procedural.icosphere(2)
    e = Effect.wave(0.5, 3.0, 2.0, WaveDirection.VERTICAL)
    e.update(0.4)
    plain, _ = wgpu_faithful.render_frame(*frame_args(m), width=W, height=H)
    waved, _ = wgpu_faithful.render_frame(
        *frame_args(m, effect=e.uniform(0.4).as_array()), width=W, height=H
    )
    np.testing.assert_array_equal(np.asarray(plain), np.asarray(waved))


def test_distinct_look_vs_custom_semantics():
    # The two pipelines LOOK different by design (sRGB vs gamma 1/2.2,
    # pixel-center vs integer sampling, perspective-correct vs affine):
    # same silhouette class, different pixels.
    m = procedural.icosphere(2)
    args = frame_args(m)
    hw, _ = wgpu_faithful.render_frame(*args, width=W, height=H)
    sw, _ = xla.render_frame(*args, width=W, height=H)
    hw, sw = np.asarray(hw), np.asarray(sw)
    cov_hw = (hw[..., 2] != 255).sum()
    cov_sw = (sw[..., 2] != 255).sum()
    assert abs(cov_hw - cov_sw) < 0.1 * max(cov_hw, cov_sw)
    assert (hw != sw).any()


def test_backface_culling_ccw():
    # A single camera-facing triangle draws; with reversed winding it is
    # back-facing and culled (a closed mesh would just show its inside).
    m = procedural.single_triangle()
    _, d_front = wgpu_faithful.render_frame(
        *frame_args(m), width=W, height=H
    )
    assert (np.asarray(d_front) < 1.0).any()
    rev = Mesh(
        m.positions, m.normals, m.uvs,
        m.indices.reshape(-1, 3)[:, ::-1].reshape(-1).copy(),
    )
    _, depth = wgpu_faithful.render_frame(
        *frame_args(rev), width=W, height=H
    )
    assert (np.asarray(depth) == 1.0).all()


def test_shared_edge_no_gaps_no_cracks():
    # Top-left fill rule: a screen-facing quad split along its diagonal
    # must cover its interior with no background seam along the shared
    # edge (each edge pixel rasterized by exactly one triangle).
    quad = procedural.quad(z=0.0, size=1.0)
    _, depth = wgpu_faithful.render_frame(
        *frame_args(quad), width=W, height=H
    )
    depth = np.asarray(depth)
    covered = depth < 1.0
    # Interior bounding box of the covered region must be fully covered.
    ys, xs = np.nonzero(covered)
    y0, y1, x0, x1 = ys.min() + 2, ys.max() - 2, xs.min() + 2, xs.max() - 2
    assert covered[y0:y1, x0:x1].all(), "seam/gap inside the quad"


def test_srgb_differs_from_gamma():
    # A mid-gray linear value encodes differently under sRGB vs pow(1/2.2);
    # pin the backend's transfer function at a few points.
    lin = jnp.asarray(np.array([0.0, 0.002, 0.0031308, 0.18, 0.5, 1.0],
                               np.float32))
    enc = np.asarray(wgpu_faithful._srgb_encode(lin))
    expect = np.array([0.0, 0.02584, 0.04045, 0.46135613, 0.73536, 1.0],
                      np.float32)
    np.testing.assert_allclose(enc, expect, atol=2e-4)
