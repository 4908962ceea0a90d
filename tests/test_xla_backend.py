"""Pixel-parity: XLA brute-force backend vs the golden NumPy oracle.

The analog of the reference's custom-vs-wgpu visual A/B (SURVEY.md §4), made
exact: on identical platform math the two implementations should agree to
<= 1 LSB per channel (u8 rounding of ulp-level transcendental differences).
"""

import numpy as np
import pytest

from compute_renderer_tpu.core.camera import Camera
from compute_renderer_tpu.core.effects import Effect, EffectUniform, WaveDirection
from compute_renderer_tpu.core.maths import F32
from compute_renderer_tpu.golden.rasterizer import render_golden
from compute_renderer_tpu.backends import xla
from compute_renderer_tpu.io import procedural

W, H = 64, 48


def lights_default():
    return (
        np.array([[0.0, 0.0, 0.0], [-5.0, 3.0, 0.0]], dtype=F32),
        np.array([[1.0, 0.9, 0.8], [0.3, 0.4, 0.5]], dtype=F32),
        np.array([1.0, 0.5], dtype=F32),
    )


def compare(mesh, effect=None, camera=None, w=W, h=H, max_mismatch_frac=0.003):
    camera = camera or Camera.first_person([0, 0, 3.0], aspect=w / h)
    u = camera.uniform()
    effect = effect if effect is not None else EffectUniform().as_array()
    lwp, lc, li = lights_default()

    golden = render_golden(
        mesh.positions, mesh.normals, mesh.uvs, mesh.indices,
        u.view_proj, u.view_position, lwp, lc, li, effect, w, h,
    )
    ours = xla.render(mesh, u, (lwp, lc, li), effect, w, h)

    assert ours.shape == golden.shape
    diff = np.abs(ours.astype(int) - golden.astype(int))
    # Allow a tiny fraction of edge pixels to differ (coverage flips from
    # ulp-level transcendental/libm differences); interior must agree to 1 LSB.
    mismatched = (diff > 1).any(axis=-1)
    frac = mismatched.mean()
    assert frac <= max_mismatch_frac, (
        f"{mismatched.sum()} pixels differ by >1 LSB ({frac:.4%})"
    )
    return golden, ours


def test_single_triangle_parity():
    compare(procedural.single_triangle())


def test_cube_parity():
    compare(procedural.cube())


def test_icosphere_parity():
    compare(procedural.icosphere(2))


def test_overlapping_triangles_depth_parity():
    a = procedural.single_triangle(z=0.0)
    b = procedural.single_triangle(z=1.0)
    b.positions[:, 0] += 0.2
    mesh = type(a).concatenate([a, b])
    mesh.normals[3:] = [1, 0, 0]
    compare(mesh)


def test_orbit_camera_parity():
    cam = Camera.orbit(3.0, 35.0, 10.0, [0, 0, 0], aspect=W / H)
    compare(procedural.cube(), camera=cam)


def test_wave_effect_parity():
    e = Effect.wave(0.3, 2.0, 1.0, WaveDirection.VERTICAL)
    e.update(0.7)
    compare(procedural.icosphere(1), effect=e.uniform(0.7).as_array())


def test_wave_radial_parity():
    e = Effect.wave(0.2, 3.0, 1.0, WaveDirection.RADIAL)
    e.update(0.3)
    compare(procedural.icosphere(1), effect=e.uniform(0.3).as_array())


def test_edge_melt_parity():
    e = Effect.edge_melt(0.3, 1.0)
    e.update(0.5)
    compare(procedural.icosphere(1), effect=e.uniform(0.5).as_array())


def test_voxelize_parity():
    e = Effect.voxelize(0.5, 1.0)
    e.update(0.8)
    compare(procedural.cube(), effect=e.uniform(0.8).as_array())


def test_mirage_parity():
    e = Effect.mirage(1.5, 0.5, 1.0)
    e.update(0.4)
    compare(procedural.cube(), effect=e.uniform(0.4).as_array())


def test_behind_camera_all_background():
    mesh = procedural.single_triangle(z=10.0)
    cam = Camera.first_person([0, 0, 3.0], aspect=W / H)
    u = cam.uniform()
    lwp, lc, li = lights_default()
    img = xla.render(mesh, u, (lwp, lc, li), EffectUniform().as_array(), W, H)
    assert (img == np.array([0, 0, 255, 255], dtype=np.uint8)).all()


def test_odd_resolution():
    # Non-tile-aligned framebuffer (e.g. 61x47) must work.
    compare(procedural.cube(), w=61, h=47)


@pytest.mark.parametrize("chunk", [1, 8, 64])
def test_chunk_size_invariance(chunk):
    mesh = procedural.icosphere(1)
    cam = Camera.first_person([0, 0, 3.0], aspect=W / H)
    u = cam.uniform()
    lwp, lc, li = lights_default()
    eff = EffectUniform().as_array()
    ref = xla.render(mesh, u, (lwp, lc, li), eff, W, H, chunk=8)
    out = xla.render(mesh, u, (lwp, lc, li), eff, W, H, chunk=chunk)
    np.testing.assert_array_equal(ref, out)
