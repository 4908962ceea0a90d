"""Micro-scene tests for the golden-oracle rasterizer.

These pin down the semantics every backend must reproduce: coverage,
depth ordering, culling rules, lighting formula quirks.
"""

import numpy as np

from compute_renderer_tpu.core.camera import Camera
from compute_renderer_tpu.core.effects import EffectUniform
from compute_renderer_tpu.core.maths import F32
from compute_renderer_tpu.golden.rasterizer import (
    barycentric,
    render_golden,
    triangle_setup,
    vertex_stage,
)
from compute_renderer_tpu.io import procedural

W, H = 64, 64
BLUE = np.array([0, 0, 255, 255], dtype=np.uint8)


def default_camera():
    return Camera.first_person([0, 0, 3.0], aspect=W / H)


def render(mesh, camera=None, effect=None, lights=None, w=W, h=H, **kw):
    camera = camera or default_camera()
    u = camera.uniform()
    effect = effect if effect is not None else EffectUniform().as_array()
    if lights is None:
        lwp = np.array([[0, 0, 5.0]], dtype=F32)
        lc = np.ones((1, 3), dtype=F32)
        li = np.ones((1,), dtype=F32)
    else:
        lwp, lc, li = lights
    return render_golden(
        mesh.positions, mesh.normals, mesh.uvs, mesh.indices,
        u.view_proj, u.view_position, lwp, lc, li, effect, w, h, **kw
    )


def test_background_is_blue():
    mesh = procedural.single_triangle(z=100.0)  # behind the camera
    img = render(mesh)
    assert (img == BLUE).all()


def test_single_triangle_renders_centered():
    mesh = procedural.single_triangle(z=0.0)
    img = render(mesh)
    covered = ~(img == BLUE).all(axis=-1)
    assert covered.any()
    # The triangle straddles the screen center.
    assert covered[H // 2, W // 2]
    # Corners stay background.
    assert not covered[0, 0] and not covered[-1, -1]
    # Coverage is roughly the analytic fraction: triangle spans 1x1 in world
    # at z=0 viewed from z=3 with fov 90 -> screen extent (1/3)*W/2 wide...
    frac = covered.mean()
    assert 0.005 < frac < 0.25


def test_backface_culled():
    mesh = procedural.single_triangle(z=0.0)
    # Reverse winding -> culled -> all background.
    mesh.indices = mesh.indices[::-1].copy()
    img = render(mesh)
    assert (img == BLUE).all()


def test_depth_ordering_front_wins():
    tri_front = procedural.single_triangle(z=1.0)  # closer to camera at z=3
    tri_back = procedural.single_triangle(z=0.0)
    both = type(tri_front).concatenate([tri_back, tri_front])
    # Give the two triangles distinct normals so we can tell who won.
    both.normals[:3] = [1, 0, 0]
    both.normals[3:] = [0, 0, 1]

    img = render(both)
    tri_front_only = render(tri_front)
    covered_front = ~(tri_front_only == BLUE).all(axis=-1)
    # Where the front triangle covers, the combined image matches it.
    np.testing.assert_array_equal(img[covered_front], tri_front_only[covered_front])


def test_depth_tie_first_triangle_wins():
    a = procedural.single_triangle(z=0.0)
    b = procedural.single_triangle(z=0.0)
    both = type(a).concatenate([a, b])
    both.normals[:3] = [0, 0, 1]
    both.normals[3:] = [0.5, 0.5, 0.5]
    img = render(both)
    only_a = render(a)
    covered = ~(only_a == BLUE).all(axis=-1)
    np.testing.assert_array_equal(img[covered], only_a[covered])


def test_near_plane_whole_triangle_discard():
    # One vertex behind the camera (w < 0) discards the whole triangle —
    # no clipping (binning.wgsl:100-103).
    mesh = procedural.single_triangle(z=0.0)
    mesh.positions[2, 2] = 10.0  # push one vertex behind the eye at z=3
    img = render(mesh)
    assert (img == BLUE).all()


def test_vertex_stage_screen_mapping():
    cam = default_camera()
    u = cam.uniform()
    positions = np.array([[0, 0, 0]], dtype=F32)
    effect = EffectUniform().as_array()
    world, screen = vertex_stage(positions, u.view_proj, effect, W, H)
    # Origin is dead center.
    np.testing.assert_allclose(screen[0, 0], W / 2, atol=1e-3)
    np.testing.assert_allclose(screen[0, 1], H / 2, atol=1e-3)
    assert screen[0, 3] > 0  # w = distance along view dir
    np.testing.assert_allclose(screen[0, 3], 3.0, atol=1e-5)


def test_barycentric_formula():
    v1 = np.array([0.0, 0.0, 0, 1], dtype=F32)
    v2 = np.array([10.0, 0.0, 0, 1], dtype=F32)
    v3 = np.array([0.0, 10.0, 0, 1], dtype=F32)
    bc1, bc2, bc3 = barycentric(v1, v2, v3, np.array([0.0]), np.array([0.0]))
    np.testing.assert_allclose([bc1[0], bc2[0], bc3[0]], [1, 0, 0], atol=1e-6)
    bc1, bc2, bc3 = barycentric(
        v1, v2, v3, np.array([10.0 / 3]), np.array([10.0 / 3])
    )
    np.testing.assert_allclose([bc1[0], bc2[0], bc3[0]], [1 / 3] * 3, atol=1e-5)


def test_triangle_setup_tile_ranges():
    # Hand-made screen-space triangle: bbox [10, 20] x [5, 9].
    screen = np.array(
        [
            [10.0, 5.0, 0.5, 1.0],
            [10.0, 9.0, 0.5, 1.0],
            [20.0, 7.0, 0.5, 1.0],
        ],
        dtype=F32,
    )
    # winding: cross_z = (0)(2) - (4)(10) < 0 -> front-facing
    setup = triangle_setup(
        screen, np.array([0, 1, 2], dtype=np.uint32),
        EffectUniform().as_array(), 64, 64, tile_size=8,
    )
    assert setup["alive"][0]
    np.testing.assert_array_equal(setup["start_tile"][0], [1, 0])
    # end_x = ceil(20/8) = 3, end_y = ceil(9/8) = 2
    np.testing.assert_array_equal(setup["tile_range"][0], [2, 2])


def test_lighting_no_normal_renormalization():
    # Scaled normals brighten the diffuse term (reference quirk: interpolated
    # normal is NOT renormalized, fragment.wgsl:77).
    mesh = procedural.single_triangle(z=0.0)
    img1 = render(mesh)
    mesh2 = procedural.single_triangle(z=0.0)
    mesh2.normals = mesh2.normals * 0.25
    img2 = render(mesh2)
    covered = ~(img1 == BLUE).all(axis=-1)
    assert img2[covered][..., 0].mean() < img1[covered][..., 0].mean()


def test_light_intensity_and_color():
    mesh = procedural.single_triangle(z=0.0)
    dark = render(
        mesh,
        lights=(
            np.array([[0, 0, 5.0]], dtype=F32),
            np.zeros((1, 3), dtype=F32),  # black light -> ambient only
            np.ones((1,), dtype=F32),
        ),
    )
    covered = ~(dark == BLUE).all(axis=-1)
    # ambient 0.1 -> gamma: 0.1^(1/2.2) * 255 ~ 89.6 -> 90
    expected = round(255 * 0.1 ** (1 / 2.2))
    assert abs(int(dark[covered][0][0]) - expected) <= 1


def test_two_lights_additive():
    mesh = procedural.single_triangle(z=0.0)
    one = render(mesh)
    two = render(
        mesh,
        lights=(
            np.array([[0, 0, 5.0], [0, 0, 5.0]], dtype=F32),
            np.ones((2, 3), dtype=F32),
            np.ones((2,), dtype=F32),
        ),
    )
    covered = ~(one == BLUE).all(axis=-1)
    assert two[covered].astype(int).sum() >= one[covered].astype(int).sum()


def test_gbuffer_depth_written():
    mesh = procedural.single_triangle(z=0.0)
    _, gbuf = render(mesh, return_gbuffer=True)
    assert gbuf["flag"].any()
    d = gbuf["depth_bits"]
    assert (d[gbuf["flag"]] != 0xFFFFFFFF).all()
