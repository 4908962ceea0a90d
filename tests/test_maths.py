"""Unit tests for core matrix math vs reference (glam) conventions."""

import numpy as np

from compute_renderer_tpu.core import maths
from compute_renderer_tpu.core.camera import Camera, CameraMode, FOVY, ZNEAR, ZFAR


def test_look_at_rh_origin():
    # Eye at +Z looking at origin: view maps origin to (0, 0, -dist).
    m = maths.look_at_rh(
        np.array([0, 0, 5.0]), np.array([0, 0, 0.0]), np.array([0, 1, 0.0])
    )
    p = maths.transform_point3(m, np.array([0, 0, 0.0]))
    np.testing.assert_allclose(p, [0, 0, -5.0], atol=1e-6)
    # A point right of target (world +X) stays +X in view space.
    p = maths.transform_point3(m, np.array([1, 0, 0.0]))
    np.testing.assert_allclose(p, [1, 0, -5.0], atol=1e-6)


def test_perspective_rh_depth_range():
    proj = maths.perspective_rh(FOVY, 4 / 3, ZNEAR, ZFAR)
    # Point on near plane -> ndc z = 0; far plane -> ndc z = 1 (0..1 depth).
    near_clip = proj @ np.array([0, 0, -ZNEAR, 1], dtype=np.float32)
    far_clip = proj @ np.array([0, 0, -ZFAR, 1], dtype=np.float32)
    assert abs(near_clip[2] / near_clip[3]) < 1e-6
    assert abs(far_clip[2] / far_clip[3] - 1.0) < 1e-5
    # w = -z_view (RH).
    assert near_clip[3] == np.float32(ZNEAR)


def test_perspective_fov():
    # At 90-degree FOV, a point at 45 degrees up maps to ndc y = 1.
    proj = maths.perspective_rh(np.pi / 2, 1.0, 0.1, 100.0)
    clip = proj @ np.array([0, 1, -1, 1], dtype=np.float32)
    np.testing.assert_allclose(clip[1] / clip[3], 1.0, atol=1e-6)


def test_orbit_camera_position():
    cam = Camera.orbit(distance=4.0, theta=0.0, phi=0.0, target=[1, 2, 3], aspect=1.0)
    # yaw=0, pitch=0 -> eye = target + (dist, 0, 0)
    np.testing.assert_allclose(cam.eye, [5, 2, 3], atol=1e-5)
    cam2 = Camera.orbit(distance=4.0, theta=90.0, phi=0.0, target=[0, 0, 0], aspect=1.0)
    np.testing.assert_allclose(cam2.eye, [0, 0, 4], atol=1e-5)


def test_orbit_update_over_time():
    cam = Camera.orbit(distance=2.0, theta=0.0, phi=0.0, target=[0, 0, 0], aspect=1.0)
    # dt * orbit_speed * 57.2958 degrees: one second at default speed 0.5.
    cam.update_over_time(1.0)
    assert abs(cam.yaw - 0.5 * 57.2958) < 1e-4


def test_first_person_defaults():
    cam = Camera.first_person([1, 2, 3], aspect=2.0)
    assert cam.mode is CameraMode.FIRST_PERSON
    np.testing.assert_allclose(cam.target, [1, 2, 2])  # facing -Z
    assert cam.yaw == -90.0


def test_first_person_movement():
    cam = Camera.first_person([0, 0, 0], aspect=1.0)
    cam.process_keyboard({"w"}, dt=0.1)  # forward = -Z
    np.testing.assert_allclose(cam.eye, [0, 0, -0.5], atol=1e-6)
    cam.process_keyboard({"w", "shift"}, dt=0.1)  # 10x sprint
    np.testing.assert_allclose(cam.eye, [0, 0, -5.5], atol=1e-5)


def test_first_person_mouse_pitch_clamp():
    cam = Camera.first_person([0, 0, 0], aspect=1.0)
    cam.process_mouse(0.0, 10000.0)
    assert cam.pitch == 89.0
    cam.process_mouse(0.0, -100000.0)
    assert cam.pitch == -89.0


def test_view_proj_composition():
    cam = Camera.orbit(distance=3.0, theta=0.0, phi=0.0, target=[0, 0, 0], aspect=1.0)
    u = cam.uniform()
    assert u.view_proj.dtype == np.float32
    np.testing.assert_allclose(u.view_position, [3, 0, 0, 1], atol=1e-5)
    # Target projects to the screen center (ndc 0,0).
    clip = u.view_proj @ np.array([0, 0, 0, 1], dtype=np.float32)
    ndc = clip[:3] / clip[3]
    np.testing.assert_allclose(ndc[:2], [0, 0], atol=1e-6)
