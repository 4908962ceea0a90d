"""The browser-based viewer driven over REAL HTTP (app/webview.py).

Unlike the Tk viewer (faked in test_window.py because no display exists),
the web viewer's entire surface IS network protocol, so these tests
exercise it for real: an ephemeral-port server, urllib requests for the
page and PNG frames, and JSON input events that must reach the camera.
The render loop is stepped manually via ``tick()`` (the HTTP threads only
queue events / serve the latest frame; the loop owns all state).
"""

import json
import urllib.request

import numpy as np
import pytest

from compute_renderer_tpu.app.webview import WebViewerApp
from compute_renderer_tpu.engine.scene import CameraConfig, SceneConfig

W, H = 64, 48


@pytest.fixture
def app():
    cfgs = [SceneConfig(
        model_path="suzanne.obj", backend_type="xla",
        camera_config=CameraConfig.first_person((0.0, 0.0, 3.0)),
        benchmark_duration_secs=None)]
    a = WebViewerApp(cfgs, W, H, port=0)  # ephemeral port
    yield a
    a.shutdown()


def _get(app, path):
    with urllib.request.urlopen(
            f"http://127.0.0.1:{app.port}{path}", timeout=10) as r:
        return r.read(), dict(r.headers)


def _post(app, path, payload):
    req = urllib.request.Request(
        f"http://127.0.0.1:{app.port}{path}",
        data=json.dumps(payload).encode(), method="POST")
    with urllib.request.urlopen(req, timeout=10) as r:
        return r.read()


def _decode_png(data):
    import io

    from PIL import Image

    return np.asarray(Image.open(io.BytesIO(data)).convert("RGBA"))


def test_page_and_frame_served(app):
    page, _ = _get(app, "/")
    assert b"<html" in page and b"/frame" in page and b"/input" in page

    app.tick()
    png, headers = _get(app, "/frame?since=0")
    assert png.startswith(b"\x89PNG")
    assert int(headers["X-Frame-No"]) >= 1
    assert "fps" in headers["X-HUD"]
    rgba = _decode_png(png)
    assert rgba.shape == (H, W, 4)
    # Blue clear color at a corner (fragment.wgsl:58-62).
    assert tuple(rgba[0, 0]) == (0, 0, 255, 255)
    # Something rendered (the suzanne stand-in covers the center).
    assert (rgba[:, :, :3] != (0, 0, 255)).any(axis=-1).sum() > 20


def test_input_events_drive_camera(app):
    cam = app.scene.get_active_camera()
    before_eye = np.array(cam.eye, np.float32).copy()
    yaw_before = float(cam.yaw)

    _post(app, "/input", {"kind": "keydown", "key": "w"})
    _post(app, "/input", {"kind": "mousedown", "x": 10, "y": 10})
    _post(app, "/input", {"kind": "mousemove", "x": 30, "y": 10})
    _post(app, "/input", {"kind": "mouseup"})
    app.tick()  # drains the queue, then moves with dt

    assert "w" in app.keys_down
    assert float(cam.yaw) != yaw_before
    assert not np.allclose(np.array(cam.eye, np.float32), before_eye)

    _post(app, "/input", {"kind": "keyup", "key": "w"})
    app.tick()
    assert "w" not in app.keys_down


def test_frame_advances_and_cursor_waits(app):
    app.tick()
    _, h1 = _get(app, "/frame?since=0")
    n1 = int(h1["X-Frame-No"])
    app.tick()
    png2, h2 = _get(app, f"/frame?since={n1}")
    assert int(h2["X-Frame-No"]) == n1 + 1
    assert png2.startswith(b"\x89PNG")


def test_resize_rebuilds_step(app):
    _post(app, "/input", {"kind": "resize", "w": 96, "h": 64})
    app.tick()
    png, _ = _get(app, "/frame?since=0")
    assert _decode_png(png).shape == (64, 96, 4)


def test_escape_reloads_scene_and_quit_stops(app):
    renderer_before = app.renderer
    _post(app, "/input", {"kind": "keydown", "key": "escape"})
    app.tick()
    assert app.renderer is not renderer_before  # scene reloaded

    _post(app, "/quit", {})
    app.tick()
    assert not app.running


def test_single_scene_benchmark_end_exits(app):
    app._next_scene_or_exit()
    assert not app.running


def test_stats_endpoint(app):
    app.tick()
    body, _ = _get(app, "/stats")
    stats = json.loads(body)
    assert stats["width"] == W and stats["height"] == H
    assert stats["frames"] >= 1 and "suzanne" in stats["scene"]
