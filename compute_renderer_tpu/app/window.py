"""Interactive viewer (reference src/window.rs) on top of tkinter.

Feature map from the reference's winit ApplicationHandler:
- per-frame update loop: dt -> camera -> scene update -> render -> blit
  (window.rs:194-221, 345-410), PIPELINED: frame k is dispatched (async,
  device-resident, unchecked) before frame k-1's pixels are fetched for the
  blit, so the device renders k while k-1 crosses the link — one blocking
  device->host round trip per frame, and viewer FPS tracks kernel time
  rather than link latency (the reference's submit is equally async,
  custom_pipeline/renderer.rs:105-157). Binning-overflow flags accumulate
  on device and are flushed every few frames; an overflow triggers one
  checked render that grows capacities from the reported need.
- measured FPS in a HUD overlay (reference prints FPS to the collector)
- first-person WASD/Space/C + Shift sprint + [ ] speed trim ('P' prints the
  pose) (camera.rs:97-150) and mouse-drag look (camera.rs:152-173)
- Escape cycles to the next scene config (window.rs:274-342)
- benchmark-end auto-cycling: when a scene's benchmark duration elapses the
  collector finalises and the next SceneConfig loads; after the last one the
  app exits (window.rs:203-209, 274-281)
- window resize rebuilds the render step (window.rs:137-169)

tkinter is used because it ships with CPython — no extra GUI dependency.
Requires a display; the CLI falls back to headless rendering otherwise. The
``tk_module`` hook exists so the frame loop, input handling, and scene
cycling are testable on displayless CI boxes (tests/test_window.py drives a
fake Tk through ticks, keys, mouse, resize, and benchmark cycling).
"""

from __future__ import annotations

import time

import jax
import numpy as np

from compute_renderer_tpu.bench.collector import PerformanceCollector
from compute_renderer_tpu.engine.renderer import Renderer
from compute_renderer_tpu.engine.scene import Scene, SceneConfig

# Ticks between device-side overflow-flag flushes (each flush is one extra
# round trip; an overflowed frame shows with dropped triangles for at most
# this many frames before the checked re-render fixes capacities).
FLUSH_INTERVAL = 32

_KEYMAP = {
    "w": "w", "a": "a", "s": "s", "d": "d",
    "space": "space", "c": "c",
    "shift_l": "shift", "shift_r": "shift",
    "bracketleft": "[", "bracketright": "]",
    "p": "p",
}


class InteractiveApp:
    def __init__(self, scene_configs: list, width: int, height: int,
                 tk_module=None):
        if tk_module is None:
            import tkinter as tk_module

        self.tk = tk_module
        self.scene_configs = scene_configs
        self.scene_index = 0
        self.width = width
        self.height = height
        self.keys_down: set = set()
        self.mouse_down = False
        self.last_mouse = (0, 0)
        self.running = True

        self.root = self.tk.Tk()
        self.root.title("compute-renderer-tpu")
        self.canvas = self.tk.Canvas(self.root, width=width, height=height,
                                     highlightthickness=0)
        self.canvas.pack()
        self.photo = None

        self.root.bind("<KeyPress>", self._on_key_press)
        self.root.bind("<KeyRelease>", self._on_key_release)
        self.root.bind("<Configure>", self._on_resize)
        self.canvas.bind("<ButtonPress-1>", self._on_mouse_down)
        self.canvas.bind("<ButtonRelease-1>", self._on_mouse_up)
        self.canvas.bind("<Motion>", self._on_mouse_move)

        # Pipelined-present state: the device-resident (1,H,W,4) frame
        # dispatched last tick, fetched+blitted next tick.
        self._inflight = None
        self._tick_count = 0
        self._fps = 0.0
        self._hud = None

        self._load_scene(0)
        self.last_frame = time.perf_counter()

    # -- scene management (window.rs:274-342) --------------------------------

    def _load_scene(self, index: int) -> None:
        self._inflight = None  # old renderer's frame: drop, don't blit
        self.scene_index = index % len(self.scene_configs)
        config = self.scene_configs[self.scene_index]
        self.scene = Scene.from_config(config, self.width, self.height)
        self.renderer = Renderer(self.scene.mesh, self.width, self.height,
                                 backend=config.normalized_backend(),
                                 **self.scene.renderer_options())
        # Fresh collector per scene (window.rs:295-300); duration None means
        # endless interactive use (scene.rs:232 u64::MAX default).
        self.collector = PerformanceCollector(
            config.scene_name(), self.scene_index,
            config.benchmark_duration_secs,
            num_triangles=self.scene.mesh.num_triangles,
            num_pixels=self.width * self.height,
        )

    def _next_scene_or_exit(self) -> None:
        """Benchmark-end handling (window.rs:203-209, 274-281): finalise the
        collector; advance to the next config, or exit after the last one."""
        self.collector.finalise()
        if self.scene_index + 1 >= len(self.scene_configs):
            self.running = False
            self.root.destroy()
            return
        self._load_scene(self.scene_index + 1)

    # -- input ----------------------------------------------------------------

    def _on_key_press(self, event) -> None:
        name = event.keysym.lower()
        if name == "escape":
            self._load_scene(self.scene_index + 1)
            return
        if name in _KEYMAP:
            self.keys_down.add(_KEYMAP[name])

    def _on_key_release(self, event) -> None:
        name = event.keysym.lower()
        if name in _KEYMAP:
            self.keys_down.discard(_KEYMAP[name])

    def _on_resize(self, event) -> None:
        """Window resize (reference window.rs:137-169): update aspect ratio
        and rebuild the compiled render step for the new framebuffer."""
        w, h = int(event.width), int(event.height)
        if (w, h) == (self.width, self.height) or w < 16 or h < 16:
            return
        self.width, self.height = w, h
        self._inflight = None  # old framebuffer shape: drop, don't blit
        self.canvas.config(width=w, height=h)
        camera = self.scene.get_active_camera()
        if camera is not None:
            camera.set_aspect_ratio(w / h)
        self.renderer.resize(w, h)

    def _on_mouse_down(self, event) -> None:
        self.mouse_down = True
        self.last_mouse = (event.x, event.y)

    def _on_mouse_up(self, _event) -> None:
        self.mouse_down = False

    def _on_mouse_move(self, event) -> None:
        if not self.mouse_down:
            return
        dx = event.x - self.last_mouse[0]
        dy = self.last_mouse[1] - event.y  # y inverted like mouse-look
        self.last_mouse = (event.x, event.y)
        camera = self.scene.get_active_camera()
        if camera is not None:
            camera.process_mouse(float(dx), float(dy))

    # -- frame loop (window.rs:194-221) ---------------------------------------

    def _fetch(self, device_frames) -> np.ndarray:
        """THE one blocking device->host transfer per frame (the transfer-
        count contract tests/test_window.py pins). Everything else in the
        tick — uniform upload, frame dispatch — is asynchronous."""
        return np.asarray(jax.device_get(device_frames))

    def _blit(self, rgba: np.ndarray) -> None:
        """RGBA array -> PPM bytes -> Tk PhotoImage (no deps) + FPS HUD."""
        header = f"P6 {self.width} {self.height} 255 ".encode()
        self.photo = self.tk.PhotoImage(
            data=header + rgba[:, :, :3].tobytes(), format="PPM"
        )
        self.canvas.create_image(0, 0, image=self.photo, anchor="nw")
        hud_text = f"{self._fps:5.1f} fps"
        if self._hud is None:
            self._hud = self.canvas.create_text(
                6, 6, text=hud_text, anchor="nw", fill="#ffffff",
                font=("TkFixedFont", 10),
            )
        else:
            self.canvas.itemconfigure(self._hud, text=hud_text)
        self.canvas.tag_raise(self._hud)

    def _tick(self) -> None:
        if not self.running:
            return
        now = time.perf_counter()
        dt = now - self.last_frame
        self.last_frame = now
        if dt > 0:
            # EMA of the measured rate for the HUD.
            self._fps = 0.9 * self._fps + 0.1 / dt

        camera = self.scene.get_active_camera()
        if camera is not None:
            camera.update_over_time(dt)
            camera.process_keyboard(self.keys_down, dt)
        uniforms = self.scene.update(dt)

        self._tick_count += 1
        if (self._tick_count % FLUSH_INTERVAL == 0
                and self.renderer.flush_overflow()):
            # A recent unchecked frame dropped triangles (binning capacity):
            # one checked render grows the capacities from the reported
            # need, presents correctly, and the pipeline restarts.
            self._inflight = None
            self._blit(self.renderer.render(uniforms))
        else:
            # Pipelined present: dispatch frame k (async) BEFORE fetching
            # frame k-1, so the device renders k while k-1's pixels cross
            # the link. On pipeline warm-up (first frame after scene load /
            # resize) the just-dispatched frame is presented directly —
            # still exactly one blocking fetch.
            dispatched = self.renderer.render_batch_device(
                [uniforms], check=False
            )
            prev = self._inflight if self._inflight is not None else dispatched
            self._inflight = dispatched
            self._blit(self._fetch(prev)[0])

        # Scene-done check (reference window.rs:203-209): update() returns
        # True once the benchmark duration + warm-up has elapsed.
        if self.collector.update():
            self._next_scene_or_exit()
            if not self.running:
                return
        self.root.after(1, self._tick)

    def run(self) -> None:
        self.root.after(1, self._tick)
        self.root.mainloop()


def run_interactive(config: SceneConfig, width: int, height: int) -> None:
    # Probe ONLY the windowing system: scene-load or renderer errors inside
    # InteractiveApp must surface as themselves, not be relabeled "no
    # display" (which would also make the CLI retry the same failure
    # headlessly).
    try:
        import tkinter as tk

        probe = tk.Tk()
        probe.destroy()
    except Exception as e:  # no display / no tkinter
        raise RuntimeError(
            "Interactive viewer unavailable (no display?). "
            "Use headless mode instead."
        ) from e
    app = InteractiveApp([config], width, height)
    app.run()
