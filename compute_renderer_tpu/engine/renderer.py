"""Renderer: geometry upload + the jitted per-frame render step.

The TPU equivalent of the reference's CustomRenderer orchestration
(src/custom_pipeline/renderer.rs:105-157): where the reference encodes four
compute passes into one command buffer per frame, here the whole pipeline is
one jitted XLA program ``render_frame(uniforms) -> (H,W,4) u8`` with geometry
resident on device. ``resize`` recreates the compiled step for the new
framebuffer shape (reference renderer.rs:159-170 rebuilds all buffers).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from compute_renderer_tpu.backends import get_backend
from compute_renderer_tpu.engine.scene import FrameUniforms


class Renderer:
    def __init__(self, mesh, width: int, height: int, backend: str = "tpu",
                 **options):
        self.backend_name = {"custom": "tpu", "wgpu": "xla"}.get(backend, backend)
        self.backend = get_backend(self.backend_name)
        self.width = int(width)
        self.height = int(height)
        self.options = options
        self._step_cache = {}
        self._upload(mesh)

    def _upload(self, mesh) -> None:
        self.mesh = mesh
        self.positions = jnp.asarray(mesh.positions)
        self.normals = jnp.asarray(mesh.normals)
        self.uvs = jnp.asarray(mesh.uvs)
        self.tri = jnp.asarray(mesh.indices.astype(np.int32)).reshape(-1, 3)
        self.num_triangles = int(self.tri.shape[0])
        self._step_cache.clear()

    def resize(self, width: int, height: int) -> None:
        """Reference CustomRenderer::resize rebuilds all buffers
        (renderer.rs:159-170); here the per-size compiled step is rebuilt
        lazily on next render."""
        self.width = int(width)
        self.height = int(height)
        self._step_cache.clear()

    # -- per-frame step -------------------------------------------------------

    @staticmethod
    def pack_uniforms(uniforms: FrameUniforms) -> np.ndarray:
        """Flatten all per-frame uniforms into ONE f32 buffer so each frame
        costs a single host->device transfer (the reference makes three
        queue.write_buffer calls per frame, scene.rs:156-186; over a remote
        TPU tunnel every transfer has fixed latency, so one beats six)."""
        L = uniforms.light_world_pos.shape[0]
        return np.concatenate(
            [
                np.asarray(uniforms.view_position, np.float32).ravel(),
                np.asarray(uniforms.view_proj, np.float32).ravel(),
                np.asarray(uniforms.effect, np.float32).ravel(),
                np.asarray(uniforms.light_world_pos, np.float32).ravel(),
                np.asarray(uniforms.light_color, np.float32).ravel(),
                np.asarray(uniforms.light_intensity, np.float32).ravel(),
            ]
        ).astype(np.float32), L

    def _get_step(self, num_lights: int):
        """Compiled per-frame step with geometry baked in as constants."""
        key = (num_lights, self.width, self.height)
        step = self._step_cache.get(key)
        if step is not None:
            return step

        L = num_lights
        positions, normals, uvs, tri = (
            self.positions, self.normals, self.uvs, self.tri,
        )
        width, height, options = self.width, self.height, self.options
        backend = self.backend

        @jax.jit
        def step(packed):
            vpos = packed[0:4]
            vp = packed[4:20].reshape(4, 4)
            eff = packed[20:26]
            o = 26
            lwp = packed[o:o + 3 * L].reshape(L, 3)
            lc = packed[o + 3 * L:o + 6 * L].reshape(L, 3)
            li = packed[o + 6 * L:o + 7 * L]
            return backend.render_frame(
                positions, normals, uvs, tri, vp, vpos, lwp, lc, li, eff,
                width=width, height=height, **options,
            )

        self._step_cache[key] = step
        return step

    def render_device(self, uniforms: FrameUniforms):
        """Render and return the device-resident (H,W,4) u8 framebuffer
        (plus the depth-key buffer). No host transfer of the image."""
        packed, L = self.pack_uniforms(uniforms)
        return self._get_step(L)(jnp.asarray(packed))

    def _get_batch_step(self, num_lights: int):
        """Compiled K-frame step: lax.scan over a stack of packed uniforms
        inside ONE XLA program. Amortizes per-dispatch latency (a remote TPU
        adds fixed cost per execute call) — the offline/animation path."""
        key = ("batch", num_lights, self.width, self.height)
        step = self._step_cache.get(key)
        if step is not None:
            return step
        frame = self._get_step(num_lights)

        @jax.jit
        def batch(packed_stack):
            def body(_, packed):
                out = frame(packed)
                return None, out[0]  # rgba only

            _, frames = jax.lax.scan(body, None, packed_stack)
            return frames

        self._step_cache[key] = batch
        return batch

    def render_batch_device(self, uniforms_seq):
        """Render a sequence of frames in one dispatch; returns the
        device-resident (K,H,W,4) u8 stack."""
        packs = []
        L = None
        for u in uniforms_seq:
            p, L = self.pack_uniforms(u)
            packs.append(p)
        stack = jnp.asarray(np.stack(packs))
        return self._get_batch_step(L)(stack)

    def render(self, uniforms: FrameUniforms) -> np.ndarray:
        """Render one frame to a host (H,W,4) uint8 RGBA array — the
        'present' step (reference present_pass collapses to a device_get,
        SURVEY.md D7)."""
        rgba = self.render_device(uniforms)[0]
        return np.asarray(jax.device_get(rgba))

    def render_blocked(self, uniforms: FrameUniforms):
        """Render and block until the device finishes, returning the device
        framebuffer. Used by the benchmark harness to measure true per-frame
        latency (the reference's custom path never fences — BASELINE.md
        documents why we do)."""
        rgba = self.render_device(uniforms)[0]
        return jax.block_until_ready(rgba)
