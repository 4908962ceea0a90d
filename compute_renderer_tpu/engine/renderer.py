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
        self._upload(mesh)

    def _upload(self, mesh) -> None:
        self.mesh = mesh
        self.positions = jnp.asarray(mesh.positions)
        self.normals = jnp.asarray(mesh.normals)
        self.uvs = jnp.asarray(mesh.uvs)
        self.tri = jnp.asarray(mesh.indices.astype(np.int32)).reshape(-1, 3)
        self.num_triangles = int(self.tri.shape[0])

    def resize(self, width: int, height: int) -> None:
        self.width = int(width)
        self.height = int(height)

    def render_device(self, uniforms: FrameUniforms):
        """Render and return the device-resident (H,W,4) u8 framebuffer
        (plus the depth-key buffer). No host transfer."""
        return self.backend.render_frame(
            self.positions,
            self.normals,
            self.uvs,
            self.tri,
            jnp.asarray(uniforms.view_proj),
            jnp.asarray(uniforms.view_position),
            jnp.asarray(uniforms.light_world_pos),
            jnp.asarray(uniforms.light_color),
            jnp.asarray(uniforms.light_intensity),
            jnp.asarray(uniforms.effect),
            width=self.width,
            height=self.height,
            **self.options,
        )

    def render(self, uniforms: FrameUniforms) -> np.ndarray:
        """Render one frame to a host (H,W,4) uint8 RGBA array — the
        'present' step (reference present_pass collapses to a device_get,
        SURVEY.md D7)."""
        rgba, _ = self.render_device(uniforms)
        return np.asarray(jax.device_get(rgba))

    def render_blocked(self, uniforms: FrameUniforms):
        """Render and block until the device finishes, returning the device
        framebuffer. Used by the benchmark harness to measure true per-frame
        latency (the reference's custom path never fences — BASELINE.md
        documents why we do)."""
        rgba, _ = self.render_device(uniforms)
        return jax.block_until_ready(rgba)
