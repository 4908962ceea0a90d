"""Render backends.

- ``xla``: brute-force pure-XLA rasterizer (every triangle against every
  pixel, chunked). Slow but simple and runs everywhere — it plays the role
  the wgpu hardware pipeline plays in the reference (the known-good
  comparison baseline, reference src/wgpu_pipeline/).
- ``tpu``: the real engine — sort/segment triangle-to-tile binning plus a
  fused Pallas raster kernel tiled over the framebuffer grid (the reference's
  four WGSL compute passes, re-architected for TPU).
- ``wgpu-faithful``: software model of the reference's wgpu HARDWARE
  pipeline (sRGB surface, float depth Less, pixel-center top-left-rule
  sampling, perspective-correct interpolation, CCW cull, no effects) —
  restores the reference's custom-vs-hardware A/B, which the ``wgpu``
  backend name deliberately does NOT (it maps to the custom-semantics xla
  comparator; PARITY.md H13).

``xla`` and ``tpu`` share the vertex/setup/shade stages in ``common.py``
and produce bit-identical (per platform) framebuffers; they differ only in
how the per-pixel depth resolve is computed. ``wgpu-faithful`` is
intentionally different-looking, like the reference's own two pipelines.
"""

BACKENDS = ("xla", "tpu", "wgpu-faithful")


def get_backend(name: str):
    if name == "xla":
        from compute_renderer_tpu.backends import xla

        return xla
    if name == "tpu":
        from compute_renderer_tpu.backends import tpu

        return tpu
    if name == "wgpu-faithful":
        from compute_renderer_tpu.backends import wgpu_faithful

        return wgpu_faithful
    raise ValueError(f"Unknown backend '{name}'. Available: {BACKENDS}")
