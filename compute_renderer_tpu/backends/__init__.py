"""Render backends.

- ``xla``: brute-force pure-XLA rasterizer (every triangle against every
  pixel, chunked). Slow but simple and runs everywhere — it plays the role
  the wgpu hardware pipeline plays in the reference (the known-good
  comparison baseline, reference src/wgpu_pipeline/).
- ``tpu``: the real engine — sort/segment triangle-to-tile binning plus a
  fused Pallas raster kernel tiled over the framebuffer grid (the reference's
  four WGSL compute passes, re-architected for TPU).

Both share the vertex/setup/shade stages in ``common.py`` and produce
bit-identical (per platform) framebuffers; they differ only in how the
per-pixel depth resolve is computed.
"""

BACKENDS = ("xla", "tpu")


def get_backend(name: str):
    if name == "xla":
        from compute_renderer_tpu.backends import xla

        return xla
    if name == "tpu":
        from compute_renderer_tpu.backends import tpu

        return tpu
    raise ValueError(f"Unknown backend '{name}'. Available: {BACKENDS}")
