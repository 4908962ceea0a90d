"""Golden-oracle NumPy rasterizer used as the ground truth for all backends.

The reference has no tests (SURVEY.md §4); its only oracle was visual A/B
against the wgpu hardware pipeline. This package is our substitute: a small,
direct NumPy emulation of the reference's custom-pipeline semantics
(binning.wgsl / rasteriser.wgsl / fragment.wgsl), against which both the XLA
brute-force backend and the Pallas TPU backend are pixel-compared.
"""

from compute_renderer_tpu.golden.rasterizer import render_golden  # noqa: F401
