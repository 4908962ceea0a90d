"""compute_renderer_tpu — a TPU-native 3D software-rendering engine.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
``miguelklemmsilva/compute-renderer`` (a Rust + wgpu compute-shader rasterizer):

- four-stage pipeline: vertex processing (with animated wave / edge-melt /
  mirage / voxelize effects), triangle-to-tile binning, edge-function
  rasterisation with barycentric interpolation and deterministic depth
  resolve, and per-pixel Phong fragment shading;
- two backends: ``xla`` (brute-force every-triangle-times-every-pixel, the
  parity/benchmark baseline — the role the wgpu hardware pipeline plays in
  the reference) and ``tpu`` (sort/segment binning + a fused Pallas raster
  kernel tiled over the framebuffer grid);
- the reference's API shape (SceneConfig, camera modes, OBJ models, effect
  parameters, CLI flags, multi-scene FPS benchmark harness) as jit-stepped
  pytrees.

Reference layer map: see SURVEY.md at the repo root.
"""

__version__ = "0.1.0"

from compute_renderer_tpu.engine.scene import Scene, SceneConfig, CameraConfig  # noqa: F401
from compute_renderer_tpu.engine.renderer import Renderer  # noqa: F401
