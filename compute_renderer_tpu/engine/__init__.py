"""Engine: scene/domain model + per-frame update + jitted render step."""

from compute_renderer_tpu.engine.scene import (  # noqa: F401
    CameraConfig,
    FrameUniforms,
    Scene,
    SceneConfig,
)
from compute_renderer_tpu.engine.renderer import Renderer  # noqa: F401
