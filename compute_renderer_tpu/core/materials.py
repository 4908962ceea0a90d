"""Material / texture surface (future API, mirrors reference H14).

The reference defines ``MaterialInfo`` (ambient/specular/diffuse/shininess/
dissolve/optical_density) and atlas-style ``TextureInfo{offset,width,height}``
structs with defaults but never binds them to any pipeline
(custom_pipeline/util.rs:35-85) — materials from MTL files are loaded and
discarded (model.rs:24). We keep the same documented-but-unwired surface:
these dataclasses define the layout a texture/material stage would consume
(an (N, H, W) texture atlas as a jnp array + per-triangle material indices),
but no kernel reads them yet, matching reference behavior.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from compute_renderer_tpu.core.maths import F32


@dataclass
class MaterialInfo:
    ambient: np.ndarray = field(
        default_factory=lambda: np.array([0.1, 0.1, 0.1], dtype=F32)
    )
    specular: np.ndarray = field(
        default_factory=lambda: np.array([0.5, 0.5, 0.5], dtype=F32)
    )
    diffuse: np.ndarray = field(
        default_factory=lambda: np.array([0.8, 0.8, 0.8], dtype=F32)
    )
    shininess: float = 32.0
    dissolve: float = 1.0
    optical_density: float = 1.0


@dataclass
class TextureInfo:
    """Atlas-style texture record: offset into a flat texel pool + extent."""

    offset: int = 0
    width: int = 0
    height: int = 0
