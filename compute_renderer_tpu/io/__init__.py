"""Asset IO: OBJ/MTL loading, asset path resolution, procedural test meshes.

Mirrors the reference's model layer (src/model.rs, src/util.rs). A native C++
fast-path parser (``compute_renderer_tpu.io.native``) handles large models;
``obj.py`` is the always-available pure-Python implementation with identical
output.
"""

from compute_renderer_tpu.io.obj import load_obj  # noqa: F401
from compute_renderer_tpu.io.assets import get_asset_path  # noqa: F401
from compute_renderer_tpu.io.model import Model  # noqa: F401
