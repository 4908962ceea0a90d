"""Multi-chip scaling via jax.sharding + shard_map.

The reference is single-GPU (SURVEY.md §2.4: no distributed anything); its
scaling axes are kernel-grid decompositions. The natural multi-chip mapping
is framebuffer-tile sharding — each chip owns a horizontal stripe of tile
rows (the raster analog of sequence parallelism over pixels): geometry is
replicated (vertex transform is tiny), binning and raster run per-stripe
with zero halo (tiles are independent), and only the final framebuffer
gather crosses chips over ICI.
"""

from compute_renderer_tpu.parallel.sharding import (  # noqa: F401
    make_mesh,
    render_frame_sharded,
)
