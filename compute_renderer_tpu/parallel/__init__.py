"""Multi-chip scaling via jax.sharding + shard_map.

The reference is single-GPU (SURVEY.md §2.4: no distributed anything); the
rebuild provides three decompositions over a device mesh:

- **framebuffer stripes** (``sharding.render_frame_sharded``): each chip
  owns a stripe of tile rows (the raster analog of sequence parallelism
  over pixels); zero-halo raster, one ICI gather — shortens per-frame
  latency;
- **sort-middle** (``path="sortmiddle"``): triangle-parallel front end
  (setup/expansion/sort/coefficient table all O(T/n) per chip), one
  all_to_all (cell, tri) pair exchange + one table all_gather riding ICI,
  screen-parallel back end;
- **frame parallelism** (``frames.render_frames_sharded``): the frame
  axis sharded, geometry replicated, zero hot-loop communication — linear
  THROUGHPUT scaling for animation/benchmark workloads.
"""

from compute_renderer_tpu.parallel.frames import (  # noqa: F401
    render_frames,
    render_frames_sharded,
)
from compute_renderer_tpu.parallel.sharding import (  # noqa: F401
    make_mesh,
    render_frame_sharded,
)
