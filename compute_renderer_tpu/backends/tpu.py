"""The TPU engine: sort/segment binning + fused Pallas raster kernel.

This is the rebuild of the reference's custom pipeline
(src/custom_pipeline/): the four WGSL passes become

  vertex+setup (XLA, batched)      <- binning.wgsl count_triangles' geometry
  bin_triangles (XLA sort/segment) <- count/scan/store kernels (D1-D4)
  raster_tiles (Pallas)            <- rasteriser.wgsl raster_main (D5)
  resolve + shade (XLA, fused)     <- fragment.wgsl fragment_main (D6)

The framebuffer is padded to the tile grid (default 8 x 128, the VPU
register shape) and cropped after the kernel. On non-TPU platforms the
Pallas kernel runs in interpret mode so tests/CI work anywhere.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from compute_renderer_tpu.backends import binning, common, pallas_raster
from compute_renderer_tpu.backends.common import F32


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


@partial(
    jax.jit,
    static_argnames=("width", "height", "tile_h", "tile_w", "pair_cap",
                     "tile_cap", "interpret"),
)
def render_frame(
    positions,
    normals,
    uvs,
    tri,  # (T, 3) int32
    view_proj,
    view_position,
    light_world_pos,
    light_color,
    light_intensity,
    effect,
    *,
    width: int,
    height: int,
    tile_h: int = 16,
    tile_w: int = 256,
    pair_cap: int = 0,  # 0 -> heuristic
    tile_cap: int = 0,  # 0 -> heuristic
    interpret: bool | None = None,
):
    """Render one frame; returns ((H,W,4) u8 RGBA, depth_key (H,W) u32,
    overflow () bool)."""
    if tri.shape[0] == 0:
        rgba, key = common.empty_frame(width, height)
        return rgba, key, jnp.asarray(False)

    if interpret is None:
        interpret = _use_interpret()

    T = int(tri.shape[0])
    ntx = (width + tile_w - 1) // tile_w
    nty = (height + tile_h - 1) // tile_h
    if pair_cap == 0:
        pair_cap = binning.default_pair_cap(T, ntx * nty)
    if tile_cap == 0:
        tile_cap = binning.default_tile_cap(T, width, height, tile_h, tile_w)

    # Stage 1: vertex processing (one batched transform; the reference
    # re-transforms shared vertices per triangle-slot, binning.wgsl:216-219).
    world, screen = common.vertex_stage(positions, view_proj, effect, width, height)

    # Stage 2: triangle setup + binning.
    setup = common.triangle_setup(screen, tri, effect, width, height, tile_h, tile_w)
    bins = binning.bin_triangles(setup, ntx, nty, pair_cap, tile_cap)

    # Stage 3+4: fused Pallas raster + attribute interpolation + shading
    # over the padded tile grid.
    tri_table = pallas_raster.build_tri_table(
        screen, tri, uvs.astype(F32), normals.astype(F32), world
    )
    pair_data = bins["bin_rows"] if bins["layout"] == "dense" else bins["pair_tri"]
    rgba_packed, best_key_p, _ = pallas_raster.raster_shade_tiles(
        tri_table,
        pair_data,
        bins["seg_start"],
        bins["seg_count"],
        effect,
        view_position.astype(F32),
        light_world_pos.astype(F32),
        light_color.astype(F32),
        light_intensity.astype(F32),
        height_padded=nty * tile_h,
        width_padded=ntx * tile_w,
        tile_h=tile_h,
        tile_w=tile_w,
        tile_cap=tile_cap,
        layout=bins["layout"],
        interpret=interpret,
    )
    rgba = pallas_raster.unpack_rgba(rgba_packed)[:height, :width]
    best_key = best_key_p[:height, :width]
    return rgba, best_key, bins["overflow"]


def render(mesh, camera_uniform, lights, effect, width, height,
           tile_h: int = 16, tile_w: int = 256, pair_cap: int = 0,
           tile_cap: int = 0, max_retries: int = 3):
    """Host-level entry with automatic capacity retry: if the binning
    capacities overflow (detected, unlike the reference's silent OOB), double
    them and re-render."""
    light_world_pos, light_color, light_intensity = lights
    T = max(mesh.indices.shape[0] // 3, 1)
    ntx = (width + tile_w - 1) // tile_w
    nty = (height + tile_h - 1) // tile_h
    pc = pair_cap or binning.default_pair_cap(T, ntx * nty)
    tc = tile_cap or binning.default_tile_cap(T, width, height, tile_h, tile_w)

    args = (
        jnp.asarray(mesh.positions),
        jnp.asarray(mesh.normals),
        jnp.asarray(mesh.uvs),
        jnp.asarray(mesh.indices.astype(np.int32)).reshape(-1, 3),
        jnp.asarray(camera_uniform.view_proj),
        jnp.asarray(camera_uniform.view_position),
        jnp.asarray(light_world_pos),
        jnp.asarray(light_color),
        jnp.asarray(light_intensity),
        jnp.asarray(effect),
    )
    for _ in range(max_retries):
        rgba, _, overflow = render_frame(
            *args, width=width, height=height, tile_h=tile_h, tile_w=tile_w,
            pair_cap=pc, tile_cap=tc,
        )
        if not bool(overflow):
            return np.asarray(rgba)
        pc *= 2
        tc *= 2
    raise RuntimeError(
        f"binning capacity overflow after {max_retries} retries "
        f"(pair_cap={pc}, tile_cap={tc})"
    )
