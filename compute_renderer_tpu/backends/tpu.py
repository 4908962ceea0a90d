"""The TPU engine: sort/segment binning + fused Pallas raster kernel.

This is the rebuild of the reference's custom pipeline
(src/custom_pipeline/): the four WGSL passes become

  vertex+setup (XLA, batched)       <- binning.wgsl count_triangles' geometry
  bin_triangles (XLA, dense or sort)<- count/scan/store kernels (D1-D4)
  raster_shade_tiles (Pallas, fused)<- raster_main (D5) + fragment_main (D6)

The framebuffer is padded to the tile grid (16 x 256 by default, chosen
adaptively) and cropped after the kernel; scenes beyond the VMEM triangle-
table budget render in chunks merged by depth key. On non-TPU platforms the
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


# VMEM budget for the resident triangle table (v5e has ~16 MiB VMEM; leave
# room for tile blocks and scratch).
MAX_TRI_TABLE_BYTES = 12 * 2**20

# Per-tile triangle-list cap ceiling: bounds the kernel's SMEM window
# (~4 B/entry). Overflow past it is detected and retried with doubled caps.
MAX_TILE_CAP = 8192


def choose_tile(num_triangles: int, width: int, height: int) -> tuple:
    """Adaptive framebuffer tile shape.

    Every binned triangle costs one full-tile vector pass, so scenes of
    subpixel triangles want the smallest (VPU-register-shaped) tile, while
    low-density scenes want big tiles to amortize per-tile overhead
    (measured sweep in BASELINE.md)."""
    avg_area = (width * height) / max(num_triangles, 1)
    # Measured sweep (BASELINE.md): 16x256 wins down to ~19 px/tri scenes;
    # only truly subpixel geometry (~1M tris at 1024x768) gains from the
    # smaller tile's 4x lower per-pair vector cost.
    if avg_area < 4.0:
        return 8, 128
    return 16, 256


@partial(
    jax.jit,
    static_argnames=("width", "height", "tile_h", "tile_w", "pair_cap",
                     "tile_cap", "interpret", "tri_chunk"),
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
    tile_h: int = 0,  # 0 -> adaptive (choose_tile)
    tile_w: int = 0,
    pair_cap: int = 0,  # 0 -> heuristic
    tile_cap: int = 0,  # 0 -> heuristic
    interpret: bool | None = None,
    tri_chunk: int = 0,  # 0 -> VMEM-budget heuristic
):
    """Render one frame; returns ((H,W,4) u8 RGBA, depth_key (H,W) u32,
    overflow (2,) bool = [pair_overflow, tile_overflow]).

    Scenes whose triangle table exceeds the VMEM budget are rendered in
    triangle chunks: the fused kernel runs once per chunk and the chunk
    framebuffers merge by depth key. Shading commutes with the merge (a
    pixel's shaded color depends only on its depth winner), and the strict
    < merge preserves the global lowest-triangle-index tie-break, so the
    result is bit-identical to a single pass."""
    if tri.shape[0] == 0:
        rgba, key = common.empty_frame(width, height)
        return rgba, key, jnp.zeros((2,), bool)

    if interpret is None:
        interpret = _use_interpret()

    T = int(tri.shape[0])
    if tri_chunk == 0:
        tri_chunk = MAX_TRI_TABLE_BYTES // (pallas_raster.TRI_TABLE_WIDTH * 4)
    if tile_h == 0 or tile_w == 0:
        tile_h, tile_w = choose_tile(T, width, height)

    ntx = (width + tile_w - 1) // tile_w
    nty = (height + tile_h - 1) // tile_h

    # Stage 1: vertex processing (one batched transform; the reference
    # re-transforms shared vertices per triangle-slot, binning.wgsl:216-219).
    world, screen = common.vertex_stage(positions, view_proj, effect, width, height)

    # Stage 2: triangle setup (full scene, once).
    setup = common.triangle_setup(screen, tri, effect, width, height, tile_h, tile_w)

    uvs32 = uvs.astype(F32)
    normals32 = normals.astype(F32)
    num_chunks = (T + tri_chunk - 1) // tri_chunk

    rgba_packed = best_key_p = overflow = None
    for c in range(num_chunks):
        c0 = c * tri_chunk
        c1 = min(c0 + tri_chunk, T)
        Tc = c1 - c0
        chunk_setup = {k: v[c0:c1] for k, v in setup.items()}
        pc = pair_cap or binning.default_pair_cap(Tc, ntx * nty)
        # Per-tile capacity from FULL-scene density: a chunk's triangles are
        # spatially clustered (mesh index order is spatial), so the chunk's
        # average density badly underestimates its local maxima. Bounded so
        # the kernel's SMEM list window stays small.
        tc = tile_cap or min(
            binning.default_tile_cap(T, width, height, tile_h, tile_w),
            MAX_TILE_CAP,
        )
        bins = binning.bin_triangles(chunk_setup, ntx, nty, pc, tc)

        # Stage 3+4: fused Pallas raster + attribute interpolation +
        # shading over the padded tile grid (chunk-local triangle ids).
        tri_table = pallas_raster.build_tri_table(
            screen, tri[c0:c1], uvs32, normals32, world
        )
        pair_data = (
            bins["bin_rows"] if bins["layout"] == "dense" else bins["pair_tri"]
        )
        rgba_c, key_c = pallas_raster.raster_shade_tiles(
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
            tile_cap=tc,
            layout=bins["layout"],
            interpret=interpret,
        )
        chunk_flags = jnp.stack([bins["pair_overflow"], bins["tile_overflow"]])
        if rgba_packed is None:
            rgba_packed, best_key_p, overflow = rgba_c, key_c, chunk_flags
        else:
            win = key_c < best_key_p
            rgba_packed = jnp.where(win, rgba_c, rgba_packed)
            best_key_p = jnp.where(win, key_c, best_key_p)
            overflow = overflow | chunk_flags

    rgba = pallas_raster.unpack_rgba(rgba_packed)[:height, :width]
    best_key = best_key_p[:height, :width]
    return rgba, best_key, overflow


def render(mesh, camera_uniform, lights, effect, width, height,
           tile_h: int = 0, tile_w: int = 0, pair_cap: int = 0,
           tile_cap: int = 0, max_retries: int = 3):
    """Host-level entry with automatic capacity retry: if the binning
    capacities overflow (detected, unlike the reference's silent OOB), double
    them and re-render."""
    light_world_pos, light_color, light_intensity = lights
    T = max(mesh.indices.shape[0] // 3, 1)
    if tile_h == 0 or tile_w == 0:
        tile_h, tile_w = choose_tile(T, width, height)
    ntx = (width + tile_w - 1) // tile_w
    nty = (height + tile_h - 1) // tile_h
    pc = pair_cap or binning.default_pair_cap(T, ntx * nty)
    tc = tile_cap or min(
        binning.default_tile_cap(T, width, height, tile_h, tile_w),
        MAX_TILE_CAP,
    )

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
        flags = np.asarray(overflow)
        if not flags.any():
            return np.asarray(rgba)
        if flags[0]:
            pc *= 2
        if flags[1]:
            if tc >= MAX_TILE_CAP:
                # The SMEM triangle-list window is bounded; growing past it
                # would fail Mosaic compilation obscurely. Fail clearly.
                raise RuntimeError(
                    f"per-tile triangle list overflow at the MAX_TILE_CAP="
                    f"{MAX_TILE_CAP} ceiling (scene too dense for tile "
                    f"{tile_h}x{tile_w}; try a smaller tile size)"
                )
            tc = min(tc * 2, MAX_TILE_CAP)
    raise RuntimeError(
        f"binning capacity overflow after {max_retries} retries "
        f"(pair_cap={pc}, tile_cap={tc})"
    )
