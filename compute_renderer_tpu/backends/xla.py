"""Brute-force pure-XLA rasterizer backend.

Plays the role of the reference's wgpu hardware pipeline
(src/wgpu_pipeline/renderer.rs + shaders.wgsl): the simple, known-good
baseline both for pixel-parity testing against the real engine and as the
benchmark comparator. Unlike the reference's baseline (which has no effects
support and uses hardware depth), this one implements the FULL custom-
pipeline semantics — effects, bitcast-u32 depth ordering, tile-rectangle
raster regions — so it is pixel-comparable with the golden oracle and the
Pallas TPU backend.

Algorithm: chunked scan over triangles; each chunk tests CHUNK triangles
against every pixel, carrying per-pixel (depth_key, triangle_index). The
carry is (H,W); peak memory is CHUNK x H x W per intermediate. Attributes
are resolved once at the end for the winning triangle per pixel.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from compute_renderer_tpu.backends import common
from compute_renderer_tpu.backends.common import DEPTH_CLEAR_BITS, F32, NO_TRI


def _pad_tris(n: int, chunk: int) -> int:
    return ((n + chunk - 1) // chunk) * chunk


@partial(
    jax.jit,
    static_argnames=("width", "height", "tile_h", "tile_w", "chunk"),
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
    tile_h: int = 8,
    tile_w: int = 8,
    chunk: int = 8,
):
    """Render one frame; returns ((H, W, 4) uint8 RGBA, depth_key (H,W) u32)."""
    if tri.shape[0] == 0:
        return common.empty_frame(width, height)
    world, screen = common.vertex_stage(positions, view_proj, effect, width, height)
    setup = common.triangle_setup(screen, tri, effect, width, height, tile_h, tile_w)
    px, py = common.pixel_grid(effect, width, height)
    threshold, melt_threshold = common.coverage_thresholds(effect)

    # Unwarped integer coords for the covered-tile-rectangle restriction.
    xi = jax.lax.broadcasted_iota(jnp.int32, (height, width), 1)
    yi = jax.lax.broadcasted_iota(jnp.int32, (height, width), 0)

    T = tri.shape[0]
    Tpad = _pad_tris(max(T, 1), chunk)

    def pad_i32(a, fill=0):
        return jnp.concatenate(
            [a.astype(jnp.int32), jnp.full((Tpad - T,), fill, jnp.int32)]
        )

    tri_pad = jnp.concatenate(
        [tri.astype(jnp.int32), jnp.zeros((Tpad - T, 3), jnp.int32)], axis=0
    )
    alive_pad = jnp.concatenate(
        [setup["alive"], jnp.zeros((Tpad - T,), bool)]
    )
    x0_pad = pad_i32(setup["px_x0"])
    x1_pad = pad_i32(setup["px_x1"])
    y0_pad = pad_i32(setup["px_y0"])
    y1_pad = pad_i32(setup["px_y1"])

    def body(c, carry):
        best_key, best_tri = carry
        s = c * chunk
        idx = jax.lax.dynamic_slice(tri_pad, (s, 0), (chunk, 3))  # (C,3)
        v1 = screen[idx[:, 0]]  # (C,4)
        v2 = screen[idx[:, 1]]
        v3 = screen[idx[:, 2]]

        # Same affine coefficient form + evaluation order as the Pallas
        # kernel (pallas_raster.build_tri_table / _raster_kernel), so the
        # two backends agree bitwise.
        co = common.barycentric_coefficients(
            v1[:, 0], v1[:, 1], v2[:, 0], v2[:, 1], v3[:, 0], v3[:, 1]
        )
        za, zb, zc = common.affine_combine(co, v1[:, 2], v2[:, 2], v3[:, 2])

        bcast = lambda a: a[:, None, None]
        dx = px[None] - bcast(co["ax"])
        dy = py[None] - bcast(co["ay"])
        bc1 = bcast(co["a1"]) + bcast(co["b1"]) * dx + bcast(co["c1"]) * dy
        bc2 = bcast(co["a2"]) + bcast(co["b2"]) * dx + bcast(co["c2"]) * dy
        bc3 = bcast(co["a3"]) + bcast(co["b3"]) * dx + bcast(co["c3"]) * dy

        mask = (bc1 >= threshold) & (bc2 >= threshold) & (bc3 >= threshold)
        min_bc = jnp.minimum(bc1, jnp.minimum(bc2, bc3))
        mask &= min_bc >= melt_threshold
        z = bcast(za) + bcast(zb) * dx + bcast(zc) * dy
        mask &= jnp.isfinite(z)  # (C,H,W)

        sl = lambda a: jax.lax.dynamic_slice(a, (s,), (chunk,))[:, None, None]
        mask &= (xi[None] >= sl(x0_pad)) & (xi[None] < sl(x1_pad))
        mask &= (yi[None] >= sl(y0_pad)) & (yi[None] < sl(y1_pad))
        mask &= jax.lax.dynamic_slice(alive_pad, (s,), (chunk,))[:, None, None]

        key = jnp.where(mask, common.depth_key(z), DEPTH_CLEAR_BITS)
        chunk_best = key.min(axis=0)
        chunk_arg = key.argmin(axis=0).astype(jnp.int32)

        # Strict <: earlier chunks (lower triangle indices) win depth ties,
        # matching the deterministic in-order contract.
        win = chunk_best < best_key
        best_key = jnp.where(win, chunk_best, best_key)
        best_tri = jnp.where(win, s + chunk_arg, best_tri)
        return best_key, best_tri

    init = (
        jnp.full((height, width), DEPTH_CLEAR_BITS, jnp.uint32),
        jnp.full((height, width), NO_TRI, jnp.int32),
    )
    best_key, best_tri = jax.lax.fori_loop(0, Tpad // chunk, body, init)

    gbuffer = common.resolve_attributes(
        best_tri, tri.astype(jnp.int32), screen, world, normals.astype(F32),
        uvs.astype(F32), effect, width, height,
    )
    rgba = common.shade(
        gbuffer, view_position, light_world_pos.astype(F32),
        light_color.astype(F32), light_intensity.astype(F32),
    )
    return rgba, best_key


def render(mesh, camera_uniform, lights, effect, width, height,
           tile_h: int = 8, tile_w: int = 8, chunk: int = 8):
    """Convenience host-level entry: numpy/dataclass in, numpy RGBA out."""
    light_world_pos, light_color, light_intensity = lights
    rgba, _ = render_frame(
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
        width=width,
        height=height,
        tile_h=tile_h,
        tile_w=tile_w,
        chunk=chunk,
    )
    return np.asarray(rgba)
