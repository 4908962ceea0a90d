"""Fused Pallas TPU raster + shade kernel: per-framebuffer-tile depth
resolve, attribute interpolation, and deferred Phong lighting in one pass.

TPU-native replacement for ``raster_main`` + ``fragment_main``
(rasteriser.wgsl:192-243, fragment.wgsl:50-93). The reference runs one
64-thread workgroup per 8x8 tile with a workgroup-atomic CAS depth loop it
itself documents as racy (rasteriser.wgsl:166-185), then a separate
pixel-parallel lighting pass over a fragment G-buffer. Here:

- the grid is the framebuffer tile grid (default 16 x 256, adaptively
  8 x 128 for subpixel-triangle scenes — VPU-register-shaped, vs the
  reference's 8 x 8 GPU workgroup tiles);
- each grid step stages its tile's binned triangle list HBM -> SMEM (SMEM
  supports the dynamic scalar indexing the bin walk needs): the dense
  layout DMAs one 8-row block per 8 tiles, the flat layout double-buffers
  a prefetched window per tile;
- the list walk has a dynamic trip count; per triangle, all tile pixels
  evaluate as vector ops using precomputed affine (A + B*px + C*py)
  coefficients for barycentrics (1/uz folded in), depth, and the six
  attribute channels — two FMAs per quantity;
- the depth resolve is a running depth-key min carried in registers —
  deterministic (first triangle in bin order wins ties), no atomics;
- the epilogue shades the tile in place (ambient + per-light diffuse +
  Phong specular, gamma, blue background) and writes byte-packed RGBA;
  empty tiles short-circuit to constant background.

Fusing shading here removes the XLA per-pixel gather pass that dominated
frame time (~21 ms of a 22 ms frame at 1024x768 on v5e).

The coefficient table lives whole in VMEM ((T, 32) f32 = 128 B/tri; ~98k
triangles per chunk in a 16 MB VMEM — larger scenes render in chunks,
backends/tpu.py); the bin lists stay in HBM and stream per-tile.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from compute_renderer_tpu.core.effects import EFFECT_MIRAGE

F32 = jnp.float32
# numpy scalar (not a jnp array): jnp constants would be captured as consts
# by the pallas kernel closure, which pallas_call rejects.
DEPTH_CLEAR_BITS = np.uint32(0xFFFFFFFF)

# tri_table row layout (32 lanes) — anchored affine (A, B, C) coefficient
# triples, each quantity evaluated per pixel as A + B*dx + C*dy with
# (dx, dy) = sample position minus the triangle's vertex-1 anchor (exact
# constant term; see common.barycentric_coefficients):
#   0:3    bc1    3:6  bc2    6:9  bc3   (1/uz folded in)
#   9:12   depth z
#   12:30  6 attribute channels [nx, ny, nz, wx, wy, wz]
#   30:32  anchor (v1x, v1y)
# UV interpolation is intentionally omitted: the reference writes uv to its
# fragment buffer but the lighting formula never reads it (fragment.wgsl:70-82).
# Material extension: a (T, 35) table appends the per-triangle diffuse
#   32:35  kd (r, g, b)
# and switches the kernel epilogue to the modulated formula (static shape
# dispatch in raster_shade_tiles; the 32-wide default path is untouched).
# Fused-texture extension (round 4): a (T, 44) table appends
#   32:38  uv affine coefficient triples (u then v)
#   38:41  kd (r, g, b)
#   41:44  TextureInfo {off, tw, th} as exact f32 ints (util.rs:75-85)
# and switches the kernel to the texf epilogue: instead of shading, it
# emits the common.TEXF G-buffer (uv, kd, tex row, per-light diff/spec)
# so the only remaining XLA-tail gather is the texel-pool fetch itself
# (common.fused_texture_tail). Replaces the round-3 deferred tail whose
# per-pixel resolve gathers dominated textured frames (67 ms vs 4.1 ms
# plain at 36k tris, suite_round3b).
TRI_TABLE_WIDTH = 32
MAT_TRI_TABLE_WIDTH = 35
TEX_TRI_TABLE_WIDTH = 44
# Mip-filtered (trilinear/anisotropic) fused texturing appends the (T, 5)
# common.mip_tri_rows block [tid, lod, mu, mv, spread] in place of the
# TextureInfo row (the mip tail derives per-level {off, w, h} from the i32
# mip table instead) — see common.TEXF_MIP_BASE_CHANNELS for the G-buffer.
TEX_MIP_TRI_TABLE_WIDTH = 46


def build_tri_table(screen, tri, uvs, normals, world, face_kd=None,
                    tex_rows=None):
    """(T, 32) f32 per-triangle affine-coefficient table — (T, 35) with the
    material extension's kd columns when ``face_kd`` (T, 3) is given, or
    (T, 44) with the fused-texture columns when ``tex_rows`` is given
    (``uvs`` is only read in that form — shading never reads uv,
    fragment.wgsl:70-82)."""
    uv = uvs.astype(F32)[tri] if tex_rows is not None else None
    return build_tri_table_corners(screen[tri], normals[tri], world[tri],
                                   face_kd=face_kd, uv=uv,
                                   tex_rows=tex_rows)


def build_tri_table_corners(v, nrm, wld, face_kd=None, uv=None,
                            tex_rows=None):
    """``build_tri_table`` on pre-gathered corner data: v (T, 3, 4) screen
    vertices, nrm/wld (T, 3, 3), optional uv (T, 3, 2). The mega path holds
    geometry corner-major so the table build is gather-free streaming math
    (three T-row gathers cost more than everything else in the front-end at
    ~1M triangles)."""
    screen_soa = tuple(tuple(v[:, k, c] for c in range(4)) for k in range(3))
    nrm_soa = tuple(tuple(nrm[:, k, c] for c in range(3)) for k in range(3))
    wld_soa = tuple(tuple(wld[:, k, c] for c in range(3)) for k in range(3))
    uv_soa = (tuple(tuple(uv[:, k, c] for c in range(2)) for k in range(3))
              if uv is not None else None)
    return build_tri_table_soa(screen_soa, nrm_soa, wld_soa, face_kd=face_kd,
                               uv_soa=uv_soa, tex_rows=tex_rows)


def tri_table_columns(screen_soa, nrm_soa, wld_soa, face_kd=None,
                      uv_soa=None, tex_rows=None):
    """The 32 per-triangle affine-coefficient columns as a list of
    contiguous (T,) arrays (corner-SoA inputs — see
    ``common.vertex_stage_soa``). Layout = ``TRI_TABLE_WIDTH`` order; with
    ``face_kd`` (T, 3), the 3 kd columns append (MAT_TRI_TABLE_WIDTH).

    Fused-texture form (``uv_soa`` (3 corners, 2, T) + ``tex_rows`` (T, 3)
    from common.tex_rows_f32, together): uv affine triples + kd (ones when
    ``face_kd`` is None) + TextureInfo columns append
    (TEX_TRI_TABLE_WIDTH)."""
    from compute_renderer_tpu.backends import common

    v1, v2, v3 = screen_soa
    co = common.barycentric_coefficients(
        v1[0], v1[1], v2[0], v2[1], v3[0], v3[1]
    )

    cols = [co["a1"], co["b1"], co["c1"],
            co["a2"], co["b2"], co["c2"],
            co["a3"], co["b3"], co["c3"]]
    cols += list(common.affine_combine(co, v1[2], v2[2], v3[2]))

    for src in (nrm_soa, wld_soa):
        for ch in range(3):
            cols += list(
                common.affine_combine(co, src[0][ch], src[1][ch],
                                      src[2][ch])
            )

    cols += [co["ax"], co["ay"]]
    assert len(cols) == TRI_TABLE_WIDTH
    if tex_rows is not None:
        assert uv_soa is not None, "texf table needs uv corner data"
        for ch in range(2):
            cols += list(
                common.affine_combine(co, uv_soa[0][ch], uv_soa[1][ch],
                                      uv_soa[2][ch])
            )
        if face_kd is not None:
            kd = face_kd.astype(F32)
            cols += [kd[:, 0], kd[:, 1], kd[:, 2]]
        else:
            ones = jnp.ones_like(cols[0])
            cols += [ones, ones, ones]
        # TextureInfo block: (T, 3) {off, tw, th} rows (TEXF), or the
        # (T, 5) mip constants [tid, lod, mu, mv, spread] (TEXF_MIP).
        tr = tex_rows.astype(F32)
        cols += [tr[:, c] for c in range(tr.shape[1])]
        assert len(cols) in (TEX_TRI_TABLE_WIDTH, TEX_MIP_TRI_TABLE_WIDTH)
    elif face_kd is not None:
        kd = face_kd.astype(F32)
        cols += [kd[:, 0], kd[:, 1], kd[:, 2]]
        assert len(cols) == MAT_TRI_TABLE_WIDTH
    return cols


def build_tri_table_soa(screen_soa, nrm_soa, wld_soa, face_kd=None,
                        uv_soa=None, tex_rows=None):
    """``build_tri_table`` on corner-SoA inputs: all coefficient math runs
    on contiguous rows; the only layout change is the final (T, 32) stack,
    one interleave instead of the strided reads everywhere that the
    (T, 3, c) form paid."""
    return jnp.stack(
        tri_table_columns(screen_soa, nrm_soa, wld_soa, face_kd=face_kd,
                          uv_soa=uv_soa, tex_rows=tex_rows),
        axis=1,
    )


def window_elems(tile_cap: int) -> int:
    """SMEM superwindow size for a tile's pair-list segment: tile_cap
    rounded up to the 1024-element HBM tile, plus one tile of slack for the
    unaligned start."""
    return (tile_cap + 1023) // 1024 * 1024 + 1024


def _pow32(s):
    """s**32 via 5 squarings — deterministic and transcendental-free,
    matching backends/common.py shade()."""
    s2 = s * s
    s4 = s2 * s2
    s8 = s4 * s4
    s16 = s8 * s8
    return s16 * s16


def _raster_kernel(
    # SMEM inputs (full, unblocked)
    params_ref,  # (2, 8) f32: row0 = [threshold, melt_threshold, mirage,
    #              amplitude, frequency, phase, time, y_offset]
    #              row1 = [eye.x, eye.y, eye.z, num_lights, pad...]
    lights_ref,  # (L, 8) f32: [px, py, pz, cr, cg, cb, intensity, pad]
    start_ref,  # (num_tiles,) i32 per-tile segment offsets into pair list
    count_ref,  # (num_tiles,) i32 per-tile triangle counts
    # VMEM / HBM inputs (full, unblocked)
    tri_table_ref,  # (T, 32) f32 affine-coefficient table (VMEM)
    pair_tri_ref,  # flat: (padded pairs,) i32 | dense: (rows8, C) i32 (HBM)
    # outputs (blocked per tile)
    rgba_ref,  # (TH, TW) u32 byte-packed RGBA
    key_ref,  # (TH, TW) u32 depth keys
    # scratch: dense -> (block_smem, sem); flat -> (buf_a, buf_b, sem_a, sem_b)
    *scratch,
    tile_h: int,
    tile_w: int,
    num_lights: int,
    dense_rows: bool,
    has_materials: bool = False,
    vis: bool = False,
    texf: bool = False,
):
    ti = pl.program_id(0)  # tile row
    tj = pl.program_id(1)  # tile col
    num_tiles = pl.num_programs(0) * pl.num_programs(1)
    tile_id = ti * pl.num_programs(1) + tj

    count = count_ref[tile_id]

    # -- triangle-list staging (overlapped across grid steps) ----------------
    if dense_rows:
        # Dense (rows, C) layout: one synchronous DMA per 8-row block (i32
        # HBM tiling is (8, 128)); the block scratch persists across the
        # next 7 grid steps.
        idx_smem, dma_sem = scratch
        j0 = pl.multiple_of((tile_id // 8) * 8, 8)
        row_in_block = tile_id - j0

        @pl.when(row_in_block == 0)
        def _():
            cp = pltpu.make_async_copy(
                pair_tri_ref.at[pl.ds(j0, 8), :], idx_smem, dma_sem
            )
            cp.start()
            cp.wait()

        def wait_list():
            pass

        read_slot = lambda k: idx_smem[row_in_block, k]
    else:
        # Flat sorted-pair-list layout: double-buffered prefetch. Step i
        # issues tile i+1's window into the alternate buffer and waits on
        # its own only when it has work, hiding one DMA latency per tile.
        # Two separate scratch buffers (not a (2, W) array): Mosaic can't
        # take a dynamic-row SMEM slice as a DMA target.
        idx_a, idx_b, sem_a, sem_b = scratch
        W = idx_a.shape[0]
        slot = tile_id % 2

        def issue(tid, buf, sem):
            seg_start = start_ref[tid]
            # 1-D i32 HBM tiling is 1024 elements: offset and size must be
            # 1024-aligned; index with the residual at read time.
            aligned = pl.multiple_of((seg_start // 1024) * 1024, 1024)
            pltpu.make_async_copy(
                pair_tri_ref.at[pl.ds(aligned, W)], buf, sem
            ).start()

        @pl.when((tile_id == 0) & (count > 0))
        def _():
            issue(0, idx_a, sem_a)

        nxt = jnp.minimum(tile_id + 1, num_tiles - 1)
        do_prefetch = (tile_id + 1 < num_tiles) & (count_ref[nxt] > 0)

        @pl.when(do_prefetch & (slot == 1))  # next slot is 0
        def _():
            issue(nxt, idx_a, sem_a)

        @pl.when(do_prefetch & (slot == 0))  # next slot is 1
        def _():
            issue(nxt, idx_b, sem_b)

        def wait_list():
            @pl.when(slot == 0)
            def _():
                pltpu.make_async_copy(
                    pair_tri_ref.at[pl.ds(0, W)], idx_a, sem_a
                ).wait()

            @pl.when(slot == 1)
            def _():
                pltpu.make_async_copy(
                    pair_tri_ref.at[pl.ds(0, W)], idx_b, sem_b
                ).wait()

        seg_offset = start_ref[tile_id] - (start_ref[tile_id] // 1024) * 1024

        def read_slot(k):
            i = seg_offset + k
            return jnp.where(slot == 0, idx_a[i], idx_b[i])

    # Empty tiles (most of the screen for typical scenes) take the constant
    # fast path: background color (no-winner id in vis mode), cleared depth.
    # No wait, no shading.
    @pl.when(count == 0)
    def _():
        if vis:
            rgba_ref[:, :] = jnp.full((tile_h, tile_w), -1, jnp.int32)
        elif texf:
            # Background pixels never read the G-buffer (the tail masks on
            # the cleared depth key); zero-fill keeps the math NaN-free.
            rgba_ref[:, :, :] = jnp.zeros(rgba_ref.shape, F32)
        else:
            rgba_ref[:, :] = jnp.full(
                (tile_h, tile_w), 0xFFFF0000, jnp.uint32  # blue, alpha 1
            )
        key_ref[:, :] = jnp.full((tile_h, tile_w), DEPTH_CLEAR_BITS, jnp.uint32)

    @pl.when(count > 0)
    def _():
        _raster_tile(
            params_ref, lights_ref, tri_table_ref,
            rgba_ref, key_ref,
            wait_list, read_slot, ti, tj, count,
            tile_h=tile_h, tile_w=tile_w, num_lights=num_lights,
            has_materials=has_materials, vis=vis, texf=texf,
        )


def _emit_texf_gbuffer(gbuf_ref, key_ref, lights_ref, best_key, attrs,
                       eye_x, eye_y, eye_z, *, num_lights: int):
    """Shared texf epilogue (tile and micro kernels): write the
    common.TEXF (or TEXF_MIP) G-buffer channels. ``attrs`` = the walk's
    winner channels [nx, ny, nz, wx, wy, wz, u, v, kd.r, kd.g, kd.b, then
    the TextureInfo row (off, tw, th) or the mip constants (tid, lod, mu,
    mv, spread) — the count picks the layout]; ``gbuf_ref`` the (C, th,
    tw) output block. diff/spec use the same op chain as the shading
    epilogues (bitwise contract with common.shade)."""
    nx, ny, nz = attrs[0], attrs[1], attrs[2]
    wx, wy, wz = attrs[3], attrs[4], attrs[5]
    ntex = len(attrs) - 11  # 3 (TEXF) or 5 (TEXF_MIP)

    gbuf_ref[0, :, :] = attrs[6]  # u
    gbuf_ref[1, :, :] = attrs[7]  # v
    for c in range(3):
        gbuf_ref[2 + c, :, :] = attrs[8 + c]  # kd
    for c in range(ntex):
        gbuf_ref[5 + c, :, :] = attrs[11 + c]  # TextureInfo / mip consts

    vdx = eye_x - wx
    vdy = eye_y - wy
    vdz = eye_z - wz
    vnorm = jnp.sqrt(vdx * vdx + vdy * vdy + vdz * vdz)
    vdx = vdx / vnorm
    vdy = vdy / vnorm
    vdz = vdz / vnorm

    for li in range(num_lights):
        lpx = lights_ref[li, 0]
        lpy = lights_ref[li, 1]
        lpz = lights_ref[li, 2]

        ldx = lpx - wx
        ldy = lpy - wy
        ldz = lpz - wz
        lnorm = jnp.sqrt(ldx * ldx + ldy * ldy + ldz * ldz)
        ldx = ldx / lnorm
        ldy = ldy / lnorm
        ldz = ldz / lnorm

        d = nx * ldx + ny * ldy + nz * ldz
        diff = jnp.where(d > F32(0.0), d, F32(0.0))

        edotn = -(ldx * nx + ldy * ny + ldz * nz)
        rdx = -ldx - F32(2.0) * edotn * nx
        rdy = -ldy - F32(2.0) * edotn * ny
        rdz = -ldz - F32(2.0) * edotn * nz
        s = vdx * rdx + vdy * rdy + vdz * rdz
        s = jnp.where(s > F32(0.0), s, F32(0.0))
        spec = _pow32(s)

        gbuf_ref[5 + ntex + 2 * li, :, :] = diff
        gbuf_ref[6 + ntex + 2 * li, :, :] = spec

    key_ref[:, :] = best_key


def _raster_tile(
    params_ref, lights_ref, tri_table_ref,
    rgba_ref, key_ref,
    wait_list, read_slot, ti, tj, count,
    *, tile_h: int, tile_w: int, num_lights: int,
    has_materials: bool = False,
    vis: bool = False,
    texf: bool = False,
):
    threshold = params_ref[0, 0]
    melt_threshold = params_ref[0, 1]
    # (bc1>=t)&(bc2>=t)&(bc3>=t)&(min_bc>=melt) == min_bc >= max(t, melt):
    # identical for all inputs incl. NaN bcs (minimum propagates the NaN,
    # which then fails the >=) — and it drops ~6 vector ops from every
    # iteration of the per-triangle walk, the kernel's innermost loop.
    cov_min = jnp.maximum(threshold, melt_threshold)
    mirage = params_ref[0, 2]
    amplitude = params_ref[0, 3]
    frequency = params_ref[0, 4]
    phase = params_ref[0, 5]
    time = params_ref[0, 6]

    y0 = (ti * tile_h).astype(F32) + params_ref[0, 7]
    x0 = (tj * tile_w).astype(F32)
    # iota must be integer-typed on TPU; cast to f32 after.
    ys = jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 0).astype(F32) + y0
    xs = jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 1).astype(F32) + x0

    # Mirage sample warp (rasteriser.wgsl:112-118), branchless.
    off_x = amplitude * jnp.sin(frequency * xs + time + phase)
    off_y = amplitude * jnp.cos(frequency * ys + time + phase)
    px = jnp.where(mirage > 0.5, xs + off_x, xs)
    py = jnp.where(mirage > 0.5, ys + off_y, ys)

    wait_list()

    zero = jnp.zeros((tile_h, tile_w), F32)

    if vis:
        # Visibility-only walk (the deferred-texturing front half): carry
        # the winner's triangle id instead of interpolated attributes —
        # attribute resolve, atlas sampling, and shading run as a plain-XLA
        # tail over the (tri, key) output (backends/tpu.py).
        def body_vis(k, carry):
            best_key, best_t = carry
            t = read_slot(k)
            row = tri_table_ref[t, :]
            dx = px - row[30]
            dy = py - row[31]
            bc1 = row[0] + row[1] * dx + row[2] * dy
            bc2 = row[3] + row[4] * dx + row[5] * dy
            bc3 = row[6] + row[7] * dx + row[8] * dy
            min_bc = jnp.minimum(bc1, jnp.minimum(bc2, bc3))
            mask = min_bc >= cov_min
            z = row[9] + row[10] * dx + row[11] * dy
            mask &= jnp.isfinite(z)
            key = jnp.where(mask, pltpu.bitcast(z, jnp.uint32),
                            DEPTH_CLEAR_BITS)
            win = key < best_key
            return (jnp.where(win, key, best_key),
                    jnp.where(win, t, best_t))

        init = (
            jnp.full((tile_h, tile_w), DEPTH_CLEAR_BITS, jnp.uint32),
            jnp.full((tile_h, tile_w), -1, jnp.int32),
        )
        best_key, best_t = jax.lax.fori_loop(0, count, body_vis, init)
        rgba_ref[:, :] = best_t
        key_ref[:, :] = best_key
        return

    def body(k, carry):
        best_key, attrs = carry
        t = read_slot(k)
        row = tri_table_ref[t, :]  # (32,) anchored affine coefficients

        # Anchored affine evaluation: q = A + B*dx + C*dy (1/uz pre-folded).
        dx = px - row[30]
        dy = py - row[31]
        bc1 = row[0] + row[1] * dx + row[2] * dy
        bc2 = row[3] + row[4] * dx + row[5] * dy
        bc3 = row[6] + row[7] * dx + row[8] * dy

        min_bc = jnp.minimum(bc1, jnp.minimum(bc2, bc3))
        mask = min_bc >= cov_min

        z = row[9] + row[10] * dx + row[11] * dy
        mask &= jnp.isfinite(z)

        key = jnp.where(mask, pltpu.bitcast(z, jnp.uint32), DEPTH_CLEAR_BITS)
        # Strict <: earlier bin entries (lower triangle ids) win ties.
        win = key < best_key
        best_key = jnp.where(win, key, best_key)

        # Select the winner's interpolated attributes in-register (replaces
        # the reference's fragment_buffer writes, rasteriser.wgsl:173-179).
        new_attrs = []
        for c in range(6):
            interp = row[12 + c * 3] + row[13 + c * 3] * dx + row[14 + c * 3] * dy
            new_attrs.append(jnp.where(win, interp, attrs[c]))
        if has_materials:
            # Material extension: the winner's per-triangle diffuse (a
            # scalar table read broadcast over the tile, not interpolated).
            for c in range(3):
                new_attrs.append(jnp.where(win, row[32 + c], attrs[6 + c]))
        elif texf:
            # Fused-texture extension: interpolated uv (affine rows 32:38,
            # same formula resolve_attributes evaluates) + the winner's kd
            # and TextureInfo (rows 38:44) — or kd and mip (rows 38:46,
            # TEXF_MIP) — constants, count static from the table width.
            for c in range(2):
                interp = (row[32 + c * 3] + row[33 + c * 3] * dx
                          + row[34 + c * 3] * dy)
                new_attrs.append(jnp.where(win, interp, attrs[6 + c]))
            for c in range(tri_table_ref.shape[-1] - 38):
                new_attrs.append(jnp.where(win, row[38 + c], attrs[8 + c]))
        return best_key, tuple(new_attrs)

    nattr = (8 + tri_table_ref.shape[-1] - 38 if texf
             else (9 if has_materials else 6))
    init = (
        jnp.full((tile_h, tile_w), DEPTH_CLEAR_BITS, jnp.uint32),
        tuple(zero for _ in range(nattr)),
    )
    best_key, attrs = jax.lax.fori_loop(0, count, body, init)

    # -- shading epilogue (fragment.wgsl:50-93) ------------------------------
    # attrs: [nx, ny, nz, wx, wy, wz]
    nx, ny, nz = attrs[0], attrs[1], attrs[2]
    wx, wy, wz = attrs[3], attrs[4], attrs[5]

    eye_x = params_ref[1, 0]
    eye_y = params_ref[1, 1]
    eye_z = params_ref[1, 2]

    if texf:
        # Fused-texture epilogue: emit the common.TEXF G-buffer instead of
        # shading — uv/kd/TextureInfo from the walk, per-light diff/spec
        # with the IDENTICAL op chain the shading epilogue below uses, so
        # the XLA tail (common.fused_texture_tail) reproduces the deferred
        # image bitwise with only the texel fetch left as a gather.
        _emit_texf_gbuffer(
            rgba_ref, key_ref, lights_ref, best_key, attrs,
            eye_x, eye_y, eye_z, num_lights=num_lights,
        )
        return

    if has_materials:
        # Material epilogue: ambient + diffuse modulated by the winner's
        # kd; specular unmodulated (same op order as common.shade).
        kdr, kdg, kdb = attrs[6], attrs[7], attrs[8]
        r = F32(0.1) * kdr
        g = F32(0.1) * kdg
        b = F32(0.1) * kdb
    else:
        r = jnp.full((tile_h, tile_w), F32(0.1))
        g = jnp.full((tile_h, tile_w), F32(0.1))
        b = jnp.full((tile_h, tile_w), F32(0.1))

    vdx = eye_x - wx
    vdy = eye_y - wy
    vdz = eye_z - wz
    vnorm = jnp.sqrt(vdx * vdx + vdy * vdy + vdz * vdz)
    vdx = vdx / vnorm
    vdy = vdy / vnorm
    vdz = vdz / vnorm

    for li in range(num_lights):
        lpx = lights_ref[li, 0]
        lpy = lights_ref[li, 1]
        lpz = lights_ref[li, 2]
        lcr = lights_ref[li, 3]
        lcg = lights_ref[li, 4]
        lcb = lights_ref[li, 5]
        inten = lights_ref[li, 6]

        ldx = lpx - wx
        ldy = lpy - wy
        ldz = lpz - wz
        lnorm = jnp.sqrt(ldx * ldx + ldy * ldy + ldz * ldz)
        ldx = ldx / lnorm
        ldy = ldy / lnorm
        ldz = ldz / lnorm

        d = nx * ldx + ny * ldy + nz * ldz
        diff = jnp.where(d > F32(0.0), d, F32(0.0))

        # reflect(-l, n) = -l - 2*dot(-l, n)*n (WGSL reflect)
        edotn = -(ldx * nx + ldy * ny + ldz * nz)
        rdx = -ldx - F32(2.0) * edotn * nx
        rdy = -ldy - F32(2.0) * edotn * ny
        rdz = -ldz - F32(2.0) * edotn * nz
        s = vdx * rdx + vdy * rdy + vdz * rdz
        s = jnp.where(s > F32(0.0), s, F32(0.0))
        spec = _pow32(s)

        if has_materials:
            spec_half = spec * F32(0.5)
            r = r + (diff * kdr + spec_half) * lcr * inten
            g = g + (diff * kdg + spec_half) * lcg * inten
            b = b + (diff * kdb + spec_half) * lcb * inten
        else:
            contrib = diff + spec * F32(0.5)
            r = r + contrib * lcr * inten
            g = g + contrib * lcg * inten
            b = b + contrib * lcb * inten

    flag = best_key != DEPTH_CLEAR_BITS
    gamma = F32(1.0 / 2.2)
    r = jnp.power(jnp.clip(r, F32(0.0), F32(1.0)), gamma)
    g = jnp.power(jnp.clip(g, F32(0.0), F32(1.0)), gamma)
    b = jnp.power(jnp.clip(b, F32(0.0), F32(1.0)), gamma)

    # f32 -> i32 -> u32: Mosaic has no direct f32->u32 cast; values are 0..255.
    ri = jnp.round(r * F32(255.0)).astype(jnp.int32).astype(jnp.uint32)
    gi = jnp.round(g * F32(255.0)).astype(jnp.int32).astype(jnp.uint32)
    bi = jnp.round(b * F32(255.0)).astype(jnp.int32).astype(jnp.uint32)
    shaded = ri | (gi << 8) | (bi << 16) | jnp.uint32(0xFF000000)
    background = jnp.uint32(0xFFFF0000)  # blue, alpha 1 (fragment.wgsl:58-62)

    rgba_ref[:, :] = jnp.where(flag, shaded, background)
    key_ref[:, :] = best_key


def _raster_kernel_wl(
    # scalar-prefetch
    wl_ref,  # (num_tiles,) i32 ascending occupied-tile ids (first k valid)
    # SMEM inputs (full)
    params_ref,
    lights_ref,
    start_ref,
    count_ref,
    # VMEM / HBM inputs (full)
    tri_table_ref,
    pair_tri_ref,
    rgba_clear_ref,  # aliased into rgba_ref; never read
    key_clear_ref,  # aliased into key_ref; never read
    # outputs (blocked per *visited* tile)
    rgba_ref,
    key_ref,
    # scratch
    *scratch,
    tile_h: int,
    tile_w: int,
    ntx: int,
    num_lights: int,
    dense_rows: bool,
    has_materials: bool = False,
    vis: bool = False,
    texf: bool = False,
):
    """Work-list variant of ``_raster_kernel``: the grid is the (dynamic)
    number of OCCUPIED tiles; step i renders tile ``wl[i]``. Empty tiles —
    most of the screen for typical scenes — never become grid steps: their
    pixels come from the pre-cleared framebuffer aliased into the outputs.
    The reference dispatches every tile and early-outs per thread
    (raster_pass.rs:139-142); here the hardware never sees them at all."""
    del rgba_clear_ref, key_clear_ref
    i = pl.program_id(0)
    n = pl.num_programs(0)
    tile_id = wl_ref[i]
    ti = tile_id // ntx
    tj = tile_id - ti * ntx
    count = count_ref[tile_id]  # > 0 by construction

    if dense_rows:
        # Ascending work list preserves the 8-row block reuse: re-DMA only
        # when this step's block differs from the previous step's.
        idx_smem, dma_sem = scratch
        j0 = pl.multiple_of((tile_id // 8) * 8, 8)
        prev_block = wl_ref[jnp.maximum(i - 1, 0)] // 8

        @pl.when((i == 0) | (prev_block != tile_id // 8))
        def _():
            cp = pltpu.make_async_copy(
                pair_tri_ref.at[pl.ds(j0, 8), :], idx_smem, dma_sem
            )
            cp.start()
            cp.wait()

        def wait_list():
            pass

        row_in_block = tile_id - j0
        read_slot = lambda k: idx_smem[row_in_block, k]
    else:
        idx_a, idx_b, sem_a, sem_b = scratch
        W = idx_a.shape[0]
        slot = i % 2

        def issue(tid, buf, sem):
            seg_start = start_ref[tid]
            aligned = pl.multiple_of((seg_start // 1024) * 1024, 1024)
            pltpu.make_async_copy(
                pair_tri_ref.at[pl.ds(aligned, W)], buf, sem
            ).start()

        @pl.when(i == 0)
        def _():
            issue(tile_id, idx_a, sem_a)

        nxt = wl_ref[jnp.minimum(i + 1, n - 1)]

        @pl.when((i + 1 < n) & (slot == 1))  # next slot is 0
        def _():
            issue(nxt, idx_a, sem_a)

        @pl.when((i + 1 < n) & (slot == 0))  # next slot is 1
        def _():
            issue(nxt, idx_b, sem_b)

        def wait_list():
            @pl.when(slot == 0)
            def _():
                pltpu.make_async_copy(
                    pair_tri_ref.at[pl.ds(0, W)], idx_a, sem_a
                ).wait()

            @pl.when(slot == 1)
            def _():
                pltpu.make_async_copy(
                    pair_tri_ref.at[pl.ds(0, W)], idx_b, sem_b
                ).wait()

        seg_offset = start_ref[tile_id] - (start_ref[tile_id] // 1024) * 1024

        def read_slot(k):
            idx = seg_offset + k
            return jnp.where(slot == 0, idx_a[idx], idx_b[idx])

    _raster_tile(
        params_ref, lights_ref, tri_table_ref,
        rgba_ref, key_ref,
        wait_list, read_slot, ti, tj, count,
        tile_h=tile_h, tile_w=tile_w, num_lights=num_lights,
        has_materials=has_materials, vis=vis, texf=texf,
    )


def occupied_worklist(seg_count):
    """(ascending occupied-tile ids padded with 0, occupied count). The
    compaction is a cumsum + scatter — O(num_tiles) streaming work."""
    i32 = jnp.int32
    num_tiles = seg_count.shape[0]
    occ = seg_count > 0
    incl = jnp.cumsum(occ.astype(i32))
    k = incl[-1] if num_tiles > 0 else jnp.int32(0)
    pos = jnp.where(occ, incl - 1, num_tiles)  # out of range -> dropped
    wl = jnp.zeros((num_tiles,), i32).at[pos].set(
        jnp.arange(num_tiles, dtype=i32), mode="drop"
    )
    return wl, k


@functools.partial(
    jax.jit,
    static_argnames=("height_padded", "width_padded", "tile_h", "tile_w",
                     "tile_cap", "layout", "interpret", "worklist", "vis",
                     "texf"),
)
def raster_shade_tiles(
    tri_table,  # (T, 32) f32
    pair_tri,  # (pair_cap + C,) i32 tile-sorted triangle ids
    seg_start,  # (num_tiles,) i32
    seg_count,  # (num_tiles,) i32
    effect,  # (6,) f32
    view_position,  # (4,) f32
    light_world_pos,  # (L, 3) f32
    light_color,  # (L, 3) f32
    light_intensity,  # (L,) f32
    *,
    height_padded: int,
    width_padded: int,
    tile_h: int,
    tile_w: int,
    tile_cap: int,
    layout: str = "flat",
    interpret: bool = False,
    worklist: bool = False,
    vis: bool = False,
    texf: bool = False,
    y_offset=0,
):
    """Run the fused raster+shade kernel over the padded framebuffer.

    ``y_offset`` (traced scalar ok) is the global pixel row of this window —
    nonzero when rendering one stripe of a sharded framebuffer.

    ``worklist=True`` uses the occupied-tile work-list kernel: the Pallas
    grid is the dynamic count of non-empty tiles and empty-tile pixels come
    from a pre-cleared framebuffer aliased into the outputs (bitwise the
    same image; see ``_raster_kernel_wl``).

    Returns (rgba_packed (Hp,Wp) u32, best_key (Hp,Wp) u32).

    ``vis=True`` runs the visibility-only walk (deferred texturing): the
    first output is the winning triangle id (Hp,Wp) i32 (-1 = background)
    instead of shaded RGBA; attribute resolve + atlas sample + shading run
    as a plain-XLA tail over it (backends/tpu.py).

    ``texf=True`` (fused texturing, round 4 — requires a
    TEX_TRI_TABLE_WIDTH table): the first output is the (C,Hp,Wp) f32
    common.TEXF G-buffer; the tail (common.fused_texture_tail) is one
    texel fetch + elementwise math. Mutually exclusive with ``vis``."""
    nty = height_padded // tile_h
    ntx = width_padded // tile_w

    from compute_renderer_tpu.backends import common

    if texf and vis:
        raise ValueError("texf and vis are mutually exclusive")
    if texf and tri_table.shape[1] not in (TEX_TRI_TABLE_WIDTH,
                                           TEX_MIP_TRI_TABLE_WIDTH):
        raise ValueError(
            f"texf needs a {TEX_TRI_TABLE_WIDTH}- or "
            f"{TEX_MIP_TRI_TABLE_WIDTH}-wide table, got "
            f"{tri_table.shape[1]}"
        )

    threshold, melt_threshold = common.coverage_thresholds(effect)
    mirage_flag = jnp.where(effect[0] == EFFECT_MIRAGE, F32(1.0), F32(0.0))

    num_lights = int(light_world_pos.shape[0])
    params = jnp.stack(
        [
            threshold, melt_threshold, mirage_flag, effect[1], effect[2],
            effect[3], effect[5], jnp.asarray(y_offset, F32),
            view_position[0], view_position[1], view_position[2],
            F32(num_lights), F32(0.0), F32(0.0), F32(0.0), F32(0.0),
        ]
    ).reshape(2, 8)
    lights = jnp.concatenate(
        [
            light_world_pos.astype(F32),
            light_color.astype(F32),
            light_intensity.astype(F32)[:, None],
            jnp.zeros((num_lights, 1), F32),
        ],
        axis=1,
    )  # (L, 8)

    grid = (nty, ntx)
    dense_rows = layout == "dense"
    # Static shape dispatch: a 35-wide table carries the material
    # extension's kd columns and selects the modulated epilogue (the
    # 44-wide texf table is dispatched explicitly, not by shape).
    has_materials = (not texf) and tri_table.shape[1] > TRI_TABLE_WIDTH
    kernel = functools.partial(
        _raster_kernel, tile_h=tile_h, tile_w=tile_w, num_lights=num_lights,
        dense_rows=dense_rows, has_materials=has_materials, vis=vis,
        texf=texf,
    )
    out0_dtype = jnp.int32 if vis else (F32 if texf else jnp.uint32)
    C = (common.texf_mip_channels(num_lights)
         if texf and tri_table.shape[1] == TEX_MIP_TRI_TABLE_WIDTH
         else common.texf_channels(num_lights))
    if texf:
        out0_shape = (C, height_padded, width_padded)
        out0_block = (C, tile_h, tile_w)
        out0_index = lambda i, j: (0, i, j)
        out0_index_wl = lambda i, wl: (0, wl[i] // ntx, wl[i] % ntx)
    else:
        out0_shape = (height_padded, width_padded)
        out0_block = (tile_h, tile_w)
        out0_index = lambda i, j: (i, j)
        out0_index_wl = lambda i, wl: (wl[i] // ntx, wl[i] % ntx)
    if dense_rows:
        scratch_shapes = [
            pltpu.SMEM((8, pair_tri.shape[1]), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ]
    else:
        W = window_elems(tile_cap)
        scratch_shapes = [
            pltpu.SMEM((W,), jnp.int32),
            pltpu.SMEM((W,), jnp.int32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ]

    if worklist:
        wl, k = occupied_worklist(seg_count.astype(jnp.int32))
        wl_kernel = functools.partial(
            _raster_kernel_wl, tile_h=tile_h, tile_w=tile_w, ntx=ntx,
            num_lights=num_lights, dense_rows=dense_rows,
            has_materials=has_materials, vis=vis, texf=texf,
        )
        if vis:
            rgba_clear = jnp.full((height_padded, width_padded), -1,
                                  jnp.int32)
        elif texf:
            rgba_clear = jnp.zeros(out0_shape, F32)
        else:
            rgba_clear = jnp.full((height_padded, width_padded),
                                  0xFFFF0000, jnp.uint32)
        key_clear = jnp.full((height_padded, width_padded), DEPTH_CLEAR_BITS,
                             jnp.uint32)
        hbm = pl.ANY if interpret else pltpu.HBM
        rgba, best_key = pl.pallas_call(
            wl_kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(k,),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.SMEM),  # params
                    pl.BlockSpec(memory_space=pltpu.SMEM),  # lights
                    pl.BlockSpec(memory_space=pltpu.SMEM),  # starts
                    pl.BlockSpec(memory_space=pltpu.SMEM),  # counts
                    pl.BlockSpec(memory_space=pltpu.VMEM),  # tri table
                    pl.BlockSpec(memory_space=hbm),  # pair list
                    pl.BlockSpec(memory_space=pl.ANY),  # aliased rgba clear
                    pl.BlockSpec(memory_space=pl.ANY),  # aliased key clear
                ],
                out_specs=[
                    pl.BlockSpec(
                        out0_block, out0_index_wl,
                        memory_space=pltpu.VMEM,
                    ),
                    pl.BlockSpec(
                        (tile_h, tile_w),
                        lambda i, wl: (wl[i] // ntx, wl[i] % ntx),
                        memory_space=pltpu.VMEM,
                    ),
                ],
                scratch_shapes=scratch_shapes,
            ),
            out_shape=[
                jax.ShapeDtypeStruct(out0_shape, out0_dtype),
                jax.ShapeDtypeStruct((height_padded, width_padded),
                                     jnp.uint32),
            ],
            # Operand indices include the scalar-prefetch arg (0).
            input_output_aliases={7: 0, 8: 1},
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
            ),
            interpret=interpret,
        )(wl, params, lights, seg_start.astype(jnp.int32),
          seg_count.astype(jnp.int32), tri_table, pair_tri,
          rgba_clear, key_clear)
        return rgba, best_key

    rgba, best_key = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # params, full
            pl.BlockSpec(memory_space=pltpu.SMEM),  # lights, full
            pl.BlockSpec(memory_space=pltpu.SMEM),  # per-tile starts, full
            pl.BlockSpec(memory_space=pltpu.SMEM),  # per-tile counts, full
            pl.BlockSpec(memory_space=pltpu.VMEM),  # full tri table
            # Explicit HBM (not ANY): a small pair list would otherwise be
            # promoted to VMEM, where the dynamic-offset DMA slice violates
            # the (8, 128) tiling.
            pl.BlockSpec(memory_space=pl.ANY if interpret else pltpu.HBM),
        ],
        out_specs=[
            pl.BlockSpec(out0_block, out0_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_h, tile_w), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(out0_shape, out0_dtype),
            jax.ShapeDtypeStruct((height_padded, width_padded), jnp.uint32),
        ],
        scratch_shapes=scratch_shapes,
        # "arbitrary" (sequential) — the kernel depends on grid order: flat
        # layout prefetches tile i+1's list during tile i, and the dense
        # 8-row SMEM block is loaded once per block and reused for the next
        # 7 steps. "parallel" could split the grid across Megacore
        # TensorCores and break both.
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(params, lights, seg_start.astype(jnp.int32),
      seg_count.astype(jnp.int32), tri_table, pair_tri)
    return rgba, best_key


def unpack_rgba(packed):
    """(H,W) u32 byte-packed -> (H,W,4) u8 RGBA (little-endian lanes)."""
    return jax.lax.bitcast_convert_type(packed, jnp.uint8)
