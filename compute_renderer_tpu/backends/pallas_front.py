"""Fused Pallas front end for the mega-scene (micro) path.

Replaces the XLA chain vertex_stage_soa -> triangle_setup_soa ->
tri_table_columns (backends/common.py:117-268, pallas_raster.py:89-119)
with ONE streaming pass over triangle blocks. The XLA form is ~150 small
O(T) elementwise ops that XLA:TPU schedules as dozens of separate
loop nests over (T,) rows — measured ~5 ms (vertex+setup) plus the
table-build share of the coefficient stage at 1M triangles, despite being
pure streaming work (~100 MB of traffic, <0.5 ms at HBM speed-of-light).
Here every op runs on (1, B) vector rows inside one kernel: each block is
read once, all ~150 ops run register-resident, and the outputs stream out.

Arithmetic is copied op-for-op from the XLA form (same order, same
operations — vertex transform with wave displacement binning.wgsl:144-161,
cull/bbox/cell-rect setup binning.wgsl:93-142, anchored-affine barycentric
coefficients shared with every other backend), so outputs are bit-identical
on TPU, where neither XLA:TPU nor Mosaic contracts mul+add into FMA
(XLA:CPU does, unconditionally — CPU comparisons are 1-ULP-tolerant, see
tests/test_front_kernel.py and the PARITY.md note on FMA contraction).

Outputs:
- ``coeff`` (32, Tpad) f32 — the tri-table columns in pallas_raster
  TRI_TABLE_WIDTH order (rows = coefficients, lanes = triangles);
- ``meta`` (4, Tpad) i32 — tile_x0, tile_y0, rect width rx, cover count c
  (exactly the ``cover_counts`` quantities the pair-expansion kernel
  consumes; c = 0 for culled triangles, matching binning.cover_counts).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from compute_renderer_tpu.backends.common import (
    EFFECT_VOXELIZE,
    EFFECT_WAVE,
)

F32 = jnp.float32
I32 = jnp.int32

B = 2048  # triangles per grid step (18 input + 36 output rows -> ~450 KiB)


def _front_kernel(
    scal_ref,  # (24,) f32 SMEM: m row-major (16) + effect (8)
    pos_ref,  # (9, B) f32: corner-major rows x,y,z per corner
    nrm_ref,  # (9, B) f32
    *refs,  # mode extras (uv_ref (6, B), ext_ref (6, B)), then outputs
    width: int,
    height: int,
    tile_h: int,
    tile_w: int,
    mode: str = "base",
):
    # Outputs are the trailing two refs; extras precede them per mode:
    #   base: ()                      -> 32 coeff rows
    #   mat:  (ext_ref,)              -> 35 rows (kd in ext rows 0:3)
    #   texf: (uv_ref, ext_ref)       -> 44 rows (uv affine 32:38,
    #                                    kd 38:41, TextureInfo 41:44)
    uv_ref = ext_ref = None
    if mode == "texf":
        uv_ref, ext_ref, coeff_ref, meta_ref = refs
    elif mode == "mat":
        ext_ref, coeff_ref, meta_ref = refs
    else:
        coeff_ref, meta_ref = refs
    m = [scal_ref[r] for r in range(16)]  # view_proj row-major
    amplitude = scal_ref[17]
    frequency = scal_ref[18]
    phase = scal_ref[19]
    direction = scal_ref[20]
    etype = scal_ref[16]

    # Scalar conditions as f32-splat compares: selecting on a *dynamic*
    # scalar bool materializes an i8 vector that Mosaic cannot truncate to
    # i1 ("Unsupported target bitwidth for truncation"); comparing an f32
    # splat produces the i1 vector natively.
    def splat(v, like):
        return jnp.full_like(like, v)

    # --- vertex stage (common.vertex_stage_soa) --------------------------
    world = []
    screen = []
    for k in range(3):
        x = pos_ref[3 * k : 3 * k + 1, :]
        y = pos_ref[3 * k + 1 : 3 * k + 2, :]
        z = pos_ref[3 * k + 2 : 3 * k + 3, :]
        is_wave = splat(etype, x) == F32(EFFECT_WAVE)
        dirv = splat(direction, x)
        vertical = dirv < F32(0.5)
        horizontal = (dirv >= F32(0.5)) & (dirv < F32(1.5))
        dy = amplitude * jnp.sin(frequency * x + phase)
        dx = amplitude * jnp.sin(frequency * y + phase)
        dist = jnp.sqrt(x * x + y * y)
        dz = amplitude * jnp.sin(frequency * dist + phase)
        wx = jnp.where(is_wave & horizontal, x + dx, x)
        wy = jnp.where(is_wave & vertical, y + dy, y)
        wz = jnp.where(is_wave & ~(vertical | horizontal), z + dz, z)

        clip = [
            (m[4 * r + 0] * wx + m[4 * r + 1] * wy)
            + (m[4 * r + 2] * wz + m[4 * r + 3])
            for r in range(4)
        ]
        cx, cy, cz, cw = clip
        ndc_x = cx / cw
        ndc_y = cy / cw
        world.append((wx, wy, wz))
        screen.append((
            (ndc_x + F32(1.0)) * F32(0.5) * F32(width),
            (F32(1.0) - ndc_y) * F32(0.5) * F32(height),
            cz / cw,
            cw,
        ))

    (v1x, v1y, v1z, v1w) = screen[0]
    (v2x, v2y, v2z, v2w) = screen[1]
    (v3x, v3y, v3z, v3w) = screen[2]

    # --- triangle setup (common.triangle_setup_soa) ----------------------
    w_ok = ~((v1w < F32(0.0)) | (v2w < F32(0.0)) | (v3w < F32(0.0)))

    min_x = jnp.minimum(jnp.minimum(v1x, v2x), v3x)
    max_x = jnp.maximum(jnp.maximum(v1x, v2x), v3x)
    min_y = jnp.minimum(jnp.minimum(v1y, v2y), v3y)
    max_y = jnp.maximum(jnp.maximum(v1y, v2y), v3y)

    on_screen = ~(
        (max_x < F32(0.0)) | (min_x >= F32(width))
        | (max_y < F32(0.0)) | (min_y >= F32(height))
    )

    ax_e = v2x - v1x
    ay_e = v2y - v1y
    bx_e = v3x - v1x
    by_e = v3y - v1y
    cross_z = ax_e * by_e - ay_e * bx_e
    is_voxelize = splat(etype, cross_z) == F32(EFFECT_VOXELIZE)
    facing = is_voxelize | (cross_z < F32(0.0))

    finite = (
        jnp.isfinite(v1x) & jnp.isfinite(v2x) & jnp.isfinite(v3x)
        & jnp.isfinite(v1y) & jnp.isfinite(v2y) & jnp.isfinite(v3y)
    )

    alive = w_ok & on_screen & facing & finite

    cb_min_x = jnp.maximum(min_x, F32(0.0))
    cb_min_y = jnp.maximum(min_y, F32(0.0))
    cb_max_x = jnp.minimum(max_x, F32(width) - F32(1.0))
    cb_max_y = jnp.minimum(max_y, F32(height) - F32(1.0))

    ntx = (width + tile_w - 1) // tile_w
    nty = (height + tile_h - 1) // tile_h

    safe = lambda a: jnp.where(alive, a, F32(0.0))
    tile_x0 = jnp.maximum(
        jnp.floor(safe(cb_min_x) / F32(tile_w)), F32(0.0)
    ).astype(I32)
    tile_y0 = jnp.maximum(
        jnp.floor(safe(cb_min_y) / F32(tile_h)), F32(0.0)
    ).astype(I32)
    tile_x1 = jnp.minimum(
        jnp.ceil(safe(cb_max_x) / F32(tile_w)), F32(ntx)
    ).astype(I32)
    tile_y1 = jnp.minimum(
        jnp.ceil(safe(cb_max_y) / F32(tile_h)), F32(nty)
    ).astype(I32)

    alive = alive & (tile_x1 > tile_x0) & (tile_y1 > tile_y0)
    tile_x1 = jnp.where(alive, tile_x1, tile_x0)
    tile_y1 = jnp.where(alive, tile_y1, tile_y0)

    rx = tile_x1 - tile_x0
    ry = tile_y1 - tile_y0
    c = jnp.where(alive, rx * ry, 0)

    meta_ref[0:1, :] = tile_x0
    meta_ref[1:2, :] = tile_y0
    meta_ref[2:3, :] = rx
    meta_ref[3:4, :] = c

    # --- anchored-affine coefficients (pallas_raster.tri_table_columns) --
    bux = v2y - v1y
    cux = -(v2x - v1x)
    buy = -(v3y - v1y)
    cuy = v3x - v1x
    uz = (v3x - v1x) * (v2y - v1y) - (v2x - v1x) * (v3y - v1y)
    inv = F32(1.0) / uz
    zero = jnp.zeros_like(inv)
    b3, c3 = bux * inv, cux * inv
    b2, c2 = buy * inv, cuy * inv
    a1 = jnp.full_like(inv, F32(1.0)) + zero * inv
    b1 = -(bux + buy) * inv
    c1 = -(cux + cuy) * inv
    a2 = zero * inv
    a3 = zero * inv

    rows = [a1, b1, c1, a2, b2, c2, a3, b3, c3]

    def combine(w1, w2, w3):
        a = w1 * a1 + w2 * a2 + w3 * a3
        b = w1 * b1 + w2 * b2 + w3 * b3
        cc = w1 * c1 + w2 * c2 + w3 * c3
        return [a, b, cc]

    rows += combine(v1z, v2z, v3z)
    for k in range(3):  # normal channels
        rows += combine(
            nrm_ref[0 + k : 1 + k, :],
            nrm_ref[3 + k : 4 + k, :],
            nrm_ref[6 + k : 7 + k, :],
        )
    for k in range(3):  # world channels
        rows += combine(world[0][k], world[1][k], world[2][k])
    rows += [v1x, v1y]  # anchor

    if mode == "texf":
        # uv affine channels (same combine as tri_table_columns' texf form).
        for ch in range(2):
            rows += combine(
                uv_ref[0 + ch : 1 + ch, :],
                uv_ref[2 + ch : 3 + ch, :],
                uv_ref[4 + ch : 5 + ch, :],
            )
        for r in range(6):  # kd rgb + TextureInfo off/tw/th passthrough
            rows += [ext_ref[r : r + 1, :]]
    elif mode == "mat":
        for r in range(3):  # kd rgb passthrough
            rows += [ext_ref[r : r + 1, :]]

    for r, row in enumerate(rows):
        coeff_ref[r : r + 1, :] = row


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "tile_h", "tile_w", "interpret"),
)
def front_end(pos_soa, nrm_soa, view_proj, effect, *, width: int,
              height: int, tile_h: int = 8, tile_w: int = 8,
              interpret: bool = False,
              kd_rows=None, uv_soa=None, tex_rows=None):
    """Fused vertex + setup + coefficient table (see module docstring).

    ``pos_soa``/``nrm_soa``: (3, 3, T). Returns (coeff (R, T) f32,
    meta (4, T) i32 = [tile_x0, tile_y0, rx, c]) where R is 32 (base),
    35 (``kd_rows`` (T, 3): material columns appended), or 44
    (``uv_soa`` (3 corners, 2, T) + ``tex_rows`` (T, 3) + optional
    ``kd_rows``: the fused-texture layout, pallas_raster
    TEX_TRI_TABLE_WIDTH) — same column orders as tri_table_columns."""
    T = pos_soa.shape[2]
    Tpad = (T + B - 1) // B * B

    if tex_rows is not None:
        mode, R = "texf", 44
    elif kd_rows is not None:
        mode, R = "mat", 35
    else:
        mode, R = "base", 32

    def pad_rows(a, rows):
        a = a.astype(F32).reshape(rows, -1)
        if Tpad != T:
            # Pad columns are discarded by the [:, :T] slice below; zeros
            # are fine regardless of what the kernel computes for them.
            a = jnp.concatenate([a, jnp.zeros((rows, Tpad - T), F32)],
                                axis=1)
        return a

    pos_rows = pad_rows(pos_soa, 9)
    nrm_rows = pad_rows(nrm_soa, 9)

    scal = jnp.concatenate([
        view_proj.astype(F32).reshape(16),
        effect.astype(F32).reshape(-1)[:8],
    ])

    inputs = [scal, pos_rows, nrm_rows]
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec((9, B), lambda i: (0, i)),
        pl.BlockSpec((9, B), lambda i: (0, i)),
    ]
    if mode == "texf":
        # uv rows interleaved corner-major: rows (2k + ch) = corner k,
        # channel ch — matching the kernel's uv_ref[2k + ch] reads.
        uv_rows = pad_rows(jnp.asarray(uv_soa), 6)
        kd = (kd_rows.astype(F32).T if kd_rows is not None
              else jnp.ones((3, T), F32))
        ext_rows = pad_rows(
            jnp.concatenate([kd, tex_rows.astype(F32).T], axis=0), 6
        )
        inputs += [uv_rows, ext_rows]
        in_specs += [
            pl.BlockSpec((6, B), lambda i: (0, i)),
            pl.BlockSpec((6, B), lambda i: (0, i)),
        ]
    elif mode == "mat":
        # (6, B) block with zero padding rows: Mosaic block shapes want
        # the same sublane multiple as the texf form; rows 3:6 unused.
        ext_rows = pad_rows(
            jnp.concatenate(
                [kd_rows.astype(F32).T, jnp.zeros((3, T), F32)], axis=0
            ),
            6,
        )
        inputs += [ext_rows]
        in_specs += [pl.BlockSpec((6, B), lambda i: (0, i))]

    coeff, meta = pl.pallas_call(
        functools.partial(
            _front_kernel, width=width, height=height,
            tile_h=tile_h, tile_w=tile_w, mode=mode,
        ),
        grid=(Tpad // B,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((R, B), lambda i: (0, i)),
            pl.BlockSpec((4, B), lambda i: (0, i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((R, Tpad), F32),
            jax.ShapeDtypeStruct((4, Tpad), I32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(*inputs)
    return coeff[:, :T], meta[:, :T]


def pack_table_c64(coeff):
    """(R, T) coefficient rows -> the (T, R') complex64 table
    ``pallas_micro.build_tri_table_c64`` produces for the same layout
    (bit-identical pack: complex64 moves the f32 payloads verbatim; an
    odd row count gains one zero pad row first, matching the zero pad
    column build_tri_table_c64 appends)."""
    if coeff.shape[0] % 2:
        coeff = jnp.concatenate(
            [coeff, jnp.zeros((1, coeff.shape[1]), F32)], axis=0
        )
    packed = jax.lax.complex(coeff[0::2, :], coeff[1::2, :])
    return packed.T


def pack_table_c64_cm(coeff):
    """Column-major pack: the (R, T) coefficient rows the front end
    NATIVELY emits -> (R2, T) complex64 with no transpose at all. Feed to
    ``pallas_micro.build_pair_coeffs_cm`` (bit-identical stream to the
    row-major ``pack_table_c64`` + ``build_pair_coeffs`` pipeline)."""
    if coeff.shape[0] % 2:
        coeff = jnp.concatenate(
            [coeff, jnp.zeros((1, coeff.shape[1]), F32)], axis=0
        )
    return jax.lax.complex(coeff[0::2, :], coeff[1::2, :])
