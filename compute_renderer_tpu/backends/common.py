"""Shared JAX pipeline stages used by every backend.

These are the TPU-native equivalents of the reference's WGSL device stages:

- ``vertex_stage``       <- geometry_pipeline (binning.wgsl:163-189): one
  batched transform over ALL vertices (the reference redundantly re-transforms
  shared vertices per referencing triangle; we don't);
- ``triangle_setup``     <- compute_triangle_meta (binning.wgsl:93-142);
- ``pixel_grid``         <- raster sample positions incl. the mirage warp
  (rasteriser.wgsl:110-118);
- ``barycentric`` + ``coverage_mask`` <- rasteriser.wgsl:71-81, 120-145;
- ``resolve_attributes`` <- the fragment_buffer writes (rasteriser.wgsl:173-179),
  recomputed once per pixel for the depth winner instead of written per
  candidate (deterministic; no atomics);
- ``shade``              <- fragment_main (fragment.wgsl:50-93).

Depth ordering uses the reference's *bitcast-u32 comparison* of f32 depths
(rasteriser.wgsl:84-90,153), so negative-depth quirks match. The depth winner
per pixel is (key, triangle_index)-lexicographic-min — deterministic, fixing
the reference's CAS/fragment-write race (rasteriser.wgsl:166-185).

All arithmetic keeps explicit f32 operation order so backends agree bitwise
per platform (XLA does not reassociate floats).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from compute_renderer_tpu.core.effects import (
    EFFECT_EDGE_MELT,
    EFFECT_MIRAGE,
    EFFECT_VOXELIZE,
    EFFECT_WAVE,
)

F32 = jnp.float32
DEPTH_CLEAR_BITS = jnp.uint32(0xFFFFFFFF)
# Sentinel triangle id for "no fragment" (flag == 0 in the reference).
NO_TRI = jnp.int32(-1)


def empty_frame(width: int, height: int):
    """Background-only frame for zero-triangle scenes: blue clear color +
    cleared depth (fragment.wgsl:58-62)."""
    rgba = jnp.tile(
        jnp.array([0, 0, 255, 255], dtype=jnp.uint8), (height, width, 1)
    )
    depth = jnp.full((height, width), DEPTH_CLEAR_BITS, jnp.uint32)
    return rgba, depth


# ---------------------------------------------------------------------------
# Stage 1: vertex processing
# ---------------------------------------------------------------------------

def apply_wave_effect(pos, effect):
    """Wave vertex displacement (binning.wgsl:144-161), branchless.

    effect: (6,) f32 [type, p1..p4, time]. Applied only when type == 1."""
    amplitude, frequency, phase, direction = (
        effect[1], effect[2], effect[3], effect[4],
    )
    x, y, z = pos[:, 0], pos[:, 1], pos[:, 2]
    dy = amplitude * jnp.sin(frequency * x + phase)
    dx = amplitude * jnp.sin(frequency * y + phase)
    dist = jnp.sqrt(x * x + y * y)
    dz = amplitude * jnp.sin(frequency * dist + phase)

    vertical = direction < 0.5
    horizontal = (direction >= 0.5) & (direction < 1.5)
    out = jnp.stack(
        [
            jnp.where(horizontal, x + dx, x),
            jnp.where(vertical, y + dy, y),
            jnp.where(vertical | horizontal, z, z + dz),
        ],
        axis=1,
    )
    is_wave = effect[0] == EFFECT_WAVE
    return jnp.where(is_wave, out, pos)


def vertex_stage(positions, view_proj, effect, width: int, height: int):
    """Transform all vertices to screen space (binning.wgsl:163-189).

    Returns (world_pos (N,3), screen (N,4)) with screen =
    (x_px, y_px_flipped, ndc_z, clip_w)."""
    positions = positions.astype(F32)
    world = apply_wave_effect(positions, effect)

    m = view_proj.astype(F32)
    x, y, z = world[:, 0], world[:, 1], world[:, 2]
    # Explicit mul/add chain (same order as the golden oracle) — a tiny
    # (N,4)x(4,4) matmul would hit the MXU with unspecified accumulation
    # order; the VPU chain is both faster at this size and bit-stable.
    clip = [
        ((m[r, 0] * x + m[r, 1] * y) + (m[r, 2] * z + m[r, 3]))
        for r in range(4)
    ]
    cx, cy, cz, cw = clip
    ndc_x = cx / cw
    ndc_y = cy / cw
    screen = jnp.stack(
        [
            (ndc_x + F32(1.0)) * F32(0.5) * F32(width),
            (F32(1.0) - ndc_y) * F32(0.5) * F32(height),
            cz / cw,
            cw,
        ],
        axis=1,
    )
    return world, screen


def vertex_stage_soa(pos_soa, view_proj, effect, width: int, height: int):
    """``vertex_stage`` on corner-SoA geometry.

    ``pos_soa`` is (3 corners, 3 components, T): ``pos_soa[k, c, t]`` is
    component c of corner k of triangle t, so every per-corner quantity is
    a *contiguous* (T,) row — the whole stage is streaming elementwise work
    with no strided slices (the (N, 3)-row form made XLA:TPU interleave /
    de-interleave lanes at every step, which dominated the mega-scene
    front-end). Per-element arithmetic is identical to ``vertex_stage``.

    Returns (world_soa, screen_soa): tuples over corners of tuples of (T,)
    arrays — world (x, y, z), screen (x_px, y_px_flipped, ndc_z, clip_w)."""
    m = view_proj.astype(F32)
    amplitude, frequency, phase, direction = (
        effect[1], effect[2], effect[3], effect[4],
    )
    is_wave = effect[0] == EFFECT_WAVE
    vertical = direction < 0.5
    horizontal = (direction >= 0.5) & (direction < 1.5)

    world_soa = []
    screen_soa = []
    for k in range(3):
        x = pos_soa[k, 0].astype(F32)
        y = pos_soa[k, 1].astype(F32)
        z = pos_soa[k, 2].astype(F32)
        # Wave displacement (apply_wave_effect, binning.wgsl:144-161).
        dy = amplitude * jnp.sin(frequency * x + phase)
        dx = amplitude * jnp.sin(frequency * y + phase)
        dist = jnp.sqrt(x * x + y * y)
        dz = amplitude * jnp.sin(frequency * dist + phase)
        wx = jnp.where(is_wave & horizontal, x + dx, x)
        wy = jnp.where(is_wave & vertical, y + dy, y)
        wz = jnp.where(is_wave & ~(vertical | horizontal), z + dz, z)

        clip = [
            ((m[r, 0] * wx + m[r, 1] * wy) + (m[r, 2] * wz + m[r, 3]))
            for r in range(4)
        ]
        cx, cy, cz, cw = clip
        ndc_x = cx / cw
        ndc_y = cy / cw
        world_soa.append((wx, wy, wz))
        screen_soa.append((
            (ndc_x + F32(1.0)) * F32(0.5) * F32(width),
            (F32(1.0) - ndc_y) * F32(0.5) * F32(height),
            cz / cw,
            cw,
        ))
    return tuple(world_soa), tuple(screen_soa)


# ---------------------------------------------------------------------------
# Stage 2: triangle setup / culling / tile ranges
# ---------------------------------------------------------------------------

def triangle_setup(screen, tri, effect, width: int, height: int,
                   tile_h: int, tile_w: int):
    """Per-triangle cull + clipped bbox + covered-tile rectangle
    (binning.wgsl:93-142). ``tri`` is (T,3) int32 vertex indices.

    Returns a dict of (T,)-shaped arrays:
      alive          bool
      tile_x0/y0     int32  first covered tile (inclusive)
      tile_x1/y1     int32  last covered tile (exclusive)
      px_x0/y0/x1/y1 int32  covered pixel rectangle (union of covered tiles,
                            clipped to screen) — the raster region
    """
    return triangle_setup_corners(screen[tri], effect, width, height,
                                  tile_h, tile_w)


def triangle_setup_corners(v, effect, width: int, height: int,
                           tile_h: int, tile_w: int):
    """``triangle_setup`` on pre-gathered corner vertices ``v`` (T, 3, 4).

    The mega-scene path keeps geometry corner-major (one screen row per
    triangle corner, like the reference's per-corner transform,
    binning.wgsl:216-219) so setup is pure streaming elementwise work — at
    ~1M triangles the ``screen[tri]`` row-gather dominated the whole
    front-end on TPU."""
    screen_soa = tuple(
        tuple(v[:, k, c] for c in range(4)) for k in range(3)
    )
    return triangle_setup_soa(screen_soa, effect, width, height,
                              tile_h, tile_w)


def triangle_setup_soa(screen_soa, effect, width: int, height: int,
                       tile_h: int, tile_w: int):
    """``triangle_setup`` on corner-SoA screen vertices (see
    ``vertex_stage_soa``): all-contiguous (T,) rows, no strided slices."""
    (v1x, v1y, _, v1w), (v2x, v2y, _, v2w), (v3x, v3y, _, v3w) = screen_soa

    w_ok = ~((v1w < F32(0.0)) | (v2w < F32(0.0)) | (v3w < F32(0.0)))

    min_x = jnp.minimum(jnp.minimum(v1x, v2x), v3x)
    max_x = jnp.maximum(jnp.maximum(v1x, v2x), v3x)
    min_y = jnp.minimum(jnp.minimum(v1y, v2y), v3y)
    max_y = jnp.maximum(jnp.maximum(v1y, v2y), v3y)

    on_screen = ~(
        (max_x < F32(0.0)) | (min_x >= F32(width))
        | (max_y < F32(0.0)) | (min_y >= F32(height))
    )

    ax = v2x - v1x
    ay = v2y - v1y
    bx = v3x - v1x
    by = v3y - v1y
    cross_z = ax * by - ay * bx
    is_voxelize = effect[0] == EFFECT_VOXELIZE
    facing = jnp.where(is_voxelize, jnp.ones_like(cross_z, bool), cross_z < F32(0.0))

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
    tile_x0 = jnp.maximum(jnp.floor(safe(cb_min_x) / F32(tile_w)), F32(0.0)).astype(jnp.int32)
    tile_y0 = jnp.maximum(jnp.floor(safe(cb_min_y) / F32(tile_h)), F32(0.0)).astype(jnp.int32)
    tile_x1 = jnp.minimum(jnp.ceil(safe(cb_max_x) / F32(tile_w)), ntx).astype(jnp.int32)
    tile_y1 = jnp.minimum(jnp.ceil(safe(cb_max_y) / F32(tile_h)), nty).astype(jnp.int32)

    alive = alive & (tile_x1 > tile_x0) & (tile_y1 > tile_y0)
    tile_x1 = jnp.where(alive, tile_x1, tile_x0)
    tile_y1 = jnp.where(alive, tile_y1, tile_y0)

    return {
        "alive": alive,
        "tile_x0": tile_x0,
        "tile_y0": tile_y0,
        "tile_x1": tile_x1,
        "tile_y1": tile_y1,
        "px_x0": tile_x0 * tile_w,
        "px_y0": tile_y0 * tile_h,
        "px_x1": jnp.minimum(tile_x1 * tile_w, width),
        "px_y1": jnp.minimum(tile_y1 * tile_h, height),
    }


# ---------------------------------------------------------------------------
# Stage 3 support: sample positions, barycentrics, coverage
# ---------------------------------------------------------------------------

def pixel_grid(effect, width: int, height: int, x_offset=0, y_offset=0):
    """(H,W) sample positions with the mirage warp applied when effect==4
    (rasteriser.wgsl:110-118). Offsets give the window's global pixel
    coordinates when rendering a sharded stripe of the framebuffer."""
    xs = jax.lax.broadcasted_iota(F32, (height, width), 1) + x_offset
    ys = jax.lax.broadcasted_iota(F32, (height, width), 0) + y_offset
    return warp_positions(xs, ys, effect)


def warp_positions(xs, ys, effect):
    """Mirage sample warp on given (…)-shaped f32 pixel coordinates."""
    amplitude, frequency, phase, time = effect[1], effect[2], effect[3], effect[5]
    off_x = amplitude * jnp.sin(frequency * xs + time + phase)
    off_y = amplitude * jnp.cos(frequency * ys + time + phase)
    is_mirage = effect[0] == EFFECT_MIRAGE
    px = jnp.where(is_mirage, xs + off_x, xs)
    py = jnp.where(is_mirage, ys + off_y, ys)
    return px, py


def barycentric(v1, v2, v3, px, py):
    """Cross-product barycentric formulation (rasteriser.wgsl:71-81).

    v1..v3: (..., 4) screen vertices broadcastable against px/py."""
    v1x, v1y = v1[..., 0], v1[..., 1]
    v2x, v2y = v2[..., 0], v2[..., 1]
    v3x, v3y = v3[..., 0], v3[..., 1]
    ux = (v2x - v1x) * (v1y - py) - (v1x - px) * (v2y - v1y)
    uy = (v1x - px) * (v3y - v1y) - (v3x - v1x) * (v1y - py)
    uz = (v3x - v1x) * (v2y - v1y) - (v2x - v1x) * (v3y - v1y)
    bc2 = uy / uz
    bc3 = ux / uz
    bc1 = F32(1.0) - (ux + uy) / uz
    return bc1, bc2, bc3


def barycentric_coefficients(v1x, v1y, v2x, v2y, v3x, v3y):
    """*Anchored* affine barycentric coefficients.

    The cross-product barycentrics (rasteriser.wgsl:71-81) are affine in the
    sample position. Evaluated about the origin the constant term suffers
    catastrophic cancellation (A ~ coords^2 while bc ~ 1, which punched
    pixel-center pinholes along shared edges); anchoring at vertex 1 makes
    the constant term exact — bc = (1,0,0) at the anchor — and the deltas
    small:

        bc_i(px, py) = A_i + B_i*dx + C_i*dy,   dx = px - v1x, dy = py - v1y

    with the 1/uz division folded into B/C. Two FMAs per quantity in the hot
    loop, shared by both backends (bit-identical across them by
    construction). Degenerate triangles (uz == 0) produce inf/nan
    coefficients; evaluation then fails the isfinite(z) mask exactly like
    the direct formulation.

    Returns a dict with the nine coefficient arrays plus the anchor
    ("ax", "ay")."""
    bux = v2y - v1y
    cux = -(v2x - v1x)
    buy = -(v3y - v1y)
    cuy = v3x - v1x
    uz = (v3x - v1x) * (v2y - v1y) - (v2x - v1x) * (v3y - v1y)
    inv = F32(1.0) / uz
    zero = jnp.zeros_like(inv)
    b3, c3 = bux * inv, cux * inv  # bc3 = ux/uz, ux(anchor) = 0
    b2, c2 = buy * inv, cuy * inv  # bc2 = uy/uz, uy(anchor) = 0
    a1 = jnp.full_like(inv, F32(1.0)) + zero * inv  # nan for degenerate uz
    b1 = -(bux + buy) * inv
    c1 = -(cux + cuy) * inv
    return {
        "a1": a1, "b1": b1, "c1": c1,
        "a2": zero * inv, "b2": b2, "c2": c2,
        "a3": zero * inv, "b3": b3, "c3": c3,
        "ax": v1x, "ay": v1y,
    }


def affine_combine(coeffs, w1, w2, w3):
    """(A, B, C) of w1*bc1 + w2*bc2 + w3*bc3 — the affine form of any
    barycentric-interpolated quantity (depth, normals, world positions)."""
    a = w1 * coeffs["a1"] + w2 * coeffs["a2"] + w3 * coeffs["a3"]
    b = w1 * coeffs["b1"] + w2 * coeffs["b2"] + w3 * coeffs["b3"]
    c = w1 * coeffs["c1"] + w2 * coeffs["c2"] + w3 * coeffs["c3"]
    return a, b, c


def coverage_thresholds(effect):
    """Per-frame scalar thresholds for the inside test.

    Returns (threshold, melt_threshold):
    - threshold: barycentric inside threshold; -param1 under voxelize
      ("inflation", rasteriser.wgsl:127-131), else 0;
    - melt_threshold: edge-melt min-barycentric cutoff
      (rasteriser.wgsl:136-141); -inf when inactive so the test passes."""
    etype = effect[0]
    threshold = jnp.where(etype == EFFECT_VOXELIZE, -effect[1], F32(0.0))
    melt = effect[1] * (F32(0.5) + F32(0.5) * jnp.sin(effect[5] + effect[2]))
    melt_threshold = jnp.where(etype == EFFECT_EDGE_MELT, melt, F32(-jnp.inf))
    return threshold, melt_threshold


def depth_key(z):
    """f32 depth -> u32 ordering key (bitcast), matching the reference's
    atomic comparison on raw float bits (rasteriser.wgsl:84-90)."""
    return jax.lax.bitcast_convert_type(z.astype(F32), jnp.uint32)


# ---------------------------------------------------------------------------
# Attribute resolve: one pass over the winner per pixel
# ---------------------------------------------------------------------------

def resolve_attributes(best_tri, tri, screen, world, normals, uvs, effect,
                       width: int, height: int, x_offset=0, y_offset=0):
    """Recompute barycentrics for each pixel's winning triangle and
    interpolate {uv, normal, world_pos} (the reference writes these per
    depth-CAS winner, rasteriser.wgsl:173-179; we resolve once at the end).

    best_tri: (H,W) int32 winning triangle index or NO_TRI.
    Returns gbuffer dict of (H,W,…) arrays + 'flag' (H,W) bool."""
    flag = best_tri != NO_TRI
    t = jnp.where(flag, best_tri, 0)
    idx = tri[t]  # (H, W, 3)
    v1 = screen[idx[..., 0]]
    v2 = screen[idx[..., 1]]
    v3 = screen[idx[..., 2]]

    px, py = pixel_grid(effect, width, height, x_offset, y_offset)
    # Affine form, identical to the Pallas kernel's evaluation order.
    co = barycentric_coefficients(
        v1[..., 0], v1[..., 1], v2[..., 0], v2[..., 1], v3[..., 0], v3[..., 1]
    )

    dx = px - co["ax"]
    dy = py - co["ay"]

    def interp(w1, w2, w3):
        a, b, c = affine_combine(co, w1, w2, w3)
        return a + b * dx + c * dy

    uv = jnp.stack(
        [interp(uvs[idx[..., 0]][..., ch], uvs[idx[..., 1]][..., ch],
                uvs[idx[..., 2]][..., ch]) for ch in range(2)],
        axis=-1,
    )
    nrm = jnp.stack(
        [interp(normals[idx[..., 0]][..., ch], normals[idx[..., 1]][..., ch],
                normals[idx[..., 2]][..., ch]) for ch in range(3)],
        axis=-1,
    )
    pos = jnp.stack(
        [interp(world[idx[..., 0]][..., ch], world[idx[..., 1]][..., ch],
                world[idx[..., 2]][..., ch]) for ch in range(3)],
        axis=-1,
    )
    zero = F32(0.0)
    return {
        "flag": flag,
        "uv": jnp.where(flag[..., None], uv, zero),
        "normal": jnp.where(flag[..., None], nrm, zero),
        "world_pos": jnp.where(flag[..., None], pos, zero),
    }


# ---------------------------------------------------------------------------
# Texture sampling (extension; the reference's TextureInfo is never bound)
# ---------------------------------------------------------------------------

def sample_atlas(texels, tex_table, face_tex, best_tri, flag, uv,
                 bilinear: bool = False):
    """Nearest-neighbor (default) or bilinear, repeat-wrap sample of the
    flat texel atlas.

    The atlas is the reference's (unbound) TextureInfo layout made live
    (custom_pipeline/util.rs:75-85): ``texels`` (P, 3) f32 pool, top image
    row first; ``tex_table`` (M, 3) i32 {offset, width, height} rows;
    ``face_tex`` (T,) i32 slot per triangle (-1 = untextured). ``uv`` is
    the interpolated (H, W, 2) texcoord — V already flipped at load
    (model.rs:64), so v'=0 addresses the top row directly.

    ``bilinear=True`` filters over the 2x2 texel neighborhood of the
    half-texel-offset sample point (standard GL convention: the texel
    center sits at (i + 0.5) / size), wrapping in repeat mode — an
    EXTENSION past the reference, whose TextureInfo never binds a sampler
    at all (custom_pipeline/util.rs:75-85). The lerp order is fixed and
    mirrored verbatim by the golden rasterizer for parity.

    Returns ``(texel (H, W, 3) f32, has (H, W) bool)`` — white (the
    modulation identity) wherever ``has`` is False, so callers can
    unconditionally multiply."""
    tid = face_tex[jnp.where(flag, best_tri, 0)]
    has = flag & (tid >= 0)
    t0 = jnp.where(has, tid, 0)
    off = tex_table[t0, 0]
    tw = tex_table[t0, 1]
    th = tex_table[t0, 2]
    u = uv[..., 0]
    v = uv[..., 1]
    fu = u - jnp.floor(u)
    fv = v - jnp.floor(v)
    safe_idx = lambda i: jnp.where(has, i, 0)
    if not bilinear:
        tx = jnp.minimum((fu * tw.astype(F32)).astype(jnp.int32), tw - 1)
        ty = jnp.minimum((fv * th.astype(F32)).astype(jnp.int32), th - 1)
        texel = texels[safe_idx(off + ty * tw + tx)]
        return jnp.where(has[..., None], texel, F32(1.0)), has
    texel = _bilinear_level(texels, off, tw, th, fu, fv, safe_idx)
    return jnp.where(has[..., None], texel, F32(1.0)), has


def _bilinear_level(texels, off, tw, th, fu, fv, safe_idx):
    """One bilinear tap at a given {offset, width, height} level (GL
    half-texel convention, repeat wrap; lerp order fixed and mirrored by
    the golden rasterizer)."""
    pu = fu * tw.astype(F32) - F32(0.5)
    pv = fv * th.astype(F32) - F32(0.5)
    x0f = jnp.floor(pu)
    y0f = jnp.floor(pv)
    wx = (pu - x0f)[..., None]
    wy = (pv - y0f)[..., None]
    # jnp.mod keeps the divisor's sign, so the -1 left of texel 0 wraps to
    # size-1 (repeat) with no branch.
    x0 = jnp.mod(x0f.astype(jnp.int32), tw)
    y0 = jnp.mod(y0f.astype(jnp.int32), th)
    x1 = jnp.mod(x0 + 1, tw)
    y1 = jnp.mod(y0 + 1, th)
    t00 = texels[safe_idx(off + y0 * tw + x0)]
    t10 = texels[safe_idx(off + y0 * tw + x1)]
    t01 = texels[safe_idx(off + y1 * tw + x0)]
    t11 = texels[safe_idx(off + y1 * tw + x1)]
    one = F32(1.0)
    top = t00 * (one - wx) + t10 * wx
    bot = t01 * (one - wx) + t11 * wx
    return top * (one - wy) + bot * wy


def uv_gradients(tri, screen, uvs):
    """Per-triangle screen-space uv gradients (T, 4):
    [du/dx, dv/dx, du/dy, dv/dy].

    The pipeline's barycentrics are the reference's cross-product
    formulation (rasteriser.wgsl:71-81) — AFFINE in pixel coords — so the
    interpolated uv has a CONSTANT gradient per triangle, computed exactly
    from the screen vertices: with uz the (constant) denominator,
    b2 = uy/uz, b3 = ux/uz, dux/dx = (v2y-v1y), duy/dx = -(v3y-v1y),
    dux/dy = -(v2x-v1x), duy/dy = (v3x-v1x). Degenerate triangles
    (uz ~ 0) get gradient 0 (=> mip level 0)."""
    i1, i2, i3 = tri[:, 0], tri[:, 1], tri[:, 2]
    v1 = screen[i1]
    v2 = screen[i2]
    v3 = screen[i3]
    uz = ((v3[:, 0] - v1[:, 0]) * (v2[:, 1] - v1[:, 1])
          - (v2[:, 0] - v1[:, 0]) * (v3[:, 1] - v1[:, 1]))
    safe = jnp.where(jnp.abs(uz) > F32(1e-20), uz, F32(1.0))
    inv = jnp.where(jnp.abs(uz) > F32(1e-20), F32(1.0) / safe, F32(0.0))
    e2 = uvs[i2] - uvs[i1]  # (T, 2)
    e3 = uvs[i3] - uvs[i1]
    db2_dx = -(v3[:, 1] - v1[:, 1]) * inv
    db3_dx = (v2[:, 1] - v1[:, 1]) * inv
    db2_dy = (v3[:, 0] - v1[:, 0]) * inv
    db3_dy = -(v2[:, 0] - v1[:, 0]) * inv
    gx = e2 * db2_dx[:, None] + e3 * db3_dx[:, None]  # (T, 2) d(uv)/dx
    gy = e2 * db2_dy[:, None] + e3 * db3_dy[:, None]
    return jnp.concatenate([gx, gy], axis=1).astype(F32)


def sample_atlas_aniso(texels, mip_table, face_tex, best_tri, flag, uv,
                       guv, max_aniso: int = 4):
    """Anisotropic sample: MAX_ANISO trilinear-LOD taps spread along the
    footprint's MAJOR axis (EXT_texture_filter_anisotropic model).

    Per pixel: Px/Py = the texel-space lengths of the uv gradients,
    N = clamp(Pmax/Pmin, 1, max_aniso), lod = log2(Pmax / N) — the LOD a
    footprint squashed by N would have — and ``max_aniso`` bilinear taps
    at uv + major_axis * s_i with s_i spanning (1 - 1/N) of the footprint
    (a pixel with Px == Py bitwise collapses every tap onto the center
    and reproduces the trilinear sample exactly: summing max_aniso
    identical f32 taps then dividing by max_aniso is exact; nearly-
    isotropic pixels land within a few LSB). All work is fixed-shape
    vector math — no data-dependent tap counts, so XLA fuses it like any
    other elementwise chain."""
    L = mip_table.shape[1]
    tid = face_tex[jnp.where(flag, best_tri, 0)]
    has = flag & (tid >= 0)
    t0 = jnp.where(has, tid, 0)
    base = mip_table[t0, 0]
    safe_idx = lambda i: jnp.where(has, i, 0)

    tw0 = base[..., 1].astype(F32)
    th0 = base[..., 2].astype(F32)
    gx_u = guv[..., 0] * tw0
    gx_v = guv[..., 1] * th0
    gy_u = guv[..., 2] * tw0
    gy_v = guv[..., 3] * th0
    px = jnp.sqrt(gx_u * gx_u + gx_v * gx_v)
    py = jnp.sqrt(gy_u * gy_u + gy_v * gy_v)
    pmax = jnp.maximum(jnp.maximum(px, py), F32(1e-12))
    pmin = jnp.maximum(jnp.minimum(px, py), F32(1e-12))
    n_eff = jnp.clip(pmax / pmin, F32(1.0), F32(max_aniso))
    lod = jnp.clip(jnp.log2(pmax / n_eff), F32(0.0), F32(L - 1))
    l0 = lod.astype(jnp.int32)
    l1 = jnp.minimum(l0 + 1, L - 1)
    frac = (lod - l0.astype(F32))[..., None]

    # Major-axis direction in UV units (not texel units), scaled so the
    # taps span (1 - 1/N) of the footprint: isotropic N=1 -> zero spread.
    x_major = px >= py
    mu = jnp.where(x_major, guv[..., 0], guv[..., 2])
    mv = jnp.where(x_major, guv[..., 1], guv[..., 3])
    spread = F32(1.0) - F32(1.0) / n_eff

    u = uv[..., 0]
    v = uv[..., 1]
    acc = None
    for i in range(max_aniso):
        s = (F32((i + 0.5) / max_aniso) - F32(0.5)) * spread
        ui = u + mu * s
        vi = v + mv * s
        fu = ui - jnp.floor(ui)
        fv = vi - jnp.floor(vi)

        row0 = mip_table[t0, l0]
        row1 = mip_table[t0, l1]
        tap = (_bilinear_level(texels, row0[..., 0], row0[..., 1],
                               row0[..., 2], fu, fv, safe_idx)
               * (F32(1.0) - frac)
               + _bilinear_level(texels, row1[..., 0], row1[..., 1],
                                 row1[..., 2], fu, fv, safe_idx) * frac)
        acc = tap if acc is None else acc + tap
    texel = acc / F32(max_aniso)
    return jnp.where(has[..., None], texel, F32(1.0)), has


def sample_atlas_trilinear(texels, mip_table, face_tex, best_tri, flag, uv,
                           guv):
    """Trilinear (mipmapped) repeat-wrap sample of the mip-extended atlas.

    ``mip_table`` is (M, L, 3) i32 {offset, width, height} per level from
    ``io.textures.build_mips``; ``guv`` the winner's per-pixel (H, W, 4)
    screen-space uv gradient rows (``uv_gradients`` gathered by winner).
    LOD follows the GL footprint rule: lod = log2(max(|d(uv)/dx * dims|,
    |d(uv)/dy * dims|)), clamped to [0, L-1]; the two straddling levels
    are bilinearly tapped and lerped."""
    L = mip_table.shape[1]
    tid = face_tex[jnp.where(flag, best_tri, 0)]
    has = flag & (tid >= 0)
    t0 = jnp.where(has, tid, 0)
    base = mip_table[t0, 0]  # (H, W, 3): level-0 {off, w, h}
    u = uv[..., 0]
    v = uv[..., 1]
    fu = u - jnp.floor(u)
    fv = v - jnp.floor(v)
    safe_idx = lambda i: jnp.where(has, i, 0)

    tw0 = base[..., 1].astype(F32)
    th0 = base[..., 2].astype(F32)
    rx = jnp.sqrt((guv[..., 0] * tw0) ** 2 + (guv[..., 1] * th0) ** 2)
    ry = jnp.sqrt((guv[..., 2] * tw0) ** 2 + (guv[..., 3] * th0) ** 2)
    rho = jnp.maximum(jnp.maximum(rx, ry), F32(1e-12))
    lod = jnp.clip(jnp.log2(rho), F32(0.0), F32(L - 1))
    l0 = lod.astype(jnp.int32)
    l1 = jnp.minimum(l0 + 1, L - 1)
    frac = (lod - l0.astype(F32))[..., None]

    def tap(level):
        row = mip_table[t0, level]
        return _bilinear_level(
            texels, row[..., 0], row[..., 1], row[..., 2], fu, fv, safe_idx
        )

    texel = tap(l0) * (F32(1.0) - frac) + tap(l1) * frac
    return jnp.where(has[..., None], texel, F32(1.0)), has


def textured_shade(gbuffer, best_tri, face_kd, face_tex, texels, tex_table,
                   view_position, light_world_pos, light_color,
                   light_intensity, tex_filter: str = "nearest",
                   tex_mips=None, guv=None):
    """Deferred-texturing shade tail shared by every visibility-mode
    consumer (tpu.render_frame / render_frame_micro, the sharded stripe
    bodies, and the frame-parallel path): look up the winner's per-triangle
    kd, sample the flat atlas at the interpolated uv, modulate, and run the
    reference fragment formula (fragment.wgsl:50-93). ``gbuffer`` comes
    from ``resolve_attributes`` on the same screen/world/normal values the
    visibility kernel's coefficients were built from."""
    flag = gbuffer["flag"]
    if face_kd is not None:
        kd = face_kd.astype(F32)[jnp.where(flag, best_tri, 0)]
        kd = jnp.where(flag[..., None], kd, F32(1.0))
    else:
        kd = jnp.ones(flag.shape + (3,), F32)
    if tex_filter in ("trilinear", "anisotropic"):
        # ``texels`` is the mip-extended pool (io.textures.build_mips);
        # ``tex_mips`` its (M, L, 3) level table; ``guv`` the per-TRIANGLE
        # (T, 4) uv-gradient table (common.uv_gradients over the same
        # vertex arrays the resolve used) — gathered by winner here.
        if tex_mips is None:
            raise ValueError(
                f"tex_filter={tex_filter!r} needs the mip-extended pool as "
                "texels AND its level table as tex_mips — build both with "
                "io.textures.trilinear_tex_arrays(texels, tex_table) (the "
                "engine/CLI entries do this automatically)"
            )
        guv_px = guv[jnp.where(flag, best_tri, 0)]
        sampler = (sample_atlas_aniso if tex_filter == "anisotropic"
                   else sample_atlas_trilinear)
        texel, has = sampler(
            texels, tex_mips, face_tex.astype(jnp.int32), best_tri, flag,
            uv=gbuffer["uv"], guv=guv_px,
        )
    else:
        texel, has = sample_atlas(
            texels, tex_table, face_tex.astype(jnp.int32), best_tri, flag,
            uv=gbuffer["uv"], bilinear=(tex_filter == "bilinear"),
        )
    kd = jnp.where(has[..., None], kd * texel, kd)
    gbuffer["kd"] = kd
    return shade(
        gbuffer, view_position, light_world_pos.astype(F32),
        light_color.astype(F32), light_intensity.astype(F32),
    )


# ---------------------------------------------------------------------------
# Fused-texturing tail (round 4)
# ---------------------------------------------------------------------------
#
# G-buffer channel layout written by the kernels' fused-texture epilogue
# (pallas_raster/_raster_tile and pallas_micro/_raster_tile_micro, texf
# mode). The kernel interpolates EVERYTHING the deferred tail used to
# resolve with per-pixel gathers (uv, kd, the winner's TextureInfo row, and
# the per-light diffuse/specular scalars); the tail below is left with only
# the texel-pool fetch — the one gather a texture lookup fundamentally is —
# plus pure elementwise math. Measured context (suite_round3b): the
# deferred resolve/sample chain cost ~63 ms at 36k tris; the gathers it
# performed per pixel (12+ gathers into per-vertex arrays + tex-table rows)
# are exactly what this layout deletes.
#
#   0: u      1: v          interpolated texcoord (affine, same formula as
#                           resolve_attributes — bitwise-equal values)
#   2: kd.r   3: kd.g   4: kd.b   winner's per-triangle diffuse (1s if none)
#   5: off    6: tw     7: th     winner's TextureInfo row as exact f32
#                                 ints (custom_pipeline/util.rs:75-85);
#                                 tw == 0 means "untextured face"
#   8+2i: diff_i   9+2i: spec_i  per-light Phong scalars, same op chain as
#                                 the kernels' shading epilogue
TEXF_BASE_CHANNELS = 8


def texf_channels(num_lights: int) -> int:
    return TEXF_BASE_CHANNELS + 2 * num_lights


def fused_texture_tail(gbuf, best_key, texels, light_color, light_intensity,
                       tex_filter: str = "nearest", texels_packed=None):
    """Shade a fused-texture G-buffer: one texel fetch + elementwise math.

    ``gbuf``: (C, H, W) f32 in the TEXF layout above (C = texf_channels(L));
    ``best_key``: (H, W) u32 depth keys (DEPTH_CLEAR_BITS = background);
    ``texels``: (P, 3) f32 flat atlas pool; ``texels_packed``: optional
    (P,) i32 pool with the SAME texels as round(v*255) u8 packed r|g<<8|b<<16
    — used instead of ``texels`` when given, turning each tap's 3-element
    row gather into 1 element (~3x less gather traffic; build with
    io.textures.pack_pool_u8, which verifies exact f32 round-trip so the
    unpack is bitwise-identical to the f32 gather).

    Arithmetic mirrors ``sample_atlas``/``_bilinear_level`` and ``shade``'s
    material branch op-for-op, so the image equals the deferred tail's
    bitwise. Returns (H, W, 4) u8 RGBA."""
    flag = best_key != DEPTH_CLEAR_BITS
    u = gbuf[0]
    v = gbuf[1]
    kd = jnp.stack([gbuf[2], gbuf[3], gbuf[4]], axis=-1)  # (H, W, 3)
    off = gbuf[5].astype(jnp.int32)
    tw = gbuf[6].astype(jnp.int32)
    th = gbuf[7].astype(jnp.int32)
    has = flag & (tw > 0)
    # Dead lanes (background / untextured) carry zeros; substitute size 1
    # so the index math below stays finite (sample_atlas achieves the same
    # by redirecting them to texture slot 0). kd of uncovered pixels is
    # garbage too — masked by ``flag`` in the final select.
    tws = jnp.where(has, tw, 1)
    ths = jnp.where(has, th, 1)
    twf = tws.astype(F32)
    thf = ths.astype(F32)

    if texels_packed is not None:
        def fetch(idx):
            p = texels_packed[idx]
            return jnp.stack(
                [
                    (p & 0xFF).astype(F32) / F32(255.0),
                    ((p >> 8) & 0xFF).astype(F32) / F32(255.0),
                    ((p >> 16) & 0xFF).astype(F32) / F32(255.0),
                ],
                axis=-1,
            )
    else:
        def fetch(idx):
            return texels[idx]

    fu = u - jnp.floor(u)
    fv = v - jnp.floor(v)
    safe_idx = lambda i: jnp.where(has, i, 0)
    if tex_filter == "nearest":
        tx = jnp.minimum((fu * twf).astype(jnp.int32), tws - 1)
        ty = jnp.minimum((fv * thf).astype(jnp.int32), ths - 1)
        texel = fetch(safe_idx(off + ty * tws + tx))
    elif tex_filter == "bilinear":
        # Same math and lerp order as _bilinear_level.
        pu = fu * twf - F32(0.5)
        pv = fv * thf - F32(0.5)
        x0f = jnp.floor(pu)
        y0f = jnp.floor(pv)
        wx = (pu - x0f)[..., None]
        wy = (pv - y0f)[..., None]
        x0 = jnp.mod(x0f.astype(jnp.int32), tws)
        y0 = jnp.mod(y0f.astype(jnp.int32), ths)
        x1 = jnp.mod(x0 + 1, tws)
        y1 = jnp.mod(y0 + 1, ths)
        t00 = fetch(safe_idx(off + y0 * tws + x0))
        t10 = fetch(safe_idx(off + y0 * tws + x1))
        t01 = fetch(safe_idx(off + y1 * tws + x0))
        t11 = fetch(safe_idx(off + y1 * tws + x1))
        one = F32(1.0)
        top = t00 * (one - wx) + t10 * wx
        bot = t01 * (one - wx) + t11 * wx
        texel = top * (one - wy) + bot * wy
    else:
        raise ValueError(
            f"fused texture tail supports nearest/bilinear, not "
            f"{tex_filter!r} (trilinear/anisotropic use the deferred tail)"
        )

    kdt = jnp.where(has[..., None], kd * texel, kd)

    # shade()'s material branch, with the per-light diff/spec scalars read
    # from the G-buffer instead of recomputed (the kernel computed them
    # with the identical op chain).
    final = F32(0.1) * kdt
    num_lights = (gbuf.shape[0] - TEXF_BASE_CHANNELS) // 2
    for li in range(num_lights):
        diff = gbuf[TEXF_BASE_CHANNELS + 2 * li]
        spec = gbuf[TEXF_BASE_CHANNELS + 2 * li + 1]
        contrib = diff[..., None] * kdt + (spec * F32(0.5))[..., None]
        lc = light_color[li].astype(F32)
        inten = light_intensity[li].astype(F32)
        final = final + contrib * lc[None, None, :] * inten

    final = jnp.clip(final, F32(0.0), F32(1.0))
    srgb = jnp.power(final, F32(1.0 / 2.2))
    shaded = jnp.round(srgb * F32(255.0)).astype(jnp.uint8)
    background = jnp.array([0, 0, 255], dtype=jnp.uint8)
    rgb = jnp.where(flag[..., None], shaded, background[None, None, :])
    alpha = jnp.full(flag.shape + (1,), 255, dtype=jnp.uint8)
    return jnp.concatenate([rgb, alpha], axis=-1)


def tex_rows_f32(face_tex, tex_table):
    """Per-triangle TextureInfo rows (off, tw, th) as (T, 3) exact f32 for
    the texf coefficient table; untextured faces (slot -1) become all-zero
    rows (tw == 0 is the tail's 'untextured' mark). Offsets must stay below
    2^24 for f32 exactness — callers route larger atlases to the deferred
    tail (tpu.texf_eligible)."""
    t0 = jnp.maximum(face_tex.astype(jnp.int32), 0)
    rows = tex_table.astype(jnp.int32)[t0].astype(F32)  # (T, 3)
    return jnp.where((face_tex >= 0)[:, None], rows, F32(0.0))

def shade(gbuffer, view_position, light_world_pos, light_color,
          light_intensity):
    """fragment_main (fragment.wgsl:50-93): ambient 0.1 + per-light diffuse +
    Phong specular; world-space light dir; unnormalized interpolated normal;
    clamp; gamma 1/2.2; blue background. Returns (H,W,4) uint8 RGBA.

    Material extension (beyond the reference, which has no live materials):
    when the gbuffer carries a per-pixel diffuse color ``kd`` (H,W,3), the
    ambient and diffuse terms are modulated by it —
    ``0.1*kd + sum_l (diff*kd + 0.5*spec) * light_color * intensity`` —
    specular stays unmodulated. ``kd`` absent keeps the reference formula
    on its original expression (bitwise unchanged)."""
    flag = gbuffer["flag"]
    normal = gbuffer["normal"]
    pos = gbuffer["world_pos"]
    kd = gbuffer.get("kd")

    if kd is None:
        final = jnp.full(pos.shape[:2] + (3,), F32(0.1))
    else:
        final = F32(0.1) * kd.astype(F32)
    eye = view_position.astype(F32)[:3]

    num_lights = light_world_pos.shape[0]
    for li in range(num_lights):
        lp = light_world_pos[li]
        lc = light_color[li]
        inten = light_intensity[li]

        ldir = lp[None, None, :] - pos
        lnorm = jnp.sqrt(jnp.sum(ldir * ldir, axis=-1, keepdims=True))
        ldir = ldir / lnorm

        d = jnp.sum(normal * ldir, axis=-1)
        # fmax semantics: NaN (zero-length light vector) -> 0, like GPU max.
        diff = jnp.where(d > F32(0.0), d, F32(0.0))

        vdir = eye[None, None, :] - pos
        vnorm = jnp.sqrt(jnp.sum(vdir * vdir, axis=-1, keepdims=True))
        vdir = vdir / vnorm

        # reflect(-l, n) = -l - 2*dot(-l, n)*n (WGSL reflect, fragment.wgsl:79)
        e = -ldir
        rdir = e - F32(2.0) * jnp.sum(e * normal, axis=-1, keepdims=True) * normal
        s = jnp.sum(vdir * rdir, axis=-1)
        s = jnp.where(s > F32(0.0), s, F32(0.0))
        # s**32 via 5 squarings: transcendental-free and bit-identical to
        # the Pallas kernel's _pow32.
        s2 = s * s
        s4 = s2 * s2
        s8 = s4 * s4
        s16 = s8 * s8
        spec = s16 * s16

        if kd is None:
            contrib = (diff + spec * F32(0.5))[..., None]
        else:
            # Same per-channel op order as the Pallas kernels' material
            # epilogue: diff*kd, spec*0.5, add, then *color, *intensity.
            contrib = diff[..., None] * kd + (spec * F32(0.5))[..., None]
        final = final + contrib * lc[None, None, :] * inten

    final = jnp.clip(final, F32(0.0), F32(1.0))
    srgb = jnp.power(final, F32(1.0 / 2.2))

    shaded = jnp.round(srgb * F32(255.0)).astype(jnp.uint8)
    background = jnp.array([0, 0, 255], dtype=jnp.uint8)
    rgb = jnp.where(flag[..., None], shaded, background[None, None, :])
    alpha = jnp.full(flag.shape + (1,), 255, dtype=jnp.uint8)
    return jnp.concatenate([rgb, alpha], axis=-1)
