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
# Anisotropic-filtering tap count AND the footprint clamp baked into
# mip_tri_rows' per-triangle spread/lod constants — the one shared
# definition (see core.maths.MAX_ANISO; ADVICE r4).
from compute_renderer_tpu.core.maths import MAX_ANISO  # noqa: E402


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
    return _bilinear_level_fetch(
        lambda i: texels[i], off, tw, th, fu, fv, safe_idx
    )


def _bilinear_level_fetch(fetch, off, tw, th, fu, fv, safe_idx):
    """``_bilinear_level`` over an arbitrary texel ``fetch`` (f32 row
    gather or the u8-packed-pool unpack) — same ops in the same order, so
    the tap is bitwise-identical for any fetch that returns the same
    values."""
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
    t00 = fetch(safe_idx(off + y0 * tw + x0))
    t10 = fetch(safe_idx(off + y0 * tw + x1))
    t01 = fetch(safe_idx(off + y1 * tw + x0))
    t11 = fetch(safe_idx(off + y1 * tw + x1))
    one = F32(1.0)
    top = t00 * (one - wx) + t10 * wx
    bot = t01 * (one - wx) + t11 * wx
    return top * (one - wy) + bot * wy


def _uv_gradients_comps(v1x, v1y, v2x, v2y, v3x, v3y, e2u, e2v, e3u, e3v):
    """The uv-gradient math on (T,) components, fenced by optimization
    barriers so every caller compiles the IDENTICAL subgraph.

    Why the fences: the mul-add chains below are FMA-contraction bait, and
    XLA:CPU's contraction decisions depend on the surrounding fusion — the
    same formula inlined into the micro program and the XLA-reference
    program produced rows 1 ULP apart (observed on the minified-quad
    parity test, plugin-inert CPU regime only). Barriers on the inputs and
    the output isolate the chain into its own fusion with identical
    producers/consumers everywhere, so codegen — and therefore every bit
    of the result — matches across programs. Rank is (T,), so the lost
    fusion is noise."""
    from jax import lax

    (v1x, v1y, v2x, v2y, v3x, v3y, e2u, e2v, e3u, e3v) = (
        lax.optimization_barrier(
            (v1x, v1y, v2x, v2y, v3x, v3y, e2u, e2v, e3u, e3v)
        )
    )
    uz = (v3x - v1x) * (v2y - v1y) - (v2x - v1x) * (v3y - v1y)
    safe = jnp.where(jnp.abs(uz) > F32(1e-20), uz, F32(1.0))
    inv = jnp.where(jnp.abs(uz) > F32(1e-20), F32(1.0) / safe, F32(0.0))
    db2_dx = -(v3y - v1y) * inv
    db3_dx = (v2y - v1y) * inv
    db2_dy = (v3x - v1x) * inv
    db3_dy = -(v2x - v1x) * inv
    cols = []
    for grad_b2, grad_b3 in ((db2_dx, db3_dx), (db2_dy, db3_dy)):
        for e2, e3 in ((e2u, e3u), (e2v, e3v)):
            cols.append(e2 * grad_b2 + e3 * grad_b3)
    out = jnp.stack(cols, axis=1).astype(F32)  # (T, 4)
    return lax.optimization_barrier(out)


def uv_gradients(tri, screen, uvs):
    """Per-triangle screen-space uv gradients (T, 4):
    [du/dx, dv/dx, du/dy, dv/dy].

    The pipeline's barycentrics are the reference's cross-product
    formulation (rasteriser.wgsl:71-81) — AFFINE in pixel coords — so the
    interpolated uv has a CONSTANT gradient per triangle, computed exactly
    from the screen vertices: with uz the (constant) denominator,
    b2 = uy/uz, b3 = ux/uz, dux/dx = (v2y-v1y), duy/dx = -(v3y-v1y),
    dux/dy = -(v2x-v1x), duy/dy = (v3x-v1x). Degenerate triangles
    (uz ~ 0) get gradient 0 (=> mip level 0). Routed through the fenced
    component kernel (``_uv_gradients_comps``) so the rows are bitwise
    stable across every program that embeds them."""
    i1, i2, i3 = tri[:, 0], tri[:, 1], tri[:, 2]
    v1 = screen[i1]
    v2 = screen[i2]
    v3 = screen[i3]
    e2 = uvs[i2] - uvs[i1]  # (T, 2)
    e3 = uvs[i3] - uvs[i1]
    return _uv_gradients_comps(
        v1[:, 0], v1[:, 1], v2[:, 0], v2[:, 1], v3[:, 0], v3[:, 1],
        e2[:, 0], e2[:, 1], e3[:, 0], e3[:, 1],
    )


def uv_gradients_soa(screen_soa, uv_c):
    """``uv_gradients`` on corner-SoA inputs: ``screen_soa`` the vertex
    stage's 3-corner tuples of (T,) components, ``uv_c`` the (3, 2, T) uv
    corner array. Routed through the same fenced component kernel on the
    same f32 values, so the rows are bitwise-equal to ``uv_gradients``
    over the equivalent per-vertex arrays (the micro path's deferred tail
    builds exactly those via ``corner_vertex_arrays``)."""
    v1, v2, v3 = screen_soa
    return _uv_gradients_comps(
        v1[0], v1[1], v2[0], v2[1], v3[0], v3[1],
        uv_c[1][0] - uv_c[0][0], uv_c[1][1] - uv_c[0][1],
        uv_c[2][0] - uv_c[0][0], uv_c[2][1] - uv_c[0][1],
    )


def _sample_mip_px(texels, mip_table, tid, lod, mu, mv, spread, u, v, flag,
                   tex_filter: str, texels_packed=None, max_aniso: int = MAX_ANISO):
    """Shared per-pixel mip sampler over PER-TRIANGLE constants.

    ``tid``/``lod``/``mu``/``mv``/``spread`` are the ``mip_tri_rows``
    columns brought to pixel rank — either gathered by winner (deferred
    tail) or interpolated as flat columns by the fused kernels (TEXF_MIP
    G-buffer). Both routes deliver bitwise-identical values, and this is
    the ONE implementation of the taps, so fused == deferred bitwise by
    construction (hoisting the lod/footprint math to triangle rank in
    ``mip_tri_rows`` is what makes that possible: the same formulas at
    pixel rank compile into different fusion contexts, where XLA's FMA
    contraction is free to differ by 1 ULP between codegen regimes).

    Trilinear: two bilinear taps at the straddling levels, lerped by the
    LOD fraction. Anisotropic: ``max_aniso`` such taps spread along the
    major footprint axis (EXT_texture_filter_anisotropic model; a pixel
    with zero ``spread`` bitwise collapses every tap onto the center —
    summing max_aniso identical f32 taps then dividing by max_aniso is
    exact). All fixed-shape vector math — no data-dependent tap counts,
    so XLA fuses it like any other elementwise chain."""
    has = flag & (tid >= 0)
    t0 = jnp.where(has, tid, 0)
    safe_idx = lambda i: jnp.where(has, i, 0)
    fetch = _pool_fetcher(texels, texels_packed)

    L = mip_table.shape[1]
    l0 = lod.astype(jnp.int32)
    l1 = jnp.minimum(l0 + 1, L - 1)
    frac = (lod - l0.astype(F32))[..., None]
    row0 = mip_table[t0, l0]
    row1 = mip_table[t0, l1]

    def tap(ui, vi):
        fu = ui - jnp.floor(ui)
        fv = vi - jnp.floor(vi)
        return (_bilinear_level_fetch(fetch, row0[..., 0], row0[..., 1],
                                      row0[..., 2], fu, fv, safe_idx)
                * (F32(1.0) - frac)
                + _bilinear_level_fetch(fetch, row1[..., 0], row1[..., 1],
                                        row1[..., 2], fu, fv, safe_idx)
                * frac)

    if tex_filter == "trilinear":
        texel = tap(u, v)
    elif tex_filter == "anisotropic":
        acc = None
        for i in range(max_aniso):
            s = (F32((i + 0.5) / max_aniso) - F32(0.5)) * spread
            t = tap(u + mu * s, v + mv * s)
            acc = t if acc is None else acc + t
        texel = acc / F32(max_aniso)
    else:
        raise ValueError(
            f"mip sampler needs trilinear/anisotropic, not {tex_filter!r}"
        )
    return jnp.where(has[..., None], texel, F32(1.0)), has


def sample_atlas_mip(texels, mip_table, face_tex, best_tri, flag, uv,
                     guv_rows, tex_filter: str, max_aniso: int = MAX_ANISO):
    """Trilinear/anisotropic repeat-wrap sample of the mip-extended atlas.

    ``mip_table`` is (M, L, 3) i32 {offset, width, height} per level from
    ``io.textures.build_mips``; ``guv_rows`` the PER-TRIANGLE (T, 4)
    screen-space uv-gradient table (``common.uv_gradients``). The LOD /
    footprint terms are computed at triangle rank (``mip_tri_rows``) and
    gathered by winner — both because they ARE per-triangle constants
    (the pipeline's barycentrics are affine) and because triangle rank is
    the only formulation the fused kernels can carry, so sharing it keeps
    deferred and fused bitwise-equal. LOD follows the GL footprint rule:
    lod = log2(max(|d(uv)/dx * dims|, |d(uv)/dy * dims|)), clamped to
    [0, L-1]."""
    rows = mip_tri_rows(face_tex, mip_table, guv_rows, tex_filter,
                        max_aniso=max_aniso)
    r = rows[jnp.where(flag, best_tri, 0)]  # (H, W, 5)
    return _sample_mip_px(
        texels, mip_table, r[..., 0].astype(jnp.int32), r[..., 1],
        r[..., 2], r[..., 3], r[..., 4], uv[..., 0], uv[..., 1], flag,
        tex_filter, max_aniso=max_aniso,
    )


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
        texel, has = sample_atlas_mip(
            texels, tex_mips, face_tex.astype(jnp.int32), best_tri, flag,
            uv=gbuffer["uv"], guv_rows=guv, tex_filter=tex_filter,
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

# Mip-filtered (trilinear/anisotropic) fused-texture G-buffer (round 4):
# mip sampling needs per-level {off, w, h} rows from the mip table rather
# than one TextureInfo row, and its LOD/footprint terms are PER-TRIANGLE
# constants (guv is per-triangle and the pipeline's barycentrics are
# affine), so the kernel carries them as flat columns exactly like kd:
#   0: u      1: v          interpolated texcoord (as TEXF)
#   2: kd.r   3: kd.g   4: kd.b
#   5: tid    winner's texture slot as exact f32 int (-1 = untextured —
#             the mip tail indexes the i32 mip table, so no 2^24 offset
#             eligibility bound applies)
#   6: lod    clipped mip level (mip_tri_rows formula)
#   7: mu     8: mv        major-axis tap direction in uv units (aniso;
#                          zeros for trilinear)
#   9: spread              tap span 1 - 1/N (aniso; zero for trilinear)
#   10+2i / 11+2i           per-light diff/spec as TEXF
TEXF_MIP_BASE_CHANNELS = 10


def texf_channels(num_lights: int) -> int:
    return TEXF_BASE_CHANNELS + 2 * num_lights


def texf_mip_channels(num_lights: int) -> int:
    return TEXF_MIP_BASE_CHANNELS + 2 * num_lights


def mip_tri_rows(face_tex, mip_table, guv, tex_filter: str,
                 max_aniso: int = MAX_ANISO):
    """Per-triangle mip-sampling constants (T, 5) f32 for the fused-texture
    coefficient table: [tid, lod, mu, mv, spread].

    The mip samplers' LOD/footprint math at its NATURAL rank: every input
    (``guv`` row, texture dims) is constant per triangle, so this is the
    one place the formulas are evaluated — both the deferred tail
    (``sample_atlas_mip`` gathers these rows by winner) and the fused
    kernels (the rows ride the coefficient table as flat columns) sample
    via ``_sample_mip_px`` on these values, which keeps the two paths
    bitwise-equal by construction. Unlike ``tex_rows_f32`` these rows are
    per-FRAME (guv depends on the screen transform), so they are built
    inside the jitted frame.

    Fenced by optimization barriers for the same reason as
    ``_uv_gradients_comps``: the sqrt/log2 feeding chains are
    FMA-contraction bait, and the rows are embedded into very different
    programs (the fused kernels' table build vs the deferred tails) —
    barriers pin one codegen for all of them."""
    from jax import lax

    L = mip_table.shape[1]
    tid = face_tex.astype(jnp.int32)
    t0 = jnp.where(tid >= 0, tid, 0)
    base = mip_table[t0, 0]
    tw0 = base[:, 1].astype(F32)
    th0 = base[:, 2].astype(F32)
    guv, tw0, th0 = lax.optimization_barrier((guv, tw0, th0))
    gx_u = guv[:, 0] * tw0
    gx_v = guv[:, 1] * th0
    gy_u = guv[:, 2] * tw0
    gy_v = guv[:, 3] * th0
    zero = jnp.zeros_like(tw0)
    if tex_filter == "trilinear":
        rx = jnp.sqrt(gx_u * gx_u + gx_v * gx_v)
        ry = jnp.sqrt(gy_u * gy_u + gy_v * gy_v)
        rho = jnp.maximum(jnp.maximum(rx, ry), F32(1e-12))
        lod = jnp.clip(jnp.log2(rho), F32(0.0), F32(L - 1))
        mu = mv = spread = zero
    elif tex_filter == "anisotropic":
        px = jnp.sqrt(gx_u * gx_u + gx_v * gx_v)
        py = jnp.sqrt(gy_u * gy_u + gy_v * gy_v)
        pmax = jnp.maximum(jnp.maximum(px, py), F32(1e-12))
        pmin = jnp.maximum(jnp.minimum(px, py), F32(1e-12))
        n_eff = jnp.clip(pmax / pmin, F32(1.0), F32(max_aniso))
        lod = jnp.clip(jnp.log2(pmax / n_eff), F32(0.0), F32(L - 1))
        x_major = px >= py
        mu = jnp.where(x_major, guv[:, 0], guv[:, 2])
        mv = jnp.where(x_major, guv[:, 1], guv[:, 3])
        spread = F32(1.0) - F32(1.0) / n_eff
    else:
        raise ValueError(f"mip_tri_rows: not a mip filter: {tex_filter!r}")
    rows = jnp.stack([tid.astype(F32), lod, mu, mv, spread], axis=1)
    return lax.optimization_barrier(rows)


def _pool_fetcher(texels, texels_packed):
    """Texel fetch for the fused tails: a (P, 3) f32 row gather, or — when
    the u8-packed (P,) i32 pool is given — a 1-element gather plus exact
    unpack (io.textures.pack_pool_u8 verifies the f32 round-trip, so both
    fetches return bitwise-identical rows)."""
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
        return fetch
    return lambda idx: texels[idx]


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

    fetch = _pool_fetcher(texels, texels_packed)

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
    return _texf_shade_epilogue(kdt, flag, gbuf, TEXF_BASE_CHANNELS,
                                light_color, light_intensity)


def _texf_shade_epilogue(kdt, flag, gbuf, base, light_color,
                         light_intensity):
    """shade()'s material branch, with the per-light diff/spec scalars read
    from the G-buffer (channels ``base``..) instead of recomputed — the
    kernel computed them with the identical op chain."""
    final = F32(0.1) * kdt
    num_lights = (gbuf.shape[0] - base) // 2
    for li in range(num_lights):
        diff = gbuf[base + 2 * li]
        spec = gbuf[base + 2 * li + 1]
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


def fused_texture_tail_mip(gbuf, best_key, texels, mip_table, light_color,
                           light_intensity, tex_filter: str = "trilinear",
                           texels_packed=None, max_aniso: int = MAX_ANISO):
    """Shade a TEXF_MIP G-buffer: trilinear is two bilinear taps lerped by
    the carried LOD, anisotropic ``max_aniso`` such taps spread along the
    carried major axis — the SAME ``_sample_mip_px`` the deferred tail
    runs, on bitwise-equal inputs (the LOD/footprint terms are
    per-triangle constants hoisted by ``mip_tri_rows`` and interpolated
    by the kernel as flat columns), so the image equals the deferred
    tail's bitwise. ``texels`` must be the mip-extended pool and
    ``mip_table`` its (M, L, 3) i32 level table (io.textures.build_mips).
    The remaining per-pixel gathers are the texel taps plus two 3-element
    mip-table row reads — everything the deferred resolve chain gathered
    (vertex attributes, guv rows, face slots) arrives interpolated in
    ``gbuf``."""
    flag = best_key != DEPTH_CLEAR_BITS
    kd = jnp.stack([gbuf[2], gbuf[3], gbuf[4]], axis=-1)
    texel, has = _sample_mip_px(
        texels, mip_table, gbuf[5].astype(jnp.int32), gbuf[6], gbuf[7],
        gbuf[8], gbuf[9], gbuf[0], gbuf[1], flag, tex_filter,
        texels_packed=texels_packed, max_aniso=max_aniso,
    )
    kdt = jnp.where(has[..., None], kd * texel, kd)
    return _texf_shade_epilogue(kdt, flag, gbuf, TEXF_MIP_BASE_CHANNELS,
                                light_color, light_intensity)


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
