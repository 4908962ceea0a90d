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
    static_argnames=("width", "height", "tile_h", "tile_w", "chunk",
                     "tex_filter", "return_tri"),
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
    screen=None,
    world=None,
    tri_table=None,
    face_kd=None,  # (T, 3) f32 per-triangle diffuse (material extension)
    face_tex=None,  # (T,) i32 texture slot (texture extension)
    texels=None,  # (P, 3) f32 flat atlas pool (mip-extended for trilinear)
    tex_table=None,  # (M, 3) i32 {offset, width, height}
    tex_filter: str = "nearest",  # "nearest" | "bilinear" | "trilinear"
    tex_mips=None,  # (M, L, 3) i32 mip level table (trilinear only)
    # Also return the per-pixel winner triangle id (NO_TRI where uncovered).
    # Test/debug surface: the golden-parity tests use it to prove that
    # every >1-LSB pixel is a cross-library coverage/winner flip (1-ULP
    # class, XLA:CPU FMA contraction) rather than sampler drift.
    return_tri: bool = False,
):
    """Render one frame; returns ((H, W, 4) uint8 RGBA, depth_key (H,W) u32).

    ``face_kd`` (optional) enables the material extension: the winning
    triangle's diffuse color modulates ambient + diffuse in ``common.shade``
    (specular unmodulated); None keeps the reference formula bitwise.
    ``face_tex``/``texels``/``tex_table`` (optional, together) enable the
    texture extension: the winner's diffuse is further modulated by an
    atlas sample at the interpolated uv (``common.sample_atlas``). Not
    compatible with ``tri_table`` injection (the table carries no uv).

    ``screen``/``world``/``tri_table`` may be injected (normally they are
    computed here). Injection exists for the cross-backend bitwise parity
    tests: XLA:CPU contracts mul+add chains into FMAs unconditionally and
    picks arrangements per fusion context, so the *same source expression*
    can round 1 ULP apart in two different jit programs. Feeding both
    backends one precomputed coefficient table removes that (untestable)
    degree of freedom and pins the raster/shade logic bitwise; on TPU the
    fully fused programs agree bitwise without injection (the VPU does not
    contract)."""
    if tri.shape[0] == 0:
        rgba0, key0 = common.empty_frame(width, height)
        if return_tri:
            return rgba0, key0, jnp.full((height, width), NO_TRI, jnp.int32)
        return rgba0, key0
    if screen is not None and world is None:
        raise ValueError(
            "screen injection requires world (both come from the same "
            "vertex-stage evaluation)"
        )
    if screen is None:
        world, screen = common.vertex_stage(positions, view_proj, effect,
                                            width, height)
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

    if tri_table is not None:
        table_pad = jnp.concatenate(
            [tri_table.astype(F32),
             jnp.zeros((Tpad - tri_table.shape[0], tri_table.shape[1]), F32)]
        )

    def body(c, carry):
        best_key, best_tri = carry
        s = c * chunk
        bcast = lambda a: a[:, None, None]
        if tri_table is None:
            idx = jax.lax.dynamic_slice(tri_pad, (s, 0), (chunk, 3))  # (C,3)
            v1 = screen[idx[:, 0]]  # (C,4)
            v2 = screen[idx[:, 1]]
            v3 = screen[idx[:, 2]]

            # Same affine coefficient form + evaluation order as the Pallas
            # kernel (pallas_raster.build_tri_table / _raster_kernel), so
            # the two backends agree bitwise.
            co = common.barycentric_coefficients(
                v1[:, 0], v1[:, 1], v2[:, 0], v2[:, 1], v3[:, 0], v3[:, 1]
            )
            za, zb, zc = common.affine_combine(co, v1[:, 2], v2[:, 2], v3[:, 2])
            col = {
                0: co["a1"], 1: co["b1"], 2: co["c1"],
                3: co["a2"], 4: co["b2"], 5: co["c2"],
                6: co["a3"], 7: co["b3"], 8: co["c3"],
                9: za, 10: zb, 11: zc, 30: co["ax"], 31: co["ay"],
            }
            col = {k: bcast(v) for k, v in col.items()}
        else:
            rows = jax.lax.dynamic_slice(
                table_pad, (s, 0), (chunk, table_pad.shape[1])
            )
            col = {k: bcast(rows[:, k]) for k in
                   (0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 30, 31)}

        dx = px[None] - col[30]
        dy = py[None] - col[31]
        bc1 = col[0] + col[1] * dx + col[2] * dy
        bc2 = col[3] + col[4] * dx + col[5] * dy
        bc3 = col[6] + col[7] * dx + col[8] * dy

        mask = (bc1 >= threshold) & (bc2 >= threshold) & (bc3 >= threshold)
        min_bc = jnp.minimum(bc1, jnp.minimum(bc2, bc3))
        mask &= min_bc >= melt_threshold
        z = col[9] + col[10] * dx + col[11] * dy
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

    if tri_table is None:
        gbuffer = common.resolve_attributes(
            best_tri, tri.astype(jnp.int32), screen, world,
            normals.astype(F32), uvs.astype(F32), effect, width, height,
        )
    else:
        # Table-driven resolve: interpolate the 6 attribute channels from
        # the winner's precomputed affine rows (same values the Pallas
        # kernels evaluate).
        flag = best_tri != NO_TRI
        row = tri_table[jnp.where(flag, best_tri, 0)]  # (H, W, 32)
        dx = px - row[..., 30]
        dy = py - row[..., 31]

        def interp(ch):
            return (row[..., 12 + ch * 3] + row[..., 13 + ch * 3] * dx
                    + row[..., 14 + ch * 3] * dy)

        zero = F32(0.0)
        nrm = jnp.stack([interp(0), interp(1), interp(2)], axis=-1)
        wpos = jnp.stack([interp(3), interp(4), interp(5)], axis=-1)
        gbuffer = {
            "flag": flag,
            "uv": jnp.zeros(flag.shape + (2,), F32),
            "normal": jnp.where(flag[..., None], nrm, zero),
            "world_pos": jnp.where(flag[..., None], wpos, zero),
        }
    if face_kd is not None or face_tex is not None:
        flag = gbuffer["flag"]
        if face_kd is not None:
            kd = face_kd.astype(F32)[jnp.where(flag, best_tri, 0)]
            kd = jnp.where(flag[..., None], kd, F32(1.0))
        else:
            kd = jnp.ones(flag.shape + (3,), F32)
        if face_tex is not None:
            if tri_table is not None:
                raise ValueError(
                    "textures require the uv-carrying resolve "
                    "(tri_table injection unsupported)"
                )
            if tex_filter in ("trilinear", "anisotropic"):
                guv = common.uv_gradients(
                    tri.astype(jnp.int32), screen, uvs.astype(F32)
                )
                texel, has = common.sample_atlas_mip(
                    texels, tex_mips, face_tex.astype(jnp.int32), best_tri,
                    flag, gbuffer["uv"], guv, tex_filter,
                )
            else:
                texel, has = common.sample_atlas(
                    texels, tex_table, face_tex.astype(jnp.int32), best_tri,
                    flag, gbuffer["uv"], bilinear=(tex_filter == "bilinear"),
                )
            kd = jnp.where(has[..., None], kd * texel, kd)
        gbuffer["kd"] = kd
    elif tri_table is not None and tri_table.shape[1] > 32:
        # Material-extension table (35-wide, kd in 32:35) injected by the
        # cross-backend parity tests: read the winner's kd from the rows,
        # exactly as the Pallas kernel does.
        flag = gbuffer["flag"]
        kd = jnp.stack([row[..., 32], row[..., 33], row[..., 34]], axis=-1)
        gbuffer["kd"] = jnp.where(flag[..., None], kd, F32(1.0))
    rgba = common.shade(
        gbuffer, view_position, light_world_pos.astype(F32),
        light_color.astype(F32), light_intensity.astype(F32),
    )
    if return_tri:
        return rgba, best_key, best_tri
    return rgba, best_key


def render(mesh, camera_uniform, lights, effect, width, height,
           tile_h: int = 8, tile_w: int = 8, chunk: int = 8,
           tex_filter: str = "nearest"):
    """Convenience host-level entry: numpy/dataclass in, numpy RGBA out."""
    light_world_pos, light_color, light_intensity = lights
    tex_kwargs = {}
    if getattr(mesh, "has_textures", False):
        tex_kwargs = {
            "face_tex": jnp.asarray(mesh.face_tex),
            "texels": jnp.asarray(mesh.texels),
            "tex_table": jnp.asarray(mesh.tex_table),
            "tex_filter": tex_filter,
        }
        if tex_filter in ("trilinear", "anisotropic"):
            from compute_renderer_tpu.io.textures import trilinear_tex_arrays

            pool, mips = trilinear_tex_arrays(mesh.texels, mesh.tex_table)
            tex_kwargs["texels"] = jnp.asarray(pool)
            tex_kwargs["tex_mips"] = jnp.asarray(mips)
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
        face_kd=(jnp.asarray(mesh.face_kd)
                 if getattr(mesh, "face_kd", None) is not None else None),
        **tex_kwargs,
    )
    return np.asarray(rgba)
