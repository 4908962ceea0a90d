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

from compute_renderer_tpu.backends import (
    binning,
    common,
    pallas_micro,
    pallas_raster,
)
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
    """Framebuffer tile shape default: (16, 256).

    Round-5 bisect of the round-4 regression (scripts/bisect_r4_tile.py,
    v5e 2026-08-20, BATCHED-slope methodology — the driver's): the round-4
    flip to 8x128 was based on a SINGLE-dispatch sweep
    (scripts/ab_tile_sweep.py) whose ~0.4 ms link overhead swamped the
    real per-frame compute; under the batched lax.scan the ordering
    inverts at most scales. Measured slope ms/frame (16x256 vs 8x128):
    suzanne 1.3k tris 0.325 vs 0.560 (the whole BENCH_r04 regression),
    san-miguel-small 42k 3.66 vs 4.20 — but exterior 16k 1.42 vs 0.97,
    so the optimum is scene-dependent (no density statistic measured so
    far separates exterior from san-miguel: alive-median bbox and
    pairs-per-occupied-tile are near-identical). The engine therefore
    auto-tunes the shape per scene by TIMING the candidates once at
    calibration (Renderer._maybe_tune_tile); this static default is the
    batched-methodology winner for direct render_frame callers and
    non-TPU runs."""
    del num_triangles, width, height
    return 16, 256


# Candidate framebuffer tile shapes for the engine's measured per-scene
# auto-tune. Two shapes cover every scene measured so far within 5% of its
# best: 16x256 wins suzanne/san-miguel-class, 8x128 wins exterior-class
# (16x128 edged 8x128 by 5% on exterior but loses 19% on suzanne — not
# worth a third compile per scene).
TILE_CANDIDATES = ((16, 256), (8, 128))


@partial(
    jax.jit,
    static_argnames=("width", "height", "pair_cap", "interpret",
                     "effect_kind", "tex_filter", "use_pallas_front",
                     "tex_mode", "micro_unroll", "micro_tree",
                     "micro_prefetch", "micro_colmajor", "expand_geom"),
)
def render_frame_micro(
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
    pair_cap: int = 0,  # 0 -> heuristic
    interpret: bool | None = None,
    screen=None,
    world=None,
    tri_table=None,
    pos_soa=None,
    nrm_soa=None,
    effect_kind: int | None = None,  # static EFFECT_* code per scene config
    face_kd=None,  # (T, 3) f32 per-triangle diffuse (material extension)
    # Texture extension (together): the kernel runs its visibility-only
    # walk (winner PAIR index per pixel, mapped to a triangle through the
    # sorted pair list) and a plain-XLA tail resolves attributes from the
    # corner-SoA geometry, samples the flat atlas, and shades.
    face_tex=None,
    texels=None,
    tex_table=None,
    # "nearest" | "bilinear" | "trilinear" atlas filtering in the deferred
    # tail (extension; the reference never binds a sampler). Trilinear
    # needs ``texels`` = the mip-extended pool and ``tex_mips`` its
    # (M, L, 3) level table (io.textures.build_mips).
    tex_filter: str = "nearest",
    tex_mips=None,
    # Fused Pallas front end (pallas_front): vertex + setup + coefficient
    # table in ONE streaming kernel, replacing ~150 small XLA O(T) ops.
    # None = on exactly when Mosaic-compiled and eligible (no injected
    # geometry, no material/texture extension — those paths still need the
    # XLA chain's intermediates).
    use_pallas_front: bool | None = None,
    # Texture execution mode (round 4, see render_frame): "fused" runs the
    # micro kernel's texf epilogue for nearest/bilinear; "deferred" keeps
    # the vis walk + resolve/sample tail.
    tex_mode: str = "fused",
    texels_packed=None,
    # Precomputed per-mesh texf inputs (engine uploads them once, like
    # pos_soa/nrm_soa): uv corner-SoA (3, 2, T) and TextureInfo rows
    # (T, 3) f32. Derived from uvs/face_tex/tex_table when absent — but
    # that derivation is a 6M + 3M element gather PER FRAME at 1M tris
    # (~15 ms) for values that are static per mesh.
    uv_soa=None,
    tex_rows=None,
    # Micro-kernel walk levers (static; see pallas_micro.raster_shade_micro
    # — bitwise-identical output either way). Hardware A/B at 1M tris
    # (scripts/ab_raster2.py, v5e 2026-08-20): cross-tile chunk-0 prefetch
    # alone cut the walk 7.87 -> 6.84 ms (-13%) and is default-ON;
    # tree-merged unroll measured neutral-to-negative (tree2 7.97,
    # pf_tree2 7.50 vs pf 6.84) and stays off.
    micro_unroll: int = 2,
    micro_tree: bool = False,
    micro_prefetch: bool = True,
    # Column-major coefficient table/gather (build_pair_coeffs_cm): the
    # pair stream is bit-identical, the 128x32 lane transpose disappears.
    # Ignored when ``tri_table`` is injected (tests pass row-major).
    micro_colmajor: bool = False,
    # (bsz, ch) expansion-kernel geometry override for same-process
    # in-frame A/Bs (scripts/ab_frame_expand.py); None = the swept
    # pallas_expand defaults. Bit-identical output for any legal value.
    expand_geom: tuple | None = None,
):
    """Mega-scene path: 8x8-cell binning (ONE global sort) + the lane-packed
    micro kernel (pallas_micro). Coefficients stream from HBM, so there is
    no VMEM triangle-table budget and no chunked multi-pass — one launch
    renders any scene size. Returns the same contract as ``render_frame``.

    Geometry is processed as *corner SoA*: ``pos_soa``/``nrm_soa`` are
    (3 corners, 3 components, T) arrays (precomputed once per mesh by the
    engine; derived from ``tri`` when absent, e.g. in direct test calls).
    Transforming each corner independently — like the reference's
    per-corner geometry_pipeline (binning.wgsl:216-219) — and keeping
    every component a contiguous (T,) row makes the whole front-end
    (vertex stage, setup, coefficient table) streaming elementwise work
    with no gathers and no strided slices; both dominated the frame at
    ~1M triangles. The per-corner arithmetic is bit-identical to the
    per-vertex form (same elementwise op chain on the same values).

    Coverage outside a triangle's bbox (voxelize inflation / mirage warp)
    clips to the 8x8 cell-rectangle union — the reference's own tile
    granularity (raster_pass.rs:3), and exactly the xla backend with
    tile_h=tile_w=8 (see PARITY.md deviations).

    ``screen``/``world``/``tri_table`` may be injected for the bitwise
    parity tests (see xla.render_frame's docstring on XLA:CPU FMA
    contraction)."""
    if tri.shape[0] == 0:
        rgba, key = common.empty_frame(width, height)
        return rgba, key, jnp.zeros((2,), jnp.int32)

    if interpret is None:
        interpret = _use_interpret()

    T = int(tri.shape[0])
    ntx = (width + 127) // 128
    nty = (height + 7) // 8
    if pair_cap == 0:
        pair_cap = binning.default_pair_cap_micro(T, ntx * nty * 16)

    textured = face_tex is not None
    texf = False
    if textured and tex_mode == "fused":
        if tex_filter in ("nearest", "bilinear"):
            texf = True
        elif tex_mips is not None:
            # Trilinear/anisotropic fused texturing (round 4): the table
            # carries common.mip_tri_rows constants instead of the
            # TextureInfo row and the tail is fused_texture_tail_mip.
            texf = pallas_micro.TEXF_MIP
    vis = textured and not texf

    use_front = use_pallas_front
    if use_front is None:
        # Round 4: the fused front also emits the material (35-row) and
        # fused-texture (44-row) tables, so only the deferred-vis mode —
        # whose tail needs the XLA chain's screen/world intermediates —
        # still disqualifies it. TEXF_MIP also disqualifies: its mip rows
        # derive from per-frame uv gradients over the screen vertices,
        # which the fused front never materializes.
        use_front = (not interpret and screen is None and tri_table is None
                     and not vis and texf != pallas_micro.TEXF_MIP)
    elif use_front:
        # Explicit override: refuse the combinations the auto rule
        # disqualifies instead of silently mis-shading. TEXF_MIP reads the
        # table's rows 41:46 as [tid,lod,mu,mv,spread] but the front emits
        # the 44-wide TextureInfo layout there (garbage image); vis mode's
        # deferred tail needs the XLA chain's screen/world intermediates,
        # which the front never materializes (ADVICE r4).
        if texf == pallas_micro.TEXF_MIP:
            raise ValueError(
                "use_pallas_front=True is incompatible with fused "
                "trilinear/anisotropic texturing (TEXF_MIP): the fused "
                "front emits the 44-column TextureInfo table, not the "
                "per-frame mip rows. Use tex_mode='deferred' or drop the "
                "override."
            )
        if vis:
            raise ValueError(
                "use_pallas_front=True is incompatible with deferred "
                "(vis-mode) texturing: the tail needs the XLA chain's "
                "screen/world intermediates, which the fused front never "
                "materializes. Drop the override or use tex_mode='fused'."
            )
    # Column-major tables only when WE build the table (injected tables are
    # row-major by contract).
    micro_colmajor = micro_colmajor and tri_table is None
    if use_front:
        # Fused front end: one Pallas pass produces the cover meta (fed
        # straight to the pair-expansion kernel) and the coefficient rows
        # (packed to the c64 table) — the XLA vertex/setup/table chain
        # below never materializes.
        from compute_renderer_tpu.backends import pallas_front

        if pos_soa is None:
            pos_soa = positions[tri].transpose(1, 2, 0)
        if nrm_soa is None:
            nrm_soa = normals[tri].transpose(1, 2, 0)
        front_kw = {}
        if texf:
            front_kw = {
                "kd_rows": face_kd,
                "uv_soa": (uvs.astype(F32)[tri].transpose(1, 2, 0)
                           if uv_soa is None else uv_soa),
                "tex_rows": (common.tex_rows_f32(face_tex, tex_table)
                             if tex_rows is None else tex_rows),
            }
        elif face_kd is not None:
            front_kw = {"kd_rows": face_kd}
        coeff, meta = pallas_front.front_end(
            pos_soa, nrm_soa, view_proj, effect,
            width=width, height=height, interpret=interpret, **front_kw,
        )
        bins = binning.bin_cells_sort_meta(
            meta[3], meta[2], meta[0], meta[1], ntx, nty, pair_cap,
            interpret=interpret, expand_geom=expand_geom,
        )
        tri_table = (pallas_front.pack_table_c64_cm(coeff)
                     if micro_colmajor else
                     pallas_front.pack_table_c64(coeff))
        screen_soa = world_soa = None
    else:
        if screen is not None:
            if world is None:
                raise ValueError(
                    "screen injection requires world (both come from the "
                    "same vertex-stage evaluation)"
                )
            sc = screen[tri]  # (T, 3, 4)
            wc = world[tri].astype(F32)
            screen_soa = tuple(
                tuple(sc[:, k, c] for c in range(4)) for k in range(3)
            )
            world_soa = tuple(
                tuple(wc[:, k, c] for c in range(3)) for k in range(3)
            )
        else:
            if pos_soa is None:
                pos_soa = positions[tri].transpose(1, 2, 0)
            world_soa, screen_soa = common.vertex_stage_soa(
                pos_soa, view_proj, effect, width, height
            )
        # Cell-granularity setup: tile ranges ARE cell ranges at (8, 8).
        setup = common.triangle_setup_soa(screen_soa, effect, width,
                                          height, 8, 8)
        bins = binning.bin_cells_sort(setup, ntx, nty, pair_cap,
                                      interpret=interpret,
                                      expand_geom=expand_geom)
    nrm_tuples = None
    if tri_table is None:
        if nrm_soa is None:
            nrm_soa = normals[tri].transpose(1, 2, 0)
        nrm_tuples = tuple(
            tuple(nrm_soa[k, c].astype(F32) for c in range(3))
            for k in range(3)
        )
        # complex64-packed table: halves the pair-order gather's element
        # count (the frame's most expensive op at mega scale) — bit-exact.
        # Visibility mode only reads the coverage/depth columns, so the
        # table stays 16-wide (kd applies in the deferred tail instead).
        # The fused-texture (texf) table adds uv/kd/TextureInfo columns.
        if texf:
            uv_c = (uvs.astype(F32)[tri].transpose(1, 2, 0)
                    if uv_soa is None else uv_soa)  # (3, 2, T)
            if texf == pallas_micro.TEXF_MIP:
                # Per-FRAME mip constants (lod depends on the screen
                # transform): per-triangle uv gradients over the same
                # corner values the deferred tail differentiates.
                tex_block = common.mip_tri_rows(
                    face_tex, tex_mips,
                    common.uv_gradients_soa(screen_soa, uv_c), tex_filter,
                )
            else:
                tex_block = (common.tex_rows_f32(face_tex, tex_table)
                             if tex_rows is None else tex_rows)
            build = (pallas_micro.build_tri_table_c64_cm if micro_colmajor
                     else pallas_micro.build_tri_table_c64)
            tri_table = build(
                screen_soa, nrm_tuples, world_soa, face_kd=face_kd,
                uv_soa=tuple(
                    tuple(uv_c[k][c] for c in range(2)) for k in range(3)
                ),
                tex_rows=tex_block,
            )
        else:
            build = (pallas_micro.build_tri_table_c64_cm if micro_colmajor
                     else pallas_micro.build_tri_table_c64)
            tri_table = build(
                screen_soa, nrm_tuples, world_soa,
                face_kd=None if vis else face_kd,
            )
    # Static: material tables are wider than the 32-coefficient base form
    # ((T, 35) f32 or (T, 18) c64) and select the 40-row stream + the
    # modulated shading epilogue (texf dispatches explicitly, not by
    # shape). Column-major tables carry the width on axis 0.
    coeff_width = (tri_table.shape[0] if micro_colmajor
                   else tri_table.shape[1])
    mat = (not texf) and coeff_width > (
        16 if jnp.iscomplexobj(tri_table) else 32)
    pair_coeffs = (
        pallas_micro.build_pair_coeffs_cm(tri_table, bins["pair_tri"])
        if micro_colmajor else
        pallas_micro.build_pair_coeffs(tri_table, bins["pair_tri"])
    )
    rgba_packed, best_key_p = pallas_micro.raster_shade_micro(
        pair_coeffs,
        bins["seg_start"],
        bins["seg_count"],
        bins["win_start"],
        bins["tile_count"],
        effect,
        view_position.astype(F32),
        light_world_pos.astype(F32),
        light_color.astype(F32),
        light_intensity.astype(F32),
        height_padded=nty * 8,
        width_padded=ntx * 128,
        interpret=interpret,
        effect_kind=effect_kind,
        mat=mat,
        vis=vis,
        texf=texf,
        unroll=micro_unroll,
        tree=micro_tree,
        prefetch=micro_prefetch,
    )
    best_key = best_key_p[:height, :width]
    overflow = jnp.stack([bins["pair_needed"], bins["tile_needed"]])
    if texf == pallas_micro.TEXF_MIP:
        rgba = common.fused_texture_tail_mip(
            rgba_packed[:, :height, :width], best_key, texels, tex_mips,
            light_color.astype(F32), light_intensity.astype(F32),
            tex_filter=tex_filter, texels_packed=texels_packed,
        )
        return rgba, best_key, overflow
    if texf:
        rgba = common.fused_texture_tail(
            rgba_packed[:, :height, :width], best_key, texels,
            light_color.astype(F32), light_intensity.astype(F32),
            tex_filter=tex_filter, texels_packed=texels_packed,
        )
        return rgba, best_key, overflow
    if not vis:
        rgba = pallas_raster.unpack_rgba(rgba_packed)[:height, :width]
        return rgba, best_key, overflow

    if nrm_tuples is None:
        if nrm_soa is None:
            nrm_soa = normals[tri].transpose(1, 2, 0)
        nrm_tuples = tuple(
            tuple(nrm_soa[k, c].astype(F32) for c in range(3))
            for k in range(3)
        )
    rgba = micro_vis_tail(
        rgba_packed[:height, :width], best_key, bins["pair_tri"],
        screen_soa, world_soa, nrm_tuples, uvs.astype(F32)[tri], effect,
        width, height,
        face_kd, face_tex, texels, tex_table,
        view_position, light_world_pos, light_color, light_intensity,
        tex_filter=tex_filter, tex_mips=tex_mips,
    )
    return rgba, best_key, overflow


def corner_vertex_arrays(screen_soa, world_soa, nrm_tuples, uv_corners):
    """Virtual per-corner vertex arrays for the micro path's deferred-
    texturing tail: vertex id 3t+k = corner k of triangle t, built from the
    same corner-SoA values the kernel's coefficients came from — identical
    numbers, so ``common.resolve_attributes`` over them matches the
    tile/xla tails wherever coverage granularity agrees. ``uv_corners`` is
    the pre-gathered (T, 3, 2) texcoord block (``uvs[tri]``).

    Returns (scr_v (3T,4), wld_v (3T,3), nrm_v (3T,3), uv_v (3T,2),
    tri_v (T,3))."""
    T = uv_corners.shape[0]
    scr_v = jnp.stack(
        [jnp.stack([screen_soa[k][c] for c in range(4)], axis=-1)
         for k in range(3)], axis=1,
    ).reshape(3 * T, 4)
    wld_v = jnp.stack(
        [jnp.stack([world_soa[k][c] for c in range(3)], axis=-1)
         for k in range(3)], axis=1,
    ).reshape(3 * T, 3)
    nrm_v = jnp.stack(
        [jnp.stack([nrm_tuples[k][c] for c in range(3)], axis=-1)
         for k in range(3)], axis=1,
    ).reshape(3 * T, 3)
    uv_v = uv_corners.astype(F32).reshape(3 * T, 2)
    tri_v = jnp.arange(3 * T, dtype=jnp.int32).reshape(T, 3)
    return scr_v, wld_v, nrm_v, uv_v, tri_v


def micro_vis_tail(
    best_pair, best_key, pair_tri,
    screen_soa, world_soa, nrm_tuples, uv_corners, effect,
    width: int, height: int,
    face_kd, face_tex, texels, tex_table,
    view_position, light_world_pos, light_color, light_intensity,
    x_offset=0, y_offset=0, corners=None, tex_filter: str = "nearest",
    tex_mips=None,
):
    """Deferred texturing tail of the micro path (plain XLA). The kernel
    reports the winner's PAIR index per pixel; the sorted pair list maps it
    to a triangle, ``common.resolve_attributes`` interpolates attributes
    from the virtual corner arrays, and ``common.textured_shade`` samples
    the atlas and shades. ``x/y_offset`` give the window's global pixel
    coordinates when shading a sharded stripe; ``corners`` injects prebuilt
    ``corner_vertex_arrays`` output (the sort-middle path assembles them by
    all_gather of per-slice builds, in padded-global triangle order —
    matching its pair ids) in which case the SoA/uv args are unused."""
    flag = best_key != common.DEPTH_CLEAR_BITS
    pair_safe = jnp.where(flag, best_pair, 0)
    best_tri = jnp.where(flag, pair_tri[pair_safe], common.NO_TRI)
    scr_v, wld_v, nrm_v, uv_v, tri_v = corners if corners is not None else (
        corner_vertex_arrays(screen_soa, world_soa, nrm_tuples, uv_corners)
    )
    gbuffer = common.resolve_attributes(
        best_tri, tri_v, scr_v, wld_v, nrm_v, uv_v, effect, width, height,
        x_offset, y_offset,
    )
    guv = (common.uv_gradients(tri_v, scr_v, uv_v)
           if tex_filter in ("trilinear", "anisotropic") else None)
    return common.textured_shade(
        gbuffer, best_tri, face_kd, face_tex, texels, tex_table,
        view_position, light_world_pos, light_color, light_intensity,
        tex_filter=tex_filter, tex_mips=tex_mips, guv=guv,
    )


def texf_eligible(tex_table) -> bool:
    """Fused texturing carries TextureInfo offsets as f32 constants in the
    coefficient table — exact only below 2^24 texels (64 MB of atlas).
    Larger atlases fall back to the deferred tail."""
    t = np.asarray(tex_table)
    return t.size == 0 or int(t[:, 0].max()) < (1 << 24)


def resolve_path(path: str, num_triangles: int, tri_chunk: int = 0) -> str:
    """'auto' picks the lane-packed micro path exactly where the tile path
    would have to chunk its VMEM triangle table (and pay one sort per
    chunk): above ~98k triangles."""
    if path != "auto":
        return path
    if tri_chunk == 0:
        tri_chunk = MAX_TRI_TABLE_BYTES // (pallas_raster.TRI_TABLE_WIDTH * 4)
    return "micro" if num_triangles > tri_chunk else "tile"


@partial(
    jax.jit,
    static_argnames=("width", "height", "tile_h", "tile_w", "pair_cap",
                     "tile_cap", "interpret", "tri_chunk", "path",
                     "worklist", "effect_kind", "tex_filter", "tex_mode",
                     "use_pallas_front"),
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
    path: str = "auto",  # "auto" | "tile" | "micro"
    pos_soa=None,  # (3, 3, T) corner-SoA positions (micro path; optional)
    nrm_soa=None,  # (3, 3, T) corner-SoA normals (micro path; optional)
    # Occupied-tile work-list kernel (tile path). Default on: measured
    # 3.3x over the full grid at Suzanne scale (0.39 vs 1.27 ms/frame
    # batched on v5e), bitwise-identical output.
    worklist: bool = True,
    # Static EFFECT_* code per scene config: lets the micro kernel compile
    # the mirage sample warp out of non-mirage scenes. None = dynamic.
    effect_kind: int | None = None,
    # Material extension: (T, 3) f32 per-triangle diffuse (Mesh.face_kd).
    # Both paths support it (the micro path widens its coefficient stream
    # to 40-row superblocks); None keeps every default path bitwise
    # unchanged.
    face_kd=None,
    # Texture extension (Mesh.face_tex/texels/tex_table, together): the
    # kernel runs its visibility-only walk (winner id per pixel) and a
    # plain-XLA tail resolves attributes, samples the flat atlas at the
    # interpolated uv, and shades — deferred texturing. Both paths: the
    # tile kernel reports winner TRIANGLE ids (chunking composes), the
    # micro kernel winner PAIR ids mapped through the sorted pair list.
    face_tex=None,
    texels=None,
    tex_table=None,
    # "nearest" | "bilinear" | "trilinear" atlas filtering in the deferred
    # tail (trilinear: texels = mip-extended pool, tex_mips = level table).
    tex_filter: str = "nearest",
    tex_mips=None,
    # Texture execution mode (round 4): "fused" (default) runs the kernels'
    # texf epilogue for nearest/bilinear — uv/kd/TextureInfo/diff/spec all
    # interpolated in-kernel, the XLA tail reduced to the texel fetch
    # (common.fused_texture_tail; bitwise-equal image to the deferred
    # tail). "deferred" keeps the round-3 vis-walk + resolve/sample tail
    # (also taken automatically for trilinear/anisotropic, which need the
    # mip machinery). Requires atlas offsets < 2^24 (texf_eligible).
    tex_mode: str = "fused",
    # Optional (P,) i32 u8-packed pool (io.textures.pack_pool_u8): 1 gather
    # element per tap instead of a 3-element row; bitwise-identical (but
    # measured SLOWER on v5e — see the note in ``render``).
    texels_packed=None,
    # Precomputed per-mesh texf inputs (see render_frame_micro).
    uv_soa=None,
    tex_rows=None,
    # Fused Pallas front end on the TILE path too (round 5): vertex +
    # setup + coefficient table in one kernel at TILE granularity
    # (front_end tile_h/tile_w), the binning consuming the meta rows via
    # binning.setup_from_meta. None = auto (on exactly when Mosaic-
    # compiled, single-chunk, and extension-free); forwarded to the micro
    # path unchanged.
    use_pallas_front: bool | None = None,
):
    """Render one frame; returns ((H,W,4) u8 RGBA, depth_key (H,W) u32,
    overflow (2,) i32 = [pair_cap_needed, tile_cap_needed] where 0 means
    "within capacity" — nonzero entries are the capacity a retry must
    allocate (truthiness matches the old bool contract; the micro path has
    no tile-side cap, so its second entry is always 0).

    Dispatch: scenes up to the VMEM triangle-table budget run the fused
    tile kernel; larger scenes take the lane-packed micro path
    (``render_frame_micro``) — one global sort, coefficients streamed from
    HBM, 16 triangles per vector op. ``path`` overrides the heuristic.

    On the tile path, scenes whose triangle table exceeds the VMEM budget
    (only reachable by forcing ``path="tile"``) render in triangle chunks
    merged by depth key — bit-identical to a single pass (shading commutes
    with the merge; strict < preserves the lowest-index tie-break)."""
    if tri.shape[0] == 0:
        rgba, key = common.empty_frame(width, height)
        return rgba, key, jnp.zeros((2,), jnp.int32)

    if interpret is None:
        interpret = _use_interpret()

    T = int(tri.shape[0])
    if resolve_path(path, T, tri_chunk) == "micro":
        return render_frame_micro(
            positions, normals, uvs, tri, view_proj, view_position,
            light_world_pos, light_color, light_intensity, effect,
            width=width, height=height, pair_cap=pair_cap,
            interpret=interpret, pos_soa=pos_soa, nrm_soa=nrm_soa,
            effect_kind=effect_kind, face_kd=face_kd,
            face_tex=face_tex, texels=texels, tex_table=tex_table,
            tex_filter=tex_filter, tex_mips=tex_mips,
            tex_mode=tex_mode, texels_packed=texels_packed,
            uv_soa=uv_soa, tex_rows=tex_rows,
            use_pallas_front=use_pallas_front,
        )
    textured = face_tex is not None
    texf = False
    if textured and tex_mode == "fused":
        if tex_filter in ("nearest", "bilinear"):
            texf = True
        elif tex_mips is not None:
            # Trilinear/anisotropic fused texturing (round 4): mip
            # constants ride the table, fused_texture_tail_mip shades.
            texf = pallas_micro.TEXF_MIP
    vis = textured and not texf
    if tri_chunk == 0:
        # Size chunks for the table that will actually be built: the
        # material table is MAT_TRI_TABLE_WIDTH (35) columns, not 32, and
        # the fused-texture table TEX_TRI_TABLE_WIDTH (44) — sizing by 32
        # would overshoot the VMEM budget on chunked extended scenes.
        if texf == pallas_micro.TEXF_MIP:
            table_width = pallas_raster.TEX_MIP_TRI_TABLE_WIDTH
        elif texf:
            table_width = pallas_raster.TEX_TRI_TABLE_WIDTH
        elif face_kd is not None and face_tex is None:
            table_width = pallas_raster.MAT_TRI_TABLE_WIDTH
        else:
            table_width = pallas_raster.TRI_TABLE_WIDTH
        tri_chunk = MAX_TRI_TABLE_BYTES // (table_width * 4)
    if tile_h == 0 or tile_w == 0:
        tile_h, tile_w = choose_tile(T, width, height)

    ntx = (width + tile_w - 1) // tile_w
    nty = (height + tile_h - 1) // tile_h

    num_chunks_pre = (T + tri_chunk - 1) // tri_chunk
    use_front_t = use_pallas_front
    if use_front_t is None:
        # Auto rule (mirrors the micro path's): the front cannot feed the
        # deferred-vis tail (needs screen/world intermediates), the mip
        # table (per-frame uv gradients over screen vertices), or the
        # chunked multi-pass (the front emits the FULL table; chunk-local
        # ids would need re-slicing) — and interpret-mode tests measure
        # nothing, so keep their compile graphs on the XLA chain.
        use_front_t = (not interpret and not textured and face_kd is None
                       and num_chunks_pre == 1)
    elif use_front_t and (textured or face_kd is not None
                          or num_chunks_pre > 1):
        raise ValueError(
            "use_pallas_front=True on the tile path supports only the "
            "single-chunk extension-free configuration"
        )

    front_table = None
    if use_front_t:
        # Stages 1+2 fused (round 5): ONE Pallas pass emits the
        # coefficient rows (the tile kernel's (T, 32) table, transposed)
        # and the cover meta at TILE granularity; binning consumes the
        # meta via setup_from_meta. Bit-identical to the XLA chain on TPU
        # (tests/test_front_kernel.py) — at sub-ms scenes the ~150-op
        # vertex/setup chain is dispatch-bound, not bandwidth-bound.
        from compute_renderer_tpu.backends import pallas_front

        ps = (positions[tri].transpose(1, 2, 0)
              if pos_soa is None else pos_soa)
        ns = (normals[tri].transpose(1, 2, 0)
              if nrm_soa is None else nrm_soa)
        coeff, meta = pallas_front.front_end(
            ps, ns, view_proj, effect, width=width, height=height,
            tile_h=tile_h, tile_w=tile_w, interpret=interpret,
        )
        setup = binning.setup_from_meta(meta)
        front_table = coeff.T
        world = screen = None
    else:
        # Stage 1: vertex processing (one batched transform; the reference
        # re-transforms shared vertices per triangle-slot,
        # binning.wgsl:216-219).
        world, screen = common.vertex_stage(positions, view_proj, effect,
                                            width, height)

        # Stage 2: triangle setup (full scene, once).
        setup = common.triangle_setup(screen, tri, effect, width, height,
                                      tile_h, tile_w)

    uvs32 = uvs.astype(F32)
    normals32 = normals.astype(F32)
    num_chunks = (T + tri_chunk - 1) // tri_chunk

    if texf == pallas_micro.TEXF_MIP:
        # Per-frame mip constants (lod depends on the screen transform) —
        # the same uv_gradients call the deferred tail makes, hoisted to
        # the per-triangle table (bitwise contract: common.mip_tri_rows).
        tex_rows = common.mip_tri_rows(
            face_tex, tex_mips,
            common.uv_gradients(tri.astype(jnp.int32), screen, uvs32),
            tex_filter,
        )
    elif texf and tex_rows is None:
        tex_rows = common.tex_rows_f32(face_tex, tex_table)
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
        # Visibility mode only reads the coverage/depth rows, so the table
        # stays 32-wide (kd applies in the deferred tail instead).
        if front_table is not None:
            tri_table = front_table
        else:
            tri_table = pallas_raster.build_tri_table(
                screen, tri[c0:c1], uvs32, normals32, world,
                face_kd=(None if face_kd is None or vis
                         else face_kd[c0:c1]),
                tex_rows=None if tex_rows is None else tex_rows[c0:c1],
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
            worklist=worklist,
            vis=vis,
            texf=texf,
        )
        if vis:
            # Chunk-local winner ids -> global triangle ids before merging.
            rgba_c = jnp.where(rgba_c >= 0, rgba_c + c0, -1)
        chunk_flags = jnp.stack([bins["pair_needed"], bins["tile_needed"]])
        if rgba_packed is None:
            rgba_packed, best_key_p, overflow = rgba_c, key_c, chunk_flags
        else:
            win = key_c < best_key_p
            # texf chunk merge: the (C,Hp,Wp) G-buffer merges channel-wise
            # by the same depth-key winner mask.
            rgba_packed = jnp.where(win[None] if texf else win,
                                    rgba_c, rgba_packed)
            best_key_p = jnp.where(win, key_c, best_key_p)
            overflow = jnp.maximum(overflow, chunk_flags)

    best_key = best_key_p[:height, :width]
    if texf == pallas_micro.TEXF_MIP:
        rgba = common.fused_texture_tail_mip(
            rgba_packed[:, :height, :width], best_key, texels, tex_mips,
            light_color.astype(F32), light_intensity.astype(F32),
            tex_filter=tex_filter, texels_packed=texels_packed,
        )
        return rgba, best_key, overflow
    if texf:
        rgba = common.fused_texture_tail(
            rgba_packed[:, :height, :width], best_key, texels,
            light_color.astype(F32), light_intensity.astype(F32),
            tex_filter=tex_filter, texels_packed=texels_packed,
        )
        return rgba, best_key, overflow
    if not vis:
        rgba = pallas_raster.unpack_rgba(rgba_packed)[:height, :width]
        return rgba, best_key, overflow

    # Deferred texturing tail (plain XLA — one gather-heavy pixel pass,
    # exactly the work the reference's fragment pass would do if its
    # TextureInfo plumbing were wired): resolve the winner's attributes,
    # sample the flat atlas at the interpolated uv, modulate kd, shade.
    best_tri = rgba_packed[:height, :width]
    gbuffer = common.resolve_attributes(
        best_tri, tri.astype(jnp.int32), screen, world, normals32, uvs32,
        effect, width, height,
    )
    guv = (common.uv_gradients(tri.astype(jnp.int32), screen, uvs32)
           if tex_filter in ("trilinear", "anisotropic") else None)
    rgba = common.textured_shade(
        gbuffer, best_tri, face_kd, face_tex, texels, tex_table,
        view_position, light_world_pos, light_color, light_intensity,
        tex_filter=tex_filter, tex_mips=tex_mips, guv=guv,
    )
    return rgba, best_key, overflow


def default_caps(path: str, num_triangles: int, width: int, height: int,
                 tile_h: int = 0, tile_w: int = 0) -> dict:
    """Default binning capacities for a resolved path — the ONE place the
    heuristics are combined (Renderer._grow_caps, tpu.render, and
    parallel.sharding.render_sharded all grow from these, and must agree
    on the starting point or retry growth computes from the wrong base).

    Returns {"pair_cap", "tile_cap", "tile_h", "tile_w"}; tile_cap is None
    for the micro path (no per-tile cap — windows stream from HBM)."""
    T = max(num_triangles, 1)
    if path == "micro":
        ntx_t = (width + 127) // 128
        nty_t = (height + 7) // 8
        return {
            "pair_cap": binning.default_pair_cap_micro(T, ntx_t * nty_t * 16),
            "tile_cap": None,
            "tile_h": 8,
            "tile_w": 128,
        }
    if tile_h == 0 or tile_w == 0:
        tile_h, tile_w = choose_tile(T, width, height)
    ntx = (width + tile_w - 1) // tile_w
    nty = (height + tile_h - 1) // tile_h
    return {
        "pair_cap": binning.default_pair_cap(T, ntx * nty),
        "tile_cap": min(
            binning.default_tile_cap(T, width, height, tile_h, tile_w),
            MAX_TILE_CAP,
        ),
        "tile_h": tile_h,
        "tile_w": tile_w,
    }


def render(mesh, camera_uniform, lights, effect, width, height,
           tile_h: int = 0, tile_w: int = 0, pair_cap: int = 0,
           tile_cap: int = 0, max_retries: int = 3, path: str = "auto",
           worklist: bool = True, tex_filter: str = "nearest",
           tex_mode: str = "fused"):
    """Host-level entry with automatic capacity retry: if the binning
    capacities overflow (detected, unlike the reference's silent OOB), double
    them and re-render."""
    light_world_pos, light_color, light_intensity = lights
    T = max(mesh.indices.shape[0] // 3, 1)
    face_kd = getattr(mesh, "face_kd", None)
    textured = bool(getattr(mesh, "has_textures", False))
    requested_path = path
    path = resolve_path(path, T)
    caps = default_caps(path, T, width, height, tile_h, tile_w)
    pc = pair_cap or caps["pair_cap"]
    if path != "micro":
        tile_h, tile_w = caps["tile_h"], caps["tile_w"]
        tc = tile_cap or caps["tile_cap"]

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
    micro_kwargs = {}
    if path == "micro":
        micro_kwargs = {
            "pos_soa": args[0][args[3]].transpose(1, 2, 0),
            "nrm_soa": args[1][args[3]].transpose(1, 2, 0),
        }
        mip = tex_filter in ("trilinear", "anisotropic")
        if textured and tex_mode == "fused" \
                and (mip or texf_eligible(mesh.tex_table)):
            # texf inputs are static per mesh: precompute them once like
            # pos_soa/nrm_soa (the in-jit derivation is a 9M-element
            # gather per frame at 1M tris). The mip modes' tex_rows are
            # per-FRAME (lod follows the screen transform) and are built
            # inside the jitted frame instead — only uv_soa precomputes.
            micro_kwargs["uv_soa"] = args[2].astype(F32)[
                args[3]].transpose(1, 2, 0)
            if not mip:
                micro_kwargs["tex_rows"] = common.tex_rows_f32(
                    jnp.asarray(mesh.face_tex),
                    jnp.asarray(mesh.tex_table))
    tex_kwargs = {}
    if textured:
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
        elif not (tex_mode == "fused" and texf_eligible(mesh.tex_table)):
            tex_kwargs["tex_mode"] = "deferred"
        # NOTE: the u8-packed pool (pack_pool_u8 / texels_packed) is NOT
        # used by default: measured on v5e (tex_fused A/B, 2026-08-19) the
        # flat 1-element gather is ~2x SLOWER than the (P, 3) row gather
        # (11.1 vs 6.5 ms at 36k tris) — XLA:TPU vectorizes row gathers
        # better than same-count flat gathers. The path stays available
        # (texels_packed=...) and bitwise-verified for future backends.
    for _ in range(max_retries):
        if path == "micro":
            rgba, _, overflow = render_frame_micro(
                *args, width=width, height=height, pair_cap=pc,
                face_kd=None if face_kd is None else jnp.asarray(face_kd),
                **micro_kwargs, **tex_kwargs,
            )
        else:
            rgba, _, overflow = render_frame(
                *args, width=width, height=height, tile_h=tile_h,
                tile_w=tile_w, pair_cap=pc, tile_cap=tc, path="tile",
                worklist=worklist,
                face_kd=None if face_kd is None else jnp.asarray(face_kd),
                **tex_kwargs,
            )
        flags = np.asarray(overflow)
        if not flags.any():
            return np.asarray(rgba)
        # Flags carry NEEDED capacities — jump straight to a sufficient
        # size (each retry is a recompile; minutes at mega scale).
        if flags[1] > MAX_TILE_CAP and path != "micro" \
                and requested_path == "auto":
            # Density beyond the SMEM window at any legal tile_cap (a
            # mid-size mesh filling few tiles — e.g. a 36k-tri scene at a
            # thumbnail resolution). resolve_path's triangle-count split
            # can't see screen-space density, so 'auto' falls back here to
            # the micro path, whose pair windows stream from HBM with no
            # per-tile ceiling. An explicit path="tile" still errors below.
            path = "micro"
            pc = pair_cap or default_caps(
                "micro", T, width, height)["pair_cap"]
            micro_kwargs = {
                "pos_soa": args[0][args[3]].transpose(1, 2, 0),
                "nrm_soa": args[1][args[3]].transpose(1, 2, 0),
            }
            continue
        if flags[0]:
            pc = grow_pair_cap(pc, int(flags[0]))
        if flags[1] and path != "micro":
            tc = grow_tile_cap(tc, int(flags[1]), tile_h, tile_w)
    raise RuntimeError(
        f"binning capacity overflow after {max_retries} retries "
        f"(path={path}, pair_cap={pc})"
    )


def grow_pair_cap(cur: int, needed: int) -> int:
    """Next pair_cap given the binning pass's reported need: the exact need
    plus 12.5% motion slack, 1024-aligned, never shrinking."""
    return max((needed + needed // 8 + 1023) // 1024 * 1024, cur)


def grow_tile_cap(cur: int, needed: int, tile_h: int, tile_w: int) -> int:
    """Next tile-path tile_cap for a reported need (8-aligned, 12.5% slack);
    clear error at the SMEM window ceiling."""
    if needed > MAX_TILE_CAP:
        raise RuntimeError(
            f"scene needs {needed} triangles in one {tile_h}x{tile_w} tile "
            f"list; the SMEM window caps it at MAX_TILE_CAP={MAX_TILE_CAP} "
            f"(try a smaller tile size or the micro path)"
        )
    grown = (needed + needed // 8 + 7) // 8 * 8
    return max(min(grown, MAX_TILE_CAP), cur)
