"""Triangle-to-tile binning as one sort/segment pass.

TPU-native replacement for the reference's four binning kernels
(binning.wgsl): ``count_triangles`` (atomicAdd per covered tile, :195-247),
the two-pass Blelloch scan (:252-341), and ``store_triangles`` (atomic slot
claim, :346-388). On TPU there are no usable scatter atomics, and we don't
want them: a stable sort by tile id gives the same triangle lists
*deterministically* (intra-tile order = triangle index order, where the
reference's atomic claim order is nondeterministic) and with *detected*
overflow (the reference silently writes out of bounds when a tile exceeds
its heuristic capacity, gpu_buffers.rs:53-63).

Pipeline (all static shapes, one XLA program), tuned for the TPU's
vector-friendly / gather-hostile cost model:

1. per-triangle covered-tile counts c_t = range_x * range_y  (setup output)
2. exclusive cumsum -> pair start offsets; total pairs (dynamic value)
3. pair expansion: locate each pair slot's triangle with an O(P*T)
   ``compare_all`` searchsorted (a dense VPU compare matrix beats per-element
   binary search by ~10x here), then one row-gather of packed per-triangle
   metadata
4. stable multi-operand ``lax.sort`` on (tile, tri) — sorts the payload in
   the network, avoiding post-sort gathers
5. per-tile segment (start, count) via two more compare_all reductions

The output is the *sorted pair list itself* plus per-tile (start, count):
the raster kernel DMAs its segment window directly from HBM, so no dense
(num_tiles x C) matrix is built (the scatter that built it was ~0.4 ms of
frame time at Suzanne scale).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


# Above this many cov-matrix rank-search ops the dense path loses to the
# sort path (num_tiles * tile_cap * T elementwise ops, all fused VPU work).
DENSE_BINNING_OP_LIMIT = 600_000_000


def cover_counts(setup):
    """Per-triangle covered-rect dims and cover-pair counts from a
    triangle_setup dict: (rx, ry, c) with c = rx*ry for alive triangles,
    0 otherwise. THE one definition — the sort path, the cell expansion,
    and the renderer's settle-to-need calibration all consume it."""
    i32 = jnp.int32
    rx = (setup["tile_x1"] - setup["tile_x0"]).astype(i32)
    ry = (setup["tile_y1"] - setup["tile_y0"]).astype(i32)
    return rx, ry, jnp.where(setup["alive"], rx * ry, 0)


def setup_from_meta(meta):
    """Reconstruct the minimal ``triangle_setup`` dict the binning paths
    consume (tile_x0/x1/y0/y1, alive) from the fused front end's meta rows
    (pallas_front.front_end: [tile_x0, tile_y0, rx, c]).

    Bit-exact for alive triangles: c = rx * ry with integer rx >= 1, so
    ry = c // rx recovers the rect height exactly. Dead triangles (c == 0)
    get an empty rect — every consumer (cover_counts, the dense coverage
    matrix, exact_tile_counts) masks them by ``alive`` anyway. This lets
    the TILE path ride the fused front too (round 5): front meta replaces
    the ~150-op XLA vertex/setup chain that dominates sub-ms frames."""
    i32 = jnp.int32
    x0 = meta[0].astype(i32)
    y0 = meta[1].astype(i32)
    rx = meta[2].astype(i32)
    c = meta[3].astype(i32)
    alive = c > 0
    ry = c // jnp.maximum(rx, 1)
    return {
        "tile_x0": x0,
        "tile_y0": y0,
        "tile_x1": x0 + jnp.where(alive, rx, 0),
        "tile_y1": y0 + jnp.where(alive, ry, 0),
        "alive": alive,
    }


def bin_triangles(setup, ntx: int, nty: int, pair_cap: int, tile_cap: int):
    """Dispatch to the dense-rank or sort-based binning implementation.

    Both produce identical outputs (same contract, same deterministic
    triangle order per tile); the dense path is pure vectorized
    compare/cumsum/reduce work that the VPU eats (~3x faster at Suzanne
    scale), but its rank search costs num_tiles * tile_cap * T ops, so huge
    scenes fall back to the O(P log P) sort path."""
    T = setup["alive"].shape[0]
    dense_ops = ntx * nty * tile_cap * max(T, 1)
    if dense_ops <= DENSE_BINNING_OP_LIMIT:
        return bin_triangles_dense(setup, ntx, nty, pair_cap, tile_cap)
    return bin_triangles_sort(setup, ntx, nty, pair_cap, tile_cap)


def bin_triangles_dense(setup, ntx: int, nty: int, pair_cap: int,
                        tile_cap: int):
    """Dense-rank binning: no sort, no scatter, no per-element gathers.

    1. coverage matrix cov[j, t] = tile j inside triangle t's covered-tile
       rectangle — (num_tiles, T) of fused compares;
    2. per-tile counts and pair-list offsets by reduction/cumsum;
    3. rank matrix R = cumsum(cov, axis=1); the s-th triangle of tile j is
       searchsorted(R[j], s+1) — computed as a fused compare+reduce
       (sum_t [R[j,t] < s+1]), which XLA keeps unmaterialized.

    The triangle order per tile is ascending triangle index — identical to
    the stable sort path (and deterministic, unlike the reference's atomic
    claim order, binning.wgsl:376-387)."""
    num_tiles = ntx * nty
    i32 = jnp.int32
    T = setup["alive"].shape[0]
    # The raster kernel DMAs full rows; i32 HBM lanes tile at 128, so the
    # column count must be 128-aligned.
    tile_cap = (tile_cap + 127) // 128 * 128

    tile_ids = jnp.arange(num_tiles, dtype=i32)
    jx = (tile_ids % ntx)[:, None]  # (num_tiles, 1)
    jy = (tile_ids // ntx)[:, None]

    x0 = setup["tile_x0"][None, :].astype(i32)
    x1 = setup["tile_x1"][None, :].astype(i32)
    y0 = setup["tile_y0"][None, :].astype(i32)
    y1 = setup["tile_y1"][None, :].astype(i32)
    alive = setup["alive"][None, :]

    cov = alive & (jx >= x0) & (jx < x1) & (jy >= y0) & (jy < y1)

    counts = jnp.sum(cov, axis=1).astype(i32)  # (num_tiles,)
    seg_start = jnp.cumsum(counts) - counts
    total = seg_start[-1] + counts[-1] if num_tiles > 0 else jnp.int32(0)

    # Rank search: t(j, s) = # of t' with R[j, t'] < s+1 = index of the
    # (s+1)-th covering triangle. For s >= count the result is T (clamped,
    # never read because seg_count masks it).
    R = jnp.cumsum(cov.astype(i32), axis=1)  # (num_tiles, T)
    s_plus_1 = jnp.arange(1, tile_cap + 1, dtype=i32)  # (C,)
    # (num_tiles, C, T) fused compare + reduce over T.
    tri_of_slot = jnp.sum(
        R[:, None, :] < s_plus_1[None, :, None], axis=2
    ).astype(i32)  # values in [0, T]
    tri_of_slot = jnp.minimum(tri_of_slot, max(T - 1, 0))

    # Keep the natural (num_tiles, C) row layout — the raster kernel DMAs
    # 8-row-aligned blocks, so pad rows to a multiple of 8.
    rows_padded = (num_tiles + 7) // 8 * 8
    if rows_padded != num_tiles:
        tri_of_slot = jnp.concatenate(
            [tri_of_slot, jnp.zeros((rows_padded - num_tiles, tile_cap), i32)]
        )

    tile_overflow = jnp.any(counts > tile_cap)
    max_count = jnp.max(counts) if num_tiles > 0 else jnp.int32(0)
    return {
        "bin_rows": tri_of_slot,
        "seg_start": seg_start,
        "seg_count": jnp.minimum(counts, tile_cap),
        "total_pairs": total,
        "overflow": tile_overflow,
        "pair_overflow": jnp.asarray(False),
        "tile_overflow": tile_overflow,
        # Needed capacities (0 = within cap): lets the renderer's retry jump
        # straight to a sufficient size in ONE recompile instead of doubling
        # blindly (each retry recompiles — minutes at mega scale).
        "pair_needed": jnp.int32(0),
        "tile_needed": jnp.where(tile_overflow, max_count, 0).astype(jnp.int32),
        "layout": "dense",
    }


def expand_pair_owners(starts, counts, pair_cap: int):
    """tri_of_pair: the triangle owning each pair slot p (the rightmost t
    with starts[t] <= p among triangles with counts > 0).

    Seed-scatter + cummax — O(P) instead of a searchsorted whose "sort"
    method pays an extra O((P+T) log) sort at mega scale: triangles with
    counts > 0 have strictly increasing starts, so scattering t at
    starts[t] and forward-propagating with a running max reconstructs the
    ownership exactly. Slots past the last seed inherit the last live
    triangle (they are masked invalid downstream)."""
    i32 = jnp.int32
    T = starts.shape[0]
    tpos = jnp.where(counts > 0, starts, pair_cap)  # out of range -> dropped
    # .set, not .max: triangles with counts > 0 have strictly increasing
    # starts, so live positions are unique (deterministic) — and the
    # overwrite scatter is ~25% faster than the combining one on TPU.
    seed = jnp.zeros((pair_cap,), i32).at[tpos].set(
        jnp.arange(T, dtype=i32), mode="drop"
    )
    return jax.lax.cummax(seed)


def exact_tile_counts(setup, ntx: int, nty: int):
    """Exact per-tile cover counts WITHOUT building the pair list.

    Each triangle covers the half-open tile rect [x0, x1) x [y0, y1); the
    per-tile count is a classic 2-D rectangle sum: scatter +1/-1 at the
    rect corners into an (nty+1, ntx+1) grid, then a 2-D inclusive prefix
    sum. O(T + num_tiles) — independent of pair_cap, so it stays exact
    when the pair list itself overflows. Dead triangles scatter weight 0
    (their coords can be arbitrary; mode="drop" guards the range)."""
    i32 = jnp.int32
    x0 = setup["tile_x0"].astype(i32)
    x1 = setup["tile_x1"].astype(i32)
    y0 = setup["tile_y0"].astype(i32)
    y1 = setup["tile_y1"].astype(i32)
    w = jnp.where(setup["alive"], 1, 0).astype(i32)
    grid = jnp.zeros((nty + 1, ntx + 1), i32)
    grid = grid.at[y0, x0].add(w, mode="drop")
    grid = grid.at[y0, x1].add(-w, mode="drop")
    grid = grid.at[y1, x0].add(-w, mode="drop")
    grid = grid.at[y1, x1].add(w, mode="drop")
    counts = jnp.cumsum(jnp.cumsum(grid, axis=0), axis=1)
    return counts[:nty, :ntx].reshape(-1)


def bin_triangles_sort(setup, ntx: int, nty: int, pair_cap: int, tile_cap: int):
    """Build the sorted (tile, triangle) pair list + per-tile segments.

    Args:
      setup: dict from common.triangle_setup (tile_x0/y0/x1/y1, alive), (T,).
      ntx, nty: tile grid dims.
      pair_cap: static capacity for (triangle, tile) cover pairs.
      tile_cap: static per-tile window C the raster kernel reads.

    Returns dict:
      pair_tri:   (pair_cap + tile_cap,) int32 triangle ids sorted by tile
                  (padded so any seg_start + tile_cap window is in bounds)
      seg_start:  (num_tiles,) int32 segment offset per tile
      seg_count:  (num_tiles,) int32 triangles per tile (clamped to tile_cap)
      total_pairs:() int32 true number of cover pairs
      overflow:   () bool — pair_cap exceeded or any tile exceeded tile_cap
    """
    num_tiles = ntx * nty
    i32 = jnp.int32
    rx, _, c = cover_counts(setup)

    from compute_renderer_tpu.backends.pallas_expand import blocked_cumsum_i32

    # Exclusive prefix (replaces the reference's 2-pass scan). Blocked
    # two-level form: jnp.cumsum's serialized whole-array lowering was the
    # bulk of the expand stage at scale (round 5; bit-identical for ints).
    starts = blocked_cumsum_i32(c) - c
    total = starts[-1] + c[-1]

    p = jnp.arange(pair_cap, dtype=i32)
    # Rightmost triangle with start <= p owns pair p (empty ranges skipped).
    tri_of_pair = expand_pair_owners(starts, c, pair_cap)
    valid = p < total

    # One packed row-gather instead of four element gathers.
    meta = jnp.stack(
        [starts.astype(i32), rx, setup["tile_x0"].astype(i32),
         setup["tile_y0"].astype(i32)],
        axis=1,
    )  # (T, 4)
    m = meta[tri_of_pair]  # (P, 4)
    local = p - m[:, 0]
    trx = jnp.maximum(m[:, 1], 1)
    tile_of_pair = (m[:, 3] + local // trx) * ntx + (m[:, 2] + local % trx)
    tile_of_pair = jnp.where(valid, tile_of_pair, num_tiles)

    # Stable sort by tile id carrying the triangle payload through the
    # sorting network (no post-sort gathers). Pairs are generated in
    # triangle-index order, so stability keeps that order per tile.
    sorted_tile, sorted_tri = jax.lax.sort(
        (tile_of_pair, tri_of_pair), num_keys=1, is_stable=True
    )

    tile_ids = jnp.arange(num_tiles, dtype=i32)
    seg_method = (
        "compare_all" if num_tiles * pair_cap <= 100_000_000 else "sort"
    )
    seg_start = jnp.searchsorted(
        sorted_tile, tile_ids, side="left", method=seg_method
    ).astype(i32)
    seg_end = jnp.searchsorted(
        sorted_tile, tile_ids, side="right", method=seg_method
    ).astype(i32)
    count = seg_end - seg_start

    # Pad so any 1024-aligned DMA superwindow the raster kernel reads
    # (see pallas_raster.window_elems) stays in bounds. 1024 = the TPU's
    # 1-D int32 HBM tile (8 sublanes x 128 lanes).
    pad = pair_list_padding(pair_cap, tile_cap)
    pair_tri = jnp.concatenate([sorted_tri, jnp.zeros((pad,), i32)])

    pair_overflow = total > pair_cap
    max_count = jnp.max(count) if num_tiles > 0 else jnp.int32(0)
    if num_tiles > 0:
        # Per-tile counts above derive from the pair_cap-BOUNDED list, so
        # they under-report when the pair list itself overflows — a retry
        # sized from them could overflow tile_cap and recompile a second
        # time (minutes at mega scale). On pair overflow, recompute the
        # true max from the corner-scatter rectangle sum (lax.cond: frames
        # within cap never execute it).
        max_count = jax.lax.cond(
            pair_overflow,
            lambda: jnp.max(exact_tile_counts(setup, ntx, nty)),
            lambda: max_count,
        )
    tile_overflow = max_count > tile_cap
    return {
        "pair_tri": pair_tri,
        "seg_start": seg_start,
        "seg_count": jnp.minimum(count, tile_cap),
        "total_pairs": total,
        "overflow": pair_overflow | tile_overflow,
        "pair_overflow": pair_overflow,
        "tile_overflow": tile_overflow,
        # Needed capacities (0 = within cap) — exact even under pair
        # overflow, so the retry jumps to sufficient sizes in ONE recompile.
        "pair_needed": jnp.where(pair_overflow, total, 0).astype(jnp.int32),
        "tile_needed": jnp.where(tile_overflow, max_count, 0).astype(jnp.int32),
        "layout": "flat",
    }


# VMEM bound for the Pallas expansion kernel's resident (pair_cap,)
# outputs (2 x 4 B x cap <= ~12 MB); larger caps fall back to XLA.
PALLAS_EXPAND_MAX_CAP = 1_500_000


def bin_cells_sort(setup, ntx_t: int, nty_t: int, pair_cap: int,
                   interpret: bool | None = None,
                   use_pallas_expand: bool | None = None,
                   segments: str = "boundaries",
                   expand_geom: tuple | None = None):
    """Cell-granularity binning for the micro-raster (mega-scene) path.

    Cells are 8x8 px; a framebuffer tile (8, 128) holds 16 cells side by
    side. Cell ids are ordered *cell-major within tile*:

        cell_id = (cy * ntx_t + cx // 16) * 16 + cx % 16

    so one tile's 16 cell segments are contiguous in the sorted pair list
    and the raster kernel DMAs a single per-tile window.

    ``setup`` must come from ``common.triangle_setup(..., tile_h=8,
    tile_w=8)`` (tile ranges are cell ranges). Unlike the tile path there
    is no per-cell or per-tile capacity at all: the kernel streams each
    tile's coefficient window from HBM in fixed-size chunks, so the only
    cap is the global ``pair_cap`` (growable, overflow-detected). One
    global sort, searchsorted boundary segments (no per-chunk re-sorts —
    the chunked tile path paid ~11 sorts per frame at 1M triangles).

    Returns dict:
      pair_tri:   (pair_cap,) i32 triangle ids sorted by cell
      seg_start:  (num_cells,) i32   (num_cells = ntx_t * 16 * nty_t)
      seg_count:  (num_cells,) i32
      win_start:  (num_tiles,) i32  16-aligned window base row per tile
      tile_count: (num_tiles,) i32  total pairs per tile
      pair_overflow: () bool; pair_needed: () i32 (0 = within cap)
      tile_overflow / tile_needed: always False/0 (kept for the shared
      overflow-report contract)
    """
    i32 = jnp.int32
    rx, _, c = cover_counts(setup)
    return bin_cells_sort_meta(
        c, rx, setup["tile_x0"].astype(i32), setup["tile_y0"].astype(i32),
        ntx_t, nty_t, pair_cap, interpret=interpret,
        use_pallas_expand=use_pallas_expand, segments=segments,
        expand_geom=expand_geom,
    )


def bin_cells_sort_meta(c, rx, x0, y0, ntx_t: int, nty_t: int,
                        pair_cap: int, interpret: bool | None = None,
                        use_pallas_expand: bool | None = None,
                        segments: str = "boundaries",
                        expand_geom: tuple | None = None):
    """``bin_cells_sort`` from per-triangle cover meta (see
    ``expand_cells_meta``) — the entry the fused Pallas front end uses,
    skipping the ``triangle_setup`` dict entirely."""
    num_tiles = ntx_t * nty_t
    num_cells = num_tiles * 16

    cell_of_pair, tri_of_pair, total = expand_cells_meta(
        c, rx, x0, y0, ntx_t, num_cells, pair_cap,
        interpret=interpret, use_pallas_expand=use_pallas_expand,
        expand_geom=expand_geom,
    )

    # Stable sort by cell id carrying the triangle payload (measured faster
    # on TPU than the unstable two-key lexicographic form, 5.0 vs 6.1 ms at
    # 500k pairs). Pairs are generated in triangle order, so stability
    # keeps ascending-triangle order per cell.
    sorted_cell, sorted_tri = jax.lax.sort(
        (cell_of_pair, tri_of_pair), num_keys=1, is_stable=True
    )

    # ``segments``: "boundaries" (default) searchsorteds num_cells+1
    # boundaries into the ALREADY-SORTED array; "histogram" scatter-adds
    # over the UNSORTED cells (P-sized scatter). Bit-identical outputs
    # (test_binning). Hardware A/B at 1M tris (scripts/ab_segments.py,
    # TPU v5e 2026-08-18): boundaries 37.7 ms vs histogram 7515 ms for the
    # full bin_cells_sort per call — the 1M-element scatter-add is
    # pathological on this backend, ~200x, so boundaries is the default.
    if segments == "boundaries":
        seg_start, counts, tile_count, win_start = segments_from_sorted_cells(
            sorted_cell, num_cells, num_tiles
        )
    else:
        seg_start, counts, tile_count, win_start = segments_from_cells(
            cell_of_pair, num_cells, num_tiles
        )

    return {
        "pair_tri": sorted_tri,
        "seg_start": seg_start,
        "seg_count": counts,
        "win_start": win_start,
        "tile_count": tile_count,
        "total_pairs": total,
        "pair_overflow": total > pair_cap,
        "tile_overflow": jnp.asarray(False),
        # Needed capacity (0 = within cap). No tile-side cap exists on this
        # layout (window chunks stream from HBM).
        "pair_needed": jnp.where(total > pair_cap, total, 0).astype(jnp.int32),
        "tile_needed": jnp.int32(0),
        "layout": "micro",
    }


def expand_cells_xla(setup, ntx_t: int, num_cells: int, pair_cap: int,
                     interpret: bool | None = None,
                     use_pallas_expand: bool | None = None):
    """(cell_of_pair, tri_of_pair, total_pairs) for the 8x8-cell layout
    from a ``triangle_setup`` dict (see ``expand_cells_meta``)."""
    i32 = jnp.int32
    rx, _, c = cover_counts(setup)
    return expand_cells_meta(
        c, rx, setup["tile_x0"].astype(i32), setup["tile_y0"].astype(i32),
        ntx_t, num_cells, pair_cap,
        interpret=interpret, use_pallas_expand=use_pallas_expand,
    )


def expand_cells_meta(c, rx, x0, y0, ntx_t: int, num_cells: int,
                      pair_cap: int, interpret: bool | None = None,
                      use_pallas_expand: bool | None = None,
                      expand_geom: tuple | None = None):
    """(cell_of_pair, tri_of_pair, total_pairs) for the 8x8-cell layout —
    the pre-sort arrays of ``bin_cells_sort`` (invalid tail: cell =
    num_cells sentinel) — from per-triangle cover meta (cover count ``c``,
    rect width ``rx``, rect origin ``x0``/``y0``: exactly
    ``binning.cover_counts`` + tile origins, or the fused Pallas front
    end's meta rows, pallas_front.front_end).

    ``use_pallas_expand=None`` resolves to True exactly when the kernel
    will be Mosaic-compiled (not interpret mode): measured on TPU v5e the
    Pallas expansion runs the 1M-tri mega-scene workload in 0.49 ms vs
    7.0 ms for the XLA scatter/cummax/gather chain (14x; bisect harness
    scripts/bisect_pallas_expand.py, 2026-08-18). In interpret mode (CPU
    tests) the XLA form is far faster, so it stays the default there."""
    i32 = jnp.int32

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if use_pallas_expand is None:
        use_pallas_expand = not interpret

    if use_pallas_expand and pair_cap <= PALLAS_EXPAND_MAX_CAP:
        # One sequential Pallas pass (interval-membership matmul + rect
        # walk, see pallas_expand) replacing the XLA scatter/cummax/gather
        # chain below. Outputs verified bit-identical on TPU and
        # CPU-interpret (tests/test_expand_kernel.py); the round-2 "~100x
        # slower" Mosaic lowering did NOT reproduce on the current stack
        # (bisect L4 = 0.49 ms at 1M tris, dim1-dim1 contraction fine).
        from compute_renderer_tpu.backends import pallas_expand
        # expand_geom: optional (bsz, ch) kernel-geometry override for
        # same-process in-frame A/Bs (scripts/ab_frame_expand.py); None =
        # the swept module defaults.
        geom = {}
        if expand_geom is not None:
            geom = {"bsz": expand_geom[0], "ch": expand_geom[1]}
        cell_of_pair, tri_of_pair, total = pallas_expand.expand_cells(
            c, rx, x0.astype(i32), y0.astype(i32),
            pair_cap=pair_cap, ntx_t=ntx_t, num_cells=num_cells,
            interpret=interpret, **geom,
        )
    else:
        from compute_renderer_tpu.backends.pallas_expand import (
            blocked_cumsum_i32,
        )

        starts = blocked_cumsum_i32(c) - c
        total = starts[-1] + c[-1]

        p = jnp.arange(pair_cap, dtype=i32)
        tri_of_pair = expand_pair_owners(starts, c, pair_cap)
        valid = p < total

        # Per-triangle metadata packed as complex64 (two i32 bit patterns
        # per element): the pair-order gather costs ~1.6 ns/element on TPU
        # regardless of width, so halving the element count halves the
        # gather. The raw bit patterns of small ints are f32 *denormals*,
        # which the TPU flushes to zero somewhere in the complex path
        # (observed on hardware); OR-ing bit 30 moves every pattern into
        # the normal-float exponent range, which survives any data
        # movement, and XORs back out exactly — valid for all values
        # < 2^30 (capacities and tile coordinates are orders of magnitude
        # smaller).
        bias = i32(0x40000000)
        as_f = lambda a: jax.lax.bitcast_convert_type(
            a.astype(i32) | bias, jnp.float32
        )
        meta_c = jnp.stack(
            [
                jax.lax.complex(as_f(starts), as_f(rx)),
                jax.lax.complex(as_f(x0), as_f(y0)),
            ],
            axis=1,
        )  # (T, 2) c64
        m = meta_c[tri_of_pair]  # (P, 2)
        as_i = lambda a: jax.lax.bitcast_convert_type(a, i32) ^ bias
        local = p - as_i(jnp.real(m[:, 0]))
        trx = jnp.maximum(as_i(jnp.imag(m[:, 0])), 1)
        cx = as_i(jnp.real(m[:, 1])) + local % trx
        cy = as_i(jnp.imag(m[:, 1])) + local // trx
        cell_of_pair = (cy * ntx_t + cx // 16) * 16 + cx % 16
        cell_of_pair = jnp.where(valid, cell_of_pair, num_cells)

    return cell_of_pair, tri_of_pair, total


def segments_from_cells(cell_of_pair, num_cells: int, num_tiles: int):
    """Per-cell segments of the cell-sorted pair list: (seg_start,
    seg_count, tile_count, win_start). Computed from the UNSORTED cell ids
    via histogram + cumsum (order-independent; cheaper than two
    searchsorted->sort passes at mega scale). One extra bin collects the
    invalid sentinel tail."""
    i32 = jnp.int32
    counts = jnp.zeros((num_cells + 1,), i32).at[cell_of_pair].add(1)
    counts = counts[:num_cells]
    seg_start = jnp.cumsum(counts) - counts

    tile_count = counts.reshape(num_tiles, 16).sum(axis=1)
    first = seg_start.reshape(num_tiles, 16)[:, 0]
    win_start = (first // 16) * 16
    return seg_start, counts, tile_count, win_start


def segments_from_sorted_cells(sorted_cell, num_cells: int, num_tiles: int):
    """``segments_from_cells`` computed from the cell-SORTED pair list via
    num_cells + 1 searchsorted boundaries instead of a P-sized scatter-add:
    seg_start[i] = #pairs with cell < i (searchsorted-left), counts = the
    boundary differences. Same values bit-for-bit (the sentinel tail sorts
    past every real cell). O(num_cells log P) compares vs the histogram's
    O(P) scatter — the round-3 hardware A/B measured this 200x over the
    scatter-add histogram at 1M tris.

    ``method="sort"``: JAX's default 'scan' lowering runs ~log2(P)
    serialized whole-array passes; the 'sort' lowering pays one extra
    (P + num_cells)-element sort instead, which the TPU sorts in ~1 ms at
    mega scale. Measured (binning_profile2, v5e 2026-08-19, 1M tris /
    327k pairs): scan 5.34 ms -> sort 1.55 ms, element-equal — it turned
    the segment stage from the largest binning sub-stage into noise."""
    i32 = jnp.int32
    bounds = jnp.searchsorted(
        sorted_cell, jnp.arange(num_cells + 1, dtype=i32), side="left",
        method="sort",
    ).astype(i32)
    seg_start = bounds[:-1]
    counts = bounds[1:] - bounds[:-1]
    tile_count = counts.reshape(num_tiles, 16).sum(axis=1)
    first = seg_start.reshape(num_tiles, 16)[:, 0]
    win_start = (first // 16) * 16
    return seg_start, counts, tile_count, win_start


def pair_list_padding(pair_cap: int, tile_cap: int) -> int:
    """Tail padding for the sorted pair list: the raster kernel DMAs a
    1024-aligned superwindow of ``window_elems(tile_cap)`` ints starting at
    or before any seg_start <= pair_cap."""
    up = lambda x: (x + 1023) // 1024 * 1024
    return up(pair_cap) - pair_cap + up(tile_cap) + 1024


def default_pair_cap_micro(num_triangles: int, num_cells: int) -> int:
    """Micro-path (mega-scene) pair capacity. Mega scenes cull well over
    half their triangles (backface + offscreen + near-plane) and survivors
    are near-subpixel (~1 covered cell each) — measured San-Miguel-class
    coverage is ~0.33 pairs/triangle — so 3T/8 keeps ~15% slack while
    every capacity-proportional stage (expansion, sort, histogram,
    coefficient gather) stays tight (the round-1 2T default made them ~6x
    slower than needed at 1M tris). Underestimates are detected and
    retried at the exact reported need (tpu.grow_pair_cap)."""
    return max(num_triangles * 3 // 8, num_cells, 32768)


def default_pair_cap(num_triangles: int, num_tiles: int) -> int:
    """Static pair capacity heuristic. Unlike the reference's unchecked
    per-tile cap (gpu_buffers.rs:53-63) this bounds *total* pairs; overflow
    is detected and the renderer retries with a doubled cap. Kept tight —
    expansion and sort cost scale with the cap."""
    return max(2 * num_triangles, num_tiles, 2048)


def default_tile_cap(num_triangles: int, width: int, height: int,
                     tile_h: int, tile_w: int) -> int:
    """Per-tile capacity C — the reference's heuristic
    max(2 * tile_area / avg_tri_area, 128) (gpu_buffers.rs:53-63), rounded
    to a multiple of 8."""
    avg_tri_area = (width * height) / max(num_triangles, 1)
    base = int(2.0 * (tile_h * tile_w) / max(avg_tri_area, 1e-6))
    cap = max(base, 128)
    return (cap + 7) // 8 * 8
