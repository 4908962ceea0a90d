"""Lane-packed micro-triangle Pallas kernel: 16 binned pairs per vector op.

Mega-scene (San-Miguel-class, ~1M triangle) replacement for the fused tile
kernel in ``pallas_raster.py``. That kernel pays one full (8, 128) vector
pass per binned triangle — right when triangles cover ~1000 pixels, ~1000x
wasted when they cover ~1. This kernel restores the balance the reference
gets from its 8x8-tile/64-thread shape (raster_pass.rs:3,139-142;
rasteriser.wgsl:192-243), the TPU way:

- binning is at 8x8 *cell* granularity (= the reference's tile size), cells
  ordered cell-major within each (8, 128) framebuffer tile
  (``binning.bin_cells_sort``);
- pair coefficients are stored *coefficient-major* and dense: superblock
  sb is a (32, 128) block whose row r, lane l holds coefficient r of pair
  128*sb + l — 32 B/pair in the HBM stream (the round-1 row-per-pair form
  padded 32 lanes to 128 and streamed 512 B/pair, 4x the bytes);
- per walk step, a dynamic lane-roll aligns the block's 16 pairs to lane 0
  and a bit-exact selection matmul (f32 via ``Precision.HIGHEST``; the
  selection matrix is 0/1 so each output is a single exact product)
  broadcasts pair g's coefficients to lane group g — 16 triangles x 64
  pixels = all 1024 lanes busy per op;
- each lane group carries its own running (depth key, pair index,
  attributes) min; after a cell's walk, a 4-round lane-roll butterfly
  reduces across groups with (key, pair)-lexicographic order — deterministic
  lowest-triangle-index tie-break, same contract as the tile kernel and the
  reference's intended (racy) CAS loop (rasteriser.wgsl:147-186);
- triangle coefficients stream from HBM in fixed-size per-tile window
  CHUNKS (double-buffered DMA inside the tile's walk), so there is NO VMEM
  triangle-table budget, no chunked multi-pass, and — unlike the round-1
  single-window design — no per-tile density ceiling: a tile needing 11k+
  coefficient rows (San-Miguel-class densest tile at 1024x768) walks
  ceil(rows/CHUNK_ROWS) chunks with a dynamic fori_loop instead of failing
  at a MAX_WINDOW_ROWS VMEM bound. The per-chunk re-sorts that dominated
  mega-scene frames (~11 sorts/frame at 1M tris) collapse into one global
  sort in binning, and only pair_cap remains as a (growable) capacity.

Effect semantics: identical formulas to the tile kernel; coverage outside
the triangle bbox (voxelize inflation, mirage warp) clips to the 8x8 *cell*
rectangle union — exactly the xla backend with tile_h=tile_w=8, and exactly
the reference's own 8x8 tile union, i.e. *closer* to the reference than the
16x256 tile path (see PARITY.md deviations).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from compute_renderer_tpu.backends.pallas_raster import (
    DEPTH_CLEAR_BITS,
    TRI_TABLE_WIDTH,
    _emit_texf_gbuffer,
    _pow32,
)
from compute_renderer_tpu.core.effects import EFFECT_MIRAGE

F32 = jnp.float32
PAIR_IDX_CLEAR = np.int32(2**31 - 1)

# Rows per 128-pair superblock of the coefficient stream. Base layout: the
# 32 affine columns of pallas_raster.TRI_TABLE_WIDTH. Material extension
# (per-triangle kd at rows 32:35, pallas_raster.MAT_TRI_TABLE_WIDTH): 35
# used rows padded to 40 so superblock row offsets stay 8-aligned for VMEM
# slicing. Fused-texture extension (uv affine 32:38 + kd 38:41 +
# TextureInfo 41:44, pallas_raster.TEX_TRI_TABLE_WIDTH): 44 used rows
# padded to 48. Mip fused texturing (kd 38:41 + [tid, lod, mu, mv, spread]
# 41:46, pallas_raster.TEX_MIP_TRI_TABLE_WIDTH): 46 rows, same 48-row
# superblock — the stream hides the true width, so the ``texf`` static is
# a MODE (False | True | TEXF_MIP == 2) rather than a flag.
SB_ROWS = 32
SB_ROWS_MAT = 40
SB_ROWS_TEX = 48
TEXF_MIP = 2


def _sb_rows(mat: bool, texf: bool = False) -> int:
    if texf:
        return SB_ROWS_TEX
    return SB_ROWS_MAT if mat else SB_ROWS


def _selection_matrix():
    """(128, 128) f32 0/1: S[q, j] = 1 iff lane j belongs to group q.

    For a lane-aligned coefficient block M (32, 128) (row r = coefficient
    r, lane q = pair q), ``M @ S`` is (32, 128) with E[r, j] = M[r, j//8] —
    pair g's coefficients broadcast to lane group g. Each output element
    has exactly one nonzero term, so the matmul is bit-exact under
    ``Precision.HIGHEST`` f32."""
    gj = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1) // 8
    gg = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
    return (gj == gg).astype(F32)


def _micro_kernel(
    # SMEM inputs (full)
    params_ref,  # (2, 8) f32 — same layout as pallas_raster._raster_kernel
    lights_ref,  # (L, 8) f32
    seg_start_ref,  # (num_cells,) i32
    seg_count_ref,  # (num_cells,) i32
    win_start_ref,  # (num_tiles,) i32 — 16-aligned window base row
    tile_count_ref,  # (num_tiles,) i32 — total pairs in tile
    # HBM input (full)
    coeffs_ref,  # (P_pad, 128) f32 — pair coefficient rows in sorted order
    # outputs (blocked per tile)
    rgba_ref,  # (8, 128) u32
    key_ref,  # (8, 128) u32
    # scratch
    win_a,  # (CHUNK_ROWS, 128) f32 VMEM
    win_b,
    sem_a,
    sem_b,
    *,
    num_lights: int,
    skip_mirage: bool = False,
    mat: bool = False,
    vis: bool = False,
    texf: bool = False,
    unroll: int = 2,
    tree: bool = False,
):
    ti = pl.program_id(0)
    tj = pl.program_id(1)
    ntx = pl.num_programs(1)
    tile_id = ti * ntx + tj
    W = win_a.shape[0]  # chunk rows
    rows = _sb_rows(mat, texf)

    count = tile_count_ref[tile_id]
    # Window base: the superblock (128-pair group) containing the tile's
    # first pair. All window arithmetic is in PAIR units; row offset of
    # pair p is (p / 128) * rows (each (rows, 128) superblock holds 128
    # pairs' coefficients).
    w0 = pl.multiple_of((win_start_ref[tile_id] // 128) * 128, 128)
    # Cells are contiguous in the sorted pair list, so the tile's pairs are
    # [first, first + count) with first = seg_start of its cell 0; the
    # chunk walk covers ceil(span / chunk_pairs) chunks — dynamic trip
    # count, NO static per-tile density ceiling.
    first = seg_start_ref[tile_id * 16]
    chunk_pairs = (W // rows) * 128
    span = first + count - w0
    nchunks = (span + chunk_pairs - 1) // chunk_pairs

    @pl.when(count == 0)
    def _():
        if vis:
            rgba_ref[:, :] = jnp.full((8, 128), PAIR_IDX_CLEAR, jnp.int32)
        elif texf:
            rgba_ref[:, :, :] = jnp.zeros(rgba_ref.shape, F32)
        else:
            rgba_ref[:, :] = jnp.full((8, 128), 0xFFFF0000, jnp.uint32)
        key_ref[:, :] = jnp.full((8, 128), DEPTH_CLEAR_BITS, jnp.uint32)

    @pl.when(count > 0)
    def _():
        # Chunk 0 in flight before the walk; the walk waits on it at the
        # first block and double-buffers subsequent chunks (issue k+1 while
        # evaluating k).
        pltpu.make_async_copy(
            coeffs_ref.at[pl.ds((w0 // 128) * rows, W), :], win_a, sem_a
        ).start()
        _raster_tile_micro(
            params_ref, lights_ref, seg_start_ref, seg_count_ref,
            coeffs_ref, rgba_ref, key_ref, win_a, win_b, sem_a, sem_b,
            w0, nchunks, ti, tj, tile_id, num_lights=num_lights,
            skip_mirage=skip_mirage, mat=mat, vis=vis, texf=texf,
            unroll=unroll, tree=tree,
        )


def _micro_kernel_wl(
    # scalar-prefetch
    wl_ref,  # (num_tiles,) i32 ascending occupied-tile ids (first k valid)
    # SMEM inputs (full)
    params_ref,
    lights_ref,
    seg_start_ref,
    seg_count_ref,
    win_start_ref,
    tile_count_ref,
    # HBM input (full)
    coeffs_ref,
    rgba_clear_ref,  # aliased into rgba_ref; never read
    key_clear_ref,  # aliased into key_ref; never read
    # outputs (blocked per *visited* tile)
    rgba_ref,
    key_ref,
    # scratch: win_a, win_b, sem_a, sem_b (+ par_ref SMEM when prefetch)
    *scratch,
    ntx: int,
    num_lights: int,
    skip_mirage: bool = False,
    mat: bool = False,
    vis: bool = False,
    texf: bool = False,
    unroll: int = 2,
    tree: bool = False,
    prefetch: bool = False,
):
    """Work-list variant of ``_micro_kernel`` (the micro-path analog of
    pallas_raster._raster_kernel_wl): the grid is the dynamic count of
    OCCUPIED (8, 128) tiles; step i renders tile ``wl[i]``. Empty tiles —
    most of the screen when a mega mesh is small on it — never become grid
    steps: their pixels come from the pre-cleared framebuffer aliased into
    the outputs. Bitwise the same image as the full grid.

    ``prefetch``: cross-tile chunk-0 pipelining — each step issues the
    NEXT tile's first window chunk before finishing, so the next step's
    walk finds its DMA already in flight instead of stalling a full HBM
    round trip at every tile. Buffer parity is carried across steps in a
    one-element SMEM scratch (chunk ck of a tile lives in win_a iff
    ck + base parity is even); every issued DMA is still waited exactly
    once, so the semaphores stay balanced. Bitwise identical. Measured
    (scripts/ab_raster2.py, v5e 2026-08-20, 1M tris / 327k pairs /
    ~700 occupied tiles): 7.87 -> 6.84 ms (-13%), the round-5 default."""
    del rgba_clear_ref, key_clear_ref
    if prefetch:
        win_a, win_b, sem_a, sem_b, par_ref = scratch
    else:
        win_a, win_b, sem_a, sem_b = scratch
    i = pl.program_id(0)
    tile_id = wl_ref[i]
    ti = tile_id // ntx
    tj = tile_id - ti * ntx
    W = win_a.shape[0]
    rows = _sb_rows(mat, texf)

    count = tile_count_ref[tile_id]  # > 0 by work-list construction
    w0 = pl.multiple_of((win_start_ref[tile_id] // 128) * 128, 128)
    first = seg_start_ref[tile_id * 16]
    chunk_pairs = (W // rows) * 128
    span = first + count - w0
    nchunks = (span + chunk_pairs - 1) // chunk_pairs

    if not prefetch:
        pltpu.make_async_copy(
            coeffs_ref.at[pl.ds((w0 // 128) * rows, W), :], win_a, sem_a
        ).start()
        _raster_tile_micro(
            params_ref, lights_ref, seg_start_ref, seg_count_ref,
            coeffs_ref, rgba_ref, key_ref, win_a, win_b, sem_a, sem_b,
            w0, nchunks, ti, tj, tile_id, num_lights=num_lights,
            skip_mirage=skip_mirage, mat=mat, vis=vis, texf=texf,
            unroll=unroll, tree=tree,
        )
        return

    # Step 0 has no predecessor: issue its own chunk 0 (parity 0).
    @pl.when(i == 0)
    def _():
        par_ref[0] = 0
        pltpu.make_async_copy(
            coeffs_ref.at[pl.ds((w0 // 128) * rows, W), :], win_a, sem_a
        ).start()

    base = par_ref[0]
    _raster_tile_micro(
        params_ref, lights_ref, seg_start_ref, seg_count_ref,
        coeffs_ref, rgba_ref, key_ref, win_a, win_b, sem_a, sem_b,
        w0, nchunks, ti, tj, tile_id, num_lights=num_lights,
        skip_mirage=skip_mirage, mat=mat, vis=vis, texf=texf,
        unroll=unroll, tree=tree, base_par=base,
    )

    # The walk entered chunks 0..nchunks-1 (the tile's last pair lives in
    # chunk nchunks-1 and segments are contiguous), so the last-used
    # buffer is (base + nchunks - 1) & 1 and the next tile's chunk 0 goes
    # to the other one.
    nxt = (base + nchunks) % 2
    par_ref[0] = nxt

    @pl.when(i + 1 < pl.num_programs(0))
    def _():
        tid2 = wl_ref[i + 1]
        row2 = (win_start_ref[tid2] // 128) * rows

        @pl.when(nxt == 0)
        def _():
            pltpu.make_async_copy(
                coeffs_ref.at[pl.ds(row2, W), :], win_a, sem_a
            ).start()

        @pl.when(nxt == 1)
        def _():
            pltpu.make_async_copy(
                coeffs_ref.at[pl.ds(row2, W), :], win_b, sem_b
            ).start()


def _raster_tile_micro(
    params_ref, lights_ref, seg_start_ref, seg_count_ref, coeffs_ref,
    rgba_ref, key_ref, win_a, win_b, sem_a, sem_b, w0, nchunks,
    ti, tj, tile_id,
    *, num_lights: int, skip_mirage: bool = False, mat: bool = False,
    vis: bool = False, texf: bool = False, unroll: int = 2,
    tree: bool = False, base_par=None,
):
    threshold = params_ref[0, 0]
    melt_threshold = params_ref[0, 1]
    # Combined coverage bound (see pallas_raster: min_bc >= max(t, melt) is
    # bit-identical to the 4-test form, NaNs included, and ~6 ops cheaper
    # per 16-pair block).
    cov_min = jnp.maximum(threshold, melt_threshold)
    mirage = params_ref[0, 2]
    amplitude = params_ref[0, 3]
    frequency = params_ref[0, 4]
    phase = params_ref[0, 5]
    time = params_ref[0, 6]

    W = win_a.shape[0]
    rows = _sb_rows(mat, texf)
    # [nx ny nz wx wy wz] (+ per-tri kd r g b; texf additionally + uv and
    # + TextureInfo); the visibility-only walk (deferred texturing) carries
    # no attributes at all — the winner's PAIR index is the output and the
    # XLA tail resolves everything from it.
    if vis:
        nattr = 0
    elif texf:
        nattr = 16 if texf == TEXF_MIP else 14
    else:
        nattr = 9 if mat else 6
    CP = (W // rows) * 128  # pairs per chunk
    sel = _selection_matrix()

    y0 = (ti * 8).astype(F32) + params_ref[0, 7]
    x_tile0 = (tj * 128).astype(F32)
    ys_base = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0).astype(F32) + y0
    lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    lane_local = (lane % 8).astype(F32)
    group = lane // 8  # (8, 128) i32: lane group = pair slot within a step

    # Buffer parity: chunk ck resides in win_a iff (ck + base_par) is even.
    # base_par is 0 except under the work-list cross-tile prefetch, where
    # the next tile's chunk 0 lands in whichever buffer follows the
    # previous tile's last chunk.
    if base_par is None:
        use_a_of = lambda ck: (ck % 2) == 0
    else:
        use_a_of = lambda ck: ((ck + base_par) % 2) == 0

    # Per-tile accumulated framebuffer state.
    acc_key = jnp.full((8, 128), DEPTH_CLEAR_BITS, jnp.uint32)
    acc_attrs = tuple(jnp.zeros((8, 128), F32) for _ in range(nattr))
    acc_pair = (jnp.full((8, 128), PAIR_IDX_CLEAR, jnp.int32)
                if vis else None)
    # Chunk currently resident (-1: chunk 0 issued but not yet waited on).
    # Blocks walk pairs in non-decreasing order across cells (segments are
    # contiguous), each 16-pair block lies inside ONE chunk (16 | 128 | CP
    # alignment), and consecutive processed blocks are <= 16 pairs apart,
    # so the walk crosses chunk boundaries one at a time.
    cur = jnp.int32(-1)

    for c in range(16):  # static unroll: one 8x8 cell per iteration
        s = seg_start_ref[tile_id * 16 + c]
        n = seg_count_ref[tile_id * 16 + c]

        # Skip empty cells entirely (lax.cond compiles to a real scalar
        # branch): an occupied tile's empty cells previously still paid the
        # mirage warp + 4-round butterfly + commit, only to write the same
        # clear values the accumulator already holds. Bitwise-equivalent:
        # group c of the accumulator is only ever written by cell c.
        def do_cell(carry, c=c, s=s, n=n):
            if vis:
                acc_key, acc_pair, acc_attrs, cur = carry
            else:
                acc_key, acc_attrs, cur = carry
            base0 = (s // 16) * 16
            nblocks = (s + n - base0 + 15) // 16

            # Every lane group evaluates cell c's 8x8 pixels.
            xs = x_tile0 + F32(8.0 * c) + lane_local
            if skip_mirage:
                # Statically-declared non-mirage scene: no sample warp.
                # Bitwise-identical to the dynamic form with mirage <= 0.5.
                px, py = xs, ys_base
            else:
                # Mirage sample warp (rasteriser.wgsl:112-118), branchless
                # — same op order as the tile kernel for bitwise parity.
                off_x = amplitude * jnp.sin(frequency * xs + time + phase)
                off_y = amplitude * jnp.cos(
                    frequency * ys_base + time + phase
                )
                px = jnp.where(mirage > 0.5, xs + off_x, xs)
                py = jnp.where(mirage > 0.5, ys_base + off_y, ys_base)

            def eval_raw(kb, cur):
                """Evaluate one 16-pair block WITHOUT merging: returns the
                block's per-lane (key, pair, interpolated attrs) candidates
                plus the chunk-walk state. Splitting evaluation from the
                merge lets the unrolled walk run independent chains and
                tree-merge them (the walk is latency-bound; the sequential
                carry-select chain was the serialization)."""
                ap = base0 + kb * 16  # absolute pair index of this block
                ck = (ap - w0) // CP  # chunk holding the whole block
                adv = ck != cur
                even = use_a_of(ck)

                # Crossing into chunk ck: wait for its DMA, then put the next
                # chunk in flight into the other buffer.
                @pl.when(adv & even)
                def _():
                    pltpu.make_async_copy(
                        coeffs_ref.at[pl.ds(0, W), :], win_a, sem_a
                    ).wait()

                @pl.when(adv & ~even)
                def _():
                    pltpu.make_async_copy(
                        coeffs_ref.at[pl.ds(0, W), :], win_b, sem_b
                    ).wait()

                more = (ck + 1) < nchunks

                @pl.when(adv & more & even)
                def _():
                    pltpu.make_async_copy(
                        coeffs_ref.at[
                            pl.ds(((w0 + (ck + 1) * CP) // 128) * rows, W), :
                        ],
                        win_b, sem_b,
                    ).start()

                @pl.when(adv & more & ~even)
                def _():
                    pltpu.make_async_copy(
                        coeffs_ref.at[
                            pl.ds(((w0 + (ck + 1) * CP) // 128) * rows, W), :
                        ],
                        win_a, sem_a,
                    ).start()

                rel = ap - w0 - ck * CP  # pair offset within the chunk
                row = (rel // 128) * rows  # superblock row (8-aligned)
                lo = rel - (rel // 128) * 128  # lane of the block's first pair
                SBa = win_a[pl.ds(row, rows), :]
                SBb = win_b[pl.ds(row, rows), :]
                SB = jnp.where(even, SBa, SBb)
                # Rotate the block's 16 pairs to lanes 0..15, then bit-exact
                # f32 selection matmul: E[r, j] = coefficient r of pair
                # (ap + j // 8).
                Mt = pltpu.roll(SB, (128 - lo) % 128, 1)
                E = jax.lax.dot_general(
                    Mt, sel, (((1,), (0,)), ((), ())),
                    preferred_element_type=F32,
                    precision=jax.lax.Precision.HIGHEST,
                )  # (rows, 128); row r = coefficient r per lane

                def coef(r):
                    return jnp.broadcast_to(E[r : r + 1, :], (8, 128))

                pair_idx = ap + group  # (8, 128) i32, abs pair id
                valid = (pair_idx >= s) & (pair_idx < s + n)

                dx = px - coef(30)
                dy = py - coef(31)
                bc1 = coef(0) + coef(1) * dx + coef(2) * dy
                bc2 = coef(3) + coef(4) * dx + coef(5) * dy
                bc3 = coef(6) + coef(7) * dx + coef(8) * dy

                min_bc = jnp.minimum(bc1, jnp.minimum(bc2, bc3))
                mask = min_bc >= cov_min

                z = coef(9) + coef(10) * dx + coef(11) * dy
                mask &= jnp.isfinite(z) & valid

                key = jnp.where(mask, pltpu.bitcast(z, jnp.uint32),
                                DEPTH_CLEAR_BITS)
                interps = []
                if not vis:
                    for ch in range(6):
                        interps.append(coef(12 + ch * 3)
                                       + coef(13 + ch * 3) * dx
                                       + coef(14 + ch * 3) * dy)
                    if mat:
                        # Winner's per-triangle diffuse: constant rows 32:35
                        # (broadcast, not interpolated — pallas_raster
                        # layout).
                        for ch in range(3):
                            interps.append(coef(32 + ch))
                    elif texf:
                        # Fused texturing: interpolated uv (affine rows
                        # 32:38) + the winner's kd and TextureInfo (rows
                        # 38:44) — or kd and mip (rows 38:46, TEXF_MIP) —
                        # constants; pallas_raster layout.
                        for ch in range(2):
                            interps.append(coef(32 + ch * 3)
                                           + coef(33 + ch * 3) * dx
                                           + coef(34 + ch * 3) * dy)
                        for ch in range(8 if texf == TEXF_MIP else 6):
                            interps.append(coef(38 + ch))
                return key, pair_idx, tuple(interps), ck

            # Lexicographic (key, pair) min with the pair clause FREE:
            # within a lane group, pairs arrive in strictly ascending
            # order across blocks (group g sees pairs ap+g, ap+16+g,
            # ...), so on a key tie the earlier candidate already has the
            # lower pair index — strict < (keeping the LEFT operand on a
            # tie) reproduces the lexicographic result exactly, and the
            # reduction is associative, so sequential-chain and tree
            # merges are bitwise identical. (Groups hold DIFFERENT pairs;
            # the cross-group butterfly below still compares (key, pair).)
            # Covered pixels are unaffected; uncovered lanes keep
            # PAIR_IDX_CLEAR instead of adopting the cell's lowest pair
            # on the CLEAR==CLEAR tie — every consumer masks attrs/pair
            # by key != DEPTH_CLEAR_BITS.
            def merge(a, b):
                ka, pa, ia = a
                kb_, pb, ib = b
                win = kb_ < ka
                return (
                    jnp.where(win, kb_, ka),
                    jnp.where(win, pb, pa),
                    tuple(jnp.where(win, y, x) for x, y in zip(ia, ib)),
                )

            def eval_block(kb, carry):
                best_key, best_pair, attrs, cur = carry
                key, pair_idx, interps, ck = eval_raw(kb, cur)
                best_key, best_pair, attrs = merge(
                    (best_key, best_pair, attrs), (key, pair_idx, interps)
                )
                return best_key, best_pair, attrs, ck

            # Unrolled walk: UNROLL independent roll->matmul->coverage
            # chains per trip. The walk is latency-bound, not ALU-bound
            # (round-4 raster A/B: the nattr=0 vis walk costs the SAME as
            # the nattr=6 walk), so giving Mosaic independent chains to
            # interleave is worth more than saving ops. The odd tail
            # re-evaluates the LAST real block, which is a bitwise no-op:
            # strict `key < best_key` rejects the equal re-candidate, and
            # its chunk is already resident (adv == False). Two sub-blocks
            # can never both cross a chunk boundary in one trip (crossings
            # are >= CP/16 blocks apart). ``tree`` additionally breaks the
            # carry-select serialization: the UNROLL candidates tree-merge
            # before one merge into the carry (bitwise identical — see the
            # associativity note above).
            if unroll <= 1:
                body = eval_block
                trips = nblocks
            elif tree:
                def body(it, carry):
                    best_key, best_pair, attrs, cur = carry
                    cands = []
                    for u in range(unroll):
                        kb = it * unroll if u == 0 else jnp.minimum(
                            it * unroll + u, nblocks - 1)
                        key, pair_idx, interps, cur = eval_raw(kb, cur)
                        cands.append((key, pair_idx, interps))
                    while len(cands) > 1:
                        nxt = [
                            merge(cands[j], cands[j + 1])
                            if j + 1 < len(cands) else cands[j]
                            for j in range(0, len(cands), 2)
                        ]
                        cands = nxt
                    best_key, best_pair, attrs = merge(
                        (best_key, best_pair, attrs), cands[0]
                    )
                    return best_key, best_pair, attrs, cur

                trips = (nblocks + unroll - 1) // unroll
            else:
                def body(it, carry):
                    carry = eval_block(it * unroll, carry)
                    for u in range(1, unroll):
                        kb = jnp.minimum(it * unroll + u, nblocks - 1)
                        carry = eval_block(kb, carry)
                    return carry

                trips = (nblocks + unroll - 1) // unroll

            init = (
                jnp.full((8, 128), DEPTH_CLEAR_BITS, jnp.uint32),
                jnp.full((8, 128), PAIR_IDX_CLEAR, jnp.int32),
                tuple(jnp.zeros((8, 128), F32) for _ in range(nattr)),
                cur,
            )
            ckey, cpair, cattrs, cur = jax.lax.fori_loop(
                0, trips, body, init
            )

            # Cross-group butterfly: all 16 groups hold candidates for the
            # SAME 64 pixels; reduce to the lexicographic (key, pair) min
            # per pixel.
            cattrs = list(cattrs)
            for stride in (8, 16, 32, 64):
                k2 = pltpu.roll(ckey, 128 - stride, 1)
                p2 = pltpu.roll(cpair, 128 - stride, 1)
                win = (k2 < ckey) | ((k2 == ckey) & (p2 < cpair))
                ckey = jnp.where(win, k2, ckey)
                cpair = jnp.where(win, p2, cpair)
                for ch in range(nattr):
                    a2 = pltpu.roll(cattrs[ch], 128 - stride, 1)
                    cattrs[ch] = jnp.where(win, a2, cattrs[ch])

            # Commit cell c's 64 pixels (lane group c) into the tile state.
            in_cell = group == c
            new_key = jnp.where(in_cell, ckey, acc_key)
            new_attrs = tuple(
                jnp.where(in_cell, cattrs[ch], acc_attrs[ch])
                for ch in range(nattr)
            )
            if vis:
                new_pair = jnp.where(in_cell, cpair, acc_pair)
                return new_key, new_pair, new_attrs, cur
            return new_key, new_attrs, cur

        if vis:
            acc_key, acc_pair, acc_attrs, cur = jax.lax.cond(
                n > 0, do_cell, lambda carry: carry,
                (acc_key, acc_pair, acc_attrs, cur)
            )
        else:
            acc_key, acc_attrs, cur = jax.lax.cond(
                n > 0, do_cell, lambda carry: carry,
                (acc_key, acc_attrs, cur)
            )

    if vis:
        # Visibility output: the winner's absolute PAIR index (the XLA tail
        # maps it to a triangle id via the sorted pair list) + depth key.
        rgba_ref[:, :] = acc_pair
        key_ref[:, :] = acc_key
        return

    if texf:
        # Fused-texture epilogue (shared with the tile kernel): emit the
        # common.TEXF G-buffer; the XLA tail is one texel fetch.
        _emit_texf_gbuffer(
            rgba_ref, key_ref, lights_ref, acc_key, acc_attrs,
            params_ref[1, 0], params_ref[1, 1], params_ref[1, 2],
            num_lights=num_lights,
        )
        return

    # -- shading epilogue: identical to pallas_raster._raster_tile ----------
    nx, ny, nz = acc_attrs[0], acc_attrs[1], acc_attrs[2]
    wx, wy, wz = acc_attrs[3], acc_attrs[4], acc_attrs[5]

    eye_x = params_ref[1, 0]
    eye_y = params_ref[1, 1]
    eye_z = params_ref[1, 2]

    if mat:
        # Material epilogue: ambient + diffuse modulated by the winner's
        # kd; specular unmodulated (same op order as common.shade and the
        # tile kernel's material branch).
        kdr, kdg, kdb = acc_attrs[6], acc_attrs[7], acc_attrs[8]
        r = F32(0.1) * kdr
        g = F32(0.1) * kdg
        b = F32(0.1) * kdb
    else:
        r = jnp.full((8, 128), F32(0.1))
        g = jnp.full((8, 128), F32(0.1))
        b = jnp.full((8, 128), F32(0.1))

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

        edotn = -(ldx * nx + ldy * ny + ldz * nz)
        rdx = -ldx - F32(2.0) * edotn * nx
        rdy = -ldy - F32(2.0) * edotn * ny
        rdz = -ldz - F32(2.0) * edotn * nz
        sp = vdx * rdx + vdy * rdy + vdz * rdz
        sp = jnp.where(sp > F32(0.0), sp, F32(0.0))
        spec = _pow32(sp)

        if mat:
            spec_half = spec * F32(0.5)
            r = r + (diff * kdr + spec_half) * lcr * inten
            g = g + (diff * kdg + spec_half) * lcg * inten
            b = b + (diff * kdb + spec_half) * lcb * inten
        else:
            contrib = diff + spec * F32(0.5)
            r = r + contrib * lcr * inten
            g = g + contrib * lcg * inten
            b = b + contrib * lcb * inten

    flag = acc_key != DEPTH_CLEAR_BITS
    gamma = F32(1.0 / 2.2)
    r = jnp.power(jnp.clip(r, F32(0.0), F32(1.0)), gamma)
    g = jnp.power(jnp.clip(g, F32(0.0), F32(1.0)), gamma)
    b = jnp.power(jnp.clip(b, F32(0.0), F32(1.0)), gamma)

    ri = jnp.round(r * F32(255.0)).astype(jnp.int32).astype(jnp.uint32)
    gi = jnp.round(g * F32(255.0)).astype(jnp.int32).astype(jnp.uint32)
    bi = jnp.round(b * F32(255.0)).astype(jnp.int32).astype(jnp.uint32)
    shaded = ri | (gi << 8) | (bi << 16) | jnp.uint32(0xFF000000)
    background = jnp.uint32(0xFFFF0000)

    rgba_ref[:, :] = jnp.where(flag, shaded, background)
    key_ref[:, :] = acc_key


CHUNK_ROWS = 512  # rows per streamed window chunk (2 x 256 KiB VMEM
#                   buffers); 16 superblocks of 32 rows = 2048 pairs
CHUNK_ROWS_MAT = 520  # material stream: 13 superblocks of 40 rows
#                       (1664 pairs; 2 x 260 KiB VMEM buffers)
CHUNK_ROWS_TEX = 480  # fused-texture stream: 10 superblocks of 48 rows
#                       (1280 pairs; 2 x 240 KiB VMEM buffers)


def default_chunk_rows(mat: bool, texf: bool = False) -> int:
    if texf:
        return CHUNK_ROWS_TEX
    return CHUNK_ROWS_MAT if mat else CHUNK_ROWS


def build_tri_table_c64(screen_soa, nrm_soa, wld_soa, face_kd=None,
                        uv_soa=None, tex_rows=None):
    """(T, 16) complex64 coefficient table: element k of row t packs
    coefficients (2k, 2k+1) as (real, imag).

    XLA:TPU gather cost is ~1.6 ns per *element* regardless of element
    width (measured), so packing f32 pairs into complex64 halves the
    pair-order gather — the single most expensive op of the mega-scene
    frame. Bit-exact: complex pack/unpack moves the f32 payloads verbatim
    (no arithmetic; the table's only non-finite values are qNaNs from
    degenerate triangles, which quieting maps to themselves).

    With ``face_kd`` (T, 3) the material columns append (35 wide, one zero
    pad column to keep pairs even) -> (T, 18) complex64. With
    ``uv_soa``/``tex_rows`` (fused texturing, pallas_raster layout) the
    44 columns pack to (T, 22)."""
    from compute_renderer_tpu.backends import pallas_raster

    cols = pallas_raster.tri_table_columns(screen_soa, nrm_soa, wld_soa,
                                           face_kd=face_kd, uv_soa=uv_soa,
                                           tex_rows=tex_rows)
    if len(cols) % 2:
        cols = cols + [jnp.zeros_like(cols[0])]
    packed = [
        jax.lax.complex(cols[2 * k], cols[2 * k + 1])
        for k in range(len(cols) // 2)
    ]
    return jnp.stack(packed, axis=1)


def build_tri_table_c64_cm(screen_soa, nrm_soa, wld_soa, face_kd=None,
                           uv_soa=None, tex_rows=None):
    """Column-major twin of ``build_tri_table_c64``: (R2, T) complex64 with
    TRIANGLES ON LANES — row k packs coefficient columns (2k, 2k+1).

    The table build stacks the same contiguous (T,) coefficient columns
    either way; what changes is the downstream pair gather
    (``build_pair_coeffs_cm``): gathering pairs along the LANE axis leaves
    the stream's coefficient-major layout one majors-permute away, where
    the row-major form needs a 128x32 lane transpose per superblock.

    MEASURED SLOWER on v5e (scripts/ab_expand_coeffs.py, 2026-08-20,
    1M tris / 327k pairs): the lane-axis gather costs 4.02 ms vs 2.49 for
    the row gather — XLA:TPU gathers whole (1, 16) c64 rows far faster
    than strided (16, 1) columns — and the full colmajor build is 4.92 vs
    4.19 row-major. Kept (with ``micro_colmajor``) as the documented
    negative result; the row-major build stays the default."""
    from compute_renderer_tpu.backends import pallas_raster

    cols = pallas_raster.tri_table_columns(screen_soa, nrm_soa, wld_soa,
                                           face_kd=face_kd, uv_soa=uv_soa,
                                           tex_rows=tex_rows)
    if len(cols) % 2:
        cols = cols + [jnp.zeros_like(cols[0])]
    packed = [
        jax.lax.complex(cols[2 * k], cols[2 * k + 1])
        for k in range(len(cols) // 2)
    ]
    return jnp.stack(packed, axis=0)


def build_pair_coeffs_cm(tabT, pair_tri, chunk_rows: int | None = None):
    """``build_pair_coeffs`` from the column-major (R2, T) c64 table:
    bit-identical output stream, but the P-sized gather indexes the LANE
    axis, so no 128x32 lane transpose remains — only a majors permute
    (sublane/lane axes untouched, a strided copy at HBM rate). Pad values
    match the row-major build exactly (zeros beyond the real pairs)."""
    g = tabT[:, pair_tri]  # (R2, P) c64
    gf = jnp.stack([jnp.real(g), jnp.imag(g)], axis=1).reshape(
        2 * g.shape[0], g.shape[1]
    )  # (width, P) f32; row order matches the row-major interleave
    width = gf.shape[0]
    if width <= SB_ROWS:
        rows = SB_ROWS
    elif width <= 36:
        rows = SB_ROWS_MAT
    else:
        rows = SB_ROWS_TEX
    if chunk_rows is None:
        chunk_rows = default_chunk_rows(rows == SB_ROWS_MAT,
                                        texf=rows == SB_ROWS_TEX)
    chunk_pairs = (chunk_rows // rows) * 128
    P = gf.shape[1]
    P_pad = ((P + 127) // 128) * 128 + chunk_pairs + 128
    gf = jnp.pad(gf, ((0, rows - width), (0, P_pad - P)))
    return gf.reshape(rows, -1, 128).transpose(1, 0, 2).reshape(-1, 128)


def build_pair_coeffs(tri_table, pair_tri, chunk_rows: int | None = None):
    """Coefficient-major packed pair stream: (R, 128) f32 where superblock
    sb (rows W*sb .. W*sb+W-1, W = 32 base / 40 material) holds pairs
    128*sb .. 128*sb+127 — ``out[W*sb + r, l]`` is coefficient r of pair
    128*sb + l.

    Gathers the affine table into sorted-pair order and transposes per
    128-pair superblock: 32 B/pair in the stream, dense (the row-per-pair
    form padded 32 lanes to 128 — a 4x pad write and 4x the kernel DMA
    bytes). ``tri_table`` may be the f32 table ((T, 32), or (T, 35) with
    the material kd columns) or the complex64 packed form
    (``build_tri_table_c64``) — the latter halves the gather's element
    count, 2x on TPU. Material tables pad to the 40-row superblock
    (``SB_ROWS_MAT``). Tail pairs pad so the last chunk read of
    ``chunk_rows`` rows stays in bounds."""
    gathered = tri_table[pair_tri]  # (P, 32|35|44) f32 | (P, 16|18|22) c64
    if jnp.iscomplexobj(gathered):
        gathered = jnp.stack(
            [jnp.real(gathered), jnp.imag(gathered)], axis=2
        ).reshape(gathered.shape[0], -1)
    width = gathered.shape[1]
    if width <= SB_ROWS:
        rows = SB_ROWS
    elif width <= 36:
        rows = SB_ROWS_MAT
    else:
        rows = SB_ROWS_TEX
    if chunk_rows is None:
        chunk_rows = default_chunk_rows(rows == SB_ROWS_MAT,
                                        texf=rows == SB_ROWS_TEX)
    chunk_pairs = (chunk_rows // rows) * 128
    P = gathered.shape[0]
    P_pad = ((P + 127) // 128) * 128 + chunk_pairs + 128
    g = jnp.pad(gathered, ((0, P_pad - P), (0, rows - width)))
    return g.reshape(-1, 128, rows).transpose(0, 2, 1).reshape(-1, 128)


@functools.partial(
    jax.jit,
    static_argnames=("height_padded", "width_padded", "chunk_rows",
                     "interpret", "effect_kind", "worklist", "mat", "vis",
                     "texf", "unroll", "tree", "prefetch"),
)
def raster_shade_micro(
    pair_coeffs,  # (P_pad, 128) f32
    seg_start,  # (num_cells,) i32
    seg_count,  # (num_cells,) i32
    win_start,  # (num_tiles,) i32
    tile_count,  # (num_tiles,) i32
    effect,  # (6,) f32
    view_position,  # (4,) f32
    light_world_pos,  # (L, 3) f32
    light_color,  # (L, 3) f32
    light_intensity,  # (L,) f32
    *,
    height_padded: int,
    width_padded: int,
    chunk_rows: int | None = None,
    interpret: bool = False,
    y_offset=0,
    effect_kind: int | None = None,
    worklist: bool = True,
    mat: bool = False,
    vis: bool = False,
    texf: bool = False,
    unroll: int = 2,
    tree: bool = False,
    prefetch: bool = True,
):
    """Run the micro kernel over the padded framebuffer.

    ``texf`` (static MODE, not flag): True — fused-texture walk;
    ``pair_coeffs`` must come from a TEX-width (44) table; the first
    output is the (C, Hp, Wp) f32 common.TEXF G-buffer
    (C = texf_channels(L)) and the XLA tail (common.fused_texture_tail)
    is one texel fetch. TEXF_MIP (2) — mip-filtered fused texturing; the
    table must be TEX_MIP-width (46, mip constants in place of the
    TextureInfo row), the G-buffer is the TEXF_MIP layout
    (texf_mip_channels(L)) and the tail common.fused_texture_tail_mip.
    The packed stream pads both widths to the same 48-row superblock, so
    the mode cannot be inferred from shapes — callers pass it explicitly.
    Mutually exclusive with ``mat``/``vis``.

    ``vis`` (static): visibility-only walk (deferred texturing) — the
    first output is the winner's absolute PAIR index (Hp,Wp) i32
    (PAIR_IDX_CLEAR where uncovered; map to a triangle via the sorted pair
    list) instead of shaded RGBA. Mutually exclusive with ``mat`` (kd
    applies in the deferred tail).

    ``effect_kind`` (static, optional): the scene's EFFECT_* code, fixed
    per SceneConfig. Declaring a non-mirage kind compiles the sample warp
    out of the kernel; None keeps the dynamic (always-correct) form.

    ``worklist`` (default on): dynamic grid over occupied tiles only, the
    micro analog of the tile path's measured-3.3x work-list kernel;
    bitwise-identical output (empty tiles come from the pre-cleared
    aliased framebuffer).

    ``mat`` (static): material-extension stream — 40-row superblocks with
    the winner's per-triangle kd (rows 32:35) carried to the modulated
    shading epilogue. ``pair_coeffs`` must come from a material table.

    Returns (rgba_packed (Hp,Wp) u32, best_key (Hp,Wp) u32)."""
    nty = height_padded // 8
    ntx = width_padded // 128
    if chunk_rows is None:
        chunk_rows = default_chunk_rows(mat, texf=texf)

    from compute_renderer_tpu.backends import common

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
    )

    # Static specialization: when the caller declares the scene's effect
    # kind (fixed per SceneConfig; only params animate), a non-mirage frame
    # compiles WITHOUT the per-cell sin/cos sample warp. effect_kind=None
    # (unknown) keeps the branchless dynamic form — always correct.
    skip_mirage = effect_kind is not None and effect_kind != EFFECT_MIRAGE
    if vis and mat:
        raise ValueError("vis and mat are mutually exclusive (kd applies "
                         "in the deferred tail)")
    if texf and (vis or mat):
        raise ValueError("texf is mutually exclusive with vis/mat")
    out0_dtype = jnp.int32 if vis else (F32 if texf else jnp.uint32)
    from compute_renderer_tpu.backends import common as _common

    C = (_common.texf_mip_channels(num_lights) if texf == TEXF_MIP
         else _common.texf_channels(num_lights))
    if texf:
        out0_shape = (C, height_padded, width_padded)
        out0_block = (C, 8, 128)
        out0_index = lambda i, j: (0, i, j)
        out0_index_wl = lambda i, wl: (0, wl[i] // ntx, wl[i] % ntx)
    else:
        out0_shape = (height_padded, width_padded)
        out0_block = (8, 128)
        out0_index = lambda i, j: (i, j)
        out0_index_wl = lambda i, wl: (wl[i] // ntx, wl[i] % ntx)

    scratch_shapes = [
        pltpu.VMEM((chunk_rows, 128), F32),
        pltpu.VMEM((chunk_rows, 128), F32),
        pltpu.SemaphoreType.DMA,
        pltpu.SemaphoreType.DMA,
    ]
    if worklist:
        from compute_renderer_tpu.backends.pallas_raster import (
            occupied_worklist,
        )

        if prefetch:
            # Cross-step buffer parity (see _micro_kernel_wl).
            scratch_shapes = scratch_shapes + [
                pltpu.SMEM((1,), jnp.int32)
            ]
        wl, k = occupied_worklist(tile_count.astype(jnp.int32))
        wl_kernel = functools.partial(
            _micro_kernel_wl, ntx=ntx, num_lights=num_lights,
            skip_mirage=skip_mirage, mat=mat, vis=vis, texf=texf,
            unroll=unroll, tree=tree, prefetch=prefetch,
        )
        if vis:
            rgba_clear = jnp.full((height_padded, width_padded),
                                  PAIR_IDX_CLEAR, jnp.int32)
        elif texf:
            rgba_clear = jnp.zeros(out0_shape, F32)
        else:
            rgba_clear = jnp.full((height_padded, width_padded),
                                  0xFFFF0000, jnp.uint32)
        key_clear = jnp.full((height_padded, width_padded),
                             DEPTH_CLEAR_BITS, jnp.uint32)
        hbm = pl.ANY if interpret else pltpu.HBM
        rgba, best_key = pl.pallas_call(
            wl_kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(k,),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.SMEM),  # params
                    pl.BlockSpec(memory_space=pltpu.SMEM),  # lights
                    pl.BlockSpec(memory_space=pltpu.SMEM),  # seg_start
                    pl.BlockSpec(memory_space=pltpu.SMEM),  # seg_count
                    pl.BlockSpec(memory_space=pltpu.SMEM),  # win_start
                    pl.BlockSpec(memory_space=pltpu.SMEM),  # tile_count
                    pl.BlockSpec(memory_space=hbm),  # pair coeffs
                    pl.BlockSpec(memory_space=pl.ANY),  # aliased rgba clear
                    pl.BlockSpec(memory_space=pl.ANY),  # aliased key clear
                ],
                out_specs=[
                    pl.BlockSpec(
                        out0_block, out0_index_wl,
                        memory_space=pltpu.VMEM,
                    ),
                    pl.BlockSpec(
                        (8, 128),
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
            input_output_aliases={8: 0, 9: 1},
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
            ),
            interpret=interpret,
        )(wl, params, lights, seg_start.astype(jnp.int32),
          seg_count.astype(jnp.int32), win_start.astype(jnp.int32),
          tile_count.astype(jnp.int32), pair_coeffs, rgba_clear, key_clear)
        return rgba, best_key

    kernel = functools.partial(_micro_kernel, num_lights=num_lights,
                               unroll=unroll, tree=tree,
                               skip_mirage=skip_mirage, mat=mat, vis=vis,
                               texf=texf)
    rgba, best_key = pl.pallas_call(
        kernel,
        grid=(nty, ntx),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # params
            pl.BlockSpec(memory_space=pltpu.SMEM),  # lights
            pl.BlockSpec(memory_space=pltpu.SMEM),  # seg_start
            pl.BlockSpec(memory_space=pltpu.SMEM),  # seg_count
            pl.BlockSpec(memory_space=pltpu.SMEM),  # win_start
            pl.BlockSpec(memory_space=pltpu.SMEM),  # tile_count
            pl.BlockSpec(memory_space=pl.ANY if interpret else pltpu.HBM),
        ],
        out_specs=[
            pl.BlockSpec(out0_block, out0_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(out0_shape, out0_dtype),
            jax.ShapeDtypeStruct((height_padded, width_padded), jnp.uint32),
        ],
        scratch_shapes=scratch_shapes,
        # Sequential: window-chunk DMA buffers are reused across grid steps
        # (every issue is waited within its tile, so buffers are idle at
        # each tile boundary).
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(params, lights, seg_start.astype(jnp.int32),
      seg_count.astype(jnp.int32), win_start.astype(jnp.int32),
      tile_count.astype(jnp.int32), pair_coeffs)
    return rgba, best_key
