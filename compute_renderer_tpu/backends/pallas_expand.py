"""Pallas pair-expansion kernel for the mega-scene (micro) path.

Replaces the XLA chain that turned per-triangle covered-cell counts into the
(cell, triangle) pair list fed to the binning sort:

    scatter seed -> cummax -> meta gather -> cell math

Each of those is an O(T)- or O(P)-sized gather/scatter that XLA executes at
~2-20 GB/s on TPU (measured ~10 ms/frame at 1M triangles). This kernel
streams the same work at VPU/MXU rates in ONE sequential pass over triangle
blocks:

- the per-triangle pair offsets (``starts`` = exclusive cumsum of counts)
  come from XLA — they are global, so no carry chain is needed;
- each block emits its pair range in CH-sized chunks (dynamic trip count):
  an interval-membership matrix Gt[j, t] = (start_t <= q_j < start_t + c_t)
  — exactly one nonzero per valid row — turns "which triangle owns pair
  q_j" into one exact f32 matmul that broadcasts all per-triangle fields
  (start, rect width, rect origin, triangle id) to their pairs. All values
  are < 2^24, so f32 is exact. Every operand keeps the triangle/pair axis
  on *lanes* (Mosaic rejects lane<->sublane shape casts on real TPU; the
  (CH, B) x (F, B) dim1-dim1 contraction needs no relayout);
- cell ids are computed in-block (rect walk via exact f32 floor-division
  with a one-step correction — TPU has no vector integer divide);
- the chunk walk is CH-aligned in global pair space, so chunk results
  merge into the (1, pair_cap) outputs with plain aligned read-modify-
  writes (masked where a boundary chunk overlaps a neighbor block's
  pairs); the sequential grid makes the RMWs race-free.

Outputs match ``binning.bin_cells_sort``'s pre-sort arrays bitwise in the
valid region: ``cell_of_pair`` (invalid tail = num_cells sentinel) and
``tri_of_pair`` (tail zeros). Capacity overflow is reported via
``total_pairs`` exactly as before.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

F32 = jnp.float32
I32 = jnp.int32

# Kernel geometry defaults. Per-chunk work scales ~ P*bsz + T*ch (the
# membership matrix is (ch, bsz) and every chunk touches the whole block),
# so smaller blocks/chunks do strictly less arithmetic until grid-step
# overheads dominate. Hardware sweep (scripts/ab_expand_bc.py, v5e
# 2026-08-21, 8 combos x 2 scenes, bitwise-checked): (512, 256) wins at
# both scales — structured 700k pairs 5.81 -> 3.05 ms, San Miguel 327k
# 4.18 -> 1.69 ms vs the former (1024, 512); (256, 256) regresses (grid
# overhead), (2048, 1024) is 3x worse.
B = 512  # triangles per grid step (default; see expand_cells bsz/ch)
CH = 256  # pairs per emission chunk (bounds the (CH, B) VMEM temporaries)
PAD = 3072  # output slack so aligned RMW windows never go out of bounds


def blocked_cumsum_i32(c):
    """Inclusive i32 cumsum via a two-level block decomposition: lane-dim
    cumsums within 1024-element blocks + a cumsum of block totals.

    ``jnp.cumsum`` over a (T,) i32 row lowers to a serialized whole-array
    scan on TPU — measured as the bulk of the 4.0 ms "expand" stage at 1M
    triangles (binning_profile2: the expansion kernel itself is 0.49 ms).
    The blocked form keeps both levels vectorized. Integer addition is
    associative and exact, so the result is bit-identical to jnp.cumsum
    (asserted in scripts/ab_expand_coeffs.py and tests/test_binning.py)."""
    n = c.shape[0]
    c = c.astype(I32)
    if n <= 1024:
        return jnp.cumsum(c)
    npad = (n + 1023) // 1024 * 1024
    r = jnp.pad(c, (0, npad - n)).reshape(-1, 1024)
    within = jnp.cumsum(r, axis=1)
    tot = within[:, -1]
    offs = jnp.cumsum(tot) - tot
    return (within + offs[:, None]).reshape(-1)[:n]


def _expand_kernel(
    # SMEM scalars
    dims_ref,  # (4,) i32: [T, ntx_t, num_cells, pair_cap]
    # blocked inputs (1, bsz) i32 per grid step
    starts_ref,
    c_ref,
    rx_ref,
    x0_ref,
    y0_ref,
    # outputs (full, VMEM)
    cell_ref,  # (1, cap_pad) i32
    tri_ref,  # (1, cap_pad) i32
    total_ref,  # (1,) i32 SMEM
    *,
    form: str = "dim1",
    bsz: int = B,
    ch: int = CH,
):
    i = pl.program_id(0)
    n = pl.num_programs(0)
    ntx_t = dims_ref[1]
    num_cells = dims_ref[2]
    pair_cap = dims_ref[3]
    cap_pad = cell_ref.shape[1]

    @pl.when(i == 0)
    def _():
        # Sentinel-fill the outputs (the sort relies on the invalid tail
        # sorting past every real cell id).
        def body(k, _):
            o = pl.multiple_of(k * 1024, 1024)
            cell_ref[0:1, pl.ds(o, 1024)] = jnp.full(
                (1, 1024), num_cells, I32
            )
            tri_ref[0:1, pl.ds(o, 1024)] = jnp.zeros((1, 1024), I32)
            return 0

        jax.lax.fori_loop(0, cap_pad // 1024, body, 0)

    # Block pair range via reductions (starts and starts+c are both
    # non-decreasing; Mosaic has no cheap single-lane extract).
    first = jnp.min(starts_ref[0:1, :])
    last_end = jnp.max(starts_ref[0:1, :] + c_ref[0:1, :])

    # f32-exact per-triangle fields (all < 2^24), lane-major (F, B).
    lane_t = jax.lax.broadcasted_iota(I32, (1, bsz), 1)
    F = jnp.concatenate(
        [
            starts_ref[0:1, :].astype(F32),
            jnp.maximum(rx_ref[0:1, :], 1).astype(F32),
            x0_ref[0:1, :].astype(F32),
            y0_ref[0:1, :].astype(F32),
            (i * bsz + lane_t).astype(F32),
        ],
        axis=0,
    )  # (5, B)

    starts_b = jnp.broadcast_to(starts_ref[0:1, :].astype(F32), (ch, bsz))
    ends_b = starts_b + jnp.broadcast_to(c_ref[0:1, :].astype(F32), (ch, bsz))
    sub_j = jax.lax.broadcasted_iota(I32, (ch, bsz), 0).astype(F32)

    # The chunk walk is CH-aligned in GLOBAL pair space, so every output
    # window is an aligned direct load/store (no lane rolls, no unaligned
    # slices — Mosaic requires provable 128-multiples on the lane dim).
    # Rows of an aligned chunk before ``first`` belong to earlier blocks:
    # their owner is outside this block's window, the membership matrix
    # row is all-zero, and the store mask excludes them; the sequential
    # grid makes the boundary read-modify-writes race-free.
    qbase = (first // ch) * ch
    nchunks = (last_end - qbase + ch - 1) // ch
    # Skip chunks wholly past capacity (their pairs are dropped anyway).
    max_chunks = jnp.maximum(
        jnp.minimum(nchunks, (pair_cap - qbase + ch - 1) // ch), 0
    )

    def chunk(k, _):
        qg = qbase + k * ch  # global pair index of this chunk's row 0
        qj = sub_j + qg.astype(F32)  # (ch, bsz): pair id per row

        # Interval membership: exactly one nonzero per valid column of the
        # contraction, so the dot is a bit-exact broadcast of each field to
        # its pairs. Contracting both dim-1 (the triangle lanes) lands the
        # result directly in lane-major (5, CH) — no transpose needed.
        Gt = ((starts_b <= qj) & (qj < ends_b)).astype(F32)  # (ch, bsz)
        if form == "mxu":
            # MXU-natural contraction (5, B) @ (B, CH) via an explicit
            # in-kernel transpose — the alternative the hardware bisect
            # (scripts/bisect_pallas_expand.py) compares against the
            # dim1-dim1 form below, the prime scalarization suspect.
            vals = jax.lax.dot_general(
                F, Gt.T, (((1,), (0,)), ((), ())),
                preferred_element_type=F32,
                precision=jax.lax.Precision.HIGHEST,
            )  # (5, CH)
        else:
            vals = jax.lax.dot_general(
                F, Gt, (((1,), (1,)), ((), ())),
                preferred_element_type=F32,
                precision=jax.lax.Precision.HIGHEST,
            )  # (5, CH): start, rx, x0, y0, tri per pair

        lane_q = jax.lax.broadcasted_iota(I32, (1, ch), 1).astype(F32)
        qrow = lane_q + qg.astype(F32)  # (1, ch) global pair ids
        owner_start = vals[0:1, :]
        rxv = jnp.maximum(vals[1:2, :], F32(1.0))
        local = qrow - owner_start
        # floor(local / rx) with one-step correction (exact for ints <2^24).
        qd = jnp.floor(local / rxv)
        rem = local - qd * rxv
        qd = jnp.where(rem < F32(0.0), qd - F32(1.0), qd)
        rem = jnp.where(rem < F32(0.0), rem + rxv, rem)
        over = rem >= rxv
        qd = jnp.where(over, qd + F32(1.0), qd)
        rem = jnp.where(over, rem - rxv, rem)

        cx = vals[2:3, :] + rem
        cy = vals[3:4, :] + qd
        cell16 = jnp.floor(cx / F32(16.0))
        cxm = cx - cell16 * F32(16.0)
        cellv = (cy * ntx_t.astype(F32) + cell16) * F32(16.0) + cxm
        cell_i = cellv.astype(I32)  # (1, ch)
        tri_i = vals[4:5, :].astype(I32)

        # Aligned RMW merge into the (1, cap_pad) outputs.
        w0 = pl.multiple_of(qg, ch)
        gidx = qg + jax.lax.broadcasted_iota(I32, (1, ch), 1)
        mask = (gidx >= first) & (gidx < last_end) & (gidx < pair_cap)

        cw = cell_ref[0:1, pl.ds(w0, ch)]
        cell_ref[0:1, pl.ds(w0, ch)] = jnp.where(mask, cell_i, cw)
        tw = tri_ref[0:1, pl.ds(w0, ch)]
        tri_ref[0:1, pl.ds(w0, ch)] = jnp.where(mask, tri_i, tw)
        return 0

    jax.lax.fori_loop(0, max_chunks, chunk, 0)

    @pl.when(i == n - 1)
    def _():
        total_ref[0] = last_end


@functools.partial(jax.jit, static_argnames=("pair_cap", "ntx_t", "num_cells",
                                             "interpret", "form",
                                             "bsz", "ch"))
def expand_cells(c, rx, x0, y0, *, pair_cap: int, ntx_t: int,
                 num_cells: int, interpret: bool = False,
                 form: str = "dim1", bsz: int = B, ch: int = CH):
    """Pair expansion + cell computation (see module docstring).

    Args: per-triangle (T,) i32 arrays — covered-cell count ``c`` (0 for
    culled), rect width ``rx``, rect origin ``x0``/``y0`` in cell coords.

    ``form``: contraction lowering — "dim1" (the original dim1-dim1
    dot_general) or "mxu" (explicit transpose + MXU-natural (5,B)@(B,CH));
    bit-exact either way (the membership matrix has one nonzero per valid
    column). The hardware bisect picks the faster.

    Returns (cell_of_pair (pair_cap,), tri_of_pair (pair_cap,),
    total_pairs ()) matching ``bin_cells_sort``'s pre-sort arrays."""
    T = c.shape[0]
    starts = blocked_cumsum_i32(c) - c.astype(I32)
    Tpad = (T + bsz - 1) // bsz * bsz
    if Tpad != T:
        z = jnp.zeros((Tpad - T,), I32)
        total = starts[-1] + c[-1]
        starts = jnp.concatenate([starts, jnp.full((Tpad - T,), total, I32)])
        c = jnp.concatenate([c.astype(I32), z])
        rx = jnp.concatenate([rx.astype(I32), z])
        x0 = jnp.concatenate([x0.astype(I32), z])
        y0 = jnp.concatenate([y0.astype(I32), z])
    cap_pad = (pair_cap + max(PAD, 6 * ch) + 1023) // 1024 * 1024

    dims = jnp.array([T, ntx_t, num_cells, pair_cap], I32)
    as_row = lambda a: a.astype(I32).reshape(1, -1)
    grid = (Tpad // bsz,)
    cell, tri, total = pl.pallas_call(
        functools.partial(_expand_kernel, form=form, bsz=bsz, ch=ch),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # dims
            pl.BlockSpec((1, bsz), lambda i: (0, i)),
            pl.BlockSpec((1, bsz), lambda i: (0, i)),
            pl.BlockSpec((1, bsz), lambda i: (0, i)),
            pl.BlockSpec((1, bsz), lambda i: (0, i)),
            pl.BlockSpec((1, bsz), lambda i: (0, i)),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, cap_pad), I32),
            jax.ShapeDtypeStruct((1, cap_pad), I32),
            jax.ShapeDtypeStruct((1,), I32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(dims, as_row(starts), as_row(c), as_row(rx), as_row(x0), as_row(y0))
    return cell[0, :pair_cap], tri[0, :pair_cap], total[0]
