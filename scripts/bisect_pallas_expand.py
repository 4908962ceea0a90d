"""Stage bisect for the Pallas pair-expansion kernel's Mosaic slowdown.

``backends/pallas_expand.py`` is bit-exact but ran ~100x slower than its
~4 ms projection on TPU (NOTES_ROUND3 item 1 / VERDICT r2 weak #2) —
something in the Mosaic lowering scalarizes. This harness times CUMULATIVE
stage levels of a parameterized copy of the kernel at mega-scene scale, so
one run on real hardware pinpoints the scalarized stage:

  L0  output sentinel fill only
  L1  + membership matrix build (CH, B) compares
  L2  + interval-membership dot_general (the dim1-dim1 contraction suspect)
  L2t + the same contraction via explicit transpose + MXU-natural form
  L3  + rect-walk cell math
  L4  + aligned RMW merge (== the full kernel)

and the XLA scatter/cummax/gather expansion as the baseline to beat.

Run ON TPU HARDWARE (the measurement is meaningless in interpret mode):

    python scripts/bisect_pallas_expand.py [--tris 1000000] [--iters 20]

Prints one JSON line per level; the first level whose time explodes names
the scalarized stage. Requires the axon tunnel to be up.
"""

from __future__ import annotations

import argparse
import functools
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from compute_renderer_tpu.backends import binning

F32 = jnp.float32
I32 = jnp.int32
B = 1024
CH = 512
PAD = 3072


def make_kernel(level: str):
    """Parameterized copy of pallas_expand._expand_kernel: stages beyond
    ``level`` are replaced by cheap substitutes with the same output
    contract shape (results are NOT correct below L4 — timing only)."""

    def kernel(dims_ref, starts_ref, c_ref, rx_ref, x0_ref, y0_ref,
               cell_ref, tri_ref, total_ref):
        i = pl.program_id(0)
        n = pl.num_programs(0)
        ntx_t = dims_ref[1]
        num_cells = dims_ref[2]
        pair_cap = dims_ref[3]
        cap_pad = cell_ref.shape[1]

        @pl.when(i == 0)
        def _():
            def body(k, _):
                o = pl.multiple_of(k * 1024, 1024)
                cell_ref[0:1, pl.ds(o, 1024)] = jnp.full((1, 1024),
                                                         num_cells, I32)
                tri_ref[0:1, pl.ds(o, 1024)] = jnp.zeros((1, 1024), I32)
                return 0

            jax.lax.fori_loop(0, cap_pad // 1024, body, 0)

        @pl.when(i == n - 1)
        def _():
            total_ref[0] = jnp.max(starts_ref[0:1, :] + c_ref[0:1, :])

        if level == "L0":
            return

        first = jnp.min(starts_ref[0:1, :])
        last_end = jnp.max(starts_ref[0:1, :] + c_ref[0:1, :])
        lane_t = jax.lax.broadcasted_iota(I32, (1, B), 1)
        F = jnp.concatenate(
            [starts_ref[0:1, :].astype(F32),
             jnp.maximum(rx_ref[0:1, :], 1).astype(F32),
             x0_ref[0:1, :].astype(F32),
             y0_ref[0:1, :].astype(F32),
             (i * B + lane_t).astype(F32)], axis=0)  # (5, B)

        starts_b = jnp.broadcast_to(starts_ref[0:1, :].astype(F32), (CH, B))
        ends_b = starts_b + jnp.broadcast_to(c_ref[0:1, :].astype(F32),
                                             (CH, B))
        sub_j = jax.lax.broadcasted_iota(I32, (CH, B), 0).astype(F32)

        qbase = (first // CH) * CH
        nchunks = (last_end - qbase + CH - 1) // CH
        max_chunks = jnp.maximum(
            jnp.minimum(nchunks, (pair_cap - qbase + CH - 1) // CH), 0)

        def chunk(k, _):
            qg = qbase + k * CH
            qj = sub_j + qg.astype(F32)
            Gt = ((starts_b <= qj) & (qj < ends_b)).astype(F32)  # (CH, B)

            if level == "L1":
                # Membership only: fold Gt into a scalar so it is not DCE'd.
                total_ref[0] = total_ref[0] + jnp.sum(Gt).astype(I32)
                return 0

            if level == "L2t":
                # MXU-natural contraction: (5, B) @ (B, CH).
                vals = jax.lax.dot_general(
                    F, Gt.T, (((1,), (0,)), ((), ())),
                    preferred_element_type=F32,
                    precision=jax.lax.Precision.HIGHEST)
            else:
                # The kernel's dim1-dim1 form (the prime suspect).
                vals = jax.lax.dot_general(
                    F, Gt, (((1,), (1,)), ((), ())),
                    preferred_element_type=F32,
                    precision=jax.lax.Precision.HIGHEST)  # (5, CH)

            if level in ("L2", "L2t"):
                total_ref[0] = total_ref[0] + jnp.sum(vals).astype(I32)
                return 0

            lane_q = jax.lax.broadcasted_iota(I32, (1, CH), 1).astype(F32)
            qrow = lane_q + qg.astype(F32)
            owner_start = vals[0:1, :]
            rxv = jnp.maximum(vals[1:2, :], F32(1.0))
            local = qrow - owner_start
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
            cell_i = cellv.astype(I32)
            tri_i = vals[4:5, :].astype(I32)

            if level == "L3":
                # Cell math without the dynamic-offset RMW: store to a
                # fixed aligned window instead.
                cell_ref[0:1, pl.ds(0, CH)] = cell_i
                tri_ref[0:1, pl.ds(0, CH)] = tri_i
                return 0

            w0 = pl.multiple_of(qg, CH)
            gidx = qg + jax.lax.broadcasted_iota(I32, (1, CH), 1)
            mask = (gidx >= first) & (gidx < last_end) & (gidx < pair_cap)
            cw = cell_ref[0:1, pl.ds(w0, CH)]
            cell_ref[0:1, pl.ds(w0, CH)] = jnp.where(mask, cell_i, cw)
            tw = tri_ref[0:1, pl.ds(w0, CH)]
            tri_ref[0:1, pl.ds(w0, CH)] = jnp.where(mask, tri_i, tw)
            return 0

        jax.lax.fori_loop(0, max_chunks, chunk, 0)

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("level", "pair_cap", "ntx_t",
                                    "num_cells"))
def run_level(c, rx, x0, y0, *, level, pair_cap, ntx_t, num_cells):
    T = c.shape[0]
    starts = jnp.cumsum(c.astype(I32)) - c.astype(I32)
    Tpad = (T + B - 1) // B * B
    if Tpad != T:
        z = jnp.zeros((Tpad - T,), I32)
        total = starts[-1] + c[-1]
        starts = jnp.concatenate([starts, jnp.full((Tpad - T,), total, I32)])
        c = jnp.concatenate([c.astype(I32), z])
        rx = jnp.concatenate([rx.astype(I32), z])
        x0 = jnp.concatenate([x0.astype(I32), z])
        y0 = jnp.concatenate([y0.astype(I32), z])
    cap_pad = (pair_cap + PAD + 1023) // 1024 * 1024
    dims = jnp.array([T, ntx_t, num_cells, pair_cap], I32)
    as_row = lambda a: a.astype(I32).reshape(1, -1)
    return pl.pallas_call(
        make_kernel(level),
        grid=(Tpad // B,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, B), lambda i: (0, i)),
            pl.BlockSpec((1, B), lambda i: (0, i)),
            pl.BlockSpec((1, B), lambda i: (0, i)),
            pl.BlockSpec((1, B), lambda i: (0, i)),
            pl.BlockSpec((1, B), lambda i: (0, i)),
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
            dimension_semantics=("arbitrary",)),
    )(dims, as_row(starts), as_row(c), as_row(rx), as_row(x0), as_row(y0))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tris", type=int, default=1_000_000)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    if jax.default_backend() != "tpu":
        print(json.dumps({"error": "not on TPU; timings meaningless",
                          "backend": jax.default_backend()}))
        return 1

    # Synthetic mega-scene coverage: ~1/3 of triangles alive with 1-4
    # covered cells (the measured San-Miguel-class mix).
    rng = np.random.default_rng(7)
    T = args.tris
    alive = rng.random(T) < 0.36
    rx = rng.integers(1, 3, T).astype(np.int32)
    ry = rng.integers(1, 3, T).astype(np.int32)
    c = np.where(alive, rx * ry, 0).astype(np.int32)
    x0 = rng.integers(0, 120, T).astype(np.int32)
    y0 = rng.integers(0, 90, T).astype(np.int32)
    ntx_t, num_cells = 8, 8 * 96 * 16
    pair_cap = int(c.sum() * 1.2) // 1024 * 1024 + 1024

    cj, rxj = jnp.asarray(c), jnp.asarray(rx)
    x0j, y0j = jnp.asarray(x0), jnp.asarray(y0)

    def timeit(fn):
        out = fn()
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn()
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / args.iters * 1e3

    results = {"tris": T, "pairs": int(c.sum()), "pair_cap": pair_cap}
    for level in ("L0", "L1", "L2", "L2t", "L3", "L4"):
        try:
            ms = timeit(lambda: run_level(
                cj, rxj, x0j, y0j, level=level, pair_cap=pair_cap,
                ntx_t=ntx_t, num_cells=num_cells))
        except Exception as e:  # a level can fail to lower — that IS data
            results[level] = f"FAILED: {type(e).__name__}"
            print(json.dumps({"level": level,
                              "error": f"{type(e).__name__}: {e}"[:300]}),
                  flush=True)
            continue
        results[level] = round(ms, 3)
        print(json.dumps({"level": level, "ms": round(ms, 3)}),
              flush=True)

    # XLA expansion baseline (identical c = rx*ry by construction).
    setup = {
        "tile_x0": x0j, "tile_x1": x0j + rxj,
        "tile_y0": y0j, "tile_y1": y0j + jnp.asarray(ry),
        "alive": jnp.asarray(alive),
    }
    ms_xla = timeit(lambda: binning.expand_cells_xla(
        setup, ntx_t, num_cells, pair_cap))
    results["xla_expand"] = round(ms_xla, 3)
    print(json.dumps({"level": "xla_expand", "ms": round(ms_xla, 3)}))
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
