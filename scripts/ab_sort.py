"""Hardware A/B of the global pair sort — the dominant front-end stage.

With the fused Pallas front end and Pallas pair expansion landed, the one
global ``lax.sort`` inside ``binning.bin_cells_sort`` is the largest
remaining front-end stage at mega scale (~6.6 ms of the 17.2 ms fused
1M-tri frame, benchmarks/hw_campaign/profile2.out.txt). TPU ``lax.sort``
cost scales with operand count and key width, so the candidates
reformulate the same grouping problem:

  stable2   current: stable single-key sort of (cell i32, tri i32)
  unstable2 two-key sort of (cell, pair_idx) + P-gather (keys unique)
  u16key    stable sort with the cell key narrowed to u16 (cell ids +
            sentinel fit 14 bits at 1024x768) carrying the i32 payload
  u32pack   unstable single-operand sort of cell<<B | pair_idx (unique
            keys reproduce the stable order exactly), tri recovered by one
            P-gather; eligible when cell_bits + idx_bits <= 32
  halfsplit two u32pack sorts of P/2 (each eligible one bit earlier) +
            merge-by-searchsorted + one packed c64 scatter — covers the
            mega case where u32pack is exactly one bit over
  i64pack   u32pack with 64-bit keys (always eligible). x64 must be
            enabled process-globally, which changes weak-type promotion
            for everything else, so this variant runs in its OWN
            subprocess (--variant i64pack) and is timed there.

All variants are verified element-equal to stable2 before timing.

    python scripts/ab_sort.py [--model ...] [--iters 12]

Prints one JSON line per variant plus a summary line.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

W, H = 1024, 768


def build_inputs(args):
    """(cell_of_pair, tri_of_pair, dims dict) — the pre-sort arrays of the
    mega-scene frame, produced by the production (non-x64) pipeline."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from compute_renderer_tpu.backends import binning, common
    from compute_renderer_tpu.engine.scene import (
        CameraConfig, Scene, SceneConfig,
    )
    from compute_renderer_tpu.io import procedural

    w, h = args.width, args.height
    mesh = procedural.make_model(args.model)
    scene = Scene.from_config(
        SceneConfig(camera_config=CameraConfig.first_person(
            [13.57, 2.63, 10.24])), w, h)
    u = scene.update(0.016)

    pos = jnp.asarray(mesh.positions)
    tri = jnp.asarray(mesh.indices.astype(np.int32)).reshape(-1, 3)
    vp = jnp.asarray(u.view_proj)
    eff = jnp.asarray(u.effect)

    T = int(tri.shape[0])
    ntx = (w + 127) // 128
    nty = (h + 7) // 8
    num_cells = ntx * nty * 16
    pair_cap = binning.default_pair_cap_micro(T, num_cells)
    interpret = jax.default_backend() != "tpu"

    # Under x64 (the i64pack subprocess) the Pallas expansion kernel's
    # Mosaic lowering dies with a RecursionError (round-3 campaign,
    # sort_ab.err.txt); the XLA chain produces bit-identical values, and
    # only the sort itself is being timed here.
    use_pallas = None if not jax.config.jax_enable_x64 else False

    @jax.jit
    def expand(pos, tri, vp, eff):
        pos_soa = pos[tri].transpose(1, 2, 0)
        _, screen_soa = common.vertex_stage_soa(pos_soa, vp, eff, w, h)
        setup = common.triangle_setup_soa(screen_soa, eff, w, h, 8, 8)
        return binning.expand_cells_xla(setup, ntx, num_cells, pair_cap,
                                        interpret=interpret,
                                        use_pallas_expand=use_pallas)

    cell, tri_of_pair, total = expand(pos, tri, vp, eff)
    jax.block_until_ready((cell, tri_of_pair))
    total = int(total)
    # A truncated pair list would time every variant on a smaller workload
    # than real frames while the summary silently reports pairs > pair_cap
    # (round-3 advisor finding) — refuse to measure it.
    assert total <= pair_cap, (
        f"pair list overflowed: {total} pairs > pair_cap {pair_cap}; "
        "grow the cap before timing"
    )
    return cell, tri_of_pair, {
        "tris": T, "pairs": total, "pair_cap": int(pair_cap),
        "num_cells": num_cells,
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="San_Miguel/san-miguel-low-poly.obj")
    ap.add_argument("--iters", type=int, default=12)
    ap.add_argument("--width", type=int, default=W)
    ap.add_argument("--height", type=int, default=H)
    ap.add_argument("--variant", default=None,
                    help="run ONE variant (subprocess mode; 'i64pack' "
                    "enables x64 in this process only)")
    args = ap.parse_args()

    import jax

    if args.variant == "i64pack":
        # Only this child process ever sees x64 (ADVICE round 3: the global
        # flag changed weak-type promotion for the expand pipeline AND
        # crashed Mosaic lowering of the expansion kernel with a
        # RecursionError — the stable2 baseline was never comparable).
        jax.config.update("jax_enable_x64", True)

    import jax.numpy as jnp
    import numpy as np

    from compute_renderer_tpu.bench.profiling import _timeit

    cell, tri_of_pair, dims = build_inputs(args)
    P = dims["pair_cap"]
    num_cells = dims["num_cells"]
    idx_bits = max(1, (P - 1).bit_length())
    # +1 value: the invalid-tail sentinel cell id is num_cells itself.
    cell_bits = (num_cells).bit_length()
    half = P // 2
    idx_bits_half = max(1, (half - 1).bit_length())
    results = dict(dims)
    results["u32_eligible"] = cell_bits + idx_bits <= 32
    results["halfsplit_eligible"] = (
        P % 2 == 0 and cell_bits + idx_bits_half <= 32
    )

    def f_stable2(cell, tri_of_pair):
        return jax.lax.sort((cell, tri_of_pair), num_keys=1, is_stable=True)

    def f_unstable2(cell, tri_of_pair):
        scell, sidx = jax.lax.sort(
            (cell, jnp.arange(P, dtype=jnp.int32)), num_keys=2,
            is_stable=False)
        return scell, tri_of_pair[sidx]

    def f_u16key(cell, tri_of_pair):
        # Narrow key: cell ids + sentinel fit u16 at 1024x768 (14 bits).
        return jax.lax.sort(
            (cell.astype(jnp.uint16), tri_of_pair), num_keys=1,
            is_stable=True,
        )

    def f_u32pack(cell, tri_of_pair):
        key = (cell.astype(jnp.uint32) << idx_bits) | jnp.arange(
            P, dtype=jnp.uint32)
        skey = jax.lax.sort(key, is_stable=False)
        sidx = (skey & ((1 << idx_bits) - 1)).astype(jnp.int32)
        return (skey >> idx_bits).astype(jnp.int32), tri_of_pair[sidx]

    def f_i64pack(cell, tri_of_pair):
        key = cell.astype(jnp.int64) << idx_bits | jnp.arange(
            P, dtype=jnp.int64)
        skey = jax.lax.sort(key, is_stable=False)
        sidx = (skey & ((1 << idx_bits) - 1)).astype(jnp.int32)
        return (skey >> idx_bits).astype(jnp.int32), tri_of_pair[sidx]

    def f_halfsplit(cell, tri_of_pair):
        # Two u32pack sorts of P/2 (one idx bit narrower — eligible at mega
        # scale where the full pack is exactly one bit over), merged by
        # rank: A's position in the merge is its own rank plus the count of
        # B's strictly-smaller cells (searchsorted-left; ties go to A =
        # stability), and symmetrically B uses searchsorted-right. The
        # merged (cell, tri) rows scatter once as packed c64 (bias bit 30
        # keeps the i32 bit patterns out of the f32 denormal range, exactly
        # as binning.expand_cells_meta does).
        i32 = jnp.int32
        mask = (1 << idx_bits_half) - 1
        halves = []
        for h0 in (0, half):
            key = (cell[h0:h0 + half].astype(jnp.uint32) << idx_bits_half
                   ) | jnp.arange(half, dtype=jnp.uint32)
            skey = jax.lax.sort(key, is_stable=False)
            scell = (skey >> idx_bits_half).astype(i32)
            stri = tri_of_pair[h0 + (skey & mask).astype(i32)]
            halves.append((scell, stri))
        (ca, ta), (cb, tb) = halves
        pos_a = jnp.arange(half, dtype=i32) + jnp.searchsorted(
            cb, ca, side="left").astype(i32)
        pos_b = jnp.arange(half, dtype=i32) + jnp.searchsorted(
            ca, cb, side="right").astype(i32)
        bias = i32(0x40000000)
        as_f = lambda a: jax.lax.bitcast_convert_type(
            a | bias, jnp.float32)
        packed = jnp.zeros((P,), jnp.complex64)
        packed = packed.at[pos_a].set(jax.lax.complex(as_f(ca), as_f(ta)))
        packed = packed.at[pos_b].set(jax.lax.complex(as_f(cb), as_f(tb)))
        as_i = lambda a: jax.lax.bitcast_convert_type(a, i32) ^ bias
        return as_i(jnp.real(packed)), as_i(jnp.imag(packed))

    variants = {
        "stable2": f_stable2,
        "unstable2": f_unstable2,
        "u16key": f_u16key,
        "u32pack": f_u32pack,
        "halfsplit": f_halfsplit,
        "i64pack": f_i64pack,
    }

    if args.variant is not None:
        order = ["stable2", args.variant]
    else:
        order = ["stable2", "unstable2", "u16key"]
        if results["u32_eligible"]:
            order.append("u32pack")
        if results["halfsplit_eligible"]:
            order.append("halfsplit")

    ref = None
    for name in order:
        f = variants[name]
        fj = jax.jit(f)
        try:
            out = jax.block_until_ready(fj(cell, tri_of_pair))
        except Exception as e:  # a variant must not kill the battery
            print(json.dumps({"variant": name, "error": f"{type(e).__name__}: {e}"[:300]}),
                  flush=True)
            results[f"{name}_ERROR"] = True
            continue
        got = tuple(np.asarray(o).astype(np.int64) for o in out)
        if ref is None:
            ref = got
        ok = all(np.array_equal(a, b) for a, b in zip(ref, got))
        t, _ = _timeit(fj, cell, tri_of_pair, iters=args.iters)
        results[name] = round(float(t), 3)
        print(json.dumps({"variant": name, "ms": results[name],
                          "matches_stable2": bool(ok)}), flush=True)
        if not ok:
            results[f"{name}_MISMATCH"] = True

    if args.variant is None:
        # i64pack in its own x64 process (see f_i64pack note). Its stable2
        # baseline is re-timed THERE so the comparison is honest even if
        # x64 changes how the baseline compiles.
        r = subprocess.run(
            [sys.executable, __file__, "--variant", "i64pack",
             "--model", args.model, "--iters", str(args.iters),
             "--width", str(args.width), "--height", str(args.height)],
            capture_output=True, text=True, timeout=1800,
            cwd=Path(__file__).resolve().parent.parent,
            env=dict(os.environ),
        )
        sys.stdout.write(r.stdout)
        if r.returncode != 0:
            tail = (r.stderr or "").strip().splitlines()[-3:]
            print(json.dumps({"variant": "i64pack",
                              "error": f"subprocess rc={r.returncode}",
                              "stderr_tail": tail}), flush=True)
        else:
            for line in r.stdout.splitlines():
                try:
                    row = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if row.get("variant") == "i64pack" and "ms" in row:
                    results["i64pack"] = row["ms"]
                if row.get("variant") == "stable2" and "ms" in row:
                    results["stable2_x64proc"] = row["ms"]

        print(json.dumps(results), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
