"""Hardware A/B of the global pair sort — the dominant front-end cost.

With the fused Pallas front end and Pallas pair expansion landed, the one
global ``lax.sort`` inside ``binning.bin_cells_sort`` is the largest
remaining front-end stage at mega scale (~5-6 ms of the 6.5 ms binning
stage at ~1M pairs, 2026-08-18 profile). TPU ``lax.sort`` cost scales with
operand count and key width, so the candidates reformulate the same
grouping problem:

  stable2   current: stable single-key sort of (cell i32, tri i32)
  i64pack   unstable single-operand sort of cell<<B | pair_idx (unique
            keys reproduce the stable order exactly), tri recovered by one
            P-gather through tri_of_pair
  u32pack   same pack in uint32 when cell_bits + idx_bits <= 32 (holds for
            small/medium scenes; reported ineligible at mega scale)
  unstable2 two-key sort of (cell, pair_idx) + P-gather (keys unique)

All variants are verified element-equal to stable2 before timing.

    python scripts/ab_sort.py [--model ...] [--iters 12]

Prints one JSON line per variant plus a summary line.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

W, H = 1024, 768


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="San_Miguel/san-miguel-low-poly.obj")
    ap.add_argument("--iters", type=int, default=12)
    ap.add_argument("--width", type=int, default=W)
    ap.add_argument("--height", type=int, default=H)
    args = ap.parse_args()
    w, h = args.width, args.height

    import jax

    # The i64pack variant needs real 64-bit keys; without x64, jnp.int64
    # silently degrades to int32 and the pack overflows. Everything else
    # in this script uses explicit i32/u32 dtypes, so enabling x64 does
    # not change any other operand.
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import numpy as np

    from compute_renderer_tpu.backends import binning, common
    from compute_renderer_tpu.bench.profiling import _timeit
    from compute_renderer_tpu.engine.scene import (
        CameraConfig, Scene, SceneConfig,
    )
    from compute_renderer_tpu.io import procedural

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

    @jax.jit
    def expand(pos, tri, vp, eff):
        pos_soa = pos[tri].transpose(1, 2, 0)
        _, screen_soa = common.vertex_stage_soa(pos_soa, vp, eff, w, h)
        setup = common.triangle_setup_soa(screen_soa, eff, w, h, 8, 8)
        return binning.expand_cells_xla(setup, ntx, num_cells, pair_cap,
                                        interpret=interpret)

    cell, tri_of_pair, total = expand(pos, tri, vp, eff)
    jax.block_until_ready((cell, tri_of_pair))

    P = int(pair_cap)
    idx_bits = max(1, (P - 1).bit_length())
    # +1 bit: the invalid-tail sentinel cell id is num_cells itself.
    cell_bits = (num_cells).bit_length()
    results = {
        "tris": T, "pairs": int(total), "pair_cap": P,
        "num_cells": num_cells,
        "u32_eligible": cell_bits + idx_bits <= 32,
    }

    def f_stable2(cell, tri_of_pair):
        return jax.lax.sort((cell, tri_of_pair), num_keys=1, is_stable=True)

    def f_i64pack(cell, tri_of_pair):
        key = cell.astype(jnp.int64) << idx_bits | jnp.arange(
            P, dtype=jnp.int64)
        skey = jax.lax.sort(key, is_stable=False)
        sidx = (skey & ((1 << idx_bits) - 1)).astype(jnp.int32)
        return (skey >> idx_bits).astype(jnp.int32), tri_of_pair[sidx]

    def f_u32pack(cell, tri_of_pair):
        key = (cell.astype(jnp.uint32) << idx_bits) | jnp.arange(
            P, dtype=jnp.uint32)
        skey = jax.lax.sort(key, is_stable=False)
        sidx = (skey & ((1 << idx_bits) - 1)).astype(jnp.int32)
        return (skey >> idx_bits).astype(jnp.int32), tri_of_pair[sidx]

    def f_unstable2(cell, tri_of_pair):
        scell, sidx = jax.lax.sort(
            (cell, jnp.arange(P, dtype=jnp.int32)), num_keys=2,
            is_stable=False)
        return scell, tri_of_pair[sidx]

    variants = [("stable2", f_stable2), ("i64pack", f_i64pack)]
    if results["u32_eligible"]:
        variants.append(("u32pack", f_u32pack))
    variants.append(("unstable2", f_unstable2))

    ref = None
    for name, f in variants:
        fj = jax.jit(f)
        out = jax.block_until_ready(fj(cell, tri_of_pair))
        got = tuple(np.asarray(o) for o in out)
        if ref is None:
            ref = got
        ok = all(np.array_equal(a, b) for a, b in zip(ref, got))
        t, _ = _timeit(fj, cell, tri_of_pair, iters=args.iters)
        results[name] = round(float(t), 3)
        print(json.dumps({"variant": name, "ms": results[name],
                          "matches_stable2": bool(ok)}), flush=True)
        if not ok:
            results[f"{name}_MISMATCH"] = True

    print(json.dumps(results), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
