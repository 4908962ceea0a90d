"""Sub-stage hardware profile of the mega-scene binning + coefficient path.

The round-3 profile attributed 6.58 ms of the 17.2 ms fused 1M-tri frame to
"binning (sort)". The round-4 sort A/B then measured the global stable sort
alone at **0.44 ms** (sort_ab4.out.txt) — so ~6 ms of that stage lives
elsewhere. This script times every sub-stage of the front end separately,
each as its own fenced jit over REAL frame data:

  expand        pallas_expand / XLA chain -> (cell_of_pair, tri_of_pair)
  sort          jax.lax.sort((cell, tri), stable)
  segments      searchsorted boundaries -> seg_start/counts/tile_count
  bin_full      the whole bin_cells_sort (cross-check: ~= sum of above)
  front         pallas_front.front_end (vertex+setup+coeff table)
  pack_c64      pack_table_c64 on the coeff rows
  pair_coeffs   build_pair_coeffs (table gather in pair order + transpose)
  raster        raster_shade_micro on the prepared inputs
  frame         the whole fused render_frame_micro (cross-check)

    python scripts/profile_binning.py [--iters 12]
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
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from compute_renderer_tpu.backends import (
        binning, common, pallas_front, pallas_micro, tpu,
    )
    from compute_renderer_tpu.bench.profiling import _timeit
    from compute_renderer_tpu.core.maths import F32
    from compute_renderer_tpu.engine.scene import (
        CameraConfig, Scene, SceneConfig,
    )
    from compute_renderer_tpu.io import procedural

    mesh = procedural.make_model(args.model)
    scene = Scene.from_config(
        SceneConfig(camera_config=CameraConfig.first_person(
            [13.57, 2.63, 10.24])), W, H)
    u = scene.update(0.016)

    pos = jnp.asarray(mesh.positions)
    nrm = jnp.asarray(mesh.normals)
    uvs = jnp.asarray(mesh.uvs)
    tri = jnp.asarray(mesh.indices.astype(np.int32)).reshape(-1, 3)
    vp = jnp.asarray(u.view_proj)
    vpos = jnp.asarray(u.view_position).astype(F32)
    lwp = jnp.asarray(u.light_world_pos).astype(F32)
    lc = jnp.asarray(u.light_color).astype(F32)
    li = jnp.asarray(u.light_intensity).astype(F32)
    eff = jnp.asarray(u.effect)

    T = int(tri.shape[0])
    ntx = (W + 127) // 128
    nty = (H + 7) // 8
    num_cells = ntx * nty * 16
    num_tiles = ntx * nty
    pair_cap = binning.default_pair_cap_micro(T, num_cells)
    interpret = jax.default_backend() != "tpu"
    pos_soa = pos[tri].transpose(1, 2, 0)
    nrm_soa = nrm[tri].transpose(1, 2, 0)

    results = {"tris": T, "pair_cap": int(pair_cap)}

    def stage(name, f, *a):
        try:
            t, _ = _timeit(f, *a, iters=args.iters)
        except Exception as e:
            print(json.dumps({"stage": name,
                              "error": f"{type(e).__name__}: {e}"[:300]}),
                  flush=True)
            return
        results[name] = round(float(t), 3)
        print(json.dumps({"stage": name, "ms": results[name]}), flush=True)

    # Shared inputs.
    coeff, meta = jax.block_until_ready(pallas_front.front_end(
        pos_soa, nrm_soa, vp, eff, width=W, height=H, interpret=interpret))
    c, rx, x0, y0 = meta[3], meta[2], meta[0], meta[1]

    def f_expand(c, rx, x0, y0):
        return binning.expand_cells_meta(
            c, rx, x0, y0, ntx, num_cells, pair_cap, interpret=interpret)

    cell, tri_of_pair, total = jax.block_until_ready(
        jax.jit(f_expand)(c, rx, x0, y0))
    results["pairs"] = int(total)
    print(json.dumps({"pairs": int(total)}), flush=True)

    def f_sort(cell, tri_of_pair):
        return jax.lax.sort((cell, tri_of_pair), num_keys=1, is_stable=True)

    sorted_cell, sorted_tri = jax.block_until_ready(
        jax.jit(f_sort)(cell, tri_of_pair))

    def f_segments(sorted_cell):
        return binning.segments_from_sorted_cells(
            sorted_cell, num_cells, num_tiles)

    # searchsorted lowering A/B: segments_from_sorted_cells uses JAX's
    # default method ('scan': ~log2(P) serialized whole-array steps); the
    # 'sort' method pays one extra (P + num_cells)-element sort instead —
    # and the sort A/B just measured a full 375k-pair sort at 0.44 ms.
    def f_seg_sortmethod(sorted_cell):
        bounds = jnp.searchsorted(
            sorted_cell, jnp.arange(num_cells + 1, dtype=jnp.int32),
            side="left", method="sort",
        ).astype(jnp.int32)
        seg_start = bounds[:-1]
        counts = bounds[1:] - bounds[:-1]
        tile_count = counts.reshape(num_tiles, 16).sum(axis=1)
        win_start = (seg_start.reshape(num_tiles, 16)[:, 0] // 16) * 16
        return seg_start, counts, tile_count, win_start

    def f_seg_compareall(sorted_cell):
        bounds = jnp.searchsorted(
            sorted_cell, jnp.arange(num_cells + 1, dtype=jnp.int32),
            side="left", method="compare_all",
        ).astype(jnp.int32)
        return bounds

    def f_bin_full(c, rx, x0, y0):
        out = binning.bin_cells_sort_meta(
            c, rx, x0, y0, ntx, nty, pair_cap, interpret=interpret)
        return {k: v for k, v in out.items() if k != "layout"}

    bins = jax.block_until_ready(jax.jit(f_bin_full)(c, rx, x0, y0))

    def f_front(pos_soa, nrm_soa, vp, eff):
        return pallas_front.front_end(
            pos_soa, nrm_soa, vp, eff, width=W, height=H,
            interpret=interpret)

    def f_pack(coeff):
        return pallas_front.pack_table_c64(coeff)

    table = jax.block_until_ready(jax.jit(f_pack)(coeff))

    def f_pair_coeffs(table, sorted_tri):
        return pallas_micro.build_pair_coeffs(table, sorted_tri)

    pair_coeffs = jax.block_until_ready(
        jax.jit(f_pair_coeffs)(table, sorted_tri))

    def f_raster(pair_coeffs, bins):
        return pallas_micro.raster_shade_micro(
            pair_coeffs, bins["seg_start"], bins["seg_count"],
            bins["win_start"], bins["tile_count"], eff, vpos, lwp, lc, li,
            height_padded=nty * 8, width_padded=ntx * 128,
            interpret=interpret, effect_kind=0)

    def f_frame():
        return tpu.render_frame_micro(
            pos, nrm, uvs, tri, vp, vpos, lwp, lc, li, eff,
            width=W, height=H, pos_soa=pos_soa, nrm_soa=nrm_soa,
            effect_kind=0)

    stage("expand", jax.jit(f_expand), c, rx, x0, y0)
    stage("sort", jax.jit(f_sort), cell, tri_of_pair)
    stage("segments", jax.jit(f_segments), sorted_cell)
    # Lowering-only variants: verify element equality before timing.
    ref_seg = np.asarray(jax.jit(f_segments)(sorted_cell)[0])
    alt_seg = np.asarray(jax.jit(f_seg_sortmethod)(sorted_cell)[0])
    results["segments_methods_equal"] = bool(
        np.array_equal(ref_seg, alt_seg))
    stage("segments_sortmethod", jax.jit(f_seg_sortmethod), sorted_cell)
    stage("segments_compareall", jax.jit(f_seg_compareall), sorted_cell)
    stage("bin_full", jax.jit(f_bin_full), c, rx, x0, y0)
    stage("front", jax.jit(f_front), pos_soa, nrm_soa, vp, eff)
    stage("pack_c64", jax.jit(f_pack), coeff)
    stage("pair_coeffs", jax.jit(f_pair_coeffs), table, sorted_tri)
    stage("raster", f_raster, pair_coeffs, bins)
    stage("frame", f_frame)

    print(json.dumps(results), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
