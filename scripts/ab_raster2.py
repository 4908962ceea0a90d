"""Hardware A/B of the round-5 micro-raster walk levers (VERDICT r4 #4).

The walk is latency-bound (round-4 A/B: the nattr=0 vis walk costs the
same as the nattr=6 base walk), so the levers attack serialization, not
op count:

  tree      unrolled sub-blocks evaluate independently and TREE-merge
            into the carry (the chain form serialized every block through
            the carry's select chain)
  prefetch  work-list cross-tile pipelining: each grid step issues the
            NEXT tile's first window chunk before finishing, removing a
            full HBM round-trip stall at every occupied tile
  unroll    chain/tree width 2 vs 4

Every variant's (rgba, key) output is asserted BITWISE equal to the
current default before timing.

    python scripts/ab_raster2.py [--iters 8]
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
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from compute_renderer_tpu.backends import binning, common, pallas_micro
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
    pair_cap = binning.default_pair_cap_micro(T, ntx * nty * 16)
    interpret = jax.default_backend() != "tpu"
    pos_soa = pos[tri].transpose(1, 2, 0)
    nrm_soa = nrm[tri].transpose(1, 2, 0)

    @jax.jit
    def prep(pos_soa, nrm_soa, vp, eff):
        world_soa, screen_soa = common.vertex_stage_soa(
            pos_soa, vp, eff, W, H)
        setup = common.triangle_setup_soa(screen_soa, eff, W, H, 8, 8)
        bins = dict(binning.bin_cells_sort(setup, ntx, nty, pair_cap,
                                           interpret=interpret))
        bins.pop("layout")
        return bins, world_soa, screen_soa

    bins, world_soa, screen_soa = prep(pos_soa, nrm_soa, vp, eff)
    jax.block_until_ready(bins["pair_tri"])
    assert not bool(bins["pair_overflow"]), "grow pair_cap before timing"
    nrm_t = tuple(tuple(nrm_soa[k, c].astype(F32) for c in range(3))
                  for k in range(3))

    table = pallas_micro.build_tri_table_c64(screen_soa, nrm_t, world_soa)
    stream = jax.block_until_ready(
        jax.jit(pallas_micro.build_pair_coeffs)(table, bins["pair_tri"]))

    results = {"tris": T, "pairs": int(bins["total_pairs"])}
    print(json.dumps(results), flush=True)

    def kernel(**kw):
        return pallas_micro.raster_shade_micro(
            stream, bins["seg_start"], bins["seg_count"],
            bins["win_start"], bins["tile_count"], eff, vpos, lwp, lc, li,
            height_padded=nty * 8, width_padded=ntx * 128,
            interpret=interpret, effect_kind=0, **kw)

    ref_rgba, ref_key = jax.block_until_ready(kernel())
    ref_rgba, ref_key = np.asarray(ref_rgba), np.asarray(ref_key)

    cases = [
        ("base", dict()),
        ("tree2", dict(tree=True)),
        ("tree4", dict(tree=True, unroll=4)),
        ("chain4", dict(unroll=4)),
        ("pf", dict(prefetch=True)),
        ("pf_tree2", dict(prefetch=True, tree=True)),
        ("pf_tree4", dict(prefetch=True, tree=True, unroll=4)),
        ("pf_tree4_c256", dict(prefetch=True, tree=True, unroll=4,
                               chunk_rows=256)),
        ("pf_tree2_vis", dict(prefetch=True, tree=True, vis=True)),
        ("vis", dict(vis=True)),
    ]
    for name, kw in cases:
        rgba, key = jax.block_until_ready(kernel(**kw))
        if not kw.get("vis"):
            assert np.array_equal(np.asarray(rgba), ref_rgba), name
            assert np.array_equal(np.asarray(key), ref_key), name
        t, _ = _timeit(lambda: kernel(**kw), iters=args.iters)
        results[name] = round(float(t), 3)
        print(json.dumps({"stage": name, "ms": results[name]}), flush=True)

    print(json.dumps(results), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
