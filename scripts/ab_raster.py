"""Hardware A/B of the micro raster kernel's internal cost structure.

The mega-scene raster walk costs ~7.3 ms at 1M tris (round-3 fenced
profile) and the work list only bought 8%. Before a structural rewrite,
decompose the cost with the kernel's existing static modes — all on the
SAME binning inputs so only the kernel varies:

  vis        nattr=0 walk (no attribute interpolation, no attr butterfly)
  base       nattr=6 walk + shading epilogue (production default)
  mat        nattr=9, 40-row stream
  texf       nattr=14, 48-row stream + G-buffer output
  chunk256/1024  half/double the streamed window chunk (DMA depth)
  nowl       full-grid kernel (baseline for the work-list delta)

Interpretation guide: (base - vis) = attribute interpolate+carry+butterfly
cost; (chunk1024 - base) = DMA-depth sensitivity; stream-width scaling
shows whether the walk is bandwidth- or issue-bound.

    python scripts/ab_raster.py [--iters 8]
"""

from __future__ import annotations

import argparse
import json
import sys
from functools import partial
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

    from compute_renderer_tpu.backends import (
        binning, common, pallas_micro, pallas_raster,
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
    uvs = jnp.asarray(mesh.uvs.astype(F32))
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

    # Tables + streams for each mode (built once, off the clock).
    kd = jnp.full((T, 3), F32(0.7))
    face_tex = jnp.zeros((T,), jnp.int32)
    tex_table = jnp.asarray(np.array([[0, 8, 8]], np.int32))
    uv_c = uvs[tri]
    uv_soa = tuple(tuple(uv_c[:, k, c] for c in range(2)) for k in range(3))
    tex_rows = common.tex_rows_f32(face_tex, tex_table)

    tables = {
        "base": pallas_micro.build_tri_table_c64(screen_soa, nrm_t,
                                                 world_soa),
        "mat": pallas_micro.build_tri_table_c64(screen_soa, nrm_t,
                                                world_soa, face_kd=kd),
        "texf": pallas_micro.build_tri_table_c64(
            screen_soa, nrm_t, world_soa, face_kd=kd, uv_soa=uv_soa,
            tex_rows=tex_rows),
    }
    streams = {k: jax.block_until_ready(
        jax.jit(pallas_micro.build_pair_coeffs)(v, bins["pair_tri"]))
        for k, v in tables.items()}

    results = {"tris": T, "pairs": int(bins["total_pairs"])}
    print(json.dumps(results), flush=True)

    def kernel(stream, **kw):
        return pallas_micro.raster_shade_micro(
            stream, bins["seg_start"], bins["seg_count"],
            bins["win_start"], bins["tile_count"], eff, vpos, lwp, lc, li,
            height_padded=nty * 8, width_padded=ntx * 128,
            interpret=interpret, effect_kind=0, **kw)

    cases = [
        ("vis", streams["base"], dict(vis=True)),
        ("base", streams["base"], dict()),
        ("mat", streams["mat"], dict(mat=True)),
        ("texf", streams["texf"], dict(texf=True)),
        ("base_chunk256", streams["base"], dict(chunk_rows=256)),
        ("base_chunk1024", streams["base"], dict(chunk_rows=1024)),
        ("base_nowl", streams["base"], dict(worklist=False)),
        # Unrolled-walk lever (round 4): independent roll->coverage chains
        # per fori trip for a latency-bound loop. base == unroll=2 default.
        ("base_unroll1", streams["base"], dict(unroll=1)),
        ("base_unroll4", streams["base"], dict(unroll=4)),
        ("texf_unroll1", streams["texf"], dict(texf=True, unroll=1)),
    ]
    # Bitwise contract: the unrolled walk must be a no-op on the output.
    r1, k1 = jax.block_until_ready(kernel(streams["base"], unroll=1))
    r2, k2 = jax.block_until_ready(kernel(streams["base"], unroll=2))
    results["unroll_bitwise_equal"] = bool(
        jnp.array_equal(r1, r2) & jnp.array_equal(k1, k2))
    print(json.dumps({"unroll_bitwise_equal":
                      results["unroll_bitwise_equal"]}), flush=True)
    for name, stream, kw in cases:
        f = partial(kernel, stream, **kw)
        try:
            t, _ = _timeit(f, iters=args.iters)
        except Exception as e:
            print(json.dumps({"stage": name,
                              "error": f"{type(e).__name__}: {e}"[:300]}),
                  flush=True)
            continue
        results[name] = round(float(t), 3)
        print(json.dumps({"stage": name, "ms": results[name]}), flush=True)

    print(json.dumps(results), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
