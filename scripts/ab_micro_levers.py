"""Hardware A/B of the round-3 micro-path levers (NOTES_ROUND4 item 3).

Round 3 landed four mega-scene levers on the virtual CPU mesh with no
hardware to measure them: the occupied-tile work list for the micro grid,
static effect_kind specialization (mirage warp compiled out), the fused
Pallas front end, and empty-cell skip (unconditional, visible only in the
worklist-off kernel delta). This script measures each lever's ms delta on
the live chip at San-Miguel scale so docs/ARCHITECTURE.md's perf journal
can quote numbers instead of "unmeasured".

Two tiers:
  raster stage alone (same binning inputs, fenced):
    worklist on/off x effect_kind static/dynamic
  full fused frame (tpu.render_frame_micro):
    base (fused front + static effect) / xla front / dynamic effect

    python scripts/ab_micro_levers.py [--model ...] [--iters 8]

Prints one JSON line per measurement plus a final summary line.
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
    ap.add_argument("--width", type=int, default=1024)
    ap.add_argument("--height", type=int, default=768)
    args = ap.parse_args()
    global W, H
    W, H = args.width, args.height

    import jax
    import jax.numpy as jnp
    import numpy as np

    from compute_renderer_tpu.backends import binning, common, pallas_micro, tpu
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
    effect_kind = int(np.asarray(u.effect)[0])

    T = int(tri.shape[0])
    ntx = (W + 127) // 128
    nty = (H + 7) // 8
    pair_cap = binning.default_pair_cap_micro(T, ntx * nty * 16)
    interpret = jax.default_backend() != "tpu"

    pos_soa = pos[tri].transpose(1, 2, 0)
    nrm_soa = nrm[tri].transpose(1, 2, 0)

    # Shared binning inputs for the raster-stage tier (one prep, reused
    # by every kernel variant so the A/B isolates the kernel).
    @jax.jit
    def prep(pos_soa, nrm_soa, vp, eff):
        world_soa, screen_soa = common.vertex_stage_soa(
            pos_soa, vp, eff, W, H)
        setup = common.triangle_setup_soa(screen_soa, eff, W, H, 8, 8)
        bins = dict(binning.bin_cells_sort(setup, ntx, nty, pair_cap,
                                           interpret=interpret))
        bins.pop("layout")
        nrm_t = tuple(tuple(nrm_soa[k, c].astype(F32) for c in range(3))
                      for k in range(3))
        table = pallas_micro.build_tri_table_c64(screen_soa, nrm_t,
                                                 world_soa)
        coeffs = pallas_micro.build_pair_coeffs(table, bins["pair_tri"])
        return bins, coeffs

    bins, coeffs = prep(pos_soa, nrm_soa, vp, eff)
    jax.block_until_ready(coeffs)
    # A truncated pair list would time every variant on a smaller workload
    # than real frames (round-3 advisor finding on ab_sort) — refuse.
    assert not bool(bins["pair_overflow"]), (
        f"pair list overflowed pair_cap={pair_cap} "
        f"(needed {int(bins['pair_needed'])}); grow the cap before timing"
    )

    results = {"tris": T, "pairs_cap": int(pair_cap)}

    for name, kw in [
        ("kernel_wl_static", dict(worklist=True, effect_kind=effect_kind)),
        ("kernel_nowl_static", dict(worklist=False, effect_kind=effect_kind)),
        ("kernel_wl_dynamic", dict(worklist=True, effect_kind=None)),
    ]:
        f = partial(pallas_micro.raster_shade_micro,
                    height_padded=nty * 8, width_padded=ntx * 128,
                    interpret=interpret, **kw)
        t, _ = _timeit(f, coeffs, bins["seg_start"], bins["seg_count"],
                       bins["win_start"], bins["tile_count"], eff, vpos,
                       lwp, lc, li, iters=args.iters)
        results[name] = round(float(t), 3)
        print(json.dumps({"stage": name, "ms": results[name]}), flush=True)

    for name, kw in [
        ("frame_base", dict(effect_kind=effect_kind)),
        ("frame_xla_front", dict(effect_kind=effect_kind,
                                 use_pallas_front=False)),
        ("frame_dynamic_effect", dict()),
    ]:
        def f_full(kw=kw):
            return tpu.render_frame_micro(
                pos, nrm, uvs, tri, vp, vpos, lwp, lc, li, eff,
                width=W, height=H, pos_soa=pos_soa, nrm_soa=nrm_soa, **kw)

        t, _ = _timeit(f_full, iters=args.iters)
        results[name] = round(float(t), 3)
        print(json.dumps({"stage": name, "ms": results[name]}), flush=True)

    print(json.dumps(results), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
