"""Hardware A/B: pair-expansion kernel block/chunk geometry (bsz, ch).

The expansion kernel's per-chunk work is the (ch, bsz) interval-membership
matrix build (VPU elementwise) + the (F, bsz) x (ch, bsz) contraction;
summed over all blocks the lane-op count is ~ P*bsz + T*ch (each of the
~P/ch + T/bsz chunks costs ch*bsz). The round-4 default (1024, 512) was
never swept — at the structured scene's TRUE pair count (700k pairs,
reconcile_tex_followup) the expand stage is ~8 ms, so halving the product
terms is a multi-ms lever. All combos are bit-exact by construction
(verified per combo here before timing; also tests/test_expand_kernel).

    python scripts/ab_expand_bc.py [--iters 8]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

W, H = 1024, 768

COMBOS = [
    (1024, 512),  # default
    (2048, 512),
    (1024, 1024),
    (512, 512),
    (512, 256),
    (256, 256),
    (1024, 256),
    (2048, 1024),
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from compute_renderer_tpu.backends import binning, common, pallas_expand
    from compute_renderer_tpu.bench.profiling import _timeit
    from compute_renderer_tpu.core.camera import CameraMode
    from compute_renderer_tpu.core.maths import F32
    from compute_renderer_tpu.engine.scene import (
        CameraConfig, Scene, SceneConfig,
    )
    from compute_renderer_tpu.io import procedural
    from compute_renderer_tpu.io.objgen import STRUCTURED_NAME

    interpret = jax.default_backend() != "tpu"
    ntx = (W + 127) // 128
    nty = (H + 7) // 8
    ntx_t = ntx * 16
    num_cells = ntx * nty * 16

    def scene_meta(name, config):
        scene = Scene.from_config(config, W, H)
        mesh = scene.mesh
        u = scene.update(0.016)
        pos = jnp.asarray(mesh.positions)
        tri = jnp.asarray(mesh.indices.astype(np.int32)).reshape(-1, 3)
        pos_soa = pos[tri].transpose(1, 2, 0)
        vp = jnp.asarray(u.view_proj)
        eff = jnp.asarray(u.effect)
        _, screen_soa = common.vertex_stage_soa(pos_soa, vp, eff, W, H)
        setup = common.triangle_setup_soa(screen_soa, eff, W, H, 8, 8)
        rx, _, c = binning.cover_counts(setup)
        total = int(np.asarray(jnp.sum(c)))
        from compute_renderer_tpu.backends.tpu import grow_pair_cap
        cap = grow_pair_cap(0, max(total, num_cells, 1024))
        i32 = jnp.int32
        return dict(name=name, c=c.astype(i32), rx=rx.astype(i32),
                    x0=setup["tile_x0"].astype(i32),
                    y0=setup["tile_y0"].astype(i32),
                    pairs=total, cap=cap, tris=int(tri.shape[0]))

    cases = [
        scene_meta("structured", SceneConfig(
            model_path=STRUCTURED_NAME,
            camera_config=CameraConfig(
                mode=CameraMode.FIRST_PERSON,
                position=(13.566635, 4.0, 24.0)))),
        scene_meta("san_miguel", SceneConfig(
            model_path="San_Miguel/san-miguel-low-poly.obj",
            camera_config=CameraConfig(
                mode=CameraMode.FIRST_PERSON,
                position=(13.566635, 2.6288567, 10.243919)))),
    ]

    results = {}
    for case in cases:
        nm = case["name"]
        print(json.dumps({"scene": nm, "tris": case["tris"],
                          "pairs": case["pairs"], "cap": case["cap"]}),
              flush=True)

        def run(bsz, ch):
            return pallas_expand.expand_cells(
                case["c"], case["rx"], case["x0"], case["y0"],
                pair_cap=case["cap"], ntx_t=ntx_t, num_cells=num_cells,
                interpret=interpret, bsz=bsz, ch=ch)

        # Compare only the ``total`` valid pairs: the output shape (cap_pad)
        # depends on ch, and indices >= total are never written (the masked
        # RMW covers exactly [0, total) across the contiguous block windows).
        tot = min(case["pairs"], case["cap"])
        ref = None
        for bsz, ch in COMBOS:
            out = jax.block_until_ready(run(bsz, ch))
            arr = (np.asarray(out[0]).reshape(-1)[:tot],
                   np.asarray(out[1]).reshape(-1)[:tot], int(out[2]))
            if ref is None:
                ref = arr
            else:
                ok = (np.array_equal(ref[0], arr[0])
                      and np.array_equal(ref[1], arr[1])
                      and ref[2] == arr[2])
                if not ok:
                    print(json.dumps({"scene": nm, "bsz": bsz, "ch": ch,
                                      "error": "MISMATCH"}), flush=True)
                    continue
            t, _ = _timeit(lambda: run(bsz, ch), iters=args.iters)
            key = f"{nm}_b{bsz}_c{ch}"
            results[key] = round(float(t), 3)
            print(json.dumps({"scene": nm, "bsz": bsz, "ch": ch,
                              "ms": results[key]}), flush=True)

    print(json.dumps(results), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
