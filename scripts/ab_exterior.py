"""Bisect the Exterior suite-row regression (1.99 -> 3.01 ms, round 3).

The round-3 verdict flagged a 51% move on the Exterior row
(suite_round3.json vs suite_round3b.json) and suspected the round-3
default flips (Pallas expansion, boundary segments, fused front). Those
are all MICRO-path levers; Exterior (16k-tri torus) takes the TILE path,
where nothing flipped between the two runs — and the same diff shows the
per-frame-fenced xla rows swinging +42%/-70% between the runs, i.e. the
tunnel's latency was not stationary. This script separates the two
hypotheses with data:

  1. the exact suite methodology (batch-64 device scan, one fence per
     batch), repeated REPS times with a fresh Renderer each — a
     deterministic engine cause reproduces the 3.01 every time, link
     noise shows up as spread;
  2. the direct jitted tile-path frame (no batching scan) under the
     candidate levers: worklist on/off, tile 16x256 vs 8x128, and the
     batched lax.scan form — to localize any reproducible delta.

    python scripts/ab_exterior.py [--iters 12] [--reps 5]

Prints one JSON line per measurement plus a summary line.
Reference: main.rs:177-186 (the scene + spawn).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

W, H = 1024, 768


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=12)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--batch", type=int, default=64)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from compute_renderer_tpu.bench.profiling import _timeit
    from compute_renderer_tpu.core.maths import F32
    from compute_renderer_tpu.engine.renderer import Renderer
    from compute_renderer_tpu.engine.scene import (
        CameraConfig, Scene, SceneConfig,
    )
    from compute_renderer_tpu.core.camera import CameraMode
    from compute_renderer_tpu.backends import tpu

    config = SceneConfig(
        model_path="exterior/Exterior.obj",
        camera_config=CameraConfig(
            mode=CameraMode.FIRST_PERSON,
            position=(-525.80194, 168.52838, 260.81876),
        ),
        benchmark_duration_secs=30.0,
    )
    scene = Scene.from_config(config, W, H)
    results = {"tris": scene.total_tris, "batch": args.batch}

    # --- 1. suite methodology, repeated -----------------------------------
    suite_ms = []
    for rep in range(args.reps):
        sc = Scene.from_config(config, W, H)
        renderer = Renderer(sc.mesh, W, H, backend="tpu",
                            **sc.renderer_options())
        frames = 0
        times = []
        for b in range(6):  # 6 batches: 1 warm/settle + 5 measured
            uniforms_seq = [sc.update(0.003) for _ in range(args.batch)]
            t0 = time.perf_counter()
            out = renderer.render_batch_device(uniforms_seq,
                                               check=(frames == 0))
            if frames == 0:
                np.asarray(out[-1, 0, 0])
            else:
                renderer.fence_pending()
            dt = time.perf_counter() - t0
            if b > 0:
                times.append(dt * 1000 / args.batch)
            frames += args.batch
        rep_ms = float(np.median(times))
        suite_ms.append(round(rep_ms, 3))
        print(json.dumps({"stage": f"suite_rep{rep}", "ms": rep_ms,
                          "batches_ms": [round(t, 3) for t in times]}),
              flush=True)
    results["suite_reps_ms"] = suite_ms
    results["suite_spread"] = round(
        (max(suite_ms) - min(suite_ms)) / min(suite_ms), 3)

    # --- 2. direct frame under candidate levers ----------------------------
    u = scene.update(0.016)
    mesh = scene.mesh
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

    for name, kw in [
        ("frame_default", dict()),
        ("frame_nowl", dict(worklist=False)),
        ("frame_tile8x128", dict(tile_h=8, tile_w=128)),
        ("frame_micro_path", dict(path="micro")),
    ]:
        def f(kw=kw):
            return tpu.render_frame(
                pos, nrm, uvs, tri, vp, vpos, lwp, lc, li, eff,
                width=W, height=H, effect_kind=0, **kw)

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
