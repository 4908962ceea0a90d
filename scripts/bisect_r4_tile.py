"""Bisect the round-4 plain-scene regression (VERDICT r4 #1).

BENCH_r03 measured 0.3253 ms/frame (suzanne, batched slope); BENCH_r04
measured 0.566 ms on the SAME methodology after commits 6305d42 (tile
default 16x256 -> 8x128 + 44-col table rebuild) and 7298630 (segments
sort-method flip + micro walk unroll). scripts/ab_tile_sweep.py predicted
the OPPOSITE (8x128 wins single-frame) — but it measured single dispatches
where link overhead (~0.4 ms) dominates. This script measures the exact
driver methodology (batched lax.scan slope over batch 64/256) per tile
config, for the scenes the suite flagged:

  suzanne 1.3k (tile path)     — BENCH regression 0.325 -> 0.566
  exterior 16k (tile path)     — suite ~flat
  san_miguel_small 42k (tile)  — suite up
  structured_plain 1M (micro)  — suite 36.7 -> 41.5 (optional, --mega)

    python scripts/bisect_r4_tile.py [--rounds 3] [--mega]

Prints one JSON line per (scene x config) cell.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

W, H = 1024, 768

SCENES = [
    ("suzanne", "suzanne.obj", (0.0, 0.0, 3.0), (64, 256)),
    ("exterior", "exterior/Exterior.obj",
     (-525.80194, 168.52838, 260.81876), (16, 64)),
    ("san_miguel_small", "san_miguel_small.obj",
     (13.566635, 2.6288567, 10.243919), (8, 32)),
]

CONFIGS = [
    ("8x128_wl", {"tile_h": 8, "tile_w": 128, "worklist": True}),
    ("16x256_wl", {"tile_h": 16, "tile_w": 256, "worklist": True}),
    ("8x256_wl", {"tile_h": 8, "tile_w": 256, "worklist": True}),
    ("16x128_wl", {"tile_h": 16, "tile_w": 128, "worklist": True}),
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--mega", action="store_true")
    args = ap.parse_args()

    import numpy as np

    from compute_renderer_tpu.core.camera import CameraMode
    from compute_renderer_tpu.engine.renderer import Renderer
    from compute_renderer_tpu.engine.scene import (
        CameraConfig, Scene, SceneConfig,
    )

    results = {}

    def measure(label, scene, opts, batches):
        renderer = Renderer(scene.mesh, W, H, backend="tpu", **opts)
        dt = 1.0 / 60.0

        def make_batch(n):
            return [scene.update(dt) for _ in range(n)]

        bs, bl = batches
        out = renderer.render_batch_device(make_batch(bs))
        np.asarray(out[-1, 0, 0])
        out = renderer.render_batch_device(make_batch(bl))
        np.asarray(out[-1, 0, 0])

        def timed(n):
            batch = make_batch(n)
            t0 = time.perf_counter()
            renderer.render_batch_device(batch, check=False)
            renderer.fence_pending()
            return time.perf_counter() - t0

        best_s = min(timed(bs) for _ in range(args.rounds))
        best_l = min(timed(bl) for _ in range(args.rounds))
        assert not renderer.flush_overflow(), f"overflow in {label}"
        slope = (best_l - best_s) / (bl - bs) * 1e3
        wall = best_l / bl * 1e3
        row = {"cell": label, "slope_ms": round(slope, 4),
               "wall_ms": round(wall, 4),
               "small_ms": round(best_s / bs * 1e3, 4)}
        results[label] = row
        print(json.dumps(row), flush=True)

    for name, model, spawn, batches in SCENES:
        config = SceneConfig(
            model_path=model,
            camera_config=CameraConfig(
                mode=CameraMode.FIRST_PERSON, position=spawn),
        )
        scene = Scene.from_config(config, W, H)
        T = int(scene.mesh.indices.shape[0] // 3)
        print(json.dumps({"scene": name, "tris": T}), flush=True)
        for cfg_name, opts in CONFIGS:
            measure(f"{name}_{cfg_name}", scene, dict(opts), batches)

    if args.mega:
        # structured 1M (micro path): tile shape is fixed (8,128) there;
        # this cell isolates the OTHER two candidates (segments flip +
        # table rebuild) from the tile default.
        config = SceneConfig(model_path="structured_city_1m.obj")
        scene = Scene.from_config(config, W, H)
        T = int(scene.mesh.indices.shape[0] // 3)
        print(json.dumps({"scene": "structured_1m", "tris": T}), flush=True)
        measure("structured_1m_default", scene, {}, (2, 8))

    print(json.dumps({"summary": results}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
