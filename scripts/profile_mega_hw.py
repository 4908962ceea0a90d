"""Hardware per-stage profile of the mega-scene (micro) pipeline.

Run ON TPU after a perf-relevant change to re-measure the frame's stage
breakdown (the journal table in docs/ARCHITECTURE.md). Stages are fenced
separate jits, so their sum exceeds the fused frame; ``total_fused_ms`` is
the honest per-frame number (matches the suite's mega row minus link
overhead at batch>=64).

    python scripts/profile_mega_hw.py [--tris-model San_Miguel/...] [--iters 8]

Prints one JSON line with every stage in ms.
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

    from compute_renderer_tpu.bench import profiling
    from compute_renderer_tpu.engine.scene import (
        CameraConfig, Scene, SceneConfig,
    )
    from compute_renderer_tpu.io import procedural

    mesh = procedural.make_model(args.model)
    scene = Scene.from_config(
        SceneConfig(camera_config=CameraConfig.first_person(
            [13.57, 2.63, 10.24])), W, H)
    u = scene.update(0.016)

    out = profiling.stage_timings_micro(mesh, u, W, H, iters=args.iters)
    out = {k: round(float(v), 3) for k, v in out.items()}
    out["tris"] = int(mesh.indices.size // 3)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
