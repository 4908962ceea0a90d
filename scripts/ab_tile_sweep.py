"""Hardware sweep: tile shape x work-list across small/mid scene sizes.

The round-4 Exterior bisect found the default tile choice losing at 16k
tris: 8x128 tiles ran the frame in 1.15 ms vs the default 16x256+worklist
at 1.62 ms (ab_exterior.py, 2026-08-19). ``tpu.choose_tile``'s current rule
("16x256 unless avg triangle area < 4 px") was tuned at Suzanne scale only;
this sweep measures the full (tile shape x worklist x scene size) grid so
the heuristic can be retuned with data:

  scenes: suzanne (1.3k tris), vokselia small (8k), exterior (16k),
          san miguel small (42k)
  tiles:  16x256, 8x128
  worklist: on, off

    python scripts/ab_tile_sweep.py [--iters 12]

Prints one JSON line per cell plus a summary line.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

W, H = 1024, 768

SCENES = [
    ("suzanne", "suzanne.obj", (0.0, 0.0, 3.0)),
    ("vokselia_small", "vokselia_spawn_small.obj", (0.0, 0.86896104, 1.4793645)),
    ("exterior", "exterior/Exterior.obj", (-525.80194, 168.52838, 260.81876)),
    ("san_miguel_small", "san_miguel_small.obj",
     (13.566635, 2.6288567, 10.243919)),
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=12)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from compute_renderer_tpu.backends import tpu
    from compute_renderer_tpu.bench.profiling import _timeit
    from compute_renderer_tpu.core.camera import CameraMode
    from compute_renderer_tpu.core.maths import F32
    from compute_renderer_tpu.engine.scene import (
        CameraConfig, Scene, SceneConfig,
    )

    results = {}
    for label, model, spawn in SCENES:
        config = SceneConfig(
            model_path=model,
            camera_config=CameraConfig(
                mode=CameraMode.FIRST_PERSON, position=spawn),
        )
        scene = Scene.from_config(config, W, H)
        mesh = scene.mesh
        u = scene.update(0.016)
        argsj = (
            jnp.asarray(mesh.positions), jnp.asarray(mesh.normals),
            jnp.asarray(mesh.uvs),
            jnp.asarray(mesh.indices.astype(np.int32)).reshape(-1, 3),
            jnp.asarray(u.view_proj),
            jnp.asarray(u.view_position).astype(F32),
            jnp.asarray(u.light_world_pos).astype(F32),
            jnp.asarray(u.light_color).astype(F32),
            jnp.asarray(u.light_intensity).astype(F32),
            jnp.asarray(u.effect),
        )
        T = int(mesh.indices.shape[0] // 3)
        results[f"{label}_tris"] = T
        print(json.dumps({"scene": label, "tris": T}), flush=True)
        for th, tw in ((16, 256), (8, 128)):
            for wl in (True, False):
                name = f"{label}_{th}x{tw}_{'wl' if wl else 'nowl'}"

                def f(th=th, tw=tw, wl=wl):
                    return tpu.render_frame(
                        *argsj, width=W, height=H, effect_kind=0,
                        tile_h=th, tile_w=tw, worklist=wl, path="tile")

                try:
                    t, _ = _timeit(f, iters=args.iters)
                except Exception as e:
                    print(json.dumps({"stage": name,
                                      "error": f"{type(e).__name__}: {e}"[:200]}),
                          flush=True)
                    continue
                results[name] = round(float(t), 3)
                print(json.dumps({"stage": name, "ms": results[name]}),
                      flush=True)

    print(json.dumps(results), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
