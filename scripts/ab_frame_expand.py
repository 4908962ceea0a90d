"""Interleaved in-frame A/B: expansion-kernel geometry inside the WHOLE
jitted mega frame.

The (512, 256) expansion default was chosen by an isolated-stage sweep
(ab_expand_bc: 5.81 -> 3.05 ms at 700k pairs). But absolute rates on this
tunnel swing up to ~40% between sessions (ab_engine_gap), and the suite's
structured-plain improvement (41.5 -> 39.8) is cross-session evidence —
the lever's IN-FRAME value is unproven. This A/B compiles the full
structured-plain frame at both geometries in one process and alternates
timing rounds A/B/A/B..., reporting per-round pairs: tunnel drift hits
both sides of each pair equally (the design that settled the round-3
"Exterior regression" as noise).

    python scripts/ab_frame_expand.py [--rounds 6] [--iters 6]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

W, H = 1024, 768
GEOMS = ((512, 256), (1024, 512))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=6)
    ap.add_argument("--iters", type=int, default=6)
    args = ap.parse_args()

    import jax.numpy as jnp
    import numpy as np

    from compute_renderer_tpu.backends import tpu
    from compute_renderer_tpu.bench.profiling import _timeit
    from compute_renderer_tpu.core.camera import CameraMode
    from compute_renderer_tpu.engine.renderer import Renderer
    from compute_renderer_tpu.engine.scene import (
        CameraConfig, Scene, SceneConfig,
    )
    from compute_renderer_tpu.io.objgen import STRUCTURED_NAME

    cfg = SceneConfig(
        model_path=STRUCTURED_NAME,
        camera_config=CameraConfig(
            mode=CameraMode.FIRST_PERSON,
            position=(13.566635, 4.0, 24.0)))
    scene = Scene.from_config(cfg, W, H)
    u = scene.update(0.016)
    r = Renderer(scene.mesh, W, H, backend=cfg.normalized_backend(),
                 **scene.renderer_options())
    r.render(u)  # settle the pair capacity
    pair_cap = r.options["pair_cap"]

    mesh = scene.mesh
    pos = jnp.asarray(mesh.positions)
    nrm = jnp.asarray(mesh.normals)
    uvs = jnp.asarray(mesh.uvs)
    tri = jnp.asarray(mesh.indices.astype(np.int32)).reshape(-1, 3)
    vp = jnp.asarray(u.view_proj)
    vpos = jnp.asarray(u.view_position)
    lwp = jnp.asarray(u.light_world_pos)
    lc = jnp.asarray(u.light_color)
    li = jnp.asarray(u.light_intensity)
    eff = jnp.asarray(u.effect)

    def frame(geom):
        return tpu.render_frame_micro(
            pos, nrm, uvs, tri, vp, vpos, lwp, lc, li, eff,
            width=W, height=H, pos_soa=r.pos_soa, nrm_soa=r.nrm_soa,
            effect_kind=0, pair_cap=pair_cap, expand_geom=geom)

    # Compile + bitwise gate before any timing.
    outs = {g: frame(g) for g in GEOMS}
    imgs = {g: np.asarray(o[0]) for g, o in outs.items()}
    eq = bool(np.array_equal(imgs[GEOMS[0]], imgs[GEOMS[1]]))
    print(json.dumps({"pair_cap": pair_cap, "bitwise_equal": eq}),
          flush=True)

    pairs = []
    for rnd in range(args.rounds):
        row = {}
        for g in GEOMS:
            t, _ = _timeit(lambda: frame(g), iters=args.iters)
            row[f"{g[0]}x{g[1]}"] = round(float(t), 3)
        pairs.append(row)
        print(json.dumps({"round": rnd, **row}), flush=True)

    a = np.array([p[f"{GEOMS[0][0]}x{GEOMS[0][1]}"] for p in pairs])
    b = np.array([p[f"{GEOMS[1][0]}x{GEOMS[1][1]}"] for p in pairs])
    print(json.dumps({
        "bitwise_equal": eq,
        "new_512x256_ms": {"median": round(float(np.median(a)), 3),
                           "min": round(float(a.min()), 3)},
        "old_1024x512_ms": {"median": round(float(np.median(b)), 3),
                            "min": round(float(b.min()), 3)},
        "paired_delta_ms": [round(float(x), 3) for x in (b - a)],
        "new_wins_rounds": int((a < b).sum()),
    }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
