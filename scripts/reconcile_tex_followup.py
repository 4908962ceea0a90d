"""Follow-up to reconcile_tex_mega (VERDICT r4 #3): WHY is the direct
render_frame_micro call ~2x faster than the engine step on the SAME scene?

reconcile_tex measured texf_direct 27.9 ms vs texf_engine_pipe 50.8 ms
(batch-64 51.5 = the suite row, so the suite methodology is fine). Prime
suspect: the direct call runs the DEFAULT pair_cap heuristic (3T/8) and
never checks its overflow flag — if the structured scene's coverage
exceeds the heuristic, the direct frame silently DROPS pairs and times an
incomplete frame (exactly the reference's unchecked-overflow bug class,
gpu_buffers.rs:53-63, that the engine's settle-to-need + retry exists to
prevent). This script decides it with evidence:

  overflow_default   the direct call's overflow report + true pair need
  engine_cap         the engine's settled pair_cap for the same scene
  direct_enginecap   direct call timed at the engine's cap
  image_equal        default-cap image vs engine-cap image

    python scripts/reconcile_tex_followup.py [--iters 8]
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
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from compute_renderer_tpu.backends import binning, common, tpu
    from compute_renderer_tpu.bench.profiling import _timeit
    from compute_renderer_tpu.core.camera import CameraMode
    from compute_renderer_tpu.core.maths import F32
    from compute_renderer_tpu.engine.renderer import Renderer
    from compute_renderer_tpu.engine.scene import (
        CameraConfig, Scene, SceneConfig,
    )
    from compute_renderer_tpu.io.objgen import STRUCTURED_NAME

    config = SceneConfig(
        model_path=STRUCTURED_NAME,
        camera_config=CameraConfig(
            mode=CameraMode.FIRST_PERSON,
            position=(13.566635, 4.0, 24.0),
        ),
        enable_textures=True,
    )
    scene = Scene.from_config(config, W, H)
    mesh = scene.mesh
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
    pos_soa = pos[tri].transpose(1, 2, 0)
    nrm_soa = nrm[tri].transpose(1, 2, 0)
    face_tex = jnp.asarray(mesh.face_tex)
    tex_table = jnp.asarray(mesh.tex_table)
    kw = dict(
        width=W, height=H, effect_kind=0,
        pos_soa=pos_soa, nrm_soa=nrm_soa,
        face_kd=jnp.asarray(mesh.face_kd),
        face_tex=face_tex,
        texels=jnp.asarray(mesh.texels),
        tex_table=tex_table,
        uv_soa=uvs.astype(F32)[tri].transpose(1, 2, 0),
        tex_rows=common.tex_rows_f32(face_tex, tex_table),
    )
    results = {}
    T = int(tri.shape[0])
    default_cap = binning.default_pair_cap_micro(
        T, ((W + 127) // 128) * ((H + 7) // 8) * 16)
    results["tris"] = T
    results["default_cap"] = int(default_cap)

    def direct(pair_cap=0):
        return tpu.render_frame_micro(
            pos, nrm, uvs, tri, vp, vpos, lwp, lc, li, eff,
            pair_cap=pair_cap, **kw)

    out = jax.block_until_ready(direct())
    flags = np.asarray(out[2])
    results["overflow_default"] = [int(f) for f in flags]
    print(json.dumps({"row": "overflow_default",
                      "flags": results["overflow_default"],
                      "default_cap": int(default_cap)}), flush=True)

    t, _ = _timeit(direct, iters=args.iters)
    results["direct_default_ms"] = round(float(t), 3)
    print(json.dumps({"row": "direct_default",
                      "ms": results["direct_default_ms"]}), flush=True)

    # Engine settles the cap (calibration + overflow retry).
    renderer = Renderer(mesh, W, H, backend="tpu",
                        **scene.renderer_options())
    out_e = renderer._checked(u)
    np.asarray(out_e[0][0, 0])
    engine_cap = int(renderer.options.get("pair_cap", 0))
    results["engine_cap"] = engine_cap
    print(json.dumps({"row": "engine_cap", "pair_cap": engine_cap}),
          flush=True)

    cap = engine_cap or default_cap
    out2 = jax.block_until_ready(direct(pair_cap=cap))
    results["overflow_enginecap"] = [int(f) for f in np.asarray(out2[2])]
    t, _ = _timeit(lambda: direct(pair_cap=cap), iters=args.iters)
    results["direct_enginecap_ms"] = round(float(t), 3)
    print(json.dumps({"row": "direct_enginecap",
                      "ms": results["direct_enginecap_ms"],
                      "flags": results["overflow_enginecap"]}), flush=True)

    results["image_equal_default_vs_enginecap"] = bool(
        np.array_equal(np.asarray(out[0]), np.asarray(out2[0])))
    assert not renderer.flush_overflow()

    print(json.dumps(results), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
