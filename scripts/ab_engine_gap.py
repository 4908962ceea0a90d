"""Hardware A/B: engine-vs-direct gap on the structured mega scene.

tex_mega_profile2 (quiesced, settled cap) measured the DIRECT jitted
frame at plain 27.2 / texf 41.3 ms while the suite's engine rows measure
39.8 / 49.8 — a ~10-12 ms/frame gap with both methodologies clean. This
script renders the SAME scene three ways in one quiesced process to
attribute it:

  direct    render_frame_micro(...) — the profile formulation
  engine1   Renderer.render_device (single unchecked step, fenced)
  engineK   Renderer.render_batch_device (scan over K frames, fenced)

plus the engine step's actual options dict, so a kwargs difference
(effect_kind, tex plumbing, capacities) shows up by inspection.

    python scripts/ab_engine_gap.py [--iters 12] [--tex]
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
    ap.add_argument("--iters", type=int, default=12)
    ap.add_argument("--tex", action="store_true",
                    help="textured variant (enable_textures)")
    args = ap.parse_args()

    import jax
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
            position=(13.566635, 4.0, 24.0)),
        enable_textures=args.tex)
    scene = Scene.from_config(cfg, W, H)
    u = scene.update(0.016)

    r = Renderer(scene.mesh, W, H, backend=cfg.normalized_backend(),
                 **scene.renderer_options())
    # One checked render: settles the pair capacity and compiles.
    img = r.render(u)
    opts = {k: (v if isinstance(v, (int, str, bool, float)) else
                f"<{type(v).__name__} {getattr(v, 'shape', '')}>")
            for k, v in r.options.items()}
    print(json.dumps({"engine_options": opts,
                      "covered_px": int(
                          (np.asarray(img[:, :, :3]) != (0, 0, 255))
                          .any(axis=-1).sum())}), flush=True)

    results = {}

    def rec(name, ms):
        results[name] = round(float(ms), 3)
        print(json.dumps({"form": name, "ms": results[name]}), flush=True)

    # engine single unchecked step (_timeit fences via the returned leaf)
    def eng1():
        return r.render_device(u)

    t, _ = _timeit(eng1, iters=args.iters)
    rec("engine1", t)

    # engine batched scan, fenced per batch, per-frame
    for K in (8, 64):
        def engK():
            return r.render_batch_device([u] * K, check=False)

        t, _ = _timeit(engK, iters=max(2, args.iters // 4))
        rec(f"engine{K}_per_frame", t / K)

    # direct formulation (profile_tex_mega): same precomputed inputs the
    # engine step closes over, same settled cap.
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
    pair_cap = r.options.get("pair_cap", 0)
    kw = dict(width=W, height=H, pos_soa=r.pos_soa, nrm_soa=r.nrm_soa,
              effect_kind=r.options.get("effect_kind"), pair_cap=pair_cap)
    if args.tex and r.textures is not None:
        kw.update(face_tex=r.textures.get("face_tex"),
                  texels=r.textures.get("texels"),
                  tex_table=r.textures.get("tex_table"),
                  uv_soa=r.textures.get("uv_soa"),
                  tex_rows=r.textures.get("tex_rows"))
        if r.face_kd is not None:
            kw["face_kd"] = r.face_kd

    def direct():
        return tpu.render_frame_micro(
            pos, nrm, uvs, tri, vp, vpos, lwp, lc, li, eff, **kw)

    t, _ = _timeit(direct, iters=args.iters)
    rec("direct", t)

    # direct through the GENERIC entry (tpu.render_frame), eliminating the
    # micro-vs-generic dispatch as a variable.
    def direct_generic():
        return tpu.render_frame(
            pos, nrm, uvs, tri, vp, vpos, lwp, lc, li, eff, **kw)

    t, _ = _timeit(direct_generic, iters=args.iters)
    rec("direct_generic", t)

    print(json.dumps(results), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
