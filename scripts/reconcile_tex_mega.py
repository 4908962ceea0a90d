"""Reconcile the textured-mega discrepancy (VERDICT r4 weak #4 / next #3).

tex_mega_profile measured the fused 1M-tri textured frame at 28.8 ms
(direct render_frame_micro, pipelined dispatches, one closing fence);
the suite row measured 51.4 ms (engine batch-64 lax.scan). One of them is
measuring something else. This script times every formulation in ONE
quiesced process so the gap has to show up between two adjacent rows:

  direct        render_frame_micro, profile's exact formulation
  engine_1      Renderer.render_blocked single frames (fence each)
  engine_pipe   Renderer.render_device x N, one closing fence
                (the engine step WITHOUT scan — isolates step overhead)
  engine_b8     Renderer.render_batch_device(batch=8)  (scan)
  engine_b64    Renderer.render_batch_device(batch=64) (scan, = suite row)

    python scripts/reconcile_tex_mega.py [--iters 8] [--plain]

Prints one JSON line per row.
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
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--plain", action="store_true",
                    help="also run the untextured structured scene")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from compute_renderer_tpu.backends import tpu
    from compute_renderer_tpu.bench.profiling import _timeit
    from compute_renderer_tpu.core.camera import CameraMode
    from compute_renderer_tpu.core.maths import F32
    from compute_renderer_tpu.engine.renderer import Renderer
    from compute_renderer_tpu.engine.scene import (
        CameraConfig, Scene, SceneConfig,
    )
    from compute_renderer_tpu.io.objgen import STRUCTURED_NAME

    results = {}

    def run_scene(label, enable_textures):
        config = SceneConfig(
            model_path=STRUCTURED_NAME,
            camera_config=CameraConfig(
                mode=CameraMode.FIRST_PERSON,
                position=(13.566635, 4.0, 24.0),
            ),
            enable_textures=enable_textures,
        )
        scene = Scene.from_config(config, W, H)
        mesh = scene.mesh
        u = scene.update(0.016)

        # ---- direct (the profile's formulation) -------------------------
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
        kw = dict(width=W, height=H, effect_kind=0,
                  pos_soa=pos_soa, nrm_soa=nrm_soa)
        if enable_textures:
            from compute_renderer_tpu.backends import common

            face_tex = jnp.asarray(mesh.face_tex)
            tex_table = jnp.asarray(mesh.tex_table)
            kw.update(
                face_kd=jnp.asarray(mesh.face_kd),
                face_tex=face_tex,
                texels=jnp.asarray(mesh.texels),
                tex_table=tex_table,
                uv_soa=uvs.astype(F32)[tri].transpose(1, 2, 0),
                tex_rows=common.tex_rows_f32(face_tex, tex_table),
            )

        def f_direct():
            return tpu.render_frame_micro(
                pos, nrm, uvs, tri, vp, vpos, lwp, lc, li, eff, **kw)

        t, _ = _timeit(f_direct, iters=args.iters)
        results[f"{label}_direct"] = round(float(t), 3)
        print(json.dumps({"row": f"{label}_direct", "ms": results[f"{label}_direct"]}),
              flush=True)

        # ---- engine ------------------------------------------------------
        renderer = Renderer(scene.mesh, W, H, backend="tpu",
                            **scene.renderer_options())
        uni = scene.update(0.016)

        # warm + calibrate
        out = renderer._checked(uni)
        np.asarray(out[0][0, 0])

        def f_engine():
            return renderer.render_device(uni)

        t, _ = _timeit(f_engine, iters=args.iters)
        results[f"{label}_engine_pipe"] = round(float(t), 3)
        print(json.dumps({"row": f"{label}_engine_pipe",
                          "ms": results[f"{label}_engine_pipe"]}), flush=True)

        # single frames, fenced each (true latency)
        ts = []
        for _ in range(max(args.iters // 2, 3)):
            t0 = time.perf_counter()
            o = renderer.render_device(uni)
            np.asarray(o[2])
            ts.append(time.perf_counter() - t0)
        results[f"{label}_engine_1"] = round(min(ts) * 1e3, 3)
        print(json.dumps({"row": f"{label}_engine_1",
                          "ms": results[f"{label}_engine_1"]}), flush=True)

        for batch in (8, 64):
            seq = [scene.update(0.016) for _ in range(batch)]
            out = renderer.render_batch_device(seq)
            np.asarray(out[-1, 0, 0])
            best = float("inf")
            for _ in range(2 if batch == 64 else 3):
                t0 = time.perf_counter()
                renderer.render_batch_device(seq, check=False)
                renderer.fence_pending()
                best = min(best, time.perf_counter() - t0)
            results[f"{label}_engine_b{batch}"] = round(best / batch * 1e3, 3)
            print(json.dumps({"row": f"{label}_engine_b{batch}",
                              "ms": results[f"{label}_engine_b{batch}"]}),
                  flush=True)
        assert not renderer.flush_overflow(), f"overflow in {label}"

    run_scene("texf", True)
    if args.plain:
        run_scene("plain", False)

    print(json.dumps(results), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
