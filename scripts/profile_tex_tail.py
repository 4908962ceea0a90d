"""Per-stage hardware profile of the deferred-texturing tail.

The round-3 suite shows a 36k-tri textured frame at 67 ms vs 4.1 ms plain —
the verdict attributes the gap to the plain-XLA resolve/sample/shade tail
(per-pixel gathers). Before building the fused-epilogue replacement, this
script MEASURES where the 63 ms actually goes, stage by stage, plus a raw
gather microbenchmark to calibrate the TPU's gather cost model:

  frame_plain     untextured render of the same geometry (baseline)
  frame_tex       full textured frame (vis walk + tail)
  vis_walk        kernel visibility walk alone (winner ids + keys)
  resolve         common.resolve_attributes on the winner buffer
  sample_*        atlas sampling alone (nearest / bilinear)
  shade           common.shade on a resolved gbuffer
  gather_rows3    (H, W) gather of (P, 3) f32 rows  (the texel fetch shape)
  gather_flat     (H, W) gather of (P,) f32        (packed-pool shape)

    python scripts/profile_tex_tail.py [--iters 8]

Prints one JSON line per stage plus a summary.
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

    from compute_renderer_tpu.backends import common, tpu
    from compute_renderer_tpu.bench.profiling import _timeit
    from compute_renderer_tpu.core.maths import F32
    from compute_renderer_tpu.engine.scene import (
        CameraConfig, Scene, SceneConfig,
    )
    from compute_renderer_tpu.core.camera import CameraMode

    config = SceneConfig(
        model_path="structured_scene_tex.obj",
        camera_config=CameraConfig(
            mode=CameraMode.FIRST_PERSON, position=(13.566635, 4.0, 24.0),
        ),
        enable_textures=True,
    )
    scene = Scene.from_config(config, W, H)
    mesh = scene.mesh
    u = scene.update(0.016)

    pos = jnp.asarray(mesh.positions)
    nrm = jnp.asarray(mesh.normals.astype(F32))
    uvs = jnp.asarray(mesh.uvs.astype(F32))
    tri = jnp.asarray(mesh.indices.astype(np.int32)).reshape(-1, 3)
    vp = jnp.asarray(u.view_proj)
    vpos = jnp.asarray(u.view_position).astype(F32)
    lwp = jnp.asarray(u.light_world_pos).astype(F32)
    lc = jnp.asarray(u.light_color).astype(F32)
    li = jnp.asarray(u.light_intensity).astype(F32)
    eff = jnp.asarray(u.effect)
    face_kd = (jnp.asarray(mesh.face_kd.astype(F32))
               if mesh.face_kd is not None else None)
    face_tex = jnp.asarray(mesh.face_tex.astype(np.int32))
    texels = jnp.asarray(mesh.texels.astype(F32))
    tex_table = jnp.asarray(mesh.tex_table.astype(np.int32))

    T = int(tri.shape[0])
    results = {"tris": T, "texels": int(texels.shape[0])}
    print(json.dumps({"tris": T, "texels": int(texels.shape[0]),
                      "textures": int(tex_table.shape[0])}), flush=True)

    frame_kw = dict(width=W, height=H, effect_kind=0)

    def stage(name, f, *a, **kw):
        try:
            t, _ = _timeit(f, *a, iters=args.iters, **kw)
        except Exception as e:
            print(json.dumps({"stage": name,
                              "error": f"{type(e).__name__}: {e}"[:300]}),
                  flush=True)
            return None
        results[name] = round(float(t), 3)
        print(json.dumps({"stage": name, "ms": results[name]}), flush=True)
        return t

    # Full frames.
    stage("frame_plain", lambda: tpu.render_frame(
        pos, nrm, uvs, tri, vp, vpos, lwp, lc, li, eff, **frame_kw))
    stage("frame_tex", lambda: tpu.render_frame(
        pos, nrm, uvs, tri, vp, vpos, lwp, lc, li, eff,
        face_kd=face_kd, face_tex=face_tex, texels=texels,
        tex_table=tex_table, **frame_kw))
    stage("frame_tex_bilinear", lambda: tpu.render_frame(
        pos, nrm, uvs, tri, vp, vpos, lwp, lc, li, eff,
        face_kd=face_kd, face_tex=face_tex, texels=texels,
        tex_table=tex_table, tex_filter="bilinear", **frame_kw))

    # Stage pieces, on realistic winner data.
    world, screen = common.vertex_stage(pos, vp, eff, W, H)

    best_tri_full = None
    try:
        # Reconstruct a winner buffer by re-running the vis walk via the
        # xla comparator's return_tri (cheap enough once).
        from compute_renderer_tpu.backends import xla

        _, _, best_tri = xla.render_frame(
            pos, nrm, uvs, tri, vp, vpos, lwp, lc, li, eff,
            width=W, height=H, face_tex=face_tex, texels=texels,
            tex_table=tex_table, return_tri=True)
        best_tri_full = jax.block_until_ready(best_tri)
    except Exception as e:
        print(json.dumps({"stage": "winner_buffer",
                          "error": f"{type(e).__name__}: {e}"[:200]}),
              flush=True)

    if best_tri_full is not None:
        best_tri = best_tri_full

        def f_resolve(best_tri):
            return common.resolve_attributes(
                best_tri, tri, screen, world, nrm, uvs, eff, W, H)

        gb = jax.block_until_ready(jax.jit(f_resolve)(best_tri))
        stage("resolve", jax.jit(f_resolve), best_tri)

        flag = gb["flag"]

        def f_sample_nearest(uv):
            t, has = common.sample_atlas(
                texels, tex_table, face_tex, best_tri, flag, uv)
            return t

        def f_sample_bilinear(uv):
            t, has = common.sample_atlas(
                texels, tex_table, face_tex, best_tri, flag, uv,
                bilinear=True)
            return t

        stage("sample_nearest", jax.jit(f_sample_nearest), gb["uv"])
        stage("sample_bilinear", jax.jit(f_sample_bilinear), gb["uv"])

        def f_shade(gb):
            return common.shade(gb, vpos, lwp, lc, li)

        stage("shade", jax.jit(f_shade), gb)

    # Gather microbenchmarks at tail shapes.
    P = int(texels.shape[0])
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, P, size=(H, W)).astype(np.int32))
    flat = jnp.asarray(np.ascontiguousarray(mesh.texels[:, 0].astype(F32)))
    packed = jnp.asarray(
        rng.integers(0, 2**31 - 1, size=(P,)).astype(np.int32))

    stage("gather_rows3", jax.jit(lambda i: texels[i]), idx)
    stage("gather_flat_f32", jax.jit(lambda i: flat[i]), idx)
    stage("gather_flat_i32", jax.jit(lambda i: packed[i]), idx)

    print(json.dumps(results), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
