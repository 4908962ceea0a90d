"""Hardware A/B: fused vs deferred texturing at the structured-mega scale.

Round 4 made fused texturing the default off a 36k-tri A/B (5-10x win,
ab_tex_fused). But the fused texf walk streams 44-row superblocks per
PAIR while the deferred path streams the 32-row visibility walk and pays
its texture resolve per PIXEL — and the structured scene has 700k pairs
(reconcile_tex_followup) against a fixed 786k pixels, so the economics at
mega scale were never actually measured at a non-overflowing cap (the
round-4 numbers ran the 3T/8 heuristic cap and dropped ~45% of pairs).
Times both modes at the engine's settled capacity; images must match
exactly (the fused epilogue was built bitwise-equal to the deferred tail).

    python scripts/ab_texmode_mega.py [--iters 8]
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

    ntx = (W + 127) // 128
    nty = (H + 7) // 8
    num_cells = ntx * nty * 16
    _, screen_soa = common.vertex_stage_soa(pos_soa, vp, eff, W, H)
    setup0 = common.triangle_setup_soa(screen_soa, eff, W, H, 8, 8)
    total0 = int(np.asarray(jnp.sum(binning.cover_counts(setup0)[2])))
    pair_cap = tpu.grow_pair_cap(0, max(total0, num_cells, 1024))
    print(json.dumps({"tris": int(tri.shape[0]), "pairs": total0,
                      "pair_cap": pair_cap}), flush=True)

    kw = dict(
        width=W, height=H, effect_kind=0, pair_cap=pair_cap,
        pos_soa=pos_soa, nrm_soa=nrm_soa,
        face_kd=jnp.asarray(mesh.face_kd),
        face_tex=face_tex,
        texels=jnp.asarray(mesh.texels),
        tex_table=tex_table,
        uv_soa=uvs.astype(F32)[tri].transpose(1, 2, 0),
        tex_rows=common.tex_rows_f32(face_tex, tex_table),
    )

    def frame(mode):
        return tpu.render_frame_micro(
            pos, nrm, uvs, tri, vp, vpos, lwp, lc, li, eff,
            tex_mode=mode, **kw)

    results = {}
    imgs = {}
    for mode in ("fused", "deferred"):
        out = jax.block_until_ready(frame(mode))
        flags = np.asarray(out[2])
        assert not flags.any(), (mode, flags)
        imgs[mode] = np.asarray(out[0])
        t, _ = _timeit(lambda: frame(mode), iters=args.iters)
        results[mode] = round(float(t), 3)
        print(json.dumps({"mode": mode, "ms": results[mode]}), flush=True)

    eq = bool(np.array_equal(imgs["fused"], imgs["deferred"]))
    results["image_equal"] = eq
    if not eq:
        d = (imgs["fused"].astype(int) - imgs["deferred"].astype(int))
        results["max_diff"] = int(np.abs(d).max())
        results["px_diff"] = int((np.abs(d).sum(-1) > 0).sum())
    print(json.dumps(results), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
