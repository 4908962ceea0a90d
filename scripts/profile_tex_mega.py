"""Sub-stage hardware profile of the 1M-tri FUSED-TEXTURE frame.

The round-4 fused-texturing A/B (ab_tex_fused) landed the 36k-tri textured
frame at 6.5 ms (vs the 12 ms target) but the 1M-tri textured frame at
137 ms — far above the 60 ms verdict target — and the materials-only mega
row at +53% over plain (target <= +15%). This script decomposes BOTH
extended mega frames into the same fenced sub-stages profile_binning.py
uses for the plain frame, so the overage is attributed to a stage instead
of guessed at:

  front_texf    pallas_front.front_end emitting the 44-row texf table
  bins          bin_cells_sort_meta (expand + sort + segments)
  pack_c64      pack_table_c64 on the 44 coeff rows -> (T, 22) c64
  pair_coeffs   the (P, 22) c64 pair-order gather + superblock transpose
  raster        raster_shade_micro texf walk (44-row stream, G-buffer out)
  tail          common.fused_texture_tail (texel fetch + elementwise)
  frame_texf    whole render_frame_micro (cross-check ~= sum)

plus the materials-only variants (35-col table, 40-row stream) and the
plain frame re-measured in the same process for a like-for-like base.

    python scripts/profile_tex_mega.py [--iters 8]
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

    from compute_renderer_tpu.backends import (
        binning, common, pallas_front, pallas_micro, tpu,
    )
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
    face_kd = jnp.asarray(mesh.face_kd)
    face_tex = jnp.asarray(mesh.face_tex)
    texels = jnp.asarray(mesh.texels)
    tex_table = jnp.asarray(mesh.tex_table)

    T = int(tri.shape[0])
    ntx = (W + 127) // 128
    nty = (H + 7) // 8
    num_cells = ntx * nty * 16
    interpret = jax.default_backend() != "tpu"
    pos_soa = pos[tri].transpose(1, 2, 0)
    nrm_soa = nrm[tri].transpose(1, 2, 0)
    uv_soa = uvs.astype(F32)[tri].transpose(1, 2, 0)
    tex_rows = common.tex_rows_f32(face_tex, tex_table)

    # Settle the pair capacity to the scene's MEASURED need, exactly like
    # the engine (Renderer._maybe_calibrate). The first run of this script
    # used the 3T/8 heuristic — the structured scene needs 699,377 pairs
    # vs its 383,790 cap, so every number it printed timed a frame that
    # silently dropped ~45% of its pairs and rendered a different image
    # (reconcile_tex_followup.out.txt). The reference has exactly this
    # unchecked-overflow class at gpu_buffers.rs:53-63.
    _, screen_soa = common.vertex_stage_soa(pos_soa, vp, eff, W, H)
    setup0 = common.triangle_setup_soa(screen_soa, eff, W, H, 8, 8)
    total0 = int(np.asarray(jnp.sum(binning.cover_counts(setup0)[2])))
    pair_cap = tpu.grow_pair_cap(0, max(total0, num_cells, 1024))

    results = {"tris": T, "pair_cap": int(pair_cap),
               "pairs_measured": total0,
               "texels": int(texels.shape[0])}
    print(json.dumps(results), flush=True)

    def stage(name, f, *a):
        try:
            t, _ = _timeit(f, *a, iters=args.iters)
        except Exception as e:
            print(json.dumps({"stage": name,
                              "error": f"{type(e).__name__}: {e}"[:300]}),
                  flush=True)
            return
        results[name] = round(float(t), 3)
        print(json.dumps({"stage": name, "ms": results[name]}), flush=True)

    # ---- shared intermediates (texf) ------------------------------------
    def f_front_texf(pos_soa, nrm_soa, vp, eff, face_kd, uv_soa, tex_rows):
        return pallas_front.front_end(
            pos_soa, nrm_soa, vp, eff, width=W, height=H,
            interpret=interpret, kd_rows=face_kd, uv_soa=uv_soa,
            tex_rows=tex_rows)

    coeff, meta = jax.block_until_ready(jax.jit(f_front_texf)(
        pos_soa, nrm_soa, vp, eff, face_kd, uv_soa, tex_rows))
    results["coeff_rows"] = int(coeff.shape[1]) if coeff.ndim == 2 else list(
        np.shape(coeff))
    c_, rx_, x0_, y0_ = meta[3], meta[2], meta[0], meta[1]

    def f_bins(c, rx, x0, y0):
        out = binning.bin_cells_sort_meta(
            c, rx, x0, y0, ntx, nty, pair_cap, interpret=interpret)
        return {k: v for k, v in out.items() if k != "layout"}

    bins = jax.block_until_ready(jax.jit(f_bins)(c_, rx_, x0_, y0_))
    results["pairs"] = int(np.asarray(
        bins["seg_count"]).sum())
    print(json.dumps({"pairs": results["pairs"]}), flush=True)

    def f_pack(coeff):
        return pallas_front.pack_table_c64(coeff)

    table = jax.block_until_ready(jax.jit(f_pack)(coeff))
    results["table_cols_c64"] = int(table.shape[1])

    def f_pair_coeffs(table, pair_tri):
        return pallas_micro.build_pair_coeffs(table, pair_tri)

    pair_coeffs = jax.block_until_ready(
        jax.jit(f_pair_coeffs)(table, bins["pair_tri"]))

    def f_raster(pair_coeffs, bins):
        return pallas_micro.raster_shade_micro(
            pair_coeffs, bins["seg_start"], bins["seg_count"],
            bins["win_start"], bins["tile_count"], eff, vpos, lwp, lc, li,
            height_padded=nty * 8, width_padded=ntx * 128,
            interpret=interpret, effect_kind=0, texf=True)

    gbuf_p, key_p = jax.block_until_ready(f_raster(pair_coeffs, bins))

    def f_tail(gbuf_p, key_p, texels):
        return common.fused_texture_tail(
            gbuf_p[:, :H, :W], key_p[:H, :W], texels, lc, li,
            tex_filter="nearest")

    def f_frame_texf():
        return tpu.render_frame_micro(
            pos, nrm, uvs, tri, vp, vpos, lwp, lc, li, eff,
            width=W, height=H, pos_soa=pos_soa, nrm_soa=nrm_soa,
            effect_kind=0, face_kd=face_kd, face_tex=face_tex,
            texels=texels, tex_table=tex_table,
            uv_soa=uv_soa, tex_rows=tex_rows, pair_cap=pair_cap)

    def f_frame_mat():
        return tpu.render_frame_micro(
            pos, nrm, uvs, tri, vp, vpos, lwp, lc, li, eff,
            width=W, height=H, pos_soa=pos_soa, nrm_soa=nrm_soa,
            effect_kind=0, face_kd=face_kd, pair_cap=pair_cap)

    def f_frame_plain():
        return tpu.render_frame_micro(
            pos, nrm, uvs, tri, vp, vpos, lwp, lc, li, eff,
            width=W, height=H, pos_soa=pos_soa, nrm_soa=nrm_soa,
            effect_kind=0, pair_cap=pair_cap)

    # ---- materials-only intermediates (35-col table, 40-row stream) -----
    def f_front_mat(pos_soa, nrm_soa, vp, eff, face_kd):
        return pallas_front.front_end(
            pos_soa, nrm_soa, vp, eff, width=W, height=H,
            interpret=interpret, kd_rows=face_kd)

    coeff_m, _meta_m = jax.block_until_ready(jax.jit(f_front_mat)(
        pos_soa, nrm_soa, vp, eff, face_kd))
    table_m = jax.block_until_ready(jax.jit(f_pack)(coeff_m))

    def f_raster_mat(pair_coeffs_m, bins):
        return pallas_micro.raster_shade_micro(
            pair_coeffs_m, bins["seg_start"], bins["seg_count"],
            bins["win_start"], bins["tile_count"], eff, vpos, lwp, lc, li,
            height_padded=nty * 8, width_padded=ntx * 128,
            interpret=interpret, effect_kind=0, mat=True)

    pair_coeffs_m = jax.block_until_ready(
        jax.jit(f_pair_coeffs)(table_m, bins["pair_tri"]))

    # ---- plain intermediates (16-col c64 table, 32-row stream) ----------
    def f_front_plain(pos_soa, nrm_soa, vp, eff):
        return pallas_front.front_end(
            pos_soa, nrm_soa, vp, eff, width=W, height=H,
            interpret=interpret)

    coeff_p, _ = jax.block_until_ready(jax.jit(f_front_plain)(
        pos_soa, nrm_soa, vp, eff))
    table_p = jax.block_until_ready(jax.jit(f_pack)(coeff_p))
    pair_coeffs_p = jax.block_until_ready(
        jax.jit(f_pair_coeffs)(table_p, bins["pair_tri"]))

    def f_raster_plain(pair_coeffs_p, bins):
        return pallas_micro.raster_shade_micro(
            pair_coeffs_p, bins["seg_start"], bins["seg_count"],
            bins["win_start"], bins["tile_count"], eff, vpos, lwp, lc, li,
            height_padded=nty * 8, width_padded=ntx * 128,
            interpret=interpret, effect_kind=0)

    # ---- timings ---------------------------------------------------------
    stage("front_texf", jax.jit(f_front_texf),
          pos_soa, nrm_soa, vp, eff, face_kd, uv_soa, tex_rows)
    stage("front_mat", jax.jit(f_front_mat),
          pos_soa, nrm_soa, vp, eff, face_kd)
    stage("front_plain", jax.jit(f_front_plain), pos_soa, nrm_soa, vp, eff)
    stage("bins", jax.jit(f_bins), c_, rx_, x0_, y0_)
    stage("pack_c64_texf", jax.jit(f_pack), coeff)
    stage("pair_coeffs_texf", jax.jit(f_pair_coeffs),
          table, bins["pair_tri"])
    stage("pair_coeffs_mat", jax.jit(f_pair_coeffs),
          table_m, bins["pair_tri"])
    stage("pair_coeffs_plain", jax.jit(f_pair_coeffs),
          table_p, bins["pair_tri"])
    stage("raster_texf", f_raster, pair_coeffs, bins)
    stage("raster_mat", f_raster_mat, pair_coeffs_m, bins)
    stage("raster_plain", f_raster_plain, pair_coeffs_p, bins)
    stage("tail", jax.jit(f_tail), gbuf_p, key_p, texels)
    stage("frame_texf", f_frame_texf)
    stage("frame_mat", f_frame_mat)
    stage("frame_plain", f_frame_plain)

    print(json.dumps(results), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
