"""Hardware A/B: pair-coefficient superblock packing formulations.

``build_pair_coeffs`` = P-sized row gather (measured 2.49 ms at 327k
pairs, c64-packed) + a per-128-pair superblock transpose
(reshape/transpose/reshape — the remaining ~1.7 ms; ~25 GB/s, far below
HBM rate). The transpose is a pure data movement XLA lowers poorly; the
MXU variant here replaces it with a batch of (128,128)x(128,R) identity
matmuls — same bytes, but the relayout rides the MXU's native transpose
datapath instead of scalar shuffles.

Numerics: an identity matmul accumulates exactly one nonzero term per
output, so values are bit-exact EXCEPT that f32 accumulation flushes a
-0.0 coefficient to +0.0 (0 + -0 = +0). The micro kernel's depth key is
``pltpu.bitcast(z, u32)`` (pallas_micro eval_raw), so a -0.0 z
coefficient is semantically load-bearing. The A/B therefore asserts
BITWISE equality of the packed stream on the real scenes — if a scene's
table contains -0.0 where it matters, the assert fails loudly and the
formulation is rejected rather than silently landed.

    python scripts/ab_pc_pack.py [--iters 8]
"""

from __future__ import annotations

import argparse
import functools
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

    interpret = jax.default_backend() != "tpu"
    ntx = (W + 127) // 128
    nty = (H + 7) // 8
    num_cells = ntx * nty * 16

    SB = {pallas_micro.SB_ROWS, pallas_micro.SB_ROWS_MAT,
          pallas_micro.SB_ROWS_TEX}

    def pack_mxu(tri_table, pair_tri, chunk_rows=None):
        """build_pair_coeffs with the superblock transpose as an identity
        matmul (MXU). Mirrors its padding math exactly."""
        gathered = tri_table[pair_tri]
        if jnp.iscomplexobj(gathered):
            gathered = jnp.stack(
                [jnp.real(gathered), jnp.imag(gathered)], axis=2
            ).reshape(gathered.shape[0], -1)
        width = gathered.shape[1]
        if width <= pallas_micro.SB_ROWS:
            rows = pallas_micro.SB_ROWS
        elif width <= 36:
            rows = pallas_micro.SB_ROWS_MAT
        else:
            rows = pallas_micro.SB_ROWS_TEX
        if chunk_rows is None:
            chunk_rows = pallas_micro.default_chunk_rows(
                rows == pallas_micro.SB_ROWS_MAT,
                texf=rows == pallas_micro.SB_ROWS_TEX)
        chunk_pairs = (chunk_rows // rows) * 128
        P = gathered.shape[0]
        P_pad = ((P + 127) // 128) * 128 + chunk_pairs + 128
        g = jnp.pad(gathered, ((0, P_pad - P), (0, rows - width)))
        b3 = g.reshape(-1, 128, rows)
        eye = jnp.eye(128, dtype=jnp.float32)
        out = jnp.einsum("kl,bkr->brl", eye, b3,
                         precision=jax.lax.Precision.HIGHEST)
        return out.reshape(-1, 128)

    def scene_tables(name, config, textured):
        scene = Scene.from_config(config, W, H)
        mesh = scene.mesh
        u = scene.update(0.016)
        pos = jnp.asarray(mesh.positions)
        nrm = jnp.asarray(mesh.normals)
        tri = jnp.asarray(mesh.indices.astype(np.int32)).reshape(-1, 3)
        pos_soa = pos[tri].transpose(1, 2, 0)
        nrm_soa = nrm[tri].transpose(1, 2, 0)
        vp = jnp.asarray(u.view_proj)
        eff = jnp.asarray(u.effect)
        _, screen_soa = common.vertex_stage_soa(pos_soa, vp, eff, W, H)
        setup = common.triangle_setup_soa(screen_soa, eff, W, H, 8, 8)
        rx, _, c = binning.cover_counts(setup)
        total = int(np.asarray(jnp.sum(c)))
        cap = tpu.grow_pair_cap(0, max(total, num_cells, 1024))
        bins = binning.bin_cells_sort_meta(
            c.astype(jnp.int32), rx.astype(jnp.int32),
            setup["tile_x0"].astype(jnp.int32),
            setup["tile_y0"].astype(jnp.int32),
            ntx, nty, cap, interpret=interpret)
        fkw = {}
        if textured:
            uvs = jnp.asarray(mesh.uvs)
            fkw = dict(
                kd_rows=jnp.asarray(mesh.face_kd),
                uv_soa=uvs.astype(F32)[tri].transpose(1, 2, 0),
                tex_rows=common.tex_rows_f32(
                    jnp.asarray(mesh.face_tex),
                    jnp.asarray(mesh.tex_table)),
            )
        coeff, _ = pallas_front.front_end(
            pos_soa, nrm_soa, vp, eff, width=W, height=H,
            interpret=interpret, **fkw)
        table = pallas_front.pack_table_c64(coeff)
        return dict(name=name, table=table, pair_tri=bins["pair_tri"],
                    pairs=total, cap=cap)

    struct_cfg = lambda tex: SceneConfig(
        model_path=STRUCTURED_NAME,
        camera_config=CameraConfig(
            mode=CameraMode.FIRST_PERSON,
            position=(13.566635, 4.0, 24.0)),
        enable_textures=tex)
    sm_cfg = SceneConfig(
        model_path="San_Miguel/san-miguel-low-poly.obj",
        camera_config=CameraConfig(
            mode=CameraMode.FIRST_PERSON,
            position=(13.566635, 2.6288567, 10.243919)))

    cases = [
        scene_tables("structured_texf", struct_cfg(True), True),
        scene_tables("structured_plain", struct_cfg(False), False),
        scene_tables("san_miguel", sm_cfg, False),
    ]

    results = {}
    for case in cases:
        nm = case["name"]
        table, pair_tri = case["table"], case["pair_tri"]
        print(json.dumps({"scene": nm, "pairs": case["pairs"],
                          "cap": case["cap"],
                          "table_cols_c64": int(table.shape[1])}),
              flush=True)

        base_fn = jax.jit(lambda t, p: pallas_micro.build_pair_coeffs(t, p))
        mxu_fn = jax.jit(lambda t, p: pack_mxu(t, p))
        base = jax.block_until_ready(base_fn(table, pair_tri))
        mxu = jax.block_until_ready(mxu_fn(table, pair_tri))
        eq = bool(np.array_equal(
            np.asarray(base).view(np.uint32),
            np.asarray(mxu).view(np.uint32)))
        results[f"{nm}_bitwise_equal"] = eq
        print(json.dumps({"scene": nm, "bitwise_equal": eq}), flush=True)

        t, _ = _timeit(lambda: base_fn(table, pair_tri), iters=args.iters)
        results[f"{nm}_base"] = round(float(t), 3)
        print(json.dumps({"scene": nm, "form": "base",
                          "ms": results[f"{nm}_base"]}), flush=True)
        t, _ = _timeit(lambda: mxu_fn(table, pair_tri), iters=args.iters)
        results[f"{nm}_mxu"] = round(float(t), 3)
        print(json.dumps({"scene": nm, "form": "mxu",
                          "ms": results[f"{nm}_mxu"]}), flush=True)

        gfn = jax.jit(lambda t, p: t[p])
        t, _ = _timeit(lambda: gfn(table, pair_tri), iters=args.iters)
        results[f"{nm}_gather_only"] = round(float(t), 3)
        print(json.dumps({"scene": nm, "form": "gather_only",
                          "ms": results[f"{nm}_gather_only"]}), flush=True)

    print(json.dumps(results), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
