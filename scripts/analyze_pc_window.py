"""Offline feasibility check (negative result, round 5): windowed one-hot
MXU gather for the pair-coefficient stream.

The pair_coeffs stage (11.9-16.5 ms at the structured scene's true 700k
pairs, tex_mega_profile2) is a P-sized random row gather from the
triangle-major coefficient table in sorted-cell order. If the triangle
ids referenced by each 128-pair output superblock spanned a bounded
window W of table rows, the gather could instead be a per-superblock
(128, W) one-hot x (W, R) MXU contraction (bit-exact broadcast modulo
the -0.0 flush): at W=2048 that is ~1.3 ms of f32 MXU work for the whole
stream — 10x under the measured gather.

MEASURED (this script, 1024x768 first frames): the spans are unbounded
in practice — structured p50 6,017 / p90 497,389 / max 1,023,272;
San Miguel p50 8,415 / p90 580,128. Only 13% (structured) / 0.8%
(San Miguel) of superblocks fit W=2048. A tile's segment references
triangles from anywhere in the draw order (background + foreground
geometry overlap the same cells), so sorted-cell superblocks have no
useful id locality. PARKED like coverage pruning
(scripts/analyze_cover_prune.py).

    python scripts/analyze_pc_window.py
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

W, H = 1024, 768


def main() -> int:
    import jax.numpy as jnp
    import numpy as np

    from compute_renderer_tpu.backends import binning, common
    from compute_renderer_tpu.core.camera import CameraMode
    from compute_renderer_tpu.engine.scene import (
        CameraConfig, Scene, SceneConfig,
    )
    from compute_renderer_tpu.io.objgen import STRUCTURED_NAME

    ntx = (W + 127) // 128

    def spans(name, cfg):
        scene = Scene.from_config(cfg, W, H)
        mesh = scene.mesh
        u = scene.update(0.016)
        pos = jnp.asarray(mesh.positions)
        tri = jnp.asarray(mesh.indices.astype(np.int32)).reshape(-1, 3)
        pos_soa = pos[tri].transpose(1, 2, 0)
        _, screen_soa = common.vertex_stage_soa(
            pos_soa, jnp.asarray(u.view_proj), jnp.asarray(u.effect), W, H)
        setup = common.triangle_setup_soa(
            screen_soa, jnp.asarray(u.effect), W, H, 8, 8)
        rx, _, c = (np.asarray(x) for x in binning.cover_counts(setup))
        x0 = np.asarray(setup["tile_x0"]).astype(np.int64)
        y0 = np.asarray(setup["tile_y0"]).astype(np.int64)
        c = c.astype(np.int64)
        rx = np.maximum(rx.astype(np.int64), 1)
        T = c.shape[0]
        # numpy mirror of the expansion kernel's cell math
        # (pallas_expand._expand_kernel).
        ntx_t = ntx * 16
        tid = np.repeat(np.arange(T), c)
        starts = np.concatenate([[0], np.cumsum(c)[:-1]])
        j = np.arange(c.sum()) - np.repeat(starts, c)
        cx = np.repeat(x0, c) + j % np.repeat(rx, c)
        cy = np.repeat(y0, c) + j // np.repeat(rx, c)
        cell16 = cx // 16
        cell = (cy * ntx_t + cell16 * 16) + (cx - cell16 * 16)
        st = tid[np.argsort(cell, kind="stable")]
        nsb = st.shape[0] // 128
        sb = st[: nsb * 128].reshape(nsb, 128)
        span = sb.max(axis=1) - sb.min(axis=1) + 1
        print(name, "P", st.shape[0], "superblocks", nsb,
              "span p50", int(np.percentile(span, 50)),
              "p90", int(np.percentile(span, 90)),
              "p99", int(np.percentile(span, 99)),
              "max", int(span.max()),
              "frac<=2048:", round(float((span <= 2048).mean()), 3),
              "frac<=8192:", round(float((span <= 8192).mean()), 3))

    fp = lambda p: CameraConfig(mode=CameraMode.FIRST_PERSON, position=p)
    spans("structured", SceneConfig(
        model_path=STRUCTURED_NAME,
        camera_config=fp((13.566635, 4.0, 24.0))))
    spans("san_miguel", SceneConfig(
        model_path="San_Miguel/san-miguel-low-poly.obj",
        camera_config=fp((13.566635, 2.6288567, 10.243919))))
    return 0


if __name__ == "__main__":
    sys.exit(main())
