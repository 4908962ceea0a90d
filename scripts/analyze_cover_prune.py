"""Offline (CPU) estimate of the exact-cell-coverage prune ratio.

The micro path bins triangles to 8x8-pixel cells by their clipped bbox
RECT (binning.cover_counts: c = rx * ry) — the same conservative cover the
reference uses (binning.wgsl:124-141). Every pair-sized stage (expansion,
sort, coefficient gather, raster walk) scales with that pair count. A
triangle only actually produces pixels in a cell if all three edge
functions admit at least one sample point inside it; for long thin
diagonal triangles the bbox rect is O(w*h) cells but the triangle touches
O(w+h). This script measures, per benchmark scene, how many rect pairs an
exact conservative edge test would keep — the upper bound on what a
coverage-pruned binning could save.

Pure numpy on the host; mirrors common.triangle_setup_soa's rect math and
the raster's inside test (bc >= 0 at pixel centers +0.5) with an interval
bound over each cell, evaluated in f64 with an f32-safe margin so it can
only be conservative.

    JAX_PLATFORMS=cpu python scripts/analyze_cover_prune.py
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

W, H = 1024, 768
CELL = 8


def screen_verts(mesh, u):
    """Screen-space vertices per corner, f64, reference semantics
    (binning.wgsl:163-189: perspective divide, y flip, keep w)."""
    vp = np.asarray(u.view_proj, np.float64)
    pos = np.asarray(mesh.positions, np.float64)
    tri = np.asarray(mesh.indices).reshape(-1, 3)
    out = []
    for k in range(3):
        p = pos[tri[:, k]]
        clip = p @ vp[:3, :3].T + vp[:3, 3] if False else None
        hom = np.concatenate([p, np.ones((p.shape[0], 1))], axis=1) @ vp.T
        w = hom[:, 3]
        inv = np.where(w != 0.0, 1.0 / w, 0.0)
        sx = (hom[:, 0] * inv + 1.0) * 0.5 * W
        sy = (1.0 - hom[:, 1] * inv) * 0.5 * H
        sz = hom[:, 2] * inv
        out.append((sx, sy, sz, w))
    return out


def main() -> int:
    from compute_renderer_tpu.core.camera import CameraMode
    from compute_renderer_tpu.engine.scene import (
        CameraConfig, Scene, SceneConfig,
    )
    from compute_renderer_tpu.io.objgen import STRUCTURED_NAME

    scenes = {
        "structured": SceneConfig(
            model_path=STRUCTURED_NAME,
            camera_config=CameraConfig(
                mode=CameraMode.FIRST_PERSON,
                position=(13.566635, 4.0, 24.0)),
        ),
        "san_miguel": SceneConfig(
            model_path="San_Miguel/san-miguel-low-poly.obj",
            camera_config=CameraConfig(
                mode=CameraMode.FIRST_PERSON,
                position=(13.566635, 2.6288567, 10.243919)),
        ),
        "vokselia": SceneConfig(
            model_path="vokselia_spawn/vokselia_spawn.obj",
            camera_config=CameraConfig(
                mode=CameraMode.FIRST_PERSON,
                position=(0.0, 0.86896104, 1.4793645)),
        ),
    }
    for name, config in scenes.items():
        scene = Scene.from_config(config, W, H)
        mesh = scene.mesh
        u = scene.update(0.016)
        (v1x, v1y, _, v1w), (v2x, v2y, _, v2w), (v3x, v3y, _, v3w) = (
            screen_verts(mesh, u))

        w_ok = ~((v1w < 0) | (v2w < 0) | (v3w < 0))
        min_x = np.minimum(np.minimum(v1x, v2x), v3x)
        max_x = np.maximum(np.maximum(v1x, v2x), v3x)
        min_y = np.minimum(np.minimum(v1y, v2y), v3y)
        max_y = np.maximum(np.maximum(v1y, v2y), v3y)
        on_screen = ~((max_x < 0) | (min_x >= W) | (max_y < 0)
                      | (min_y >= H))
        cross_z = ((v2x - v1x) * (v3y - v1y) - (v2y - v1y) * (v3x - v1x))
        alive = w_ok & on_screen & (cross_z < 0) & np.isfinite(
            min_x + max_x + min_y + max_y)

        x0 = np.maximum(np.floor(np.maximum(min_x, 0) / CELL), 0)
        y0 = np.maximum(np.floor(np.maximum(min_y, 0) / CELL), 0)
        x1 = np.minimum(np.ceil(np.minimum(max_x, W - 1) / CELL),
                        (W + CELL - 1) // CELL)
        y1 = np.minimum(np.ceil(np.minimum(max_y, H - 1) / CELL),
                        (H + CELL - 1) // CELL)
        alive &= (x1 > x0) & (y1 > y0)
        rx = np.where(alive, (x1 - x0).astype(np.int64), 0)
        ry = np.where(alive, (y1 - y0).astype(np.int64), 0)
        c = rx * ry
        total = int(c.sum())

        # Expand pairs (vectorized): triangle id per pair + local cell.
        idx = np.repeat(np.arange(c.shape[0]), c)
        starts = np.cumsum(c) - c
        local = np.arange(total) - starts[idx]
        lrx = np.maximum(rx[idx], 1)
        cy = y0[idx] + local // lrx
        cx = x0[idx] + local % lrx

        # Conservative inside test per (cell, tri): each edge function
        # e(x, y) = (x - ax)*dy - (y - ay)*dx  (CCW-in-screen winding ->
        # inside where e <= 0 for cross_z < 0; match by testing the SIGNED
        # area orientation directly). Samples at pixel centers +0.5 over
        # the 8x8 cell: x in [cx*8+.5, cx*8+7.5].
        keep = np.ones(total, bool)
        margin = 1e-4  # relative f32 safety, scaled per edge below
        for (axs, ays, bxs, bys) in (
            (v1x, v1y, v2x, v2y), (v2x, v2y, v3x, v3y),
            (v3x, v3y, v1x, v1y),
        ):
            ax, ay = axs[idx], ays[idx]
            dx, dy = bxs[idx] - ax, bys[idx] - ay
            # e(x,y) = (x-ax)*dy - (y-ay)*dx; for cross_z<0 winding the
            # interior satisfies e >= 0 ... sign depends on convention;
            # use orientation: inside = e * sign >= 0 with sign from
            # cross_z (negative -> clockwise in flipped-y screen space).
            sgn = np.where(cross_z[idx] < 0, 1.0, -1.0)
            xlo = cx * CELL + 0.5
            xhi = cx * CELL + 7.5
            ylo = cy * CELL + 0.5
            yhi = cy * CELL + 7.5
            # max over cell of sgn*e: pick corner per coefficient sign.
            cdx = sgn * dy       # coefficient of x
            cdy = -sgn * dx      # coefficient of y
            xpick = np.where(cdx > 0, xhi, xlo)
            ypick = np.where(cdy > 0, yhi, ylo)
            emax = cdx * (xpick - ax) + cdy * (ypick - ay)
            scale = (np.abs(cdx) * np.maximum(np.abs(xpick - ax), 1.0)
                     + np.abs(cdy) * np.maximum(np.abs(ypick - ay), 1.0))
            keep &= emax >= -margin * scale
        kept = int(keep.sum())
        # How much of the removal comes from rects >= 2x2 (the only ones a
        # cheaper height/width-only walk could address)?
        big = (rx[idx] >= 2) & (ry[idx] >= 2)
        print(json.dumps({
            "scene": name,
            "tris": int(c.shape[0]),
            "pairs_rect": total,
            "pairs_exact": kept,
            "prune_ratio": round(1 - kept / max(total, 1), 4),
            "pairs_rect_2x2plus": int(big.sum()),
            "pruned_in_2x2plus": int((~keep & big).sum()),
        }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
