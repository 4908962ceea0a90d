"""Hardware A/B: histogram vs searchsorted-boundary cell segments.

``binning.bin_cells_sort`` computes per-cell segment tables either with a
P-sized scatter-add histogram over the UNSORTED cell ids (current default;
~3 ms of the 1M-triangle frame per the round-2 xprof breakdown) or with
``segments="boundaries"``: num_cells + 1 searchsorted probes into the
ALREADY-SORTED pair list (``segments_from_sorted_cells``). The outputs are
bit-identical (tests/test_binning.py); which is faster depends on
P / num_cells and on how XLA:TPU schedules the scatter vs the sort
dependency — measure, don't guess.

Run ON TPU HARDWARE (interpret-mode times are meaningless):

    python scripts/ab_segments.py [--tris 1000000] [--iters 30]

Prints one JSON line per variant with per-call ms for the FULL
bin_cells_sort (expansion + sort + segments), so the number reflects the
real frame-stage delta including schedule overlap. If "boundaries" wins,
flip the default in binning.bin_cells_sort and record the delta in the
ARCHITECTURE performance journal.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from compute_renderer_tpu.backends import binning, common
from compute_renderer_tpu.core.camera import Camera
from compute_renderer_tpu.core.effects import EffectUniform
from compute_renderer_tpu.io import procedural

W, H = 1024, 768


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tris", type=int, default=1_000_000)
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()

    mesh = procedural._san_miguel_mega()  # ~1M tris (--tris kept for docs)
    cam = Camera.first_person([13.57, 2.63, 10.24], aspect=W / H)
    u = cam.uniform()
    eff = jnp.asarray(EffectUniform().as_array())
    pos = jnp.asarray(mesh.positions)
    tri = jnp.asarray(mesh.indices.astype(np.int32)).reshape(-1, 3)
    ntx, nty = (W + 127) // 128, (H + 7) // 8
    T = int(tri.shape[0])
    pair_cap = binning.default_pair_cap_micro(T, ntx * nty * 16)

    @partial(jax.jit, static_argnames=("segments",))
    def run(pos, tri, vp, eff, *, segments):
        _, screen = common.vertex_stage(pos, vp, eff, W, H)
        setup = common.triangle_setup(screen, tri, eff, W, H, 8, 8)
        bins = binning.bin_cells_sort(setup, ntx, nty, pair_cap,
                                      segments=segments)
        # Consume every segment output so nothing is dead-code eliminated.
        return (bins["pair_tri"][0] + bins["seg_start"][0]
                + bins["seg_count"][0] + bins["win_start"][0]
                + bins["tile_count"][0] + bins["total_pairs"])

    vp = jnp.asarray(u.view_proj)
    for segments in ("histogram", "boundaries"):
        out = run(pos, tri, vp, eff, segments=segments)
        out.block_until_ready()
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = run(pos, tri, vp, eff, segments=segments)
        np.asarray(out)  # fence (reliable through the tunnel)
        dt = (time.perf_counter() - t0) / args.iters * 1e3
        print(json.dumps({
            "variant": segments, "ms_per_call": round(dt, 3),
            "tris": T, "pair_cap": int(pair_cap),
        }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
