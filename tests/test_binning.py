"""Unit tests for sort/segment binning (the reference's D1-D4 replacement)."""

import jax.numpy as jnp
import numpy as np

from compute_renderer_tpu.backends import binning


def make_setup(tile_x0, tile_y0, tile_x1, tile_y1, alive=None):
    n = len(tile_x0)
    return {
        "alive": jnp.asarray(alive if alive is not None else [True] * n),
        "tile_x0": jnp.asarray(tile_x0, jnp.int32),
        "tile_y0": jnp.asarray(tile_y0, jnp.int32),
        "tile_x1": jnp.asarray(tile_x1, jnp.int32),
        "tile_y1": jnp.asarray(tile_y1, jnp.int32),
    }


def tile_list(out, tile):
    c = int(np.asarray(out["seg_count"])[tile])
    if out["layout"] == "dense":
        return np.asarray(out["bin_rows"])[tile, :c]
    s = int(np.asarray(out["seg_start"])[tile])
    return np.asarray(out["pair_tri"])[s:s + c]


def test_single_triangle_single_tile():
    setup = make_setup([1], [2], [2], [3])
    out = binning.bin_triangles(setup, ntx=4, nty=4, pair_cap=16, tile_cap=8)
    counts = np.asarray(out["seg_count"]).reshape(4, 4)
    assert counts[2, 1] == 1
    assert counts.sum() == 1
    assert int(out["total_pairs"]) == 1
    assert not bool(out["overflow"])
    np.testing.assert_array_equal(tile_list(out, 2 * 4 + 1), [0])


def test_triangle_spanning_multiple_tiles():
    setup = make_setup([0], [0], [3], [2])  # 3x2 = 6 tiles
    out = binning.bin_triangles(setup, ntx=4, nty=4, pair_cap=16, tile_cap=8)
    counts = np.asarray(out["seg_count"]).reshape(4, 4)
    assert counts[:2, :3].sum() == 6
    assert counts.sum() == 6
    assert int(out["total_pairs"]) == 6


def test_two_triangles_same_tile_ordered():
    setup = make_setup([1, 1], [1, 1], [2, 2], [2, 2])
    out = binning.bin_triangles(setup, ntx=4, nty=4, pair_cap=16, tile_cap=8)
    tile = 1 * 4 + 1
    # Deterministic: triangle-index order within the tile.
    np.testing.assert_array_equal(tile_list(out, tile), [0, 1])


def test_dead_triangle_not_binned():
    setup = make_setup([0, 0], [0, 0], [2, 2], [2, 2], alive=[False, True])
    out = binning.bin_triangles(setup, ntx=4, nty=4, pair_cap=32, tile_cap=8)
    assert int(out["total_pairs"]) == 4
    for t in range(16):
        lst = tile_list(out, t)
        if lst.size:
            np.testing.assert_array_equal(lst, [1] * lst.size)


def test_pair_cap_overflow_detected_sort_path():
    setup = make_setup([0], [0], [4], [4])  # 16 tiles
    out = binning.bin_triangles_sort(setup, ntx=4, nty=4, pair_cap=8, tile_cap=8)
    assert bool(out["overflow"])


def test_tile_cap_overflow_detected_sort_path():
    n = 5
    setup = make_setup([0] * n, [0] * n, [1] * n, [1] * n)
    out = binning.bin_triangles_sort(setup, ntx=2, nty=2, pair_cap=32, tile_cap=4)
    assert bool(out["overflow"])
    assert np.asarray(out["seg_count"])[0] == 4  # clamped


def test_tile_cap_overflow_detected_dense_path():
    # Dense path rounds the cap up to 128 (DMA lane alignment); overflow
    # still detected past the rounded cap.
    n = 130
    setup = make_setup([0] * n, [0] * n, [1] * n, [1] * n)
    out = binning.bin_triangles_dense(setup, ntx=2, nty=2, pair_cap=256,
                                      tile_cap=4)
    assert bool(out["overflow"])
    assert np.asarray(out["seg_count"])[0] == 128  # clamped to rounded cap


def test_interleaved_tiles():
    # tri 0 covers tiles (0,0)-(1,1); tri 1 covers (1,1)-(2,2); overlap at (1,1)
    setup = make_setup([0, 1], [0, 1], [2, 3], [2, 3])
    out = binning.bin_triangles(setup, ntx=4, nty=4, pair_cap=32, tile_cap=8)
    counts = np.asarray(out["seg_count"]).reshape(4, 4)
    assert counts[1, 1] == 2
    np.testing.assert_array_equal(tile_list(out, 1 * 4 + 1), [0, 1])
    assert int(out["total_pairs"]) == 8


def test_window_never_out_of_bounds():
    # Any 1024-aligned superwindow starting at or before any seg_start must
    # stay inside pair_tri (the raster kernel's DMA contract, sort path).
    from compute_renderer_tpu.backends.pallas_raster import window_elems

    setup = make_setup([0, 3], [0, 3], [1, 4], [1, 4])
    pair_cap, tile_cap = 8, 8
    out = binning.bin_triangles_sort(setup, ntx=4, nty=4, pair_cap=pair_cap,
                                     tile_cap=tile_cap)
    max_start = int(np.asarray(out["seg_start"]).max())
    aligned = (max_start // 1024) * 1024
    assert aligned + window_elems(tile_cap) <= out["pair_tri"].shape[0]


def test_dense_rows_padded_to_8():
    setup = make_setup([0], [0], [1], [1])
    out = binning.bin_triangles_dense(setup, ntx=3, nty=3, pair_cap=16,
                                      tile_cap=8)
    assert out["bin_rows"].shape[0] % 8 == 0


def test_dense_matches_sort_path(rng):
    # Random tile rectangles: both implementations must produce identical
    # per-tile lists.
    n, ntx, nty = 40, 6, 5
    x0 = rng.integers(0, ntx, n)
    y0 = rng.integers(0, nty, n)
    x1 = np.minimum(x0 + rng.integers(1, 4, n), ntx)
    y1 = np.minimum(y0 + rng.integers(1, 3, n), nty)
    alive = rng.random(n) > 0.2
    setup = make_setup(list(x0), list(y0), list(x1), list(y1), alive=list(alive))
    dense = binning.bin_triangles_dense(setup, ntx, nty, pair_cap=512, tile_cap=48)
    flat = binning.bin_triangles_sort(setup, ntx, nty, pair_cap=512, tile_cap=48)
    assert int(dense["total_pairs"]) == int(flat["total_pairs"])
    for j in range(ntx * nty):
        np.testing.assert_array_equal(tile_list(dense, j), tile_list(flat, j))


def test_heuristics():
    assert binning.default_pair_cap(2000, 768) == 4000
    assert binning.default_pair_cap(100, 768) == 2048  # floor
    cap = binning.default_tile_cap(1280, 1024, 768, 8, 128)
    assert cap == 128  # Suzanne-class: base < 128 floor
    cap_dense = binning.default_tile_cap(1_000_000, 1024, 768, 8, 128)
    assert cap_dense > 128 and cap_dense % 8 == 0


def test_segments_boundaries_matches_histogram(rng):
    # The searchsorted-boundary segment formulation (staged for a hardware
    # A/B against the P-sized scatter histogram) must be bit-identical on
    # real expanded cover data, including overflow (sentinel tail) and
    # empty-cell runs.
    from compute_renderer_tpu.backends import common
    from compute_renderer_tpu.core.camera import Camera
    from compute_renderer_tpu.core.effects import EffectUniform
    from compute_renderer_tpu.io import procedural

    W, H = 256, 128
    mesh = procedural.icosphere(3)
    cam = Camera.first_person([0, 0, 3.0], aspect=W / H)
    u = cam.uniform()
    eff = jnp.asarray(EffectUniform().as_array())
    pos = jnp.asarray(mesh.positions)
    tri = jnp.asarray(mesh.indices.astype(np.int32)).reshape(-1, 3)
    _, screen = common.vertex_stage(pos, jnp.asarray(u.view_proj), eff, W, H)
    setup = common.triangle_setup(screen, tri, eff, W, H, 8, 8)
    ntx, nty = (W + 127) // 128, (H + 7) // 8
    for pair_cap in (65536, 512):  # ample + overflowing
        a = binning.bin_cells_sort(setup, ntx, nty, pair_cap,
                                   segments="histogram")
        b = binning.bin_cells_sort(setup, ntx, nty, pair_cap,
                                   segments="boundaries")
        for k in ("pair_tri", "seg_start", "seg_count", "win_start",
                  "tile_count", "total_pairs", "pair_needed"):
            np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]),
                                          err_msg=f"{k} @ cap {pair_cap}")


def test_exact_tile_counts_matches_brute_force():
    rng = np.random.default_rng(7)
    ntx, nty, n = 6, 5, 40
    x0 = rng.integers(0, ntx, n)
    y0 = rng.integers(0, nty, n)
    x1 = np.minimum(x0 + rng.integers(0, 4, n), ntx)
    y1 = np.minimum(y0 + rng.integers(0, 4, n), nty)
    alive = rng.random(n) > 0.2
    setup = make_setup(x0, y0, x1, y1, alive=list(alive))
    got = np.asarray(binning.exact_tile_counts(setup, ntx, nty))
    want = np.zeros((nty, ntx), np.int32)
    for t in range(n):
        if alive[t]:
            want[y0[t]:y1[t], x0[t]:x1[t]] += 1
    np.testing.assert_array_equal(got, want.reshape(-1))


def test_tile_needed_exact_under_pair_overflow():
    # 20 triangles all covering tile (0,0), plus one spanning the whole
    # 4x4 grid. pair_cap=8 overflows long before the truncated pair list
    # can see all 21 triangles in tile 0 — tile_needed must still report
    # the TRUE max (21) so the retry converges in ONE recompile.
    n = 20
    setup = make_setup([0] * n + [0], [0] * n + [0],
                       [1] * n + [4], [1] * n + [4])
    out = binning.bin_triangles_sort(setup, ntx=4, nty=4,
                                     pair_cap=8, tile_cap=4)
    assert bool(out["pair_overflow"])
    assert int(out["pair_needed"]) == n + 16
    assert bool(out["tile_overflow"])
    assert int(out["tile_needed"]) == n + 1
    # Within-cap frames never pay the corner-scatter branch; flags stay 0.
    ok = binning.bin_triangles_sort(setup, ntx=4, nty=4,
                                    pair_cap=64, tile_cap=32)
    assert not bool(ok["overflow"])
    assert int(ok["pair_needed"]) == 0 and int(ok["tile_needed"]) == 0


def test_blocked_cumsum_matches_jnp(rng):
    # The two-level blocked cumsum replacing jnp.cumsum inside the pair
    # expansion (round 5: the serialized whole-array scan was the bulk of
    # the 4.0 ms "expand" stage at 1M tris). Integer addition is exact, so
    # the results are bit-identical at every size class, including the
    # non-multiple-of-1024 tails and the small-N passthrough.
    from compute_renderer_tpu.backends.pallas_expand import blocked_cumsum_i32

    for n in (1, 7, 1024, 1025, 4096, 10000, 1 << 17):
        c = jnp.asarray(rng.integers(0, 9, size=(n,)).astype(np.int32))
        np.testing.assert_array_equal(
            np.asarray(blocked_cumsum_i32(c)), np.asarray(jnp.cumsum(c)))
