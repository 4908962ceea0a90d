"""Round-5 micro-kernel variants: walk levers + column-major coefficients.

Split from test_micro.py: XLA:CPU segfaults order-dependently when these
variant compiles run after test_micro's ~17 tests' compiled state in one
process (the same rc=139 class the per-file suite split exists for —
see conftest._split_suite_argv). Standalone, every variant compiles and
passes; the split keeps both files green under `pytest tests/`.
"""

import numpy as np
import jax.numpy as jnp

from compute_renderer_tpu.backends import tpu
from compute_renderer_tpu.io import procedural
from tests.test_micro import W, H, colored, frame_args, precomputed_geometry


def test_walk_levers_bitwise_identical():
    """Round-5 walk levers: tree-merged unroll and cross-tile chunk-0
    prefetch are pure scheduling changes — (rgba, key) must be BITWISE
    equal to the default chain walk for every combination (the merge is
    associative and every DMA is waited exactly once; see
    pallas_micro._raster_tile_micro / _micro_kernel_wl)."""
    import itertools

    mesh = procedural.icosphere(3)
    args = frame_args(mesh)
    screen, world, table = precomputed_geometry(args)
    ref_r, ref_k, ovf = tpu.render_frame_micro(
        *args, width=W, height=H, pair_cap=65536,
        screen=screen, world=world, tri_table=table)
    assert not np.asarray(ovf).any()
    for tree, prefetch, unroll in itertools.product(
            (False, True), (False, True), (1, 2, 4)):
        if (tree, prefetch, unroll) == (False, False, 2):
            continue  # the reference configuration itself
        r, k, _ = tpu.render_frame_micro(
            *args, width=W, height=H, pair_cap=65536,
            screen=screen, world=world, tri_table=table,
            micro_tree=tree, micro_prefetch=prefetch, micro_unroll=unroll)
        np.testing.assert_array_equal(
            np.asarray(k), np.asarray(ref_k),
            err_msg=f"tree={tree} prefetch={prefetch} unroll={unroll}")
        np.testing.assert_array_equal(
            np.asarray(r), np.asarray(ref_r),
            err_msg=f"tree={tree} prefetch={prefetch} unroll={unroll}")


def test_colmajor_coeffs_bitwise_identical():
    """Column-major coefficient table + lane-axis pair gather
    (build_pair_coeffs_cm): the stream, and therefore the frame, must be
    BITWISE equal to the row-major build — plain, materials, and the
    fused-texture mode all ride the same builders."""
    mesh = procedural.icosphere(3)
    args = frame_args(mesh)
    ref_r, ref_k, ovf = tpu.render_frame_micro(
        *args, width=W, height=H, pair_cap=65536)
    assert not np.asarray(ovf).any()
    r, k, _ = tpu.render_frame_micro(
        *args, width=W, height=H, pair_cap=65536, micro_colmajor=True)
    np.testing.assert_array_equal(np.asarray(k), np.asarray(ref_k))
    np.testing.assert_array_equal(np.asarray(r), np.asarray(ref_r))

    # Materials (40-row stream) through the same switch.
    cmesh = colored(mesh)
    kd = jnp.asarray(cmesh.face_kd)
    a = tpu.render_frame_micro(*args, width=W, height=H, pair_cap=65536,
                               face_kd=kd)
    b = tpu.render_frame_micro(*args, width=W, height=H, pair_cap=65536,
                               face_kd=kd, micro_colmajor=True)
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
    np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]))

    # Raw stream equality at the builder level (the superblock pad region
    # included).
    from compute_renderer_tpu.backends import common, pallas_micro, binning

    pos, nrm, _, tri = args[0], args[1], args[2], args[3]
    pos_soa = pos[tri].transpose(1, 2, 0)
    nrm_soa = nrm[tri].transpose(1, 2, 0)
    ntx, nty = (W + 127) // 128, (H + 7) // 8
    world_soa, screen_soa = common.vertex_stage_soa(pos_soa, args[4],
                                                    args[9], W, H)
    setup = common.triangle_setup_soa(screen_soa, args[9], W, H, 8, 8)
    bins = binning.bin_cells_sort(setup, ntx, nty, 65536, interpret=True)
    nrm_t = tuple(tuple(nrm_soa[k, c].astype(jnp.float32) for c in range(3))
                  for k in range(3))
    t_rm = pallas_micro.build_tri_table_c64(screen_soa, nrm_t, world_soa)
    t_cm = pallas_micro.build_tri_table_c64_cm(screen_soa, nrm_t, world_soa)
    s_rm = pallas_micro.build_pair_coeffs(t_rm, bins["pair_tri"])
    s_cm = pallas_micro.build_pair_coeffs_cm(t_cm, bins["pair_tri"])
    np.testing.assert_array_equal(np.asarray(s_rm), np.asarray(s_cm))
