"""Micro-raster (mega-scene) path: lane-packed cell kernel + cell binning.

Parity oracle: the xla brute-force backend with tile_h=tile_w=8 — the micro
path bins at 8x8 cells, so its coverage-clip rectangle union matches the
xla backend at exactly that tile shape (and the reference's own 8x8 tiles,
raster_pass.rs:3). Comparisons are bitwise.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from compute_renderer_tpu.backends import binning, tpu, xla
from compute_renderer_tpu.core.camera import Camera
from compute_renderer_tpu.core.effects import Effect, EffectUniform, WaveDirection
from compute_renderer_tpu.io import procedural

W, H = 256, 192


def frame_args(mesh, effect=None, eye=(0.0, 0.0, 3.0)):
    cam = Camera.first_person(list(eye), aspect=W / H)
    u = cam.uniform()
    eff = (effect or EffectUniform()).as_array()
    return (
        jnp.asarray(mesh.positions),
        jnp.asarray(mesh.normals),
        jnp.asarray(mesh.uvs),
        jnp.asarray(mesh.indices.astype(np.int32)).reshape(-1, 3),
        jnp.asarray(u.view_proj),
        jnp.asarray(u.view_position),
        jnp.asarray(np.array([[0.0, 0.0, 5.0], [-5.0, 3.0, 0.0]], np.float32)),
        jnp.asarray(np.array([[1.0, 0.9, 0.8], [0.3, 0.4, 0.5]], np.float32)),
        jnp.asarray(np.array([1.0, 0.5], np.float32)),
        jnp.asarray(eff),
    )


def precomputed_geometry(args, face_kd=None):
    """(screen, world, tri_table) computed once in a standalone program.

    Injected into BOTH backends under comparison: XLA:CPU contracts mul+add
    into FMA unconditionally, choosing arrangements per fusion context, so
    the same coefficient formulas can round 1 ULP apart in two different
    jit programs (observed as spurious depth splits at shared edges). On
    TPU the fused programs agree without injection.

    With ``face_kd`` the table is the material-extension (T, 35) form."""
    import jax

    from compute_renderer_tpu.backends import common, pallas_raster

    @jax.jit
    def prep(pos, nrm, uvs, tri, vp, eff, kd):
        world, screen = common.vertex_stage(pos, vp, eff, W, H)
        table = pallas_raster.build_tri_table(
            screen, tri, uvs.astype(jnp.float32), nrm.astype(jnp.float32),
            world, face_kd=kd)
        return screen, world, table

    kd = None if face_kd is None else jnp.asarray(face_kd)
    return prep(args[0], args[1], args[2], args[3], args[4], args[9], kd)


def assert_micro_matches_xla(args, pair_cap=65536, face_kd=None,
                             **micro_kw):
    # Generous static caps: cell-granularity binning generates far more
    # pairs than tile binning (a large triangle covers many 8x8 cells), and
    # these tests assert no overflow rather than exercising the host retry.
    screen, world, table = precomputed_geometry(args, face_kd=face_kd)
    rgba_m, key_m, ovf = tpu.render_frame_micro(
        *args, width=W, height=H, pair_cap=pair_cap,
        screen=screen, world=world,
        tri_table=table, **micro_kw)
    assert not np.asarray(ovf).any(), "unexpected binning overflow"
    rgba_x, key_x = xla.render_frame(*args, width=W, height=H,
                                     tile_h=8, tile_w=8, screen=screen,
                                     world=world, tri_table=table)
    np.testing.assert_array_equal(np.asarray(key_m), np.asarray(key_x))
    np.testing.assert_array_equal(np.asarray(rgba_m), np.asarray(rgba_x))
    return np.asarray(key_m)


def test_parity_icosphere():
    key = assert_micro_matches_xla(frame_args(procedural.icosphere(3)))
    assert (key != 0xFFFFFFFF).sum() > 1000  # actually covered something


def test_parity_cube_large_triangles():
    # Large triangles spanning many cells exercise multi-cell pair lists.
    assert_micro_matches_xla(frame_args(procedural.cube(2.0)))


def test_parity_grid_oblique():
    mesh = procedural.grid_plane(
        48, 48, size=20.0,
        height_fn=lambda x, z: 0.5 * np.sin(x) * np.cos(z),
    )
    assert_micro_matches_xla(frame_args(mesh, eye=(0.0, 2.0, 10.0)))


@pytest.mark.parametrize(
    "effect",
    [
        Effect.wave(0.4, 3.0, 2.0, WaveDirection.VERTICAL),
        Effect.edge_melt(0.2, 1.0),
        Effect.voxelize(0.5, 1.0),
        Effect.mirage(0.6, 0.7, 0.3),
    ],
    ids=["wave", "edge_melt", "voxelize", "mirage"],
)
def test_parity_effects(effect):
    effect.update(0.35)
    u = effect.uniform(scene_time=0.35)
    assert_micro_matches_xla(frame_args(procedural.icosphere(2), effect=u))


def test_parity_fuzz_random_soup(rng):
    # Random triangle soup: degenerate/behind-camera/overlapping triangles.
    n = 120
    pos = rng.uniform(-2, 2, (3 * n, 3)).astype(np.float32)
    pos[:, 2] -= 1.0
    from compute_renderer_tpu.core.types import Mesh

    mesh = Mesh(
        positions=pos,
        normals=rng.standard_normal((3 * n, 3)).astype(np.float32),
        uvs=rng.uniform(0, 1, (3 * n, 2)).astype(np.float32),
        indices=np.arange(3 * n, dtype=np.uint32),
    )
    assert_micro_matches_xla(frame_args(mesh))


def test_determinism_two_runs():
    args = frame_args(procedural.icosphere(3))
    a = tpu.render_frame_micro(*args, width=W, height=H)
    b = tpu.render_frame_micro(*args, width=W, height=H)
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
    np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]))


def test_overflow_detection_and_retry_parity():
    mesh = procedural.icosphere(3)
    args = frame_args(mesh)
    # Deliberately tiny caps -> flags set; the clamped result must not crash
    # or read out of its window.
    _, _, ovf = tpu.render_frame_micro(*args, width=W, height=H,
                                       pair_cap=256)
    ovf = np.asarray(ovf)
    assert ovf.any()
    # Doubling up to sufficient caps restores exact parity (the host retry
    # loop's contract).
    assert_micro_matches_xla(args)


def test_bin_cells_sort_segments():
    """Cell segments are contiguous per tile and consistent with win_start."""
    from compute_renderer_tpu.backends import common

    mesh = procedural.icosphere(2)
    args = frame_args(mesh)
    world, screen = common.vertex_stage(args[0], args[4], args[9], W, H)
    setup = common.triangle_setup(screen, args[3], args[9], W, H, 8, 8)
    ntx, nty = (W + 127) // 128, (H + 7) // 8
    bins = binning.bin_cells_sort(setup, ntx, nty, 8192)
    seg_start = np.asarray(bins["seg_start"])
    seg_count = np.asarray(bins["seg_count"])
    win_start = np.asarray(bins["win_start"])
    tile_count = np.asarray(bins["tile_count"])
    num_tiles = ntx * nty
    assert seg_start.shape == (num_tiles * 16,)
    # Segments are non-overlapping and ordered.
    ends = seg_start + seg_count
    assert (seg_start[1:] >= ends[:-1]).all()
    # Window bases are 16-aligned and at/below the tile's first segment.
    assert (win_start % 16 == 0).all()
    first = seg_start.reshape(num_tiles, 16)[:, 0]
    assert (win_start <= first).all()
    assert (first - win_start < 16).all()
    assert tile_count.sum() == int(np.asarray(bins["total_pairs"]))
    # Sorted pair list really is cell-sorted: reconstruct cell of each pair.
    pair_tri = np.asarray(bins["pair_tri"])[: int(tile_count.sum())]
    assert (pair_tri >= 0).all()


def test_static_effect_kind_matches_dynamic():
    # Declaring the scene's effect kind statically (Scene.renderer_options
    # -> render_frame_micro effect_kind) compiles the mirage warp out of
    # non-mirage frames; output must be bitwise identical to the dynamic
    # (effect_kind=None) form for every kind, including mirage itself.
    from compute_renderer_tpu.core.effects import (
        EFFECT_MIRAGE, EFFECT_NONE, EFFECT_WAVE,
    )

    cases = [
        (None, EFFECT_NONE),
        (Effect.wave(0.4, 3.0, 2.0, WaveDirection.VERTICAL), EFFECT_WAVE),
        (Effect.mirage(0.6, 0.7, 0.3), EFFECT_MIRAGE),
    ]
    mesh = procedural.icosphere(3)
    for effect, kind in cases:
        u = None
        if effect is not None:
            effect.update(0.35)
            u = effect.uniform(scene_time=0.35)
        args = frame_args(mesh, effect=u)
        dyn = tpu.render_frame_micro(*args, width=W, height=H,
                                     pair_cap=65536)
        static = tpu.render_frame_micro(*args, width=W, height=H,
                                        pair_cap=65536, effect_kind=kind)
        np.testing.assert_array_equal(np.asarray(dyn[0]),
                                      np.asarray(static[0]), err_msg=str(kind))
        np.testing.assert_array_equal(np.asarray(dyn[1]),
                                      np.asarray(static[1]), err_msg=str(kind))


def test_worklist_matches_full_grid_micro():
    # The occupied-tile work-list micro kernel must be bitwise identical
    # to the full-grid form — empty tiles come from the pre-cleared
    # aliased framebuffer. A small mesh on a larger screen leaves most
    # tiles empty (the case the work list exists for).
    args = frame_args(procedural.icosphere(2), eye=(0.0, 0.0, 8.0))
    a = tpu.render_frame_micro(*args, width=W, height=H, pair_cap=65536)
    # Different pair_cap avoids jit-cache aliasing with the run above and
    # recompiles the non-worklist program.
    import functools

    from compute_renderer_tpu.backends import pallas_micro, binning, common
    import jax.numpy as jnp

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
    table = pallas_micro.build_tri_table_c64(screen_soa, nrm_t, world_soa)
    coeffs = pallas_micro.build_pair_coeffs(table, bins["pair_tri"])
    common_args = (coeffs, bins["seg_start"], bins["seg_count"],
                   bins["win_start"], bins["tile_count"], args[9],
                   args[5].astype(jnp.float32), args[6].astype(jnp.float32),
                   args[7].astype(jnp.float32), args[8].astype(jnp.float32))
    kw = dict(height_padded=nty * 8, width_padded=ntx * 128, interpret=True)
    r_wl, k_wl = pallas_micro.raster_shade_micro(*common_args, worklist=True,
                                                 **kw)
    r_fg, k_fg = pallas_micro.raster_shade_micro(*common_args,
                                                 worklist=False, **kw)
    np.testing.assert_array_equal(np.asarray(k_wl), np.asarray(k_fg))
    np.testing.assert_array_equal(np.asarray(r_wl), np.asarray(r_fg))
    # And the engine-level result (worklist default on) matches itself.
    assert np.asarray(a[1]).shape == (H, W)


# -- material extension on the micro path -----------------------------------


def colored(mesh, seed=7):
    from compute_renderer_tpu.core.types import Mesh

    T = mesh.num_triangles
    rng = np.random.default_rng(seed)
    kd = rng.uniform(0.1, 1.0, size=(T, 3)).astype(np.float32)
    return Mesh(positions=mesh.positions, normals=mesh.normals,
                uvs=mesh.uvs, indices=mesh.indices, face_kd=kd)


def test_parity_materials_icosphere():
    mesh = colored(procedural.icosphere(3))
    key = assert_micro_matches_xla(frame_args(mesh), face_kd=mesh.face_kd)
    assert (key != 0xFFFFFFFF).sum() > 1000


def test_parity_materials_cube_large_triangles():
    # Large triangles spanning many cells walk multi-chunk windows in the
    # 40-row material stream.
    mesh = colored(procedural.cube(2.0))
    assert_micro_matches_xla(frame_args(mesh), face_kd=mesh.face_kd)


def test_materials_c64_table_matches_f32():
    # The production path packs the material table as (T, 18) complex64
    # (35 kd columns + 1 zero pad); its pair stream must be bitwise the
    # (T, 35) f32 table's stream padded to the same 40-row superblocks.
    from compute_renderer_tpu.backends import common, pallas_micro, pallas_raster

    mesh = colored(procedural.icosphere(2))
    args = frame_args(mesh)
    pos_soa = args[0][args[3]].transpose(1, 2, 0)
    nrm_soa = args[1][args[3]].transpose(1, 2, 0)
    world_soa, screen_soa = common.vertex_stage_soa(pos_soa, args[4],
                                                    args[9], W, H)
    nrm_t = tuple(tuple(nrm_soa[k, c].astype(jnp.float32) for c in range(3))
                  for k in range(3))
    kd = jnp.asarray(mesh.face_kd)
    t_c64 = pallas_micro.build_tri_table_c64(screen_soa, nrm_t, world_soa,
                                             face_kd=kd)
    assert t_c64.shape[1] == 18
    t_f32 = pallas_raster.build_tri_table_soa(screen_soa, nrm_t, world_soa,
                                              face_kd=kd)
    pair_tri = jnp.arange(mesh.num_triangles, dtype=jnp.int32)
    s_c64 = pallas_micro.build_pair_coeffs(t_c64, pair_tri)
    s_f32 = pallas_micro.build_pair_coeffs(t_f32, pair_tri)
    np.testing.assert_array_equal(np.asarray(s_c64), np.asarray(s_f32))


def test_materials_identity_kd_matches_plain_micro():
    # kd == 1 modulates nothing: bitwise equal to the material-free kernel
    # (same semantics contract as the tile path's identity test).
    plain = procedural.icosphere(2)
    from compute_renderer_tpu.core.types import Mesh

    ident = Mesh(positions=plain.positions, normals=plain.normals,
                 uvs=plain.uvs, indices=plain.indices,
                 face_kd=np.ones((plain.num_triangles, 3), np.float32))
    args = frame_args(plain)
    screen, world, table_p = precomputed_geometry(args)
    _, _, table_i = precomputed_geometry(args, face_kd=ident.face_kd)
    r_p, k_p, _ = tpu.render_frame_micro(*args, width=W, height=H,
                                         pair_cap=65536, screen=screen,
                                         world=world, tri_table=table_p)
    r_i, k_i, _ = tpu.render_frame_micro(*args, width=W, height=H,
                                         pair_cap=65536, screen=screen,
                                         world=world, tri_table=table_i)
    np.testing.assert_array_equal(np.asarray(k_p), np.asarray(k_i))
    np.testing.assert_array_equal(np.asarray(r_p), np.asarray(r_i))


def test_materials_effects_micro():
    # Effects compose with materials (coverage changes + modulated shading).
    mesh = colored(procedural.icosphere(2), seed=11)
    eff = Effect.voxelize(0.5, 1.0)
    eff.update(0.35)
    u = eff.uniform(scene_time=0.35)
    assert_micro_matches_xla(frame_args(mesh, effect=u),
                             face_kd=mesh.face_kd)
