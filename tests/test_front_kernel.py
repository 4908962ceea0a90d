"""Fused Pallas front end (pallas_front) vs the XLA chain it replaces.

On TPU the outputs are bit-identical (neither XLA:TPU nor Mosaic contracts
mul+add into FMA). On CPU — where these tests run — XLA contracts FMA
per fusion context, so the float coefficient comparison allows 1-ULP-scale
relative error; the integer meta rows (cell rects / cover counts) are
compared exactly except where a bbox sits within float-noise of a cell
boundary (excluded by construction: random irrational-ish geometry).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from compute_renderer_tpu.backends import binning, common, pallas_front, pallas_raster
from compute_renderer_tpu.core.camera import Camera
from compute_renderer_tpu.core.effects import (
    Effect, EffectUniform, WaveDirection,
)
from compute_renderer_tpu.io import procedural

W, H = 256, 192


def _inputs(mesh, effect=None):
    cam = Camera.first_person([0.0, 0.0, 3.0], aspect=W / H)
    u = cam.uniform()
    eff = jnp.asarray((effect or EffectUniform()).as_array())
    tri = jnp.asarray(mesh.indices.astype(np.int32)).reshape(-1, 3)
    pos_soa = jnp.asarray(mesh.positions)[tri].transpose(1, 2, 0)
    nrm_soa = jnp.asarray(mesh.normals)[tri].transpose(1, 2, 0)
    vp = jnp.asarray(u.view_proj)
    return pos_soa, nrm_soa, vp, eff


def _xla_reference(pos_soa, nrm_soa, vp, eff):
    world_soa, screen_soa = common.vertex_stage_soa(pos_soa, vp, eff, W, H)
    setup = common.triangle_setup_soa(screen_soa, eff, W, H, 8, 8)
    nrm_t = tuple(
        tuple(nrm_soa[k, c].astype(jnp.float32) for c in range(3))
        for k in range(3)
    )
    cols = pallas_raster.tri_table_columns(screen_soa, nrm_t, world_soa)
    coeff = jnp.stack(cols, axis=0)  # (32, T)
    rx, _, c = binning.cover_counts(setup)
    meta = jnp.stack([
        setup["tile_x0"], setup["tile_y0"], rx, c,
    ]).astype(jnp.int32)
    return coeff, meta


def _check(mesh, effect=None):
    pos_soa, nrm_soa, vp, eff = _inputs(mesh, effect)
    coeff_p, meta_p = pallas_front.front_end(
        pos_soa, nrm_soa, vp, eff, width=W, height=H, interpret=True)
    coeff_x, meta_x = jax.jit(_xla_reference)(pos_soa, nrm_soa, vp, eff)

    np.testing.assert_array_equal(np.asarray(meta_p), np.asarray(meta_x))
    cp, cx = np.asarray(coeff_p), np.asarray(coeff_x)
    both_nan = np.isnan(cp) & np.isnan(cx)
    cp, cx = np.where(both_nan, 0.0, cp), np.where(both_nan, 0.0, cx)
    np.testing.assert_allclose(cp, cx, rtol=2e-6, atol=1e-6)


def test_front_icosphere():
    _check(procedural.icosphere(3))


def test_front_torus():
    _check(procedural.torus(32, 16))


def test_front_fuzz_soup():
    rng = np.random.default_rng(7)
    n = 4000
    pos = (rng.standard_normal((3 * n, 3)) * 1.7).astype(np.float32)
    from compute_renderer_tpu.core.types import Mesh
    mesh = Mesh(
        positions=pos,
        normals=rng.standard_normal((3 * n, 3)).astype(np.float32),
        uvs=np.zeros((3 * n, 2), np.float32),
        indices=np.arange(3 * n, dtype=np.uint32),
    )
    _check(mesh)


@pytest.mark.parametrize("effect", [
    Effect.wave(0.4, 3.0, 2.0, WaveDirection.VERTICAL),
    Effect.wave(0.4, 3.0, 2.0, WaveDirection.HORIZONTAL),
    Effect.voxelize(0.3, 1.0),
], ids=["wave_v", "wave_h", "voxelize"])
def test_front_effects(effect):
    effect.update(0.35)
    _check(procedural.icosphere(2), effect.uniform(scene_time=0.35))


def test_pack_table_matches_c64_build():
    from compute_renderer_tpu.backends import pallas_micro

    mesh = procedural.icosphere(3)
    pos_soa, nrm_soa, vp, eff = _inputs(mesh)
    world_soa, screen_soa = common.vertex_stage_soa(pos_soa, vp, eff, W, H)
    nrm_t = tuple(
        tuple(nrm_soa[k, c].astype(jnp.float32) for c in range(3))
        for k in range(3)
    )
    table_ref = pallas_micro.build_tri_table_c64(screen_soa, nrm_t, world_soa)
    cols = pallas_raster.tri_table_columns(screen_soa, nrm_t, world_soa)
    table_p = pallas_front.pack_table_c64(jnp.stack(cols, axis=0))
    a, b = np.asarray(table_p), np.asarray(table_ref)
    mask = np.isnan(a) & np.isnan(b)
    a, b = np.where(mask, 0, a), np.where(mask, 0, b)
    np.testing.assert_array_equal(a, b)


def test_full_frame_fused_front_vs_xla_chain():
    """render_frame_micro with the fused Pallas front vs the XLA chain.

    On TPU the two are bit-identical (verified on hardware). On CPU, XLA
    contracts mul+add into FMA per fusion context, so coefficients can
    round 1 ULP apart between the two programs and exact-on-edge samples
    may flip (the PARITY.md instability); the contract here is the loose
    one the sharded tests used before geometry injection existed: <=0.2%
    of pixels differ, and only at 1-2 LSB or coverage-edge magnitude.
    """
    from compute_renderer_tpu.backends import tpu

    mesh = procedural.icosphere(3)
    cam = Camera.first_person([0.0, 0.0, 3.0], aspect=W / H)
    u = cam.uniform()
    args = (
        jnp.asarray(mesh.positions),
        jnp.asarray(mesh.normals),
        jnp.asarray(mesh.uvs),
        jnp.asarray(mesh.indices.astype(np.int32)).reshape(-1, 3),
        jnp.asarray(u.view_proj),
        jnp.asarray(u.view_position),
        jnp.asarray(np.array([[0.0, 0.0, 5.0]], np.float32)),
        jnp.asarray(np.array([[1.0, 0.9, 0.8]], np.float32)),
        jnp.asarray(np.array([1.0], np.float32)),
        jnp.asarray(EffectUniform().as_array()),
    )
    rgba_f, key_f, ovf_f = tpu.render_frame_micro(
        *args, width=W, height=H, pair_cap=65536,
        interpret=True, use_pallas_front=True)
    rgba_x, key_x, ovf_x = tpu.render_frame_micro(
        *args, width=W, height=H, pair_cap=65536,
        interpret=True, use_pallas_front=False)
    assert not np.asarray(ovf_f).any() and not np.asarray(ovf_x).any()
    a, b = np.asarray(rgba_f).astype(int), np.asarray(rgba_x).astype(int)
    ndiff = int((a != b).any(axis=-1).sum())
    assert ndiff <= max(2, a.shape[0] * a.shape[1] // 500), ndiff


# ---------------------------------------------------------------------------
# Extended tables (round 4): material (35-row) and fused-texture (44-row)
# ---------------------------------------------------------------------------

def _tex_fixture(mesh):
    """kd / uv / TextureInfo rows for an extended-table check.

    uvs derive smoothly from positions (a planar projection, like real
    parametrizations): RANDOM per-vertex uvs make the affine uv combine a
    catastrophic-cancellation test of 1-ULP cross-program contraction
    noise (b = sum of huge +/- terms), which is not what these tests probe
    — the base normal/world channels pass the same tolerance because real
    attributes vary smoothly across a triangle."""
    T = mesh.indices.shape[0] // 3
    rng = np.random.default_rng(11)
    kd = rng.uniform(0.1, 1.0, (T, 3)).astype(np.float32)
    face_tex = (rng.integers(-1, 2, (T,))).astype(np.int32)
    tex_table = np.array([[0, 8, 8], [64, 4, 4]], np.int32)
    uvs = (mesh.positions[:, :2] * np.float32(0.75)
           + np.float32(0.5)).astype(np.float32)
    return kd, face_tex, tex_table, uvs


def test_front_mat_table():
    mesh = procedural.icosphere(3)
    pos_soa, nrm_soa, vp, eff = _inputs(mesh)
    kd, _, _, _ = _tex_fixture(mesh)
    coeff_p, meta_p = pallas_front.front_end(
        pos_soa, nrm_soa, vp, eff, width=W, height=H, interpret=True,
        kd_rows=jnp.asarray(kd))
    assert coeff_p.shape[0] == 35
    coeff_x, meta_x = jax.jit(_xla_reference)(pos_soa, nrm_soa, vp, eff)
    np.testing.assert_array_equal(np.asarray(meta_p), np.asarray(meta_x))
    # kd rows are exact passthrough; base rows match the XLA chain.
    np.testing.assert_array_equal(np.asarray(coeff_p[32:]), kd.T)
    cp, cx = np.asarray(coeff_p[:32]), np.asarray(coeff_x)
    both_nan = np.isnan(cp) & np.isnan(cx)
    cp, cx = np.where(both_nan, 0.0, cp), np.where(both_nan, 0.0, cx)
    np.testing.assert_allclose(cp, cx, rtol=2e-6, atol=1e-6)
    # The packed c64 table matches build_tri_table_c64's mat form exactly
    # when built from the same coefficient values.
    from compute_renderer_tpu.backends import pallas_micro

    world_soa, screen_soa = common.vertex_stage_soa(pos_soa, vp, eff, W, H)
    nrm_t = tuple(
        tuple(nrm_soa[k, c].astype(jnp.float32) for c in range(3))
        for k in range(3)
    )
    table_ref = pallas_micro.build_tri_table_c64(
        screen_soa, nrm_t, world_soa, face_kd=jnp.asarray(kd))
    cols = pallas_raster.tri_table_columns(
        screen_soa, nrm_t, world_soa, face_kd=jnp.asarray(kd))
    table_p = pallas_front.pack_table_c64(jnp.stack(cols, axis=0))
    a, b = np.asarray(table_p), np.asarray(table_ref)
    mask = np.isnan(a) & np.isnan(b)
    np.testing.assert_array_equal(np.where(mask, 0, a), np.where(mask, 0, b))


def test_front_texf_table():
    mesh = procedural.icosphere(3)
    pos_soa, nrm_soa, vp, eff = _inputs(mesh)
    kd, face_tex, tex_table, uvs = _tex_fixture(mesh)
    tri = jnp.asarray(mesh.indices.astype(np.int32)).reshape(-1, 3)
    uv_soa = jnp.asarray(uvs)[tri].transpose(1, 2, 0)  # (3, 2, T)
    tex_rows = common.tex_rows_f32(jnp.asarray(face_tex),
                                   jnp.asarray(tex_table))
    coeff_p, meta_p = pallas_front.front_end(
        pos_soa, nrm_soa, vp, eff, width=W, height=H, interpret=True,
        kd_rows=jnp.asarray(kd), uv_soa=uv_soa, tex_rows=tex_rows)
    assert coeff_p.shape[0] == pallas_raster.TEX_TRI_TABLE_WIDTH
    coeff_x, meta_x = jax.jit(_xla_reference)(pos_soa, nrm_soa, vp, eff)
    np.testing.assert_array_equal(np.asarray(meta_p), np.asarray(meta_x))
    # Constant rows: exact passthrough.
    np.testing.assert_array_equal(np.asarray(coeff_p[38:41]), kd.T)
    np.testing.assert_array_equal(np.asarray(coeff_p[41:44]),
                                  np.asarray(tex_rows).T)
    # uv affine rows vs the XLA texf column build (same combine chain).
    world_soa, screen_soa = common.vertex_stage_soa(pos_soa, vp, eff, W, H)
    nrm_t = tuple(
        tuple(nrm_soa[k, c].astype(jnp.float32) for c in range(3))
        for k in range(3)
    )
    uv_t = tuple(
        tuple(uv_soa[k, c].astype(jnp.float32) for c in range(2))
        for k in range(3)
    )
    @jax.jit
    def ref_cols(pos_soa, nrm_soa, vp, eff, kd, tex_rows):
        # Jitted like the kernel-side program: eager op-by-op evaluation
        # contracts FMAs differently and fails the 1-ULP-class tolerance.
        world_soa, screen_soa = common.vertex_stage_soa(
            pos_soa, vp, eff, W, H)
        nrm_t = tuple(
            tuple(nrm_soa[k, c].astype(jnp.float32) for c in range(3))
            for k in range(3)
        )
        cols = pallas_raster.tri_table_columns(
            screen_soa, nrm_t, world_soa, face_kd=kd,
            uv_soa=uv_t, tex_rows=tex_rows)
        return jnp.stack(cols, axis=0)

    coeff_ref = np.asarray(ref_cols(pos_soa, nrm_soa, vp, eff,
                                    jnp.asarray(kd), tex_rows))
    cp, cx = np.asarray(coeff_p), coeff_ref
    both_nan = np.isnan(cp) & np.isnan(cx)
    cp, cx = np.where(both_nan, 0.0, cp), np.where(both_nan, 0.0, cx)
    np.testing.assert_allclose(cp, cx, rtol=2e-6, atol=1e-6)


def test_full_frame_fused_front_texf():
    # render_frame_micro textured with the fused front (round 4) vs the
    # XLA front chain — same tolerance class as the plain fused-front
    # full-frame test above (cross-program FMA contraction on CPU).
    from compute_renderer_tpu.backends import tpu
    from compute_renderer_tpu.core.types import Mesh

    base = procedural.icosphere(3)
    kd, face_tex, tex_table, uvs = _tex_fixture(base)
    texels = (np.arange(80 * 3, dtype=np.float32).reshape(80, 3)
              % 256).astype(np.uint8).astype(np.float32) / np.float32(255)
    mesh = Mesh(positions=base.positions, normals=base.normals, uvs=uvs,
                indices=base.indices, face_kd=kd, face_tex=face_tex,
                texels=texels, tex_table=tex_table)
    cam = Camera.first_person([0.0, 0.0, 3.0], aspect=W / H)
    u = cam.uniform()
    args = (
        jnp.asarray(mesh.positions), jnp.asarray(mesh.normals),
        jnp.asarray(mesh.uvs),
        jnp.asarray(mesh.indices.astype(np.int32)).reshape(-1, 3),
        jnp.asarray(u.view_proj), jnp.asarray(u.view_position),
        jnp.asarray(np.array([[0.0, 0.0, 5.0]], np.float32)),
        jnp.asarray(np.array([[1.0, 0.9, 0.8]], np.float32)),
        jnp.asarray(np.array([1.0], np.float32)),
        jnp.asarray(EffectUniform().as_array()),
    )
    kw = dict(width=W, height=H, face_kd=jnp.asarray(kd),
              face_tex=jnp.asarray(face_tex), texels=jnp.asarray(texels),
              tex_table=jnp.asarray(tex_table))
    a, _, _ = tpu.render_frame_micro(*args, use_pallas_front=True,
                                     interpret=True, **kw)
    b, _, _ = tpu.render_frame_micro(*args, use_pallas_front=False,
                                     interpret=True, **kw)
    a, b = np.asarray(a), np.asarray(b)
    diff = np.abs(a.astype(int) - b.astype(int))
    bad = (diff > 2).any(axis=-1)
    assert bad.mean() <= 0.002, f"{bad.sum()} px differ by >2"


def test_tile_path_fused_front_vs_xla_chain():
    """render_frame (TILE path) with the fused front at a non-8x8 tile
    shape (round 5): front meta at tile granularity feeds bin_triangles
    via setup_from_meta and coeff.T replaces build_tri_table. Same CPU
    contract as the micro test above (FMA contraction can flip exact-edge
    samples between two different jit programs; on TPU the pair is
    bit-identical)."""
    from compute_renderer_tpu.backends import tpu

    mesh = procedural.icosphere(3)
    cam = Camera.first_person([0.0, 0.0, 3.0], aspect=W / H)
    u = cam.uniform()
    args = (
        jnp.asarray(mesh.positions),
        jnp.asarray(mesh.normals),
        jnp.asarray(mesh.uvs),
        jnp.asarray(mesh.indices.astype(np.int32)).reshape(-1, 3),
        jnp.asarray(u.view_proj),
        jnp.asarray(u.view_position),
        jnp.asarray(np.array([[0.0, 0.0, 5.0]], np.float32)),
        jnp.asarray(np.array([[1.0, 0.9, 0.8]], np.float32)),
        jnp.asarray(np.array([1.0], np.float32)),
        jnp.asarray(EffectUniform().as_array()),
    )
    for th, tw in ((16, 256), (8, 128)):
        rgba_f, key_f, ovf_f = tpu.render_frame(
            *args, width=W, height=H, path="tile", tile_h=th, tile_w=tw,
            interpret=True, use_pallas_front=True)
        rgba_x, key_x, ovf_x = tpu.render_frame(
            *args, width=W, height=H, path="tile", tile_h=th, tile_w=tw,
            interpret=True, use_pallas_front=False)
        assert not np.asarray(ovf_f).any() and not np.asarray(ovf_x).any()
        a = np.asarray(rgba_f).astype(int)
        b = np.asarray(rgba_x).astype(int)
        ndiff = int((a != b).any(axis=-1).sum())
        assert ndiff <= max(2, a.shape[0] * a.shape[1] // 500), (th, tw,
                                                                ndiff)


def test_setup_from_meta_matches_triangle_setup():
    # The reconstruction consumed by the tile path's front binning: rects
    # and alive must match common.triangle_setup bit-for-bit for alive
    # triangles (dead rows are masked by every consumer).
    from compute_renderer_tpu.backends import binning, common

    mesh = procedural.icosphere(2)
    pos_soa, nrm_soa, vp, eff = _inputs(mesh)
    th, tw = 16, 256
    coeff, meta = pallas_front.front_end(
        pos_soa, nrm_soa, vp, eff, width=W, height=H, tile_h=th,
        tile_w=tw, interpret=True)
    rec = binning.setup_from_meta(meta)

    pos = jnp.asarray(mesh.positions)
    tri = jnp.asarray(mesh.indices.astype(np.int32)).reshape(-1, 3)
    world, screen = common.vertex_stage(pos, vp, eff, W, H)
    ref = common.triangle_setup(screen, tri, eff, W, H, th, tw)
    alive = np.asarray(ref["alive"])
    np.testing.assert_array_equal(np.asarray(rec["alive"]), alive)
    for k in ("tile_x0", "tile_y0", "tile_x1", "tile_y1"):
        np.testing.assert_array_equal(
            np.asarray(rec[k])[alive], np.asarray(ref[k]).astype(np.int32)[alive],
            err_msg=k)
