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
