"""Smoke tests for the tracing/profiling subsystem (SURVEY.md §5)."""

from compute_renderer_tpu.bench.profiling import stage_timings, trace
from compute_renderer_tpu.core.camera import Camera
from compute_renderer_tpu.engine.scene import Scene, SceneConfig


def test_stage_timings_smoke():
    scene = Scene.from_config(SceneConfig(), 64, 48)
    cam = Camera.first_person([0, 0, 3.0], aspect=64 / 48)
    scene.cameras[0] = cam
    uniforms = scene.update(0.016)
    t = stage_timings(scene.mesh, uniforms, 64, 48, iters=2)
    assert set(t) == {
        "vertex_setup_ms", "binning_ms", "tri_table_ms",
        "raster_shade_ms", "total_fused_ms",
    }
    assert all(v > 0 for v in t.values())


def test_trace_context_manager(tmp_path):
    import jax.numpy as jnp

    with trace(str(tmp_path)):
        (jnp.arange(8) * 2).block_until_ready()
    # Trace files land under plugins/profile/<timestamp>/
    assert any(tmp_path.rglob("*.pb")) or any(tmp_path.rglob("*.json.gz"))


def test_stage_timings_micro_smoke():
    from compute_renderer_tpu.bench.profiling import stage_timings_micro
    from compute_renderer_tpu.engine.scene import Scene, SceneConfig

    scene = Scene.from_config(SceneConfig(), 64, 48)
    uniforms = scene.update(0.016)
    t = stage_timings_micro(scene.mesh, uniforms, 64, 48, iters=2)
    for k in ("vertex_setup_ms", "binning_ms", "tri_table_ms",
              "pair_coeffs_ms", "raster_shade_ms", "total_fused_ms"):
        assert t[k] > 0.0


def test_stage_timings_sortmiddle_smoke():
    # The sortmiddle per-device front end at a 1/8 triangle slice must cost
    # materially less than at full T (the O(T/n) contract; exact ratio is
    # noisy on a 1-core CI box, so assert a loose bound).
    from compute_renderer_tpu.bench.profiling import stage_timings_sortmiddle
    from compute_renderer_tpu.engine.scene import Scene, SceneConfig
    from compute_renderer_tpu.io import procedural

    scene = Scene.from_config(SceneConfig(), 64, 48)
    uniforms = scene.update(0.016)
    mesh = procedural.uv_sphere(nu=400, nv=128)  # ~102k tris
    t = stage_timings_sortmiddle(mesh, uniforms, 64, 48, n_shards=8, iters=3)
    assert t["front_slice_ms"] > 0.0 and t["front_full_ms"] > 0.0
    # The 1/8-slice front end must cost materially less than full T. The
    # ratio is well under 8 here: the 32768 pair-cap floor
    # (binning.default_pair_cap_micro) keeps expansion+sort constant at
    # this test scale — at mega scale (caps above the floor) every stage
    # scales with the slice. Bound kept loose for 1-core CI noise.
    assert t["speedup"] > 1.4, t


def test_stage_timings_deferred():
    import numpy as np
    import pytest

    from compute_renderer_tpu.bench.profiling import stage_timings_deferred
    from compute_renderer_tpu.core.maths import F32
    from compute_renderer_tpu.core.types import Mesh
    from compute_renderer_tpu.io import procedural

    scene = Scene.from_config(SceneConfig(), 64, 48)
    uniforms = scene.update(0.016)
    base = procedural.icosphere(1)
    n = base.num_triangles
    texels = np.full((4, 3), 0.5, F32)
    mesh = Mesh(positions=base.positions, normals=base.normals,
                uvs=base.uvs, indices=base.indices,
                face_tex=np.zeros((n,), np.int32), texels=texels,
                tex_table=np.array([[0, 2, 2]], np.int32))
    for filt in ("nearest", "trilinear"):
        out = stage_timings_deferred(mesh, uniforms, 64, 48,
                                     tex_filter=filt, iters=2)
        assert out["fused_plain_ms"] > 0 and out["vis_walk_ms"] > 0
        assert out["tex_filter"] == filt

    with pytest.raises(ValueError, match="textured"):
        stage_timings_deferred(base, uniforms, 64, 48)
