"""Parity: Pallas TPU backend vs XLA brute-force backend vs golden oracle.

On CPU the Pallas kernel runs in interpret mode; the same code path compiles
with Mosaic on real TPU. TPU-vs-XLA parity should be bitwise identical (same
platform, same math); vs golden <= 1 LSB.
"""

import numpy as np
import pytest

from compute_renderer_tpu.core.camera import Camera
from compute_renderer_tpu.core.effects import Effect, EffectUniform, WaveDirection
from compute_renderer_tpu.core.maths import F32
from compute_renderer_tpu.backends import tpu, xla
from compute_renderer_tpu.io import procedural

W, H = 256, 64  # two 128-wide tile columns, eight 8-high tile rows


def lights_default():
    return (
        np.array([[0.0, 0.0, 5.0], [-5.0, 3.0, 0.0]], dtype=F32),
        np.array([[1.0, 0.9, 0.8], [0.3, 0.4, 0.5]], dtype=F32),
        np.array([1.0, 0.5], dtype=F32),
    )


def compare_backends(mesh, effect=None, camera=None, w=W, h=H, exact=True,
                     **tpu_kw):
    camera = camera or Camera.first_person([0, 0, 3.0], aspect=w / h)
    u = camera.uniform()
    effect = effect if effect is not None else EffectUniform().as_array()
    lights = lights_default()

    # The xla ref must share the tpu default tile shape: the raster REGION
    # (covered-tile rectangle) is part of the per-pixel semantics for the
    # region-expanding effects (mirage warps samples ACROSS the triangle
    # edge, voxelize relaxes the coverage threshold), so their images
    # legitimately depend on the tiling. tpu.choose_tile returns (16, 256).
    ref = xla.render(mesh, u, lights, effect, w, h, tile_h=16, tile_w=256)
    ours = tpu.render(mesh, u, lights, effect, w, h, **tpu_kw)
    if exact:
        np.testing.assert_array_equal(ours, ref)
    else:
        diff = np.abs(ours.astype(int) - ref.astype(int))
        assert (diff <= 1).mean() > 0.999
    return ours


def test_single_triangle():
    compare_backends(procedural.single_triangle())


def test_cube():
    compare_backends(procedural.cube())


def test_icosphere():
    compare_backends(procedural.icosphere(2))


def test_depth_overlap():
    a = procedural.single_triangle(z=0.0)
    b = procedural.single_triangle(z=1.0)
    b.positions[:, 0] += 0.2
    mesh = type(a).concatenate([a, b])
    mesh.normals[3:] = [1, 0, 0]
    compare_backends(mesh)


def test_depth_tie_determinism():
    a = procedural.single_triangle(z=0.0)
    b = procedural.single_triangle(z=0.0)
    mesh = type(a).concatenate([a, b])
    mesh.normals[3:] = [1, 0, 0]
    compare_backends(mesh)


def test_orbit_camera():
    cam = Camera.orbit(3.0, 25.0, 15.0, [0, 0, 0], aspect=W / H)
    compare_backends(procedural.cube(), camera=cam)


@pytest.mark.parametrize(
    "effect",
    [
        Effect.wave(0.3, 2.0, 1.0, WaveDirection.VERTICAL),
        Effect.wave(0.2, 3.0, 1.0, WaveDirection.RADIAL),
        Effect.edge_melt(0.3, 1.0),
        Effect.voxelize(0.4, 1.0),
        Effect.mirage(1.5, 0.5, 1.0),
    ],
    ids=["wave-v", "wave-r", "edge_melt", "voxelize", "mirage"],
)
def test_effects_parity(effect):
    effect.update(0.6)
    compare_backends(procedural.icosphere(1), effect=effect.uniform(0.6).as_array())


def test_odd_resolution_cropping():
    # Framebuffer not tile-aligned: 200x50 -> padded to 256x56 internally.
    compare_backends(procedural.cube(), w=200, h=50)


def test_small_tile_caps_trigger_retry():
    # Force tiny capacities: host-level retry must still converge.
    mesh = procedural.icosphere(2)
    img = compare_backends(mesh, pair_cap=0, tile_cap=0)
    assert img.shape == (H, W, 4)


def test_determinism_two_runs():
    mesh = procedural.icosphere(2)
    cam = Camera.first_person([0, 0, 3.0], aspect=W / H)
    u = cam.uniform()
    eff = EffectUniform().as_array()
    a = tpu.render(mesh, u, lights_default(), eff, W, H)
    b = tpu.render(mesh, u, lights_default(), eff, W, H)
    np.testing.assert_array_equal(a, b)


def test_renderer_tpu_backend():
    from compute_renderer_tpu import Renderer, Scene, SceneConfig

    cfg = SceneConfig(backend_type="custom")  # reference name -> tpu
    scene = Scene.from_config(cfg, W, H)
    r = Renderer(scene.mesh, W, H, backend=cfg.normalized_backend())
    assert r.backend_name == "tpu"
    img = r.render(scene.update(0.016))
    assert img.shape == (H, W, 4)
    assert (img[..., 3] == 255).all()


def test_chunked_rendering_matches_single_pass():
    # Force multi-chunk (3 chunks of <=160 tris) and compare bit-exact with
    # the single-pass result, including depth tie-breaks across chunks.
    import jax.numpy as jnp

    mesh = procedural.icosphere(1)  # 320 tris
    cam = Camera.first_person([0, 0, 3.0], aspect=W / H)
    u = cam.uniform()
    eff = EffectUniform().as_array()
    lwp, lc, li = lights_default()
    args = (
        jnp.asarray(mesh.positions), jnp.asarray(mesh.normals),
        jnp.asarray(mesh.uvs),
        jnp.asarray(mesh.indices.astype(np.int32)).reshape(-1, 3),
        jnp.asarray(u.view_proj), jnp.asarray(u.view_position),
        jnp.asarray(lwp), jnp.asarray(lc), jnp.asarray(li), jnp.asarray(eff),
    )
    single = tpu.render_frame(*args, width=W, height=H)
    chunked = tpu.render_frame(*args, width=W, height=H, tri_chunk=160)
    np.testing.assert_array_equal(np.asarray(single[0]), np.asarray(chunked[0]))
    np.testing.assert_array_equal(np.asarray(single[1]), np.asarray(chunked[1]))


def test_flat_layout_parity(monkeypatch):
    # Force the sort/flat binning path (normally reserved for huge scenes)
    # and check it matches the XLA baseline exactly. The odd tile_cap also
    # avoids reusing the dense-path jit cache entry.
    from compute_renderer_tpu.backends import binning as B

    monkeypatch.setattr(B, "DENSE_BINNING_OP_LIMIT", 0)
    compare_backends(procedural.icosphere(2), tile_cap=136)


def test_renderer_overflow_retry():
    # 200 coincident triangles in one tile with a deliberately small
    # tile_cap: the engine must detect the overflow and retry with the
    # reported needed capacity instead of silently dropping geometry.
    from compute_renderer_tpu import Renderer
    from compute_renderer_tpu.core.types import Mesh as MeshT
    from compute_renderer_tpu.engine.scene import FrameUniforms

    n = 200
    base = procedural.single_triangle(z=0.0)
    pos = np.tile(base.positions, (n, 1))
    pos[:, 2] += np.repeat(np.linspace(0, 0.5, n), 3)  # distinct depths
    mesh = MeshT(pos, np.tile(base.normals, (n, 1)),
                 np.tile(base.uvs, (n, 1)),
                 np.arange(3 * n, dtype=np.uint32))

    cam = Camera.first_person([0, 0, 3.0], aspect=W / H)
    u = cam.uniform()
    lwp, lc, li = lights_default()
    uniforms = FrameUniforms(
        view_position=u.view_position, view_proj=u.view_proj,
        light_world_pos=lwp, light_color=lc, light_intensity=li,
        effect=EffectUniform().as_array(),
    )
    r = Renderer(mesh, W, H, backend="tpu", tile_cap=96)
    img = r.render(uniforms)
    # Retry happened: the binning pass reported 200 triangles needed in one
    # tile, so the cap jumped straight past it (one recompile) with the
    # 12.5% slack + 8-alignment of tpu.grow_tile_cap.
    assert r.options["tile_cap"] >= n
    assert (img[..., 0] > 0).any()
    # Result matches a render with ample caps from the start.
    r2 = Renderer(mesh, W, H, backend="tpu", tile_cap=1024)
    np.testing.assert_array_equal(img, r2.render(uniforms))


# -- occupied-tile work-list kernel (VERDICT r1 item 4) -----------------------

def test_worklist_matches_full_grid_dense():
    # Dense-rows layout (small scene): the work-list kernel must be bitwise
    # identical to the full-grid kernel — empty tiles come from the
    # pre-cleared aliased framebuffer instead of grid steps.
    mesh = procedural.icosphere(2)
    camera = Camera.first_person([0, 0, 3.0], aspect=W / H)
    u = camera.uniform()
    lights = lights_default()
    effect = EffectUniform().as_array()
    a = tpu.render(mesh, u, lights, effect, W, H, worklist=True)
    b = tpu.render(mesh, u, lights, effect, W, H, worklist=False)
    np.testing.assert_array_equal(a, b)


def test_worklist_matches_full_grid_flat(monkeypatch):
    # Force the flat sorted-pair-list layout.
    from compute_renderer_tpu.backends import binning

    monkeypatch.setattr(binning, "DENSE_BINNING_OP_LIMIT", 0)
    mesh = procedural.icosphere(2)
    camera = Camera.first_person([0, 0, 3.0], aspect=W / H)
    u = camera.uniform()
    lights = lights_default()
    effect = EffectUniform().as_array()
    a = tpu.render(mesh, u, lights, effect, W, H, worklist=True,
                   pair_cap=8192)
    b = tpu.render(mesh, u, lights, effect, W, H, worklist=False,
                   pair_cap=8192)
    np.testing.assert_array_equal(a, b)


def test_worklist_empty_scene_tiles():
    # A triangle covering one corner: nearly all tiles are empty; the
    # work-list render must still match xla everywhere (background
    # included).
    mesh = procedural.single_triangle()
    mesh.positions[:, :2] = mesh.positions[:, :2] * 0.1 - 0.88
    compare_backends(mesh, worklist=True)


def test_worklist_effects():
    # Voxelize inflates coverage (threshold = -param1): the work-list kernel
    # must match the full-grid kernel bitwise on the inflated footprint.
    # (xla-vs-tpu voxelize parity at looser coverage is owned by test_fuzz /
    # PARITY.md's documented tile-union deviation, not this test.)
    mesh = procedural.icosphere(2)
    camera = Camera.first_person([0, 0, 3.0], aspect=W / H)
    u = camera.uniform()
    lights = lights_default()
    eff = Effect.voxelize(0.3, 1.0).uniform(0.6).as_array()
    a = tpu.render(mesh, u, lights, eff, W, H, worklist=True)
    b = tpu.render(mesh, u, lights, eff, W, H, worklist=False)
    np.testing.assert_array_equal(a, b)


def test_worklist_zero_occupied_tiles():
    # Every triangle behind the camera: the dynamic work-list grid is
    # empty; the frame must be pure background from the aliased clear.
    mesh = procedural.icosphere(1)
    camera = Camera.first_person([0, 0, -50.0], aspect=W / H)
    u = camera.uniform()
    lights = lights_default()
    effect = EffectUniform().as_array()
    img = tpu.render(mesh, u, lights, effect, W, H, worklist=True)
    assert (img[:, :, :3] == np.array([0, 0, 255], np.uint8)).all()


def test_pair_cap_settles_to_need():
    # Settle-to-need calibration (micro path): a first-frame front-end
    # measurement replaces the 3T/8 heuristic with measured-need + 12.5%
    # slack, so every pair-sized stage runs tight. The settled render must
    # be bitwise identical to one with the ample default capacity.
    from compute_renderer_tpu import Renderer
    from compute_renderer_tpu.engine.scene import FrameUniforms

    mesh = procedural.icosphere(3)
    cam = Camera.first_person([0, 0, 3.0], aspect=W / H)
    u = cam.uniform()
    lwp, lc, li = lights_default()
    uniforms = FrameUniforms(
        view_position=u.view_position, view_proj=u.view_proj,
        light_world_pos=lwp, light_color=lc, light_intensity=li,
        effect=EffectUniform().as_array(),
    )
    r = Renderer(mesh, W, H, backend="tpu", path="micro")
    img = r.render(uniforms)
    settled = r.options.get("pair_cap")
    assert settled is not None, "calibration did not run"
    default = tpu.default_caps("micro", mesh.num_triangles, W, H)["pair_cap"]
    assert settled < default, (settled, default)

    r2 = Renderer(mesh, W, H, backend="tpu", path="micro", pair_cap=default)
    np.testing.assert_array_equal(img, r2.render(uniforms))
    # User-pinned capacity is never overridden by calibration.
    assert r2.options["pair_cap"] == default


def test_pair_cap_calibration_then_overflow_growth():
    # Coverage can exceed the settled capacity when the camera moves into
    # denser coverage: the overflow report must still grow the cap.
    from compute_renderer_tpu import Renderer
    from compute_renderer_tpu.engine.scene import FrameUniforms

    mesh = procedural.uv_sphere(nu=100, nv=30)  # 6k tris
    lwp, lc, li = lights_default()

    def uniforms_at(dist):
        cam = Camera.first_person([0, 0, dist], aspect=W / H)
        u = cam.uniform()
        return FrameUniforms(
            view_position=u.view_position, view_proj=u.view_proj,
            light_world_pos=lwp, light_color=lc, light_intensity=li,
            effect=EffectUniform().as_array(),
        )

    r = Renderer(mesh, W, H, backend="tpu", path="micro")
    r.render(uniforms_at(12.0))  # small on screen (~3.3k pairs) -> tight cap
    settled = r.options["pair_cap"]
    img = r.render(uniforms_at(1.3))  # ~7k pairs: must overflow + grow
    assert r.options["pair_cap"] > settled
    r2 = Renderer(mesh, W, H, backend="tpu", path="micro")
    np.testing.assert_array_equal(img, r2.render(uniforms_at(1.3)))


def _dense_tile_mesh(n):
    # n coincident triangles in one screen tile — per-tile density n with a
    # tiny total triangle count, the shape resolve_path's count split
    # cannot see.
    from compute_renderer_tpu.core.types import Mesh as MeshT

    base = procedural.single_triangle(z=0.0)
    pos = np.tile(base.positions, (n, 1))
    pos[:, 2] += np.repeat(np.linspace(0, 0.5, n), 3)
    return MeshT(pos, np.tile(base.normals, (n, 1)),
                 np.tile(base.uvs, (n, 1)),
                 np.arange(3 * n, dtype=np.uint32))


def test_renderer_over_cap_density_falls_back_to_micro():
    # >MAX_TILE_CAP triangles in ONE tile: no legal tile_cap fits the SMEM
    # window, so the engine must fall back to the micro path (HBM-streamed
    # pair windows, no per-tile ceiling) instead of raising. Observed in
    # the wild: the ~36k-tri textured suite row at a 64x48 test resolution
    # packed 16356 triangles into a single tile (2026-08-18).
    from compute_renderer_tpu import Renderer
    from compute_renderer_tpu.backends.tpu import MAX_TILE_CAP
    from compute_renderer_tpu.engine.scene import FrameUniforms

    n = MAX_TILE_CAP + 300
    mesh = _dense_tile_mesh(n)
    cam = Camera.first_person([0, 0, 3.0], aspect=W / H)
    u = cam.uniform()
    lwp, lc, li = lights_default()
    uniforms = FrameUniforms(
        view_position=u.view_position, view_proj=u.view_proj,
        light_world_pos=lwp, light_color=lc, light_intensity=li,
        effect=EffectUniform().as_array(),
    )
    r = Renderer(mesh, W, H, backend="tpu")
    img = r.render(uniforms)
    assert r.options["path"] == "micro"
    assert (img[..., 0] > 0).any()
    # Bitwise-equal to the micro path chosen from the start.
    r2 = Renderer(mesh, W, H, backend="tpu", path="micro")
    np.testing.assert_array_equal(img, r2.render(uniforms))
    # An explicit tile pin keeps the hard error.
    r3 = Renderer(mesh, W, H, backend="tpu", path="tile")
    with pytest.raises(RuntimeError, match="SMEM window"):
        r3.render(uniforms)


def test_render_entry_over_cap_density_falls_back_to_micro():
    # Same density fallback through the functional tpu.render entry.
    from compute_renderer_tpu.backends.tpu import MAX_TILE_CAP

    mesh = _dense_tile_mesh(MAX_TILE_CAP + 300)
    cam = Camera.first_person([0, 0, 3.0], aspect=W / H)
    u = cam.uniform()
    eff = EffectUniform().as_array()
    img = tpu.render(mesh, u, lights_default(), eff, W, H)
    assert (img[..., 0] > 0).any()
