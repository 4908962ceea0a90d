"""Extension coverage on the multi-device paths (textures, bilinear,
density fallback, SSAA) — split from test_sharding.py: XLA:CPU segfaults
order-dependently once enough 8-virtual-device executables accumulate in
ONE process (compile, serialize AND warm-cache load paths all observed,
2026-08-18), and the combined file crossed that threshold. The suite runs
one process per file (tests/conftest.py _split_suite_argv), so the split
keeps both files under it.
"""

import jax
import numpy as np
import pytest

from compute_renderer_tpu.core.camera import Camera
from compute_renderer_tpu.core.effects import EffectUniform
from compute_renderer_tpu.core.maths import F32
from compute_renderer_tpu.backends import tpu
from compute_renderer_tpu.io import procedural
from compute_renderer_tpu.parallel.sharding import make_mesh, render_frame_sharded

from tests.test_sharding import H, W, args_for  # noqa: F401


@pytest.fixture(scope="module")
def mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh(8)


def _textured(kd=False):
    from tests.test_textures import textured_quad

    kd_arr = (np.array([[0.9, 0.8, 0.2], [0.2, 0.8, 0.9]], F32)
              if kd else None)
    return textured_quad(kd=kd_arr)


def _tex_kwargs(m):
    import jax.numpy as jnp

    kw = {
        "face_tex": jnp.asarray(m.face_tex),
        "texels": jnp.asarray(m.texels),
        "tex_table": jnp.asarray(m.tex_table),
    }
    if m.face_kd is not None:
        kw["face_kd"] = jnp.asarray(m.face_kd)
    return kw


def test_sharded_textured_tile_and_micro(mesh8):
    # Texture extension across the sharded stripe paths: the kernel runs
    # its visibility-only walk per stripe and each device shades its own
    # stripe with the deferred tail at its global pixel offset. Same op
    # structure as the single-device vis render -> bitwise equal.
    m = _textured(kd=True)
    args = args_for(m)
    tex = _tex_kwargs(m)
    for path in ("tile", "micro"):
        rgba_s, keys_s, overflow = render_frame_sharded(
            *args, mesh=mesh8, width=W, height=H, path=path, **tex
        )
        rgba_1, keys_1, _ = tpu.render_frame(
            *args, width=W, height=H, path=path, **tex
        )
        assert not bool(np.asarray(overflow).any()), path
        np.testing.assert_array_equal(np.asarray(keys_s),
                                      np.asarray(keys_1), err_msg=path)
        np.testing.assert_array_equal(np.asarray(rgba_s),
                                      np.asarray(rgba_1), err_msg=path)
        # The checker atlas actually shows (vs the untextured render).
        plain, _, _ = tpu.render_frame(*args, width=W, height=H, path=path)
        assert (np.asarray(rgba_1) != np.asarray(plain)).any()


def test_sharded_textured_sortmiddle(mesh8):
    # Sort-middle with textures: per-slice corner arrays all_gather into
    # padded-global order (matching the exchanged pair ids); <=1-LSB
    # contract as the plain sortmiddle production path.
    m = _textured()
    args = args_for(m)
    tex = _tex_kwargs(m)
    rgba_s, keys_s, overflow = render_frame_sharded(
        *args, mesh=mesh8, width=W, height=H, path="sortmiddle", **tex
    )
    rgba_1, _, _ = tpu.render_frame(
        *args, width=W, height=H, path="micro", **tex
    )
    assert not bool(np.asarray(overflow).any())
    diff = np.abs(np.asarray(rgba_s).astype(int)
                  - np.asarray(rgba_1).astype(int))
    mism = (diff > 1).any(axis=-1)
    assert mism.mean() < 0.001, f"{mism.sum()} px differ by >1"
    # Texture visible through the sortmiddle path too.
    plain_args = args_for(m)
    plain, _, _ = render_frame_sharded(
        *plain_args, mesh=mesh8, width=W, height=H, path="sortmiddle"
    )
    assert (np.asarray(rgba_s) != np.asarray(plain)).any()


def test_frame_parallel_textured(mesh8):
    # face_tex/texels/tex_table flow from the Renderer into the
    # frame-parallel step; each sharded frame stays bitwise equal to the
    # single-device textured render.
    from compute_renderer_tpu.engine.renderer import Renderer
    from compute_renderer_tpu.parallel.frames import render_frames
    from compute_renderer_tpu.core.camera import Camera
    from compute_renderer_tpu.core.effects import EffectUniform
    from compute_renderer_tpu.engine.scene import FrameUniforms

    m = _textured(kd=True)
    r = Renderer(m, W, H, backend="tpu")
    cam = Camera.first_person([0, 0, 3.0], aspect=W / H)
    u = cam.uniform()
    lights = (np.array([[0, 0, 5.0]], F32), np.ones((1, 3), F32),
              np.ones((1,), F32))
    fu = FrameUniforms(
        view_position=np.asarray(u.view_position, F32),
        view_proj=np.asarray(u.view_proj, F32),
        effect=np.asarray(EffectUniform().as_array(), F32),
        light_world_pos=lights[0], light_color=lights[1],
        light_intensity=lights[2],
    )
    frames = render_frames(r, [fu, fu], mesh8)
    single = r.render(fu)
    np.testing.assert_array_equal(frames[0], single)
    np.testing.assert_array_equal(frames[1], single)


def _dense_tile_mesh(n):
    # n stacked triangles in one screen tile: per-tile density beyond
    # any legal tile_cap with a small total count (resolve_path's count
    # split cannot see it) — must fall back to the micro path. Each copy
    # gets a tiny irrational-step xy jitter so no sample point lies
    # exactly on an edge: perfectly coincident edges put EVERY edge pixel
    # inside the FMA-contraction window where the shard_map and plain-jit
    # XLA:CPU programs may disagree on coverage (PARITY.md "exact-on-edge"
    # note), which is the degenerate-input artifact, not the contract.
    from compute_renderer_tpu.core.types import Mesh as CoreMesh

    base = procedural.single_triangle(z=0.0)
    pos = np.tile(base.positions, (n, 1))
    pos[:, 2] += np.repeat(np.linspace(0, 0.5, n), 3)
    k = np.repeat(np.arange(n, dtype=np.float64), 3)
    pos[:, 0] += (((k * 0.6180339887) % 1.0) - 0.5) * 0.02
    pos[:, 1] += (((k * 0.7548776662) % 1.0) - 0.5) * 0.02
    return CoreMesh(pos, np.tile(base.normals, (n, 1)),
                    np.tile(base.uvs, (n, 1)),
                    np.arange(3 * n, dtype=np.uint32))


def test_sharded_over_cap_density_falls_back_to_micro(mesh8):
    from compute_renderer_tpu.backends.tpu import MAX_TILE_CAP
    from compute_renderer_tpu.parallel.sharding import render_sharded

    m = _dense_tile_mesh(MAX_TILE_CAP + 300)
    args = args_for(m)
    rgba, keys = render_sharded(*args, mesh=mesh8, width=W, height=H)
    # Comparator with explicit headroom: at the default micro cap this
    # scene's pair list overflows (the stacked mesh covers ~34k pairs) and
    # a raw render_frame call would silently compare against a truncated
    # render — render_sharded retries, a direct call does not.
    rgba_single, keys_single, overflow = tpu.render_frame(
        *args, width=W, height=H, path="micro", pair_cap=65536
    )
    assert not np.asarray(overflow).any()
    np.testing.assert_array_equal(np.asarray(rgba), np.asarray(rgba_single))
    np.testing.assert_array_equal(np.asarray(keys), np.asarray(keys_single))


def test_frame_parallel_over_cap_density_falls_back_to_micro(mesh8):
    from compute_renderer_tpu.backends.tpu import MAX_TILE_CAP
    from compute_renderer_tpu.engine.renderer import Renderer
    from compute_renderer_tpu.engine.scene import FrameUniforms
    from compute_renderer_tpu.parallel.frames import render_frames

    m = _dense_tile_mesh(MAX_TILE_CAP + 300)
    cam = Camera.first_person([0, 0, 3.0], aspect=W / H)
    u = cam.uniform()
    uni = FrameUniforms(
        view_position=u.view_position, view_proj=u.view_proj,
        light_world_pos=np.array([[0, 0, 5.0]], F32),
        light_color=np.ones((1, 3), F32),
        light_intensity=np.ones((1,), F32),
        effect=EffectUniform().as_array(),
    )
    # Comparator FIRST: XLA:CPU order-dependently segfaults compiling this
    # single-device program after the 8-device frame-parallel executable
    # exists in-process (the known crash family tests/conftest.py's
    # read-only-cache regime works around; observed 2026-08-18 in the
    # warm-cache run). Single-then-sharded has never crashed.
    single = Renderer(m, W, H, backend="tpu", path="micro").render(uni)
    r = Renderer(m, W, H, backend="tpu")
    frames = render_frames(r, [uni, uni], mesh8)
    np.testing.assert_array_equal(frames[0], single)
    np.testing.assert_array_equal(frames[1], single)


def test_sharded_textured_bilinear(mesh8):
    # tex_filter plumbs through the stripe-body partials: sharded bilinear
    # must stay bitwise equal to the single-device bilinear render, and
    # actually filter (differ from sharded nearest).
    m = _textured(kd=True)
    args = args_for(m)
    tex = _tex_kwargs(m)
    rgba_s, keys_s, overflow = render_frame_sharded(
        *args, mesh=mesh8, width=W, height=H, path="tile",
        tex_filter="bilinear", **tex
    )
    rgba_1, keys_1, _ = tpu.render_frame(
        *args, width=W, height=H, path="tile", tex_filter="bilinear", **tex
    )
    assert not bool(np.asarray(overflow).any())
    np.testing.assert_array_equal(np.asarray(keys_s), np.asarray(keys_1))
    np.testing.assert_array_equal(np.asarray(rgba_s), np.asarray(rgba_1))
    near, _, _ = render_frame_sharded(
        *args, mesh=mesh8, width=W, height=H, path="tile", **tex
    )
    assert (np.asarray(rgba_s) != np.asarray(near)).any()


def test_sharded_ssaa_matches_single_device(mesh8):
    # Per-stripe SSAA resolve: each device averages its own rows (exact
    # integer-valued f32 block means), so the sharded resolve is bitwise
    # equal to the single-device engine resolve on every stripe path.
    from compute_renderer_tpu.engine.renderer import Renderer
    from compute_renderer_tpu.engine.scene import FrameUniforms

    m = procedural.icosphere(2)
    args = args_for(m)
    cam = Camera.first_person([0, 0, 3.0], aspect=W / H)
    u = cam.uniform()
    uni = FrameUniforms(
        view_position=u.view_position, view_proj=u.view_proj,
        light_world_pos=np.array([[0, 0, 5.0]], F32),
        light_color=np.ones((1, 3), F32),
        light_intensity=np.ones((1,), F32),
        effect=EffectUniform().as_array(),
    )
    single = Renderer(m, W, H, backend="tpu", ssaa=2,
                      path="micro").render(uni)
    rgba, keys, overflow = render_frame_sharded(
        *args, mesh=mesh8, width=W, height=H, path="micro", ssaa=2
    )
    assert not bool(np.asarray(overflow).any())
    assert np.asarray(rgba).shape == (H, W, 4)
    assert np.asarray(keys).shape == (2 * H, 2 * W)
    np.testing.assert_array_equal(np.asarray(rgba), single)
    # Non-divisible factor: clear host-side error, not a wrong image.
    from compute_renderer_tpu.parallel.sharding import _check_ssaa_stripes

    with pytest.raises(ValueError, match="ssaa"):
        _check_ssaa_stripes(3, stripe_h=8, padded_w=128)
    _check_ssaa_stripes(2, stripe_h=8, padded_w=128)  # divisible: fine


def test_frames_x_stripes_2d_matches_single_device():
    # Composed 2-D decomposition (dp over frames x sp over framebuffer
    # stripes on ONE mesh): every frame must be bitwise equal to the
    # single-device micro render — the stripe body is the same one the
    # 1-D decomposition pins, and the frame axis adds no communication.
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from jax.sharding import Mesh as JaxMesh

    from compute_renderer_tpu.engine.renderer import Renderer
    from compute_renderer_tpu.engine.scene import FrameUniforms
    from compute_renderer_tpu.parallel.frames import render_frames_2d

    mesh2d = JaxMesh(
        np.array(jax.devices()[:8]).reshape(2, 4), ("frames", "tiles")
    )
    m = procedural.icosphere(2)

    def uni(t):
        cam = Camera.first_person([0, 0, 3.0 + 0.1 * t], aspect=W / H)
        u = cam.uniform()
        return FrameUniforms(
            view_position=u.view_position, view_proj=u.view_proj,
            light_world_pos=np.array([[0, 0, 5.0]], F32),
            light_color=np.ones((1, 3), F32),
            light_intensity=np.ones((1,), F32),
            effect=EffectUniform().as_array(),
        )

    uniforms = [uni(t) for t in range(3)]  # 3 frames, padded to 4
    r = Renderer(m, W, H, backend="tpu", path="micro")
    frames = render_frames_2d(r, uniforms, mesh2d)
    assert frames.shape == (3, H, W, 4)
    for i, u in enumerate(uniforms):
        single = Renderer(m, W, H, backend="tpu", path="micro").render(u)
        np.testing.assert_array_equal(frames[i], single, err_msg=f"frame {i}")


def test_frames_x_stripes_2d_overflow_retry_and_ssaa():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from jax.sharding import Mesh as JaxMesh

    from compute_renderer_tpu.engine.renderer import Renderer
    from compute_renderer_tpu.engine.scene import FrameUniforms
    from compute_renderer_tpu.parallel.frames import render_frames_2d

    mesh2d = JaxMesh(
        np.array(jax.devices()[:8]).reshape(2, 4), ("frames", "tiles")
    )
    m = procedural.icosphere(2)
    cam = Camera.first_person([0, 0, 3.0], aspect=W / H)
    u = cam.uniform()
    uni = FrameUniforms(
        view_position=u.view_position, view_proj=u.view_proj,
        light_world_pos=np.array([[0, 0, 5.0]], F32),
        light_color=np.ones((1, 3), F32),
        light_intensity=np.ones((1,), F32),
        effect=EffectUniform().as_array(),
    )
    # Deliberately tiny pair_cap: grown from the (nf*nt, 2) report.
    r = Renderer(m, W, H, backend="tpu", path="micro", pair_cap=512,
                 ssaa=2)
    frames = render_frames_2d(r, [uni, uni], mesh2d)
    single = Renderer(m, W, H, backend="tpu", path="micro",
                      ssaa=2).render(uni)
    np.testing.assert_array_equal(frames[0], single)
    np.testing.assert_array_equal(frames[1], single)


def test_sharded_trilinear(mesh8):
    # Trilinear through the stripe bodies: mips built once on host, pool +
    # level table replicated; sharded must stay bitwise equal to the
    # single-device trilinear render.
    import jax.numpy as jnp

    from compute_renderer_tpu.io.textures import build_mips
    from tests.test_textures import _minified_quad

    m = _minified_quad()
    pool, mips = build_mips(m.texels, m.tex_table)
    tex = {
        "face_tex": jnp.asarray(m.face_tex),
        "texels": jnp.asarray(pool),
        "tex_table": jnp.asarray(m.tex_table),
        "tex_mips": jnp.asarray(mips),
        "tex_filter": "trilinear",
    }
    args = args_for(m)
    by_path = {}
    for path in ("tile", "micro"):
        rgba_s, keys_s, overflow = render_frame_sharded(
            *args, mesh=mesh8, width=W, height=H, path=path, **tex
        )
        rgba_1, keys_1, _ = tpu.render_frame(
            *args, width=W, height=H, path=path, **tex
        )
        assert not bool(np.asarray(overflow).any()), path
        np.testing.assert_array_equal(np.asarray(keys_s),
                                      np.asarray(keys_1), err_msg=path)
        np.testing.assert_array_equal(np.asarray(rgba_s),
                                      np.asarray(rgba_1), err_msg=path)
        by_path[path] = np.asarray(rgba_s)
    # Sort-middle trilinear: per-slice corner arrays all_gather'd; same
    # <=1-LSB contract as the other sortmiddle texture paths.
    rgba_sm, _, overflow = render_frame_sharded(
        *args, mesh=mesh8, width=W, height=H, path="sortmiddle", **tex
    )
    assert not bool(np.asarray(overflow).any())
    diff = np.abs(np.asarray(rgba_sm).astype(int)
                  - np.asarray(rgba_1).astype(int))
    assert ((diff > 1).any(axis=-1)).mean() < 0.001
    # The retrying host entry accepts the BASE atlas for trilinear and
    # builds the mip pool itself (parity with the other host entries).
    from compute_renderer_tpu.parallel.sharding import render_sharded

    rgba_h, _ = render_sharded(
        *args, mesh=mesh8, width=W, height=H, path="tile",
        face_tex=jnp.asarray(m.face_tex), texels=jnp.asarray(m.texels),
        tex_table=jnp.asarray(m.tex_table), tex_filter="trilinear",
    )
    np.testing.assert_array_equal(np.asarray(rgba_h), by_path["tile"])
