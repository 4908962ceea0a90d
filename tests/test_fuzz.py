"""Randomized parity fuzzing: random triangle soups + random cameras +
random effects, golden oracle vs XLA baseline vs Pallas TPU backend.

Triangle soups hit the cases structured meshes miss: slivers, backfaces,
near-plane straddlers, offscreen geometry, coincident depths.
"""

import numpy as np
import pytest

from compute_renderer_tpu.core.camera import Camera
from compute_renderer_tpu.core.effects import Effect, EffectUniform, WaveDirection
from compute_renderer_tpu.core.maths import F32
from compute_renderer_tpu.core.types import Mesh
from compute_renderer_tpu.golden.rasterizer import render_golden
from compute_renderer_tpu.backends import tpu, xla

W, H = 128, 48


def random_soup(rng, n_tris, spread=2.0):
    pos = rng.uniform(-spread, spread, (n_tris * 3, 3)).astype(F32)
    nrm = rng.normal(size=(n_tris * 3, 3)).astype(F32)
    uv = rng.uniform(0, 1, (n_tris * 3, 2)).astype(F32)
    idx = np.arange(n_tris * 3, dtype=np.uint32)
    return Mesh(pos, nrm, uv, idx)


def random_lights(rng, n):
    return (
        rng.uniform(-6, 6, (n, 3)).astype(F32),
        rng.uniform(0, 1, (n, 3)).astype(F32),
        rng.uniform(0, 2, (n,)).astype(F32),
    )


def random_camera(rng):
    if rng.random() < 0.5:
        return Camera.first_person(rng.uniform(-1, 1, 3) + [0, 0, 4], W / H)
    return Camera.orbit(
        float(rng.uniform(2, 6)), float(rng.uniform(0, 360)),
        float(rng.uniform(-60, 60)), rng.uniform(-1, 1, 3), W / H,
    )


def random_effect(rng):
    roll = rng.integers(0, 5)
    t = float(rng.uniform(0, 3))
    if roll == 0:
        return EffectUniform().as_array()
    if roll == 1:
        e = Effect.wave(0.3, 2.0, 1.0,
                        list(WaveDirection)[rng.integers(0, 3)])
    elif roll == 2:
        e = Effect.edge_melt(float(rng.uniform(0, 0.4)), 1.0)
    elif roll == 3:
        e = Effect.voxelize(float(rng.uniform(0, 0.6)), 1.0)
    else:
        e = Effect.mirage(float(rng.uniform(0, 2)), 0.5, 1.0)
    e.update(t)
    return e.uniform(t).as_array()


@pytest.mark.parametrize("seed", [7, 23, 101])
def test_fuzz_backends_agree_exactly(seed):
    rng = np.random.default_rng(seed)
    mesh = random_soup(rng, int(rng.integers(5, 40)))
    cam = random_camera(rng)
    u = cam.uniform()
    lights = random_lights(rng, int(rng.integers(1, 4)))
    effect = random_effect(rng)

    # The comparator must share the tpu default's covered-tile rectangle:
    # voxelize inflates coverage via a negative barycentric threshold and
    # mirage warps sample positions, so for those effects the tile rect is
    # part of the per-pixel SEMANTICS (rasteriser.wgsl:112-134) and the
    # image legitimately differs across tile shapes (which is also why the
    # engine's per-scene tile auto-tune skips them).
    th, tw = tpu.choose_tile(mesh.num_triangles, W, H)
    ref = xla.render(mesh, u, lights, effect, W, H, tile_h=th, tile_w=tw)
    ours = tpu.render(mesh, u, lights, effect, W, H)
    np.testing.assert_array_equal(ours, ref)


@pytest.mark.parametrize("seed", [3, 57])
def test_fuzz_golden_agrees_no_effect(seed):
    # Golden comparison without effects (effect coverage depends on the
    # tile-rectangle geometry, which golden models at the reference's 8x8).
    rng = np.random.default_rng(seed)
    mesh = random_soup(rng, int(rng.integers(5, 30)))
    cam = random_camera(rng)
    u = cam.uniform()
    lights = random_lights(rng, 2)
    effect = EffectUniform().as_array()

    gold = render_golden(
        mesh.positions, mesh.normals, mesh.uvs, mesh.indices,
        u.view_proj, u.view_position, *lights, effect, W, H,
    )
    ours = xla.render(mesh, u, lights, effect, W, H)
    diff = np.abs(ours.astype(int) - gold.astype(int))
    mismatched = (diff > 1).any(axis=-1)
    assert mismatched.mean() <= 0.005, f"{mismatched.sum()} px differ"


def test_fuzz_degenerate_soup():
    # Zero-area triangles, duplicated vertices, points behind the camera.
    rng = np.random.default_rng(99)
    pos = np.zeros((12, 3), dtype=F32)
    pos[0:3] = [[0, 0, 0], [1, 0, 0], [0.5, 1, 0]]  # normal triangle
    pos[3:6] = [[1, 1, 1]] * 3  # fully degenerate
    pos[6:9] = [[0, 0, 10], [1, 0, 10], [0, 1, 10]]  # behind camera
    pos[9:12] = [[-1, 0, 0], [-1, 0, 0], [-1, 1, 0]]  # zero-area edge
    mesh = Mesh(pos, rng.normal(size=(12, 3)).astype(F32),
                np.zeros((12, 2), dtype=F32), np.arange(12, dtype=np.uint32))
    cam = Camera.first_person([0, 0, 3.0], W / H)
    u = cam.uniform()
    lights = random_lights(rng, 1)
    eff = EffectUniform().as_array()
    # Comparator at the tpu default tile: degenerate (zero-area) triangles
    # put pixels exactly ON an edge function's zero line, where the
    # anchored-affine evaluation's 1-ULP placement — anchored at the TILE
    # origin — decides coverage; the image is bitwise tile-shape-dependent
    # for them, and parity holds per shape (verified: 0 px at matching
    # shapes, 9 edge px across shapes).
    th, tw = tpu.choose_tile(mesh.num_triangles, W, H)
    ref = xla.render(mesh, u, lights, eff, W, H, tile_h=th, tile_w=tw)
    ours = tpu.render(mesh, u, lights, eff, W, H)
    np.testing.assert_array_equal(ours, ref)


def test_no_pinholes_on_symmetric_silhouette():
    # Regression: origin-expanded affine edge coefficients suffered
    # catastrophic cancellation, punching pixel-center pinholes along shared
    # edges (visible on a symmetric orbit view of a sphere). Anchored
    # coefficients must match the golden oracle's hole-free coverage.
    from compute_renderer_tpu.golden.rasterizer import render_golden as rg

    w, h = 256, 192
    mesh = __import__(
        "compute_renderer_tpu.io.procedural", fromlist=["icosphere"]
    ).icosphere(3)
    cam = Camera.orbit(4.0, 0.0, 0.0, [0, 0, 0], aspect=w / h)
    u = cam.uniform()
    lights = random_lights(np.random.default_rng(0), 2)
    eff = EffectUniform().as_array()

    gold = rg(mesh.positions, mesh.normals, mesh.uvs, mesh.indices,
              u.view_proj, u.view_position, *lights, eff, w, h)
    ours = tpu.render(mesh, u, lights, eff, w, h)

    def interior_background(img):
        blue = (img[:, :, 0] == 0) & (img[:, :, 1] == 0) & (img[:, :, 2] == 255)
        ys, xs = np.mgrid[0:h, 0:w]
        inside = ((xs - w / 2) ** 2 + (ys - h / 2) ** 2) < 20 ** 2
        return int((blue & inside).sum())

    assert interior_background(gold) == 0
    assert interior_background(ours) == 0


@pytest.mark.parametrize("seed", [11, 42])
def test_fuzz_micro_path_agrees_exactly(seed):
    # Mega-scene (micro) path on random soups, vs the xla baseline with the
    # micro path's 8x8 effect-coverage granularity. Hits slivers, backface,
    # near-plane straddlers through the corner-SoA front end, c64-packed
    # coefficient stream, and lane-packed kernel.
    rng = np.random.default_rng(seed)
    mesh = random_soup(rng, int(rng.integers(5, 40)))
    cam = random_camera(rng)
    u = cam.uniform()
    lights = random_lights(rng, int(rng.integers(1, 4)))
    effect = random_effect(rng)

    ref = xla.render(mesh, u, lights, effect, W, H, tile_h=8, tile_w=8)
    ours = tpu.render(mesh, u, lights, effect, W, H, path="micro")
    np.testing.assert_array_equal(ours, ref)


@pytest.mark.parametrize("seed", [11, 42])
def test_fuzz_textured_filters_backends_agree(seed):
    # Random soup + random atlas + random filter: xla and the tpu
    # visibility-mode deferred tail must stay bitwise equal on both
    # kernel paths (micro coverage clips at 8x8 cells = xla's 8x8 grid).
    rng = np.random.default_rng(seed)
    n = int(rng.integers(4, 24))
    base = random_soup(rng, n)
    m = int(rng.integers(1, 4))
    sizes = rng.integers(1, 7, (m, 2))
    texels = []
    table = []
    off = 0
    for tw, th in sizes:
        texels.append(rng.uniform(0, 1, (int(th) * int(tw), 3)).astype(F32))
        table.append([off, int(tw), int(th)])
        off += int(th) * int(tw)
    mesh = Mesh(
        base.positions, base.normals, base.uvs, base.indices,
        face_tex=rng.integers(-1, m, (n,)).astype(np.int32),
        texels=np.concatenate(texels, axis=0),
        tex_table=np.array(table, np.int32),
    )
    cam = random_camera(rng)
    u = cam.uniform()
    lights = random_lights(rng, 2)
    eff = EffectUniform().as_array()
    filt = ("nearest", "bilinear")[int(rng.integers(0, 2))]

    th, tw = tpu.choose_tile(mesh.num_triangles, W, H)
    ref_tile = xla.render(mesh, u, lights, eff, W, H, tile_h=th, tile_w=tw,
                          tex_filter=filt)
    tile = tpu.render(mesh, u, lights, eff, W, H, tex_filter=filt)
    np.testing.assert_array_equal(tile, ref_tile)
    ref_micro = xla.render(mesh, u, lights, eff, W, H, tile_h=8, tile_w=8,
                           tex_filter=filt)
    micro = tpu.render(mesh, u, lights, eff, W, H, path="micro",
                       tex_filter=filt)
    np.testing.assert_array_equal(micro, ref_micro)


@pytest.mark.parametrize("seed", [5])
def test_fuzz_ssaa_is_downsampled_supersample(seed):
    # SSAA identity: Renderer(ssaa=s).render == box_downsample of the same
    # scene rendered at (s*W, s*H) — pins the resolve to exactly "render
    # big, average blocks" with no other difference.
    import jax.numpy as jnp

    from compute_renderer_tpu.engine.renderer import (
        Renderer, box_downsample,
    )
    from compute_renderer_tpu.engine.scene import FrameUniforms

    rng = np.random.default_rng(seed)
    mesh = random_soup(rng, int(rng.integers(5, 20)))
    cam = random_camera(rng)
    u = cam.uniform()
    lights = random_lights(rng, 2)
    uni = FrameUniforms(
        view_position=u.view_position, view_proj=u.view_proj,
        light_world_pos=lights[0], light_color=lights[1],
        light_intensity=lights[2], effect=EffectUniform().as_array(),
    )
    s = 2
    small = Renderer(mesh, W, H, backend="tpu", ssaa=s).render(uni)
    big = Renderer(mesh, W * s, H * s, backend="tpu").render(uni)
    want = np.asarray(box_downsample(jnp.asarray(big), s))
    np.testing.assert_array_equal(small, want)
