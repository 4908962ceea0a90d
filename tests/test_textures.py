"""Texture extension: map_Kd parsing, image decode, flat atlas.

The reference defines atlas-style TextureInfo{offset,width,height} but
never binds it (custom_pipeline/util.rs:75-85); this build makes it live.
Stage-1 contracts: MTL map_Kd filename extraction (with option flags),
PPM decode round-trip, atlas packing offsets.
"""

import numpy as np

from compute_renderer_tpu.core.materials import parse_mtl
from compute_renderer_tpu.core.maths import F32
from compute_renderer_tpu.io import textures


def test_parse_map_kd_plain(tmp_path):
    p = tmp_path / "lib.mtl"
    p.write_text("newmtl a\nKd 1 0 0\nmap_Kd wood.ppm\n")
    m = parse_mtl(p)
    assert m["a"].diffuse_map == "wood.ppm"


def test_parse_map_kd_with_options_and_spaces(tmp_path):
    p = tmp_path / "lib.mtl"
    p.write_text(
        "newmtl a\nmap_Kd -o 0.5 0.5 -mm 0 1 -clamp on my texture.ppm\n"
        "newmtl b\nmap_Kd -s 2 2 2 tex.png\n"
        "newmtl c\nKd 0 1 0\n"
    )
    m = parse_mtl(p)
    assert m["a"].diffuse_map == "my texture.ppm"
    assert m["b"].diffuse_map == "tex.png"
    assert m["c"].diffuse_map is None


def test_ppm_round_trip(tmp_path):
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(5, 7, 3), dtype=np.uint8)
    p = tmp_path / "t.ppm"
    textures.write_ppm(p, img)
    out = textures.load_image(p)
    assert out.shape == (5, 7, 3)
    assert out.dtype == F32
    np.testing.assert_array_equal(
        np.round(out * 255).astype(np.uint8), img
    )


def test_ppm_ascii_and_comments(tmp_path):
    p = tmp_path / "t.ppm"
    p.write_text("P3\n# comment\n2 1\n255\n255 0 0  0 255 0\n")
    out = textures.load_image(p)
    np.testing.assert_allclose(out[0, 0], [1.0, 0.0, 0.0])
    np.testing.assert_allclose(out[0, 1], [0.0, 1.0, 0.0])


def test_atlas_offsets_and_fallback(tmp_path):
    a = np.zeros((2, 3, 3), dtype=np.uint8)
    a[..., 0] = 10
    b = np.zeros((4, 2, 3), dtype=np.uint8)
    b[..., 1] = 20
    textures.write_ppm(tmp_path / "a.ppm", a)
    textures.write_ppm(tmp_path / "b.ppm", b)
    texels, table = textures.build_atlas(
        [tmp_path / "a.ppm", tmp_path / "missing.ppm", tmp_path / "b.ppm"]
    )
    # TextureInfo rows: {offset, width, height} (util.rs:75-85).
    np.testing.assert_array_equal(table[0], [0, 3, 2])
    np.testing.assert_array_equal(table[1], [6, 1, 1])  # 1x1 white fallback
    np.testing.assert_array_equal(table[2], [7, 2, 4])
    assert texels.shape == (15, 3)
    np.testing.assert_allclose(texels[0], [10 / 255, 0, 0], rtol=1e-6)
    np.testing.assert_allclose(texels[6], [1, 1, 1])
    np.testing.assert_allclose(texels[7], [0, 20 / 255, 0], rtol=1e-6)


def test_load_image_top_row_first(tmp_path):
    img = np.zeros((2, 1, 3), dtype=np.uint8)
    img[0] = [255, 0, 0]  # top row red
    img[1] = [0, 0, 255]  # bottom row blue
    textures.write_ppm(tmp_path / "t.ppm", img)
    out = textures.load_image(tmp_path / "t.ppm")
    np.testing.assert_allclose(out[0, 0], [1, 0, 0])
    np.testing.assert_allclose(out[1, 0], [0, 0, 1])
