"""Render the media gallery (the analog of the reference's media/*.png
progression: Triangle -> FilledTriangle -> Lighting -> SuzanneCulling etc.),
through the real engine (TPU backend when available)."""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from compute_renderer_tpu.app.headless import write_png
from compute_renderer_tpu.core.camera import Camera
from compute_renderer_tpu.core.effects import Effect, EffectUniform, WaveDirection
from compute_renderer_tpu.core.maths import F32
from compute_renderer_tpu.backends import tpu
from compute_renderer_tpu.io import procedural

W, H = 512, 384
OUT = Path(__file__).resolve().parent.parent / "media"

LIGHTS = (
    np.array([[0.0, 0.0, 5.0], [-5.0, 3.0, 0.0]], dtype=F32),
    np.array([[1.0, 0.9, 0.8], [0.3, 0.4, 0.5]], dtype=F32),
    np.array([1.0, 0.5], dtype=F32),
)


def eff(e, t):
    e.update(t)
    return e.uniform(t).as_array()


def main():
    OUT.mkdir(exist_ok=True)
    cam = Camera.first_person([0, 0, 3.0], aspect=W / H).uniform()
    orbit = Camera.orbit(3.0, 40.0, 15.0, [0, 0, 0], aspect=W / H).uniform()
    none = EffectUniform().as_array()

    cases = {
        "Triangle": (procedural.single_triangle(), cam, none),
        "Suzanne": (procedural.icosphere(3), orbit, none),
        "CubeLighting": (procedural.cube(), orbit, none),
        "Torus": (procedural.torus(), orbit, none),
        "Wave": (procedural.icosphere(3), cam,
                 eff(Effect.wave(0.3, 3.0, 1.0, WaveDirection.VERTICAL), 0.8)),
        "EdgeMelt": (procedural.icosphere(3), cam,
                     eff(Effect.edge_melt(0.25, 1.0), 0.5)),
        "Voxelize": (procedural.cube(), orbit, eff(Effect.voxelize(0.4, 1.0), 0.8)),
        "Mirage": (procedural.icosphere(3), cam,
                   eff(Effect.mirage(2.0, 0.3, 1.0), 0.4)),
    }
    for name, (mesh, u, effect) in cases.items():
        img = tpu.render(mesh, u, LIGHTS, effect, W, H)
        write_png(OUT / f"{name}.png", img)
        print(name, "->", OUT / f"{name}.png")

    # Quality extensions (engine-level): SSAA A/B on the torus, and
    # nearest-vs-bilinear atlas filtering on a low-res checker texture.
    from compute_renderer_tpu.core.types import Mesh
    from compute_renderer_tpu.engine.renderer import Renderer
    from compute_renderer_tpu.engine.scene import FrameUniforms

    def uni_from(u):
        return FrameUniforms(
            view_position=u.view_position, view_proj=u.view_proj,
            light_world_pos=LIGHTS[0], light_color=LIGHTS[1],
            light_intensity=LIGHTS[2], effect=none,
        )

    torus = procedural.torus()
    for name, kw in (("TorusAliased", {}), ("TorusSSAA4", {"ssaa": 4})):
        img = Renderer(torus, W, H, backend="tpu", **kw).render(
            uni_from(orbit))
        write_png(OUT / f"{name}.png", img)
        print(name, "->", OUT / f"{name}.png")

    n = 4
    tex = np.zeros((n, n, 3), dtype=F32)
    yy, xx = np.mgrid[0:n, 0:n]
    tex[(yy + xx) % 2 == 0] = (1.0, 0.25, 0.2)
    tex[(yy + xx) % 2 == 1] = (0.2, 0.35, 1.0)
    quad_pos = np.array(
        [[-1.01, -1.02, 0], [1.02, -1.01, 0],
         [1.01, 1.02, 0], [-1.02, 1.01, 0]], dtype=F32)
    quad = Mesh(
        positions=quad_pos,
        normals=np.tile(np.array([[0, 0, 1]], F32), (4, 1)),
        uvs=np.array([[0, 1], [1, 1], [1, 0], [0, 0]], F32),
        indices=np.array([0, 1, 2, 0, 2, 3], np.uint32),
        face_tex=np.array([0, 0], np.int32),
        texels=tex.reshape(-1, 3),
        tex_table=np.array([[0, n, n]], np.int32),
    )
    fp = Camera.first_person([0, 0, 1.6], aspect=W / H).uniform()
    for name, filt in (("TextureNearest", "nearest"),
                       ("TextureBilinear", "bilinear")):
        img = Renderer(quad, W, H, backend="tpu",
                       tex_filter=filt).render(uni_from(fp))
        write_png(OUT / f"{name}.png", img)
        print(name, "->", OUT / f"{name}.png")

    # Minified high-frequency checker (16-texel cells tiled 48x: ~2.5
    # texels per pixel): the aliasing case mips exist for.
    n2 = 16
    fine = np.zeros((n2, n2, 3), dtype=F32)
    yy2, xx2 = np.mgrid[0:n2, 0:n2]
    fine[(yy2 + xx2) % 2 == 0] = (1.0, 0.25, 0.2)
    fine[(yy2 + xx2) % 2 == 1] = (0.2, 0.35, 1.0)
    minified = Mesh(
        positions=quad.positions, normals=quad.normals,
        uvs=quad.uvs * np.float32(48.0), indices=quad.indices,
        face_tex=quad.face_tex, texels=fine.reshape(-1, 3),
        tex_table=np.array([[0, n2, n2]], np.int32),
    )
    for name, filt in (("TextureMinifiedBilinear", "bilinear"),
                       ("TextureTrilinear", "trilinear")):
        img = Renderer(minified, W, H, backend="tpu",
                       tex_filter=filt).render(uni_from(fp))
        write_png(OUT / f"{name}.png", img)
        print(name, "->", OUT / f"{name}.png")

    # Oblique ground plane with 4-texel-wide vertical stripes (they
    # survive to mip level 3): trilinear picks the MAJOR-axis LOD and
    # blurs them away mid-distance; anisotropic keeps them — the classic
    # filtered-road A/B.
    n3 = 32
    stripes = np.zeros((n3, n3, 3), dtype=F32)
    xx3 = np.arange(n3)[None, :]
    stripes[...] = np.where(((xx3 // 4) % 2 == 0)[..., None],
                            np.array([1.0, 0.85, 0.3], F32),
                            np.array([0.15, 0.2, 0.5], F32))
    ground = Mesh(
        positions=np.array(
            [[-3, -1, 1], [3, -1, 1], [3, -1, -9], [-3, -1, -9]],
            dtype=F32),
        normals=np.tile(np.array([[0, 1, 0]], F32), (4, 1)),
        uvs=np.array([[0, 1], [1, 1], [1, 0], [0, 0]], F32) * np.float32(8),
        indices=np.array([0, 1, 2, 0, 2, 3], np.uint32),
        face_tex=np.array([0, 0], np.int32),
        texels=stripes.reshape(-1, 3),
        tex_table=np.array([[0, n3, n3]], np.int32),
    )
    graze = Camera.first_person([0, -0.7, 1.6], aspect=W / H).uniform()
    for name, filt in (("GroundTrilinear", "trilinear"),
                       ("GroundAnisotropic", "anisotropic")):
        img = Renderer(ground, W, H, backend="tpu",
                       tex_filter=filt).render(uni_from(graze))
        write_png(OUT / f"{name}.png", img)
        print(name, "->", OUT / f"{name}.png")


if __name__ == "__main__":
    main()
