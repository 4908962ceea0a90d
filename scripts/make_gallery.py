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


if __name__ == "__main__":
    main()
