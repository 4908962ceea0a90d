"""Golden-image snapshot definitions + regeneration script.

Each case builds (mesh, camera_uniform, lights, effect, w, h); snapshots are
rendered with the NumPy oracle and stored as .npy under tests/golden_data/.
"""

from pathlib import Path

import numpy as np

from compute_renderer_tpu.core.camera import Camera
from compute_renderer_tpu.core.effects import Effect, EffectUniform, WaveDirection
from compute_renderer_tpu.core.maths import F32
from compute_renderer_tpu.golden.rasterizer import render_golden
from compute_renderer_tpu.io import procedural

W, H = 96, 64

DEFAULT_LIGHTS = (
    np.array([[0.0, 0.0, 5.0], [-5.0, 3.0, 0.0]], dtype=F32),
    np.array([[1.0, 0.9, 0.8], [0.3, 0.4, 0.5]], dtype=F32),
    np.array([1.0, 0.5], dtype=F32),
)


def _fp_cam(w=W, h=H):
    return Camera.first_person([0, 0, 3.0], aspect=w / h).uniform()


def _orbit_cam(w=W, h=H):
    return Camera.orbit(3.0, 40.0, 15.0, [0, 0, 0], aspect=w / h).uniform()


def _effect(e, t):
    e.update(t)
    return e.uniform(t).as_array()


CASES = {
    "triangle_basic": lambda: (
        procedural.single_triangle(), _fp_cam(), DEFAULT_LIGHTS,
        EffectUniform().as_array(), W, H,
    ),
    "suzanne_orbit": lambda: (
        procedural.icosphere(2), _orbit_cam(), DEFAULT_LIGHTS,
        EffectUniform().as_array(), W, H,
    ),
    "cube_lit": lambda: (
        procedural.cube(), _fp_cam(), DEFAULT_LIGHTS,
        EffectUniform().as_array(), W, H,
    ),
    "overlap_depth": lambda: (
        _overlap_mesh(), _fp_cam(), DEFAULT_LIGHTS,
        EffectUniform().as_array(), W, H,
    ),
    "sphere_wave": lambda: (
        procedural.icosphere(2), _fp_cam(), DEFAULT_LIGHTS,
        _effect(Effect.wave(0.3, 2.0, 1.0, WaveDirection.VERTICAL), 0.7), W, H,
    ),
    "cube_voxelize": lambda: (
        procedural.cube(), _fp_cam(), DEFAULT_LIGHTS,
        _effect(Effect.voxelize(0.4, 1.0), 0.8), W, H,
    ),
    "sphere_edge_melt": lambda: (
        procedural.icosphere(2), _fp_cam(), DEFAULT_LIGHTS,
        _effect(Effect.edge_melt(0.3, 1.0), 0.5), W, H,
    ),
    "cube_mirage": lambda: (
        procedural.cube(), _fp_cam(), DEFAULT_LIGHTS,
        _effect(Effect.mirage(1.5, 0.5, 1.0), 0.4), W, H,
    ),
    "torus_orbit": lambda: (
        procedural.torus(24, 12), _orbit_cam(), DEFAULT_LIGHTS,
        EffectUniform().as_array(), W, H,
    ),
}


def _overlap_mesh():
    a = procedural.single_triangle(z=0.0)
    b = procedural.single_triangle(z=1.0)
    b.positions[:, 0] += 0.2
    m = type(a).concatenate([a, b])
    m.normals[3:] = [1, 0, 0]
    return m


def render_case(name):
    mesh, u, lights, effect, w, h = CASES[name]()
    return render_golden(
        mesh.positions, mesh.normals, mesh.uvs, mesh.indices,
        u.view_proj, u.view_position, *lights, effect, w, h,
    )


def main():
    out_dir = Path(__file__).parent / "golden_data"
    out_dir.mkdir(exist_ok=True)
    for name in CASES:
        img = render_case(name)
        np.save(out_dir / f"{name}.npy", img)
        print(f"{name}: {img.shape} covered={np.any(img != [0, 0, 255, 255], axis=-1).sum()}")


if __name__ == "__main__":
    main()
