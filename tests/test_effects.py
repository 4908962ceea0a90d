"""Effect state machine + uniform packing vs reference src/effect.rs."""

import numpy as np

from compute_renderer_tpu.core.effects import (
    EFFECT_EDGE_MELT,
    EFFECT_MIRAGE,
    EFFECT_VOXELIZE,
    EFFECT_WAVE,
    Effect,
    EffectUniform,
    WaveDirection,
)


def test_wave_uniform_packing():
    e = Effect.wave(0.5, 2.0, 3.0, WaveDirection.RADIAL)
    e.update(0.25)  # phase += dt * speed
    u = e.uniform(scene_time=1.5)
    assert u.effect_type == EFFECT_WAVE
    assert u.param1 == 0.5
    assert u.param2 == 2.0
    assert abs(u.param3 - 0.75) < 1e-6
    assert u.param4 == 2.0  # radial
    assert u.time == 1.5


def test_edge_melt_amplitude_clamp():
    e = Effect.edge_melt(5.0, 1.0)
    assert e.amplitude == 0.33  # clamped (effect.rs:75)
    u = e.uniform(0.0)
    assert u.effect_type == EFFECT_EDGE_MELT
    assert u.param1 == 0.33


def test_voxelize_update_animation():
    e = Effect.voxelize(0.5, speed=1.0)
    # time starts 0; after dt, time=dt*speed; voxel_size=(sin(t-pi/2)+1)/2
    e.update(np.pi / 2)
    expected = (np.sin(np.float32(np.pi / 2) - np.float32(np.pi / 2)) + 1) * 0.5
    assert abs(e.voxel_size - expected) < 1e-6
    u = e.uniform(0.0)
    assert u.effect_type == EFFECT_VOXELIZE
    assert u.param1 == e.voxel_size


def test_mirage_packing_has_speed_in_param4():
    e = Effect.mirage(1.0, 2.0, 3.0)
    e.update(0.5)
    u = e.uniform(9.0)
    assert u.effect_type == EFFECT_MIRAGE
    assert u.param4 == 3.0  # mirage packs speed (effect.rs:181)
    assert abs(u.param3 - 1.5) < 1e-6


def test_uniform_array_layout():
    u = EffectUniform(effect_type=4, param1=1, param2=2, param3=3, param4=4, time=5)
    arr = u.as_array()
    assert arr.shape == (6,)
    assert arr.dtype == np.float32
    np.testing.assert_allclose(arr, [4, 1, 2, 3, 4, 5])


def test_none_effect_default():
    arr = EffectUniform().as_array()
    np.testing.assert_allclose(arr, np.zeros(6))
