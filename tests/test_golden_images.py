"""Golden-image regression tests (SURVEY.md §4 item 3).

Fixed scenes at fixed camera poses rendered by the NumPy oracle, hashed and
compared against checked-in snapshots (tests/golden_data/). The oracle is
pure NumPy f32, so snapshots are stable per-architecture; backends are then
compared against the oracle with a small tolerance (the analog of the
reference's media/*.png progression gallery used as informal visual
regression references).

Regenerate snapshots with: python tests/make_golden_images.py
"""

from pathlib import Path

import numpy as np
import pytest

from tests.make_golden_images import CASES, render_case

DATA_DIR = Path(__file__).parent / "golden_data"


@pytest.mark.parametrize("name", list(CASES))
def test_matches_snapshot(name):
    path = DATA_DIR / f"{name}.npy"
    if not path.exists():
        pytest.skip(f"snapshot {path} not generated")
    expected = np.load(path)
    actual = render_case(name)
    # Oracle is deterministic NumPy; allow 1 LSB for libm variation across
    # CPU architectures.
    diff = np.abs(actual.astype(int) - expected.astype(int))
    assert diff.max() <= 1, f"{name}: max diff {diff.max()}"
    assert (diff > 0).mean() < 0.001


@pytest.mark.parametrize("name", ["suzanne_orbit", "cube_voxelize", "sphere_wave"])
def test_backends_match_snapshot(name):
    path = DATA_DIR / f"{name}.npy"
    if not path.exists():
        pytest.skip(f"snapshot {path} not generated")
    expected = np.load(path)

    from compute_renderer_tpu.backends import xla

    mesh, u, lights, effect, w, h = CASES[name]()
    img = xla.render(mesh, u, lights, effect, w, h)
    diff = np.abs(img.astype(int) - expected.astype(int))
    mismatched = (diff > 1).any(axis=-1)
    assert mismatched.mean() <= 0.004, f"{name}: {mismatched.sum()} px differ"
