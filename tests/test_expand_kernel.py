"""Pallas pair-expansion kernel (pallas_expand) vs the XLA formulation.

The kernel is currently default-off (correct on TPU but its Mosaic lowering
is slow — see binning.bin_cells_sort); these tests keep it bit-exact while
that is investigated.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from compute_renderer_tpu.backends import binning
from compute_renderer_tpu.backends.pallas_expand import expand_cells


def xla_ref(c, rx, x0, y0, pair_cap, ntx_t, num_cells):
    c = jnp.asarray(c)
    rx = jnp.asarray(rx)
    starts = jnp.cumsum(c) - c
    total = int(starts[-1] + c[-1])
    own = binning.expand_pair_owners(starts, c, pair_cap)
    p = jnp.arange(pair_cap, dtype=jnp.int32)
    m_starts = starts[own]
    m_rx = jnp.maximum(rx[own], 1)
    local = p - m_starts
    cx = jnp.asarray(x0)[own] + local % m_rx
    cy = jnp.asarray(y0)[own] + local // m_rx
    cell = (cy * ntx_t + cx // 16) * 16 + cx % 16
    cell = jnp.where(p < total, cell, num_cells)
    return np.asarray(cell), np.asarray(own), total


@pytest.mark.parametrize(
    "T,max_c,cap,seed",
    [
        (1000, 2, 2048, 0),
        (5000, 3, 8192, 1),
        (3000, 0, 2048, 2),   # everything culled
        (2000, 8, 4096, 3),   # bigger rects
        (4000, 3, 1024, 4),   # overflow: total > cap
        (1024, 2, 2048, 5),   # exact block multiple
        (7, 30, 1024, 6),     # tiny T, chunk crossing via large counts
    ],
)
def test_expand_cells_matches_xla(T, max_c, cap, seed):
    r = np.random.default_rng(seed)
    ntx_t, nty = 8, 96
    num_cells = ntx_t * nty * 16
    c = r.integers(0, max_c + 1, size=T).astype(np.int32)
    c[r.random(T) < 0.4] = 0
    rx = np.clip(r.integers(1, 5, size=T), 1, None).astype(np.int32)
    x0 = r.integers(0, ntx_t * 16 - 4, size=T).astype(np.int32)
    y0 = r.integers(0, nty - 4, size=T).astype(np.int32)

    cell_r, tri_r, total_r = xla_ref(c, rx, x0, y0, cap, ntx_t, num_cells)
    # Both contraction lowerings ("dim1" original, "mxu" transposed) must
    # match the XLA reference bitwise — the hardware bisect then picks the
    # faster without a correctness question.
    for form in ("dim1", "mxu"):
        cell_k, tri_k, total_k = expand_cells(
            jnp.asarray(c), jnp.asarray(rx), jnp.asarray(x0),
            jnp.asarray(y0),
            pair_cap=cap, ntx_t=ntx_t, num_cells=num_cells, interpret=True,
            form=form,
        )
        assert int(total_k) == total_r, form
        nvalid = min(total_r, cap)
        np.testing.assert_array_equal(np.asarray(cell_k)[:nvalid],
                                      cell_r[:nvalid], err_msg=form)
        np.testing.assert_array_equal(np.asarray(tri_k)[:nvalid],
                                      tri_r[:nvalid], err_msg=form)
        assert (np.asarray(cell_k)[nvalid:] == num_cells).all(), form
