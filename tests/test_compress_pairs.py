"""Vectorized pair compression vs the per-pair loop oracle."""

import numpy as np
import scipy.sparse as sparse

from memento_tpu.ops.compress import (
    _compress_pairs_loop,
    _compress_pairs_vectorized,
)
from memento_tpu.ops.size_factor import bin_size_factor


def _sorted_combos(c, p, u):
    arr = np.stack(
        [
            c.values_1[p, :u],
            c.values_2[p, :u],
            1.0 / c.inv_sf[p, :u],
            c.counts[p, :u],
        ],
        axis=1,
    )
    return arr[np.lexsort((arr[:, 2], arr[:, 1], arr[:, 0]))]


def test_vectorized_pairs_match_loop(rng):
    n, g = 400, 12
    X = rng.poisson(0.8, size=(n, g)).astype(np.float64)
    X[:, 5] = 0  # an empty gene in a pair
    Xs = sparse.csc_matrix(X)
    asf = bin_size_factor(rng.random(n) + 0.5, num_bins=7)
    idx1 = np.array([0, 2, 4, 5, 1, 1])
    idx2 = np.array([1, 3, 5, 5, 0, 2])  # includes reversed + self pairs

    a = _compress_pairs_loop(Xs, asf, idx1, idx2, 8, 8)
    b = _compress_pairs_vectorized(Xs, asf, idx1, idx2, 8, 8)

    np.testing.assert_array_equal(a.n_unique, b.n_unique)
    assert a.n_obs == b.n_obs
    for p in range(len(idx1)):
        u = a.n_unique[p]
        np.testing.assert_allclose(
            _sorted_combos(a, p, u), _sorted_combos(b, p, u), rtol=1e-6
        )
        # mass conservation: every cell accounted for
        np.testing.assert_allclose(b.counts[p].sum(), n)


def test_native_pairs_match_numpy(rng):
    """C++ per-pair merge kernel vs the one-lexsort numpy path: exact."""
    import pytest

    from memento_tpu.native import compress_pairs_native

    if compress_pairs_native is None:
        pytest.skip("native library unavailable")

    n, g = 600, 16
    X = rng.poisson(1.2, size=(n, g)).astype(np.float64)
    X[:, 7] = 0
    Xs = sparse.csc_matrix(X)
    asf = bin_size_factor(rng.random(n) + 0.5, num_bins=9)
    idx1 = np.array([0, 2, 4, 7, 1, 3, 3])
    idx2 = np.array([1, 3, 7, 7, 0, 3, 15])  # reversed, empty, self pairs

    a = compress_pairs_native(Xs, asf, idx1, idx2, 8, 8)
    b = _compress_pairs_vectorized(Xs, asf, idx1, idx2, 8, 8)

    np.testing.assert_array_equal(a.n_unique, b.n_unique)
    assert a.n_obs == b.n_obs
    # identical layout contract -> arrays match exactly slot-for-slot
    for field in ("values_1", "values_2", "counts", "inv_sf", "sf_bin"):
        np.testing.assert_allclose(
            getattr(a, field), getattr(b, field), rtol=1e-6,
            err_msg=field,
        )
    np.testing.assert_allclose(a.bin_inv_sf, b.bin_inv_sf, rtol=1e-6)
    for p in range(len(idx1)):
        np.testing.assert_allclose(a.counts[p].sum(), n)


def test_vectorized_pairs_empty_pairlist(rng):
    X = sparse.csc_matrix(rng.poisson(1.0, size=(50, 4)).astype(float))
    asf = bin_size_factor(rng.random(50) + 0.5, num_bins=5)
    out = _compress_pairs_vectorized(X, asf, np.array([], int),
                                     np.array([], int), 8, 8)
    assert out.counts.shape[0] == 0
