"""Unique-value compression vs a per-gene dictionary oracle."""

import numpy as np
import scipy.sparse as sparse

from memento_tpu.ops.compress import compress_group, compress_pairs
from memento_tpu.ops.size_factor import bin_size_factor, factorize_approx_sf

import oracle


def test_compress_group_exact(rng):
    n, g = 300, 12
    X = rng.poisson(0.8, size=(n, g)).astype(np.float64)
    sf = rng.random(n) + 0.5
    approx_sf = bin_size_factor(sf, num_bins=8)

    comp = compress_group(sparse.csr_matrix(X), approx_sf, backend="numpy")
    assert comp.n_obs == n
    assert comp.counts.sum() == n * g  # every cell accounted for, per gene

    for j in range(g):
        vals0, sfs0, cnts0 = oracle.unique_compress(X[:, j], approx_sf)
        order0 = np.lexsort((sfs0, vals0))
        u = comp.n_unique[j]
        vals1 = comp.values[j, :u]
        sfs1 = 1.0 / comp.inv_sf[j, :u]
        cnts1 = comp.counts[j, :u]
        order1 = np.lexsort((sfs1, vals1))
        np.testing.assert_allclose(vals1[order1], vals0[order0])
        np.testing.assert_allclose(sfs1[order1], sfs0[order0], rtol=1e-6)
        np.testing.assert_allclose(cnts1[order1], cnts0[order0])
        # padding is inert
        assert np.all(comp.counts[j, u:] == 0)


def test_compress_pairs_exact(rng):
    n, g = 200, 6
    X = rng.poisson(0.7, size=(n, g)).astype(np.float64)
    sf = rng.random(n) + 0.5
    approx_sf = bin_size_factor(sf, num_bins=5)
    idx1 = np.array([0, 2, 4])
    idx2 = np.array([1, 3, 5])
    comp = compress_pairs(sparse.csc_matrix(X), approx_sf, idx1, idx2)

    for p in range(len(idx1)):
        pairs = {}
        for i in range(n):
            k = (X[i, idx1[p]], X[i, idx2[p]], approx_sf[i])
            pairs[k] = pairs.get(k, 0) + 1
        u = comp.n_unique[p]
        want = np.array(
            sorted((a, b, c, v) for (a, b, c), v in pairs.items())
        )
        got = np.stack(
            [
                comp.values_1[p, :u],
                comp.values_2[p, :u],
                1.0 / comp.inv_sf[p, :u],
                comp.counts[p, :u],
            ],
            axis=1,
        )
        got = got[np.lexsort((got[:, 2], got[:, 1], got[:, 0]))]
        np.testing.assert_allclose(got, want, rtol=1e-5)


def test_factorize_roundtrip(rng):
    sf = rng.random(100) + 0.5
    approx = bin_size_factor(sf, num_bins=30)
    vals, ids = factorize_approx_sf(approx)
    np.testing.assert_allclose(vals[ids], approx)
    assert len(vals) <= 31


def test_bin_size_factor_max_kept(rng):
    sf = rng.random(1000) * 3 + 0.1
    approx = bin_size_factor(sf, num_bins=30)
    assert approx[np.argmax(sf)] == sf.max()
    # bin means preserve overall mass approximately
    assert abs(approx.mean() - sf.mean()) < 0.05
