"""Native C++ compressor vs the numpy path (which is oracle-tested)."""

import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest
import scipy.sparse as sparse

from memento_tpu import native
from memento_tpu.ops.compress import _compress_group_numpy
from memento_tpu.ops.size_factor import bin_size_factor

NATIVE_DIR = Path(__file__).resolve().parent.parent / "memento_tpu" / "native"


def _ensure_built():
    if native.available():
        return True
    try:
        subprocess.run(["make"], cwd=NATIVE_DIR, check=True,
                       capture_output=True, timeout=120)
    except Exception:
        return False
    # reset the loader cache
    native._LIB = None
    return native.available()


@pytest.mark.skipif(not _ensure_built(), reason="native build unavailable")
def test_native_matches_numpy(rng):
    n, g = 500, 25
    X = rng.poisson(0.9, size=(n, g)).astype(np.float64)
    X[:, 3] = 0  # an all-zero gene
    sf = rng.random(n) + 0.5
    approx_sf = bin_size_factor(sf, num_bins=12)
    Xs = sparse.csr_matrix(X)

    ref = _compress_group_numpy(Xs, approx_sf, 8, 8)
    got = native._compress_group_native(Xs, approx_sf, 8, 8)
    assert got is not None

    np.testing.assert_array_equal(got.n_unique, ref.n_unique)
    assert got.n_obs == ref.n_obs
    for j in range(g):
        u = ref.n_unique[j]
        # compare as sorted combo sets (slot order within zero/nonzero parts
        # is an implementation detail)
        def combos(c, j, u):
            arr = np.stack(
                [c.values[j, :u], 1.0 / c.inv_sf[j, :u], c.counts[j, :u]],
                axis=1,
            )
            return arr[np.lexsort((arr[:, 1], arr[:, 0]))]

        np.testing.assert_allclose(combos(got, j, u), combos(ref, j, u),
                                   rtol=1e-6)
        assert np.all(got.counts[j, u:] == 0)
        assert np.all(got.inv_sf[j, u:] == 1.0)


@pytest.mark.skipif(not _ensure_built(), reason="native build unavailable")
def test_native_speed_sanity(rng):
    """Native path should not be slower than numpy on a realistic slab."""
    import time

    n, g = 20000, 400
    X = sparse.random(n, g, density=0.15, format="csr",
                      data_rvs=lambda k: rng.poisson(2.0, k) + 1,
                      random_state=np.random.RandomState(0))
    approx_sf = bin_size_factor(rng.random(n) + 0.5, num_bins=30)

    t0 = time.time()
    a = _compress_group_numpy(X, approx_sf, 8, 8)
    t_np = time.time() - t0
    t0 = time.time()
    b = native._compress_group_native(X, approx_sf, 8, 8)
    t_na = time.time() - t0
    np.testing.assert_array_equal(a.n_unique, b.n_unique)
    sys.stderr.write(f"\ncompress: numpy {t_np*1e3:.1f}ms native {t_na*1e3:.1f}ms\n")
    assert t_na < t_np * 2.0  # sanity; typically much faster


@pytest.mark.skipif(not _ensure_built(), reason="native build unavailable")
def test_native_suffstats_matches_scipy(rng):
    """Fused CSR suffstats pass == the scipy CSC formulation (f64 exact)."""
    from memento_tpu.native import (col_sums_csr_native, row_sums_csr_native,
                                    suffstats_csr_native)

    n, g = 4000, 300
    X = sparse.random(n, g, density=0.12, format="csr",
                      data_rvs=lambda k: np.random.default_rng(3).poisson(3.0, k) + 1,
                      random_state=np.random.RandomState(1)).astype(np.float32)
    X[:, 7] = 0  # all-zero gene
    X.eliminate_zeros()
    sf = rng.random(n) + 0.5

    Xc = X.tocsc()
    inv = (1.0 / sf).reshape(1, -1)
    s1o = np.asarray(inv @ Xc).ravel()
    s2o = np.asarray(inv**2 @ Xc.power(2)).ravel()
    s1sqo = np.asarray(inv**2 @ Xc).ravel()
    s1, s2, s1sq = suffstats_csr_native(X, sf)
    np.testing.assert_allclose(s1, s1o, rtol=1e-12)
    np.testing.assert_allclose(s2, s2o, rtol=1e-12)
    np.testing.assert_allclose(s1sq, s1sqo, rtol=1e-12)

    mask = rng.random(g) < 0.3
    rt, mt = row_sums_csr_native(X, mask=mask)
    np.testing.assert_allclose(rt, np.asarray(X.sum(axis=1)).ravel(), rtol=1e-12)
    np.testing.assert_allclose(
        mt, np.asarray(X.multiply(mask.reshape(1, -1)).sum(axis=1)).ravel(),
        rtol=1e-12)

    cs, cn = col_sums_csr_native(X)
    np.testing.assert_allclose(cs, np.asarray(X.sum(axis=0)).ravel(), rtol=1e-12)
    np.testing.assert_array_equal(cn, np.diff(X.tocsc().indptr))


@pytest.mark.skipif(not _ensure_built(), reason="native build unavailable")
def test_suffstats_sparse_uses_native_and_agrees(rng):
    """The public host moment path gives identical results CSR (native)
    vs CSC (scipy fallback)."""
    from memento_tpu.ops.estimators import mean_var_sparse

    n, g = 3000, 200
    X = sparse.random(n, g, density=0.1, format="csr",
                      data_rvs=lambda k: np.random.default_rng(5).poisson(2.0, k) + 1,
                      random_state=np.random.RandomState(2)).astype(np.float32)
    sf = rng.random(n) + 0.5
    m1, v1 = mean_var_sparse(X, sf, 0.1)
    m2, v2 = mean_var_sparse(X.tocsc(), sf, 0.1)
    np.testing.assert_allclose(m1, m2, rtol=1e-10)
    np.testing.assert_allclose(v1, v2, rtol=1e-8, atol=1e-12)


@pytest.mark.skipif(not _ensure_built(), reason="native build unavailable")
def test_native_suffstats_csc_matches_scipy(rng):
    from memento_tpu.native import suffstats_csc_native

    n, g = 4000, 300
    X = sparse.random(n, g, density=0.12, format="csc",
                      data_rvs=lambda k: np.random.default_rng(4).poisson(3.0, k) + 1,
                      random_state=np.random.RandomState(6)).astype(np.float32)
    sf = rng.random(n) + 0.5
    inv = (1.0 / sf).reshape(1, -1)
    s1o = np.asarray(inv @ X).ravel()
    s2o = np.asarray(inv**2 @ X.power(2)).ravel()
    s1sqo = np.asarray(inv**2 @ X).ravel()
    s1, s2, s1sq = suffstats_csc_native(X, sf)
    np.testing.assert_allclose(s1, s1o, rtol=1e-12)
    np.testing.assert_allclose(s2, s2o, rtol=1e-12)
    np.testing.assert_allclose(s1sq, s1sqo, rtol=1e-12)


@pytest.mark.skipif(not _ensure_built(), reason="native build unavailable")
def test_native_pair_prods_matches_scipy(rng):
    from memento_tpu.native import pair_prods_csc_native

    n, g = 3000, 120
    X = sparse.random(n, g, density=0.15, format="csc",
                      data_rvs=lambda k: np.random.default_rng(8).poisson(2.0, k) + 1,
                      random_state=np.random.RandomState(9)).astype(np.float32)
    sf = rng.random(n) + 0.5
    idx1 = rng.integers(0, g, 200)
    idx2 = rng.integers(0, g, 200)
    idx2[:20] = idx1[:20]  # same-gene pairs (diagonal path)
    w2 = (1.0 / sf) ** 2
    got = pair_prods_csc_native(X, w2, idx1, idx2)
    inv2 = sparse.diags(w2)
    ref = np.asarray(
        (X[:, idx1].multiply(inv2 @ X[:, idx2])).sum(axis=0)).ravel()
    np.testing.assert_allclose(got, ref, rtol=1e-10)


@pytest.mark.skipif(not _ensure_built(), reason="native build unavailable")
def test_range_packer_matches_numpy(rng):
    """Zero-copy column-range packer == numpy oracle on the matching slice,
    across index dtypes (int32/int64), data dtypes (f32/f64) and ranges."""
    if native.compress_group_range_native is None:
        pytest.skip("range packer symbol unavailable")
    n, g = 700, 23
    X = rng.poisson(0.9, size=(n, g)).astype(np.float64)
    X[:, 3] = 0  # an all-zero gene
    sf = rng.random(n) + 0.5
    approx_sf = bin_size_factor(sf, num_bins=12)

    def combos(c, j, u):
        arr = np.stack(
            [c.values[j, :u], 1.0 / c.inv_sf[j, :u], c.counts[j, :u]],
            axis=1,
        )
        return arr[np.lexsort((arr[:, 1], arr[:, 0]))]

    variants = []
    base = sparse.csc_matrix(X)
    variants.append(base)
    variants.append(sparse.csc_matrix(X.astype(np.float32)))
    wide = base.copy()
    wide.indices = wide.indices.astype(np.int64)
    wide.indptr = wide.indptr.astype(np.int64)
    variants.append(wide)

    for Xs in variants:
        for (a, b) in [(0, g), (4, 17), (17, g), (0, 1)]:
            got = native.compress_group_range_native(Xs, approx_sf, a, b)
            assert got is not None
            ref = _compress_group_numpy(base[:, a:b], approx_sf, 8, 8)
            np.testing.assert_array_equal(got.n_unique, ref.n_unique)
            assert got.n_obs == n
            for j in range(b - a):
                u = ref.n_unique[j]
                np.testing.assert_allclose(combos(got, j, u),
                                           combos(ref, j, u), rtol=1e-6)
                assert np.all(got.counts[j, u:] == 0)
            # compact-transport ids reconstruct inv_sf exactly
            if got.sf_bin is not None:
                np.testing.assert_array_equal(
                    got.bin_inv_sf[got.sf_bin], got.inv_sf)


@pytest.mark.skipif(not _ensure_built(), reason="native build unavailable")
def test_range_packer_fractional_falls_back(rng):
    """Non-integral data must not take the truncating range kernel."""
    if native.compress_group_range_native is None:
        pytest.skip("range packer symbol unavailable")
    n, g = 300, 5
    X = sparse.csc_matrix(rng.poisson(1.0, size=(n, g)) + 0.5)
    sf = rng.random(n) + 0.5
    approx_sf = bin_size_factor(sf, num_bins=8)
    assert native.compress_group_range_native(X, approx_sf, 0, g) is None
    # the public entry still works via the rounding fallback
    from memento_tpu.ops.compress import compress_group
    got = compress_group(X, approx_sf, cols=(1, 4))
    ref = _compress_group_numpy(X[:, 1:4], approx_sf, 8, 8)
    np.testing.assert_array_equal(got.n_unique, ref.n_unique)


@pytest.mark.skipif(not _ensure_built(), reason="native build unavailable")
def test_range_prep_cache_invalidates_on_new_sf(rng):
    """The per-matrix prep cache must key on the size-factor ARRAY, not its
    id() (a freed array's address can be reused) — new factors recompute."""
    if native.compress_group_range_native is None:
        pytest.skip("range packer symbol unavailable")
    n, g = 400, 6
    X = sparse.csc_matrix(rng.poisson(1.0, (n, g)).astype(np.float64))
    sf = rng.random(n) + 0.5
    asf1 = bin_size_factor(sf, 8)
    got1 = native.compress_group_range_native(X, asf1, 0, g)
    asf2 = bin_size_factor(sf * rng.random(n), 24)  # different binning
    got2 = native.compress_group_range_native(X, asf2, 0, g)
    ref2 = _compress_group_numpy(X, asf2, 8, 8)
    np.testing.assert_array_equal(got2.n_unique, ref2.n_unique)
    assert got2.bin_inv_sf.shape != got1.bin_inv_sf.shape or not np.allclose(
        got2.bin_inv_sf, got1.bin_inv_sf)


@pytest.mark.skipif(not _ensure_built(), reason="native build unavailable")
def test_range_packer_rejects_negative_data(rng):
    """Negative integral data would index the C++ histogram with negative
    codes (heap corruption) — the gate must refuse, numpy fallback engages."""
    if native.compress_group_range_native is None:
        pytest.skip("range packer symbol unavailable")
    n, g = 300, 4
    X = rng.poisson(1.0, (n, g)).astype(np.float64)
    X[0, 0] = -3.0  # integral but negative
    Xs = sparse.csc_matrix(X)
    sf = rng.random(n) + 0.5
    asf = bin_size_factor(sf, 8)
    assert native.compress_group_range_native(Xs, asf, 0, g) is None
    from memento_tpu.ops.compress import compress_group
    got = compress_group(Xs, asf, cols=(0, g))  # falls back safely
    assert got.n_obs == n
