"""Estimator kernels vs the independent numpy oracle."""

import numpy as np
import pytest
import scipy.sparse as sparse

from memento_tpu.ops import estimators as est
from memento_tpu.ops.compress import compress_group
from memento_tpu.ops.size_factor import bin_size_factor

import oracle


def make_counts(rng, n=400, g=30, density=0.3):
    X = rng.poisson(1.0, size=(n, g)) * (rng.random((n, g)) < density)
    X[:, 0] = rng.poisson(5.0, size=n)  # a well-expressed gene
    return X.astype(np.float64)


def test_hyper_mean_var_sparse_matches_oracle(rng):
    X = make_counts(rng)
    sf = rng.random(X.shape[0]) + 0.5
    q = 0.1
    m, v = est.mean_var_sparse(sparse.csr_matrix(X), sf, q, "hyper_relative")
    m0, v0 = oracle.hyper_mean_var(X, sf, q)
    np.testing.assert_allclose(m, m0, rtol=1e-10)
    np.testing.assert_allclose(v, v0, rtol=1e-8, atol=1e-12)


def test_poisson_mean_var_matches_oracle(rng):
    X = make_counts(rng)
    sf = rng.random(X.shape[0]) + 0.5
    m, v = est.mean_var_sparse(sparse.csr_matrix(X), sf, 0.1, "poi_relative")
    m0, v0 = oracle.poisson_mean_var(X, sf)
    np.testing.assert_allclose(m, m0, rtol=1e-10)
    np.testing.assert_allclose(v, v0, rtol=1e-8, atol=1e-12)


def test_absolute_ignores_size_factor(rng):
    X = make_counts(rng)
    sf = rng.random(X.shape[0]) + 0.5
    m, v = est.mean_var_sparse(sparse.csr_matrix(X), sf, 0.1, "hyper_absolute")
    m0, v0 = oracle.hyper_mean_var(X, np.ones(X.shape[0]), 0.1)
    np.testing.assert_allclose(m, m0, rtol=1e-10)
    np.testing.assert_allclose(v, v0, rtol=1e-8, atol=1e-12)


def test_mean_only(rng):
    X = make_counts(rng)
    sf = np.ones(X.shape[0])
    model = est.get_noise_model("mean_only")
    s1, s2, s1sq = est.suffstats_sparse(sparse.csr_matrix(X), sf)
    m, v = est.mean_var_from_suffstats(s1, s2, s1sq, X.shape[0], 0.1, model)
    np.testing.assert_allclose(np.asarray(m), X.mean(0) + 1, rtol=1e-6)
    assert np.all(np.asarray(v) == 10.0)


def test_dense_suffstats_match_sparse(rng):
    import jax.numpy as jnp

    X = make_counts(rng)
    sf = rng.random(X.shape[0]) + 0.5
    s1d, s2d, s1sqd = est.suffstats_dense(
        jnp.asarray(X, dtype=jnp.float32), jnp.asarray(1 / sf, jnp.float32),
        jnp.asarray(1 / sf**2, jnp.float32)
    )
    s1, s2, s1sq = est.suffstats_sparse(sparse.csr_matrix(X), sf)
    np.testing.assert_allclose(np.asarray(s1d), s1, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(s2d), s2, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(s1sqd), s1sq, rtol=1e-4)


def test_compressed_observed_moments_match_dense(rng):
    """Evaluating the estimator on the compressed tiles with the observed
    multiplicities must equal the dense computation with quantized sf."""
    import jax.numpy as jnp

    from memento_tpu.ops.bootstrap import observed_moments_compressed

    X = make_counts(rng)
    sf = rng.random(X.shape[0]) + 0.5
    approx_sf = bin_size_factor(sf, num_bins=10)
    q = 0.07
    comp = compress_group(sparse.csr_matrix(X), approx_sf, backend="numpy")
    model = est.get_noise_model("hyper_relative")
    m, v = observed_moments_compressed(
        jnp.asarray(comp.values),
        jnp.asarray(comp.counts),
        jnp.asarray(comp.inv_sf),
        jnp.asarray(comp.inv_sf_sq),
        comp.n_obs,
        q,
        model,
    )
    m0, v0 = oracle.hyper_mean_var(X, approx_sf, q)
    np.testing.assert_allclose(np.asarray(m), m0, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(v), v0, rtol=2e-3, atol=1e-5)


def test_cov_from_suffstats(rng):
    X = make_counts(rng)
    sf = rng.random(X.shape[0]) + 0.5
    q = 0.1
    model = est.get_noise_model("hyper_relative")
    n = X.shape[0]
    for (i, j, same) in [(0, 1, False), (2, 2, True)]:
        x, y = X[:, i], X[:, j]
        sxy = (x * y / sf**2).sum()
        s1x = (x / sf).sum()
        s1y = (y / sf).sum()
        s_diag = (x / sf**2).sum()
        got = est.cov_from_suffstats(sxy, s1x, s1y, s_diag, n, q, same, model)
        want = oracle.hyper_cov(x, y, sf, q, same_gene=same)
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-10)


def test_registry_custom_and_errors():
    assert est.get_noise_model("hyper_relative").name == "hyper_relative"
    assert est.get_noise_model((lambda: None, lambda: None)) is None
    with pytest.raises(ValueError):
        est.get_noise_model("nope")
    assert est.is_absolute("poi_absolute")
    assert not est.is_absolute("hyper_relative")
