"""Simulation suite tests, including the estimator-validation round trip
with the actual capture processes (mirrors the reference's
``estimator_validation.ipynb`` criterion)."""

import numpy as np
import pytest
import scipy.sparse as sparse

from memento_tpu.models import simulate as sim
from memento_tpu.ops.estimators import mean_var_sparse
from memento_tpu.utils.stats import concordance


def test_extract_parameters_shapes(rng):
    X = sparse.csr_matrix(rng.poisson(1.0, size=(300, 40)).astype(float))
    (xm, xv), (zm, zv), nc, good = sim.extract_parameters(X, q=0.1)
    assert xm.shape == xv.shape == zm.shape == zv.shape
    assert nc.shape == (300,)
    assert good.max() < 40


def test_nb_param_converters():
    mu, theta = 5.0, 2.0
    r, p1m = sim.convert_params_nb(mu, theta)
    # mean of scipy NB(r, p) parameterization: r (1-p)/p
    mean = r * (1 - p1m) / p1m
    np.testing.assert_allclose(mean, mu, rtol=1e-9)
    k, scale = sim.gamma_params_from_moments(4.0, 8.0)
    np.testing.assert_allclose(k * scale, 4.0)
    np.testing.assert_allclose(k * scale**2, 8.0)


def test_simulate_transcriptomes_independent(rng):
    means = np.full(10, 20.0)
    variances = np.full(10, 60.0)
    z = sim.simulate_transcriptomes(2000, means, variances, Nc=np.full(100, 200.0),
                                    norm_cov="independent", rng=rng)
    assert z.shape == (2000, 10)
    np.testing.assert_allclose(z.mean(0), 20.0, rtol=0.1)
    np.testing.assert_allclose(z.var(0), 60.0, rtol=0.25)


def test_capture_sampling_hyper_and_poisson(rng):
    z = rng.poisson(20.0, size=(200, 15))
    qs, x_h = sim.capture_sampling(z, q=0.2, process="hyper", rng=rng)
    assert x_h.shape == z.shape
    assert np.all(x_h <= z)
    # each cell captures exactly round(q * total) molecules
    np.testing.assert_array_equal(
        x_h.sum(1), np.round(0.2 * z.sum(1)).astype(int)
    )
    qs, x_p = sim.capture_sampling(z, q=0.2, process="poisson", rng=rng)
    np.testing.assert_allclose(x_p.mean(), 0.2 * z.mean(), rtol=0.05)
    # Beta-distributed per-cell efficiency
    qs, _ = sim.capture_sampling(z, q=0.2, q_sq=0.05, process="poisson", rng=rng)
    assert qs.std() > 0.01
    np.testing.assert_allclose(qs.mean(), 0.2, atol=0.05)


def test_sequencing_sampling(rng):
    z = rng.poisson(5.0, size=(50, 10))
    obs = sim.sequencing_sampling(z, num_reads=int(z.sum() * 5), rng=rng)
    assert np.all(obs <= z)
    assert obs.sum() > 0.9 * z.sum()  # deep sequencing observes most UMIs


def test_estimator_roundtrip_with_hyper_capture(rng):
    """Full reference-style validation: NB transcriptomes -> multivariate
    hypergeometric capture -> hypergeometric estimator recovers relative
    means with high concordance."""
    n_cells, n_genes = 2000, 60
    base = np.exp(rng.uniform(np.log(5.0), np.log(80.0), n_genes))
    theta = 3.0
    z = rng.poisson(rng.gamma(theta, base / theta, size=(n_cells, n_genes)))
    q = 0.15
    _, x = sim.capture_sampling(z, q=q, process="hyper", rng=rng)
    X = sparse.csr_matrix(x.astype(np.float64))
    sf = np.asarray(X.sum(axis=1)).ravel()
    sf = sf / sf.mean()
    m, v = mean_var_sparse(X, sf, q, "hyper_relative")
    true_rel = base / base.sum()
    cc = concordance(np.log(m), np.log(true_rel * x.sum(1).mean()))
    assert cc > 0.97, cc
    # variances positive for the vast majority under correct q
    assert (v > 0).mean() > 0.9
