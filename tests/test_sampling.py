"""Bootstrap samplers: exactness of the cascade vs the BTRS multinomial."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from memento_tpu.ops.sampling import (
    bootstrap_counts,
    fused_bootstrap_sums,
    poisson_cdf_table,
)
from memento_tpu.ops.bootstrap import bootstrap_1d
from memento_tpu.ops.estimators import HYPER_RELATIVE


def test_poisson_cdf_table():
    import scipy.stats as sstats

    lam = jnp.asarray([0.5, 3.0, 20.0])
    cdf = np.asarray(poisson_cdf_table(lam, 56))
    for i, l in enumerate([0.5, 3.0, 20.0]):
        want = sstats.poisson.cdf(np.arange(56), l)
        np.testing.assert_allclose(cdf[i], want, atol=1e-5)


def _realistic_tile(rng, t=6, u=40, n=20000):
    """counts resembling compressed scRNA tiles: one huge zeros bin plus a
    tail of small bins."""
    counts = np.zeros((t, u), np.float32)
    for i in range(t):
        k = rng.integers(10, u)
        small = rng.integers(1, 40, size=k - 1).astype(np.float32)
        counts[i, 1:k] = small
        counts[i, 0] = n - small.sum()
    return counts


def test_fused_sums_match_materialized_multinomial(rng):
    """Exact-sampler fused scan == materialized multinomial contraction
    (same per-bin conditional draws, so distributions must agree; means
    match to Monte Carlo error)."""
    n = 20000
    counts = _realistic_tile(rng, t=4, u=24, n=n)
    w = rng.random((4, 24, 2)).astype(np.float32)
    B = 4000
    key = jax.random.key(0)
    sums = np.asarray(
        fused_bootstrap_sums(key, jnp.asarray(counts), jnp.asarray(w), n, B,
                             "multinomial")
    )
    draws = np.asarray(bootstrap_counts(jax.random.key(1), jnp.asarray(counts),
                                        n, B, "multinomial"))
    ref = np.einsum("tuw,tub->twb", w, draws)
    # totals conserved exactly
    np.testing.assert_allclose(draws.sum(1), n, rtol=1e-6)
    # moments agree to MC error
    np.testing.assert_allclose(sums.mean(-1), ref.mean(-1), rtol=0.02)
    np.testing.assert_allclose(sums.std(-1), ref.std(-1), rtol=0.15, atol=1e-3)


@pytest.mark.parametrize("stat", ["mean", "var"])
def test_cascade_matches_exact_multinomial_distribution(rng, stat):
    """The cascade sampler's bootstrap distribution of the actual statistics
    (mean, variance) must match the exact multinomial sampler: same center,
    same SE within a few percent, small normalized EMD."""
    from scipy.stats import wasserstein_distance

    n, t, u, B = 20000, 6, 48, 3000
    counts = _realistic_tile(rng, t=t, u=u, n=n)
    values = np.tile(np.arange(u, dtype=np.float32), (t, 1))
    sf = (rng.random((t, u)) + 0.5).astype(np.float32)
    inv_sf = 1.0 / sf
    inv_sf_sq = inv_sf**2

    out = {}
    for sampler in ["multinomial", "cascade"]:
        m, v = bootstrap_1d(
            jax.random.key(2),
            jnp.asarray(values),
            jnp.asarray(counts),
            jnp.asarray(inv_sf),
            jnp.asarray(inv_sf_sq),
            n,
            0.1,
            HYPER_RELATIVE,
            B,
            sampler,
        )
        out[sampler] = np.asarray(m) if stat == "mean" else np.asarray(v)

    for i in range(t):
        a, b = out["multinomial"][i], out["cascade"][i]
        sd = a.std()
        assert abs(a.mean() - b.mean()) < 0.06 * sd + 1e-7, f"gene {i} center"
        assert abs(a.std() - b.std()) / sd < 0.08, f"gene {i} spread"
        emd = wasserstein_distance(a, b) / sd
        assert emd < 0.08, f"gene {i} EMD {emd}"


def test_cascade_conserves_total(rng):
    """Sum over bins of cascade draws equals N exactly for every replicate
    (the conditioning property)."""
    n = 5000
    counts = _realistic_tile(rng, t=3, u=16, n=n)
    w = np.ones((3, 16, 1), np.float32)  # weight 1 -> sums = total draws
    sums = np.asarray(
        fused_bootstrap_sums(jax.random.key(0), jnp.asarray(counts),
                             jnp.asarray(w), n, 500, "cascade")
    )
    np.testing.assert_allclose(sums[:, 0, :], n, rtol=1e-6)


def test_padded_bins_inert(rng):
    """Bins with zero count draw zero under both fused samplers."""
    n = 1000
    counts = np.zeros((2, 8), np.float32)
    counts[:, 0] = 900
    counts[:, 1] = 100
    w = np.zeros((2, 8, 1), np.float32)
    w[:, 2:, 0] = 1.0  # only padded bins weighted
    for sampler in ["cascade", "multinomial"]:
        sums = np.asarray(
            fused_bootstrap_sums(jax.random.key(0), jnp.asarray(counts),
                                 jnp.asarray(w), n, 64, sampler)
        )
        assert np.all(sums == 0.0), sampler


def test_cf_gaussian_branch_accuracy(rng):
    """Bins with lam in [tau, 3*tau) take the Cornish-Fisher Gaussian branch;
    their marginal draw distribution must track the exact Poisson closely
    (mean to ~0.2%, variance to ~2%, normalized EMD < 0.02)."""
    from scipy.stats import wasserstein_distance

    from memento_tpu.ops.sampling import (
        CASCADE_TAU,
        _approx_binomial_step,
        poisson_cdf_table,
    )

    n, B = 200000.0, 60000
    for lam in (CASCADE_TAU, 12.0, 20.0):
        ratio = jnp.asarray([lam / n], jnp.float32)
        cdf = poisson_cdf_table(jnp.asarray([lam], jnp.float32))
        remaining = jnp.full((1, B), n, jnp.float32)
        draws = np.asarray(
            _approx_binomial_step(
                jax.random.key(int(lam)), remaining, jnp.asarray([n]),
                ratio, jnp.asarray([lam]), cdf
            )
        ).ravel()
        exact = np.random.default_rng(int(lam)).poisson(lam, B)
        assert abs(draws.mean() - lam) < 0.03 + 0.002 * lam, lam
        assert abs(draws.var() / exact.var() - 1) < 0.03, lam
        emd = wasserstein_distance(draws, exact) / np.sqrt(lam)
        assert emd < 0.02, (lam, emd)
