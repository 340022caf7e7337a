"""Direct p-value parity vs an independent numpy reference pipeline.

Re-implements the reference's per-gene flow in plain numpy (unique-value
compression, PCG multinomial bootstrap, residual variance, fill, weighted
meta-regression, counting ASL — following ``/root/reference/memento/
hypothesis_test.py:144-300``) and checks that the framework's p-values and
SEs agree within bootstrap Monte Carlo tolerance — the north-star
"p-value parity with CPU memento" criterion, evaluated against a clean-room
oracle since RNG streams differ by construction.
"""

import numpy as np
import pytest
import scipy.sparse as sparse

import jax

from memento_tpu.inference.ht import run_ht_1d
from memento_tpu.ops.estimators import HYPER_RELATIVE, mean_var_sparse
from memento_tpu.ops.mv_regression import fit_mv_regressor
from memento_tpu.ops.size_factor import bin_size_factor
from memento_tpu.api import _residual_variance_np

import oracle


def _oracle_ht_1d(x_groups, asf_groups, tm, trv, mv, q, covariate, treatment,
                  nc, num_boot, rng):
    """Numpy reference of _ht_1d + _regress_1d (counting ASL, bootstrap null)."""
    n_groups = len(x_groups)
    boot_mean = np.full((n_groups, num_boot + 1), np.nan)
    boot_var = np.full((n_groups, num_boot + 1), np.nan)
    good = np.zeros(n_groups, bool)
    for r in range(n_groups):
        if not np.isfinite(tm[r]) or not np.isfinite(trv[r]) or tm[r] == 0 \
           or trv[r] <= 0:
            continue
        vals, sfs, cnts = oracle.unique_compress(x_groups[r], asf_groups[r])
        if len(vals) <= 1:
            continue
        n = len(x_groups[r])
        draws = rng.multinomial(n, cnts / cnts.sum(), size=num_boot).T  # [U,B]
        inv_sf = 1.0 / sfs
        m1 = (vals[:, None] * draws * inv_sf[:, None]).sum(0) / n
        m2 = (
            (vals[:, None] ** 2 - (1 - q) * vals[:, None])
            * draws
            * (inv_sf**2)[:, None]
        ).sum(0) / n
        mean = m1
        var = m2 - m1**2
        rv = oracle.residual_variance(mean, var, mv)
        # _fill semantics
        mbad = ~(np.isfinite(mean) & (mean > 0))
        vbad = ~(np.isfinite(rv) & (rv > 0))
        if mbad.all() or vbad.all():
            continue
        mean[mbad] = rng.choice(mean[~mbad], mbad.sum())
        rv[vbad] = rng.choice(rv[~vbad], vbad.sum())
        boot_mean[r, 0] = np.log(tm[r])
        boot_var[r, 0] = np.log(trv[r])
        boot_mean[r, 1:] = np.log(mean)
        boot_var[r, 1:] = np.log(rv)
        good[r] = True
    if not good.any():
        return np.nan, np.nan, np.nan
    C, T = covariate[good], treatment[good]
    w = nc[good].astype(float)
    bm = boot_mean[good]
    bm_t = oracle.wls_residualize(C, bm, w)
    t_t = oracle.wls_residualize(C, T, w)
    coef = oracle.cross_coef(t_t, bm_t, w)[0]  # [B+1]
    stat = coef[0]
    null = coef[1:] - stat
    ec = ((null > abs(stat)) | (null < -abs(stat))).sum()
    pval = (ec + 1) / (len(null) + 1)
    se = np.nanstd(coef[1:])
    return coef[0], se, pval


@pytest.mark.parametrize("seed", [0, 1])
def test_pvalue_parity_vs_oracle(seed):
    rng = np.random.default_rng(seed)
    n, g, B = 1500, 12, 2000
    q = 0.1
    lam = rng.gamma(2.0, 2.0, size=(2 * n, g))
    lam[n:, :3] *= 1.5  # moderate planted effects -> informative p-values
    X = rng.poisson(lam * q).astype(float)
    groups = [sparse.csc_matrix(X[:n]), sparse.csc_matrix(X[n:])]
    sf = X.sum(1)
    sf = sf / sf.mean()
    asf = bin_size_factor(sf, 30)

    tm, tv = [], []
    for r, grp in enumerate(groups):
        m, v = mean_var_sparse(grp, sf[r * n : (r + 1) * n], q)
        tm.append(m)
        tv.append(v)
    tm, tv = np.array(tm), np.array(tv)
    mv = fit_mv_regressor(tm.ravel(), tv.ravel())
    trv = np.stack([_residual_variance_np(tm[r], tv[r], mv) for r in range(2)])
    covariate = np.ones((2, 1))
    treatment = np.array([[0.0], [1.0]])
    nc = np.array([n, n])

    got = run_ht_1d(
        jax.random.key(seed),
        groups=groups,
        approx_sf=[asf[:n], asf[n:]],
        true_mean=tm,
        true_res_var=trv,
        mv_coeffs=np.tile(mv, (2, 1)),
        q=np.full(2, q),
        covariate=covariate,
        treatment=treatment,
        num_boot=B,
        model=HYPER_RELATIVE,
        resampling="bootstrap",
        tile_size=16,
    )

    o_rng = np.random.default_rng(1234 + seed)
    for j in range(g):
        coef_o, se_o, p_o = _oracle_ht_1d(
            [np.asarray(grp[:, j].todense()).ravel() for grp in groups],
            [asf[:n], asf[n:]],
            tm[:, j],
            trv[:, j],
            mv,
            q,
            covariate,
            treatment,
            nc,
            B,
            o_rng,
        )
        coef_f = got["mean_coef"][j, 0]
        se_f = got["mean_se"][j, 0]
        p_f = got["mean_pval"][j, 0]
        if np.isnan(p_o):
            assert np.isnan(p_f)
            continue
        # coefficients are deterministic
        np.testing.assert_allclose(coef_f, coef_o, rtol=1e-4, atol=1e-6)
        # SEs within bootstrap MC tolerance
        assert abs(np.log(se_f / se_o)) < 0.25, (j, se_f, se_o)
        # p-values within MC tolerance of each other
        mc = 4 * np.sqrt(max(p_o, 1 / B) * (1 - min(p_o, 1 - 1 / B)) / B)
        assert abs(p_f - p_o) < max(0.03, mc + 0.02), (j, p_f, p_o)
