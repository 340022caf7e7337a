"""Side-by-side parity vs the ACTUAL reference code at ``/root/reference``.

Earlier rounds proved p-value parity against a clean-room numpy oracle
(``tests/test_pvalue_parity.py``); a shared misreading of the reference
could in principle slip past that.  This module closes the gap by importing
the reference's own modules (read-only; its unused heavy imports —
statsmodels, patsy, scanpy — are stubbed in ``sys.modules``) and comparing
three layers:

A. **Estimator level, shared draws** — my compressed-tuple moment kernels
   consume the reference's OWN ``_unique_expr`` tuples and ``gen.multinomial``
   draws and must match ``_estimator_1d`` / ``_estimator_cov`` /
   ``_corr_from_cov`` near-exactly (f64 via ``jax.enable_x64``).
B. **Regression/ASL level, shared boot matrices** — my WLS residualize +
   cross-coefficient + counting/approx ASL on the SAME ``boot_mean`` /
   ``boot_var`` / ``boot_corr`` matrices vs ``_regress_1d`` / ``_regress_2d``
   / ``_compute_asl`` (deterministic given the matrices), covering
   bootstrap / permutation / approx / one-sample / resample_rep and the
   GEV tail-refinement path.
C. **End to end, independent draws** — ``run_ht_1d`` / ``run_ht_2d`` vs the
   reference's per-gene ``_ht_1d`` / ``_ht_2d`` on identical datasets:
   exact coefficient agreement (the observed column is deterministic) and
   SE / p-value agreement within bootstrap Monte-Carlo tolerance.

Reference call stacks under test: ``hypothesis_test.py:57-141`` (ASL),
``144-300`` (1D), ``303-415`` (2D); ``bootstrap.py:40-116``;
``estimator.py:84-292``.
"""

import sys
import types

import numpy as np
import pytest
import scipy.sparse as sparse

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Import the reference package with its unused heavy deps stubbed out
# ---------------------------------------------------------------------------

def _import_reference():
    for name in (
        "statsmodels",
        "statsmodels.api",
        "statsmodels.stats",
        "statsmodels.stats.multitest",
        "patsy",
        "scanpy",
    ):
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)

    def _unavailable(*a, **k):  # loud failure if a stub is ever CALLED
        raise NotImplementedError("stubbed reference dependency was called")

    sys.modules["statsmodels.stats.multitest"].fdrcorrection = _unavailable
    sys.modules["patsy"].dmatrix = _unavailable
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    import memento.bootstrap as rbs
    import memento.estimator as rest
    import memento.hypothesis_test as rht

    return rht, rbs, rest


try:
    RHT, RBS, REST = _import_reference()
    _REF_ERR = None
except Exception as e:  # pragma: no cover - env-dependent
    RHT = RBS = REST = None
    _REF_ERR = repr(e)

pytestmark = pytest.mark.skipif(
    RHT is None, reason=f"reference package not importable: {_REF_ERR}")


# ---------------------------------------------------------------------------
# Shared helpers
# ---------------------------------------------------------------------------

Q = 0.1


def _binned_sf(X_all):
    """Total-count size factors, binned the way the pipeline ships them."""
    from memento_tpu.ops.size_factor import bin_size_factor

    sf = np.asarray(X_all.sum(1)).ravel().astype(np.float64)
    sf = sf / sf.mean()
    sf[sf == 0] = 1.0  # all-zero cells: avoid div-by-zero in the reference
    return bin_size_factor(sf, 30)


def _dataset_1d(seed, n=500, g=10, R=4, base_offset=0.3):
    """R=4 groups (2 ctrl / 2 stim), planted 1.6x effect on genes 0-1,
    gene g-1 identically zero (NaN-path probe)."""
    rng = np.random.default_rng(seed)
    base = rng.gamma(2.0, 2.0, size=g) + base_offset
    treat_of_group = np.array([0.0, 0.0, 1.0, 1.0])
    effect = np.ones(g)
    effect[:2] = 1.6
    blocks = []
    for r in range(R):
        lam = base[None, :] * (effect ** treat_of_group[r])[None, :]
        lam = lam * rng.gamma(3.0, 1 / 3.0, size=(n, 1))
        X = rng.poisson(lam * Q).astype(np.float64)
        X[:, g - 1] = 0.0
        blocks.append(X)
    X_all = sparse.csc_matrix(np.concatenate(blocks, axis=0))
    asf = _binned_sf(X_all)
    groups = [sparse.csc_matrix(b) for b in blocks]
    asf_groups = [asf[r * n:(r + 1) * n] for r in range(R)]
    covariate = np.ones((R, 1))
    treatment = treat_of_group.reshape(-1, 1)
    nc = np.full(R, n)
    return groups, asf_groups, covariate, treatment, nc


def _observed_1d(groups, asf_groups):
    """True moments + mv fit via MY pipeline components (their parity with
    the reference's sparse estimators is pinned separately below)."""
    from memento_tpu.api import _residual_variance_np
    from memento_tpu.ops.estimators import mean_var_sparse
    from memento_tpu.ops.mv_regression import fit_mv_regressor

    tm, tv = [], []
    for grp, asf in zip(groups, asf_groups):
        m, v = mean_var_sparse(grp, asf, Q)
        tm.append(m)
        tv.append(v)
    tm, tv = np.array(tm), np.array(tv)
    mv = fit_mv_regressor(tm.ravel(), tv.ravel())
    trv = np.stack([_residual_variance_np(tm[r], tv[r], mv)
                    for r in range(len(groups))])
    return tm, tv, trv, mv


def _ref_tuples(col, asf):
    """The reference's own unique-value compression for one gene column."""
    np.random.seed(0)  # _unique_expr hashes with np.random
    return RBS._unique_expr(sparse.csc_matrix(col.reshape(-1, 1)), asf)


def _se_close(mine, ref, tol=0.25):
    """SEs agree in log-ratio; NaN (degenerate-contrast genes) must match."""
    if np.isnan(ref) or np.isnan(mine):
        return np.isnan(ref) and np.isnan(mine)
    return abs(np.log(mine / ref)) < tol


def _mc_close(p_ref, p_mine, B):
    if np.isnan(p_ref):
        return np.isnan(p_mine)
    if p_ref < 0.01 and p_mine < 0.01:
        return True  # both deep in the tail; MC/GEV noise dominates there
    mc = 4 * np.sqrt(max(p_ref, 1 / B) * (1 - min(p_ref, 1 - 1 / B)) / B)
    return abs(p_ref - p_mine) < max(0.03, mc + 0.02)


# ---------------------------------------------------------------------------
# A. Estimator level — shared draws through BOTH moment kernels
# ---------------------------------------------------------------------------

def test_estimator_1d_shared_draws():
    """mean_var_compressed == the reference _estimator_1d on ITS tuples."""
    from memento_tpu.ops.estimators import (HYPER_RELATIVE, MEAN_ONLY,
                                            POI_RELATIVE,
                                            mean_var_compressed)

    rng = np.random.default_rng(3)
    n = 800
    col = rng.poisson(1.2, n).astype(np.float64)
    asf = _binned_sf(sparse.csc_matrix(
        np.column_stack([col, rng.poisson(2.0, n)])))
    inv_sf, inv_sf_sq, expr, counts = _ref_tuples(col, asf)
    B = 64
    gen = np.random.Generator(np.random.PCG64(5))
    draws = gen.multinomial(n, counts / counts.sum(), size=B).T  # [U, B]

    cases = [
        (REST._hyper_1d_relative, HYPER_RELATIVE),
        (REST._poisson_1d_relative, POI_RELATIVE),
        (REST._mean_only_1p, MEAN_ONLY),
    ]
    with jax.enable_x64():
        for ref_fn, model in cases:
            if ref_fn is REST._poisson_1d_relative:
                ref_m, ref_v = ref_fn(
                    data=(expr, draws), n_obs=n,
                    size_factor=(inv_sf, inv_sf_sq))
            else:
                ref_m, ref_v = ref_fn(
                    data=(expr, draws), n_obs=n, q=Q,
                    size_factor=(inv_sf, inv_sf_sq))
            my_m, my_v = mean_var_compressed(
                jnp.asarray(expr.ravel()),
                jnp.asarray(draws, jnp.float64),
                jnp.asarray(inv_sf.ravel()),
                jnp.asarray(inv_sf_sq.ravel()),
                n, Q, model)
            np.testing.assert_allclose(np.asarray(my_m), np.asarray(ref_m),
                                       rtol=1e-9, atol=1e-12)
            np.testing.assert_allclose(np.asarray(my_v), np.asarray(ref_v),
                                       rtol=1e-9, atol=1e-12)


def test_estimator_cov_corr_shared_draws():
    """cov_compressed / corr_from_cov == _hyper_cov_relative /
    _corr_from_cov on the reference's own joint tuples."""
    from memento_tpu.ops.estimators import (HYPER_RELATIVE, cov_compressed,
                                            corr_from_cov,
                                            mean_var_compressed)

    rng = np.random.default_rng(4)
    n = 800
    z = rng.gamma(2.0, 1.0, n)
    x1 = rng.poisson(z * 0.8)
    x2 = rng.poisson(z * 1.1)
    pair = sparse.csc_matrix(np.column_stack([x1, x2]).astype(np.float64))
    # size factors from a WIDE matrix (as the pipeline computes them) so the
    # bootstrap variance estimates are healthy and real correlations flow
    wide = sparse.csc_matrix(np.column_stack(
        [x1, x2] + [rng.poisson(2.0, n) for _ in range(10)]).astype(float))
    asf = _binned_sf(wide)
    np.random.seed(0)
    inv_sf, inv_sf_sq, expr, counts = RBS._unique_expr(pair, asf)
    B = 64
    gen = np.random.Generator(np.random.PCG64(5))
    draws = gen.multinomial(n, counts / counts.sum(), size=B).T

    ref_cov = REST._hyper_cov_relative(
        data=(expr[:, 0].reshape(-1, 1), expr[:, 1].reshape(-1, 1), draws),
        n_obs=n, size_factor=(inv_sf, inv_sf_sq), q=Q)
    _, ref_v1 = REST._hyper_1d_relative(
        data=(expr[:, 0].reshape(-1, 1), draws), n_obs=n, q=Q,
        size_factor=(inv_sf, inv_sf_sq))
    _, ref_v2 = REST._hyper_1d_relative(
        data=(expr[:, 1].reshape(-1, 1), draws), n_obs=n, q=Q,
        size_factor=(inv_sf, inv_sf_sq))
    ref_corr = REST._corr_from_cov(
        np.asarray(ref_cov, np.float64).copy(),
        np.asarray(ref_v1, np.float64).copy(),
        np.asarray(ref_v2, np.float64).copy(), boot=True)

    with jax.enable_x64():
        my_cov = cov_compressed(
            jnp.asarray(expr[:, 0]), jnp.asarray(expr[:, 1]),
            jnp.asarray(draws, jnp.float64),
            jnp.asarray(inv_sf.ravel()), jnp.asarray(inv_sf_sq.ravel()), n)
        _, my_v1 = mean_var_compressed(
            jnp.asarray(expr[:, 0]), jnp.asarray(draws, jnp.float64),
            jnp.asarray(inv_sf.ravel()), jnp.asarray(inv_sf_sq.ravel()),
            n, Q, HYPER_RELATIVE)
        _, my_v2 = mean_var_compressed(
            jnp.asarray(expr[:, 1]), jnp.asarray(draws, jnp.float64),
            jnp.asarray(inv_sf.ravel()), jnp.asarray(inv_sf_sq.ravel()),
            n, Q, HYPER_RELATIVE)
        my_corr = corr_from_cov(my_cov, my_v1, my_v2)

    np.testing.assert_allclose(np.asarray(my_cov), np.asarray(ref_cov),
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(my_corr), ref_corr,
                               rtol=1e-9, atol=1e-12, equal_nan=True)
    # real correlations actually flowed (not the invalid-variance sentinel)
    assert np.isfinite(ref_corr).all() and (np.abs(ref_corr) < 1).any()

    # degenerate variances (invalid-variance replicates): the reference's
    # 5.0 sentinel is clipped to 1.0 — NOT NaN; my kernel must match
    neg_v = np.full_like(np.asarray(my_v1), -0.5)
    ref_sentinel = REST._corr_from_cov(
        np.asarray(ref_cov, np.float64).copy(), neg_v.copy(),
        np.asarray(ref_v2, np.float64).copy(), boot=True)
    with jax.enable_x64():
        my_sentinel = corr_from_cov(my_cov, jnp.asarray(neg_v), my_v2)
    assert (ref_sentinel == 1.0).all()
    np.testing.assert_array_equal(np.asarray(my_sentinel), ref_sentinel)


def test_observed_sparse_moments_and_mv_fit():
    """mean_var_sparse / fit_mv_regressor / _residual_variance_np match the
    reference's sparse estimator + polyfit + residual variance exactly."""
    from memento_tpu.api import _residual_variance_np
    from memento_tpu.ops.estimators import mean_var_sparse
    from memento_tpu.ops.mv_regression import fit_mv_regressor

    groups, asf_groups, *_ = _dataset_1d(seed=11)
    grp, asf = groups[0], asf_groups[0]
    ref_m, ref_v = REST._hyper_1d_relative(
        grp.tocsc(), n_obs=grp.shape[0], q=Q, size_factor=asf)
    my_m, my_v = mean_var_sparse(grp, asf, Q)
    np.testing.assert_allclose(my_m, np.asarray(ref_m).ravel(),
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(my_v, np.asarray(ref_v).ravel(),
                               rtol=1e-9, atol=1e-12)

    ref_fit = REST._fit_mv_regressor(np.asarray(ref_m).ravel().copy(),
                                     np.asarray(ref_v).ravel().copy())
    my_fit = fit_mv_regressor(my_m, my_v)
    np.testing.assert_allclose(my_fit, ref_fit, rtol=1e-9)

    ref_rv = REST._residual_variance(np.asarray(ref_m).ravel(),
                                     np.asarray(ref_v).ravel(), ref_fit)
    my_rv = _residual_variance_np(my_m, my_v, my_fit)
    np.testing.assert_allclose(my_rv, ref_rv, rtol=1e-9, equal_nan=True)


# ---------------------------------------------------------------------------
# B. Regression / ASL level — shared boot matrices
# ---------------------------------------------------------------------------

def _boot_matrices(rng, R=4, B=3000, scale=0.05, shift=0.12):
    """Synthetic finite boot matrices with a modest treatment effect."""
    treatment = np.array([0.0, 0.0, 1.0, 1.0]).reshape(-1, 1)
    base = rng.normal(0.0, 1.0, size=(R, 1))
    boot = base + rng.normal(0, scale, size=(R, B + 1))
    boot += shift * treatment
    boot[:, 0] = base.ravel() + shift * treatment.ravel()
    return boot, treatment


def _refine_scipy(coef, pvals, needs, resampling):
    """Refine flagged rows with the scipy-port ``gev_refine`` (bit-parity
    with the reference's procedure; the batched Nelder-Mead variant is
    tolerance-compared in ``test_compute_asl_gev_tail_parity``)."""
    from memento_tpu.inference.asl import gev_refine

    out = np.asarray(pvals, np.float64).copy()
    for i in np.nonzero(np.asarray(needs, bool))[0]:
        stat = coef[i, 0]
        null = coef[i, 1:]
        if resampling == "bootstrap":
            null = null - stat
        out[i] = gev_refine(stat, null, out[i])
    return out


@pytest.mark.parametrize("resampling,approx", [
    ("bootstrap", False), ("permutation", False), ("bootstrap", True),
])
def test_regress_1d_shared_boot(resampling, approx):
    """_regress_1d on shared boot matrices: coef, SE and ASL all agree."""
    from memento_tpu.inference.asl import asl_counting
    from memento_tpu.inference.regression import meta_regress

    rng = np.random.default_rng(7)
    boot_mean, treatment = _boot_matrices(rng)
    boot_var, _ = _boot_matrices(rng, shift=-0.08)
    R, B1 = boot_mean.shape
    covariate = np.ones((R, 1))
    nc = np.array([300.0, 500.0, 400.0, 350.0])

    ref = RHT._regress_1d(
        covariate=covariate, treatment=treatment,
        boot_mean=boot_mean.copy(), boot_var=boot_var.copy(),
        Nc_list=nc.copy(), resampling=resampling, approx=approx)
    ref_mean_coef, ref_mean_se, ref_mean_asl = ref[0], ref[1], ref[2]
    ref_var_coef, ref_var_se, ref_var_asl = ref[3], ref[4], ref[5]

    with jax.enable_x64():
        coef_m = np.asarray(meta_regress(
            jnp.asarray(covariate), jnp.asarray(treatment),
            jnp.asarray(boot_mean), jnp.asarray(nc), one_sample=False))
        coef_v = np.asarray(meta_regress(
            jnp.asarray(covariate), jnp.asarray(treatment),
            jnp.asarray(boot_var), jnp.asarray(nc), one_sample=False))
        p_m, needs_m = asl_counting(jnp.asarray(coef_m), resampling, approx)
        p_v, needs_v = asl_counting(jnp.asarray(coef_v), resampling, approx)
    p_m = _refine_scipy(coef_m, np.asarray(p_m), np.asarray(needs_m),
                        resampling)
    p_v = _refine_scipy(coef_v, np.asarray(p_v), np.asarray(needs_v),
                        resampling)

    np.testing.assert_allclose(coef_m[:, 0], ref_mean_coef,
                               rtol=1e-5, atol=1e-9)
    np.testing.assert_allclose(coef_v[:, 0], ref_var_coef,
                               rtol=1e-5, atol=1e-9)
    np.testing.assert_allclose(np.nanstd(coef_m[:, 1:], axis=1), ref_mean_se,
                               rtol=1e-5)
    np.testing.assert_allclose(np.nanstd(coef_v[:, 1:], axis=1), ref_var_se,
                               rtol=1e-5)
    # ASL: deterministic given the coef rows (counting or normal fit)
    np.testing.assert_allclose(p_m, ref_mean_asl, rtol=1e-4, atol=1e-9)
    np.testing.assert_allclose(p_v, ref_var_asl, rtol=1e-4, atol=1e-9)


def test_regress_1d_one_sample_shared_boot():
    """treatment == 1 -> weighted average; reference hypothesis_test.py:262."""
    from memento_tpu.inference.asl import asl_counting
    from memento_tpu.inference.regression import meta_regress

    rng = np.random.default_rng(8)
    boot_mean, _ = _boot_matrices(rng)
    boot_var, _ = _boot_matrices(rng)
    R = boot_mean.shape[0]
    covariate = np.ones((R, 1))
    treatment = np.ones((R, 1))
    nc = np.array([300.0, 500.0, 400.0, 350.0])

    ref = RHT._regress_1d(
        covariate=covariate, treatment=treatment,
        boot_mean=boot_mean.copy(), boot_var=boot_var.copy(),
        Nc_list=nc.copy(), resampling="bootstrap")
    with jax.enable_x64():
        coef_m = np.asarray(meta_regress(
            jnp.asarray(covariate), jnp.asarray(treatment),
            jnp.asarray(boot_mean), jnp.asarray(nc), one_sample=True))
        p_m, needs_m = asl_counting(jnp.asarray(coef_m), "bootstrap", False)
    p_m = _refine_scipy(coef_m, np.asarray(p_m), np.asarray(needs_m),
                        "bootstrap")
    np.testing.assert_allclose(coef_m[:, 0], ref[0], rtol=1e-9)
    np.testing.assert_allclose(np.nanstd(coef_m[:, 1:], axis=1), ref[1],
                               rtol=1e-9)
    np.testing.assert_allclose(p_m, ref[2], rtol=1e-4, atol=1e-12)


def test_regress_2d_shared_boot():
    from memento_tpu.inference.asl import asl_counting
    from memento_tpu.inference.regression import meta_regress

    rng = np.random.default_rng(9)
    boot_corr, treatment = _boot_matrices(rng, scale=0.03, shift=0.1)
    boot_corr = np.tanh(boot_corr)  # keep in correlation range
    R = boot_corr.shape[0]
    covariate = np.ones((R, 1))
    nc = np.array([250.0, 450.0, 380.0, 300.0])

    ref_coef, ref_se, ref_asl = RHT._regress_2d(
        covariate=covariate, treatment=treatment,
        boot_corr=boot_corr.copy(), Nc_list=nc.copy(),
        resampling="bootstrap")
    with jax.enable_x64():
        coef = np.asarray(meta_regress(
            jnp.asarray(covariate), jnp.asarray(treatment),
            jnp.asarray(boot_corr), jnp.asarray(nc), one_sample=False))
        p, needs = asl_counting(jnp.asarray(coef), "bootstrap", False)
    p = _refine_scipy(coef, np.asarray(p), np.asarray(needs), "bootstrap")
    np.testing.assert_allclose(coef[:, 0], ref_coef, rtol=1e-5, atol=1e-9)
    np.testing.assert_allclose(np.nanstd(coef[:, 1:], axis=1), ref_se,
                               rtol=1e-5)
    np.testing.assert_allclose(p, ref_asl, rtol=1e-4, atol=1e-9)


def test_cross_coef_resampled_shared_assignments():
    """The resample_rep math on IDENTICAL hierarchical assignments."""
    from memento_tpu.inference.regression import (cross_coef_resampled,
                                                  wls_residualize)

    rng = np.random.default_rng(10)
    boot_mean, treatment = _boot_matrices(rng, B=400)
    R, B1 = boot_mean.shape
    B = B1 - 1
    covariate = np.ones((R, 1))
    nc = np.array([300.0, 500.0, 400.0, 350.0])

    # Reference residualization (sklearn), then ITS resampled cross coef
    from sklearn.linear_model import LinearRegression
    bm_t = boot_mean - LinearRegression(n_jobs=1).fit(
        covariate, boot_mean, nc).predict(covariate)
    t_t = treatment - LinearRegression(n_jobs=1).fit(
        covariate, treatment, nc).predict(covariate)
    rep = rng.integers(0, R, size=(R, B))
    rep[:, 0] = np.arange(R)
    bi = rng.integers(0, B, size=(R, B)) + 1
    bi[:, 0] = 0
    ref_coef = RHT._cross_coef_resampled(
        t_t[rep], bm_t[(rep, bi)], nc[rep])

    with jax.enable_x64():
        my_bm_t = np.asarray(wls_residualize(
            jnp.asarray(covariate), jnp.asarray(boot_mean), jnp.asarray(nc)))
        my_t_t = np.asarray(wls_residualize(
            jnp.asarray(covariate), jnp.asarray(treatment), jnp.asarray(nc)))
        # my residualization == sklearn's (trace-scaled ridge vs lstsq)
        np.testing.assert_allclose(my_bm_t, bm_t, rtol=5e-5, atol=1e-7)
        np.testing.assert_allclose(my_t_t, t_t, rtol=5e-5, atol=1e-7)
        # my resampled cross-coef on the SAME residualized arrays and
        # assignments — including the reference's 0/0 -> NaN columns for
        # contrast-free resampled replicate sets
        my_coef = np.asarray(cross_coef_resampled(
            jnp.asarray(t_t[rep]), jnp.asarray(bm_t[(rep, bi)]),
            jnp.asarray(nc[rep].astype(np.float64))))
    # Degenerate (one-arm) resampled columns: the reference's exact 0/0
    # yields NaN only when the weighted mean cancels EXACTLY (equal-weight
    # draws); with unequal weights its A_mA is catastrophic-cancellation
    # residue and the "coefficient" is numerically meaningless O(1) noise.
    # My scale-relative threshold NaNs ALL contrast-free columns — a
    # deliberate, documented deviation (PARITY.md): my NaN set must be a
    # superset of the reference's, the extras must all be contrast-free
    # columns, and every non-degenerate column must match tightly.
    ref_nan = np.isnan(ref_coef)
    my_nan = np.isnan(my_coef)
    assert ref_nan.any()  # degenerate columns DID occur
    assert (ref_nan <= my_nan).all()  # superset
    t_rs = t_t[rep]  # [R, B, Kt]
    contrast_free = np.ptp(t_rs, axis=0).T == 0  # [Kt, B]
    assert (my_nan <= (ref_nan | contrast_free)).all()
    both = ~my_nan
    np.testing.assert_allclose(my_coef[both], ref_coef[both],
                               rtol=1e-5, atol=1e-9)


def test_compute_asl_gev_tail_parity():
    """A far-tail statistic (extreme count <= 10) drives both sides through
    the genextreme tail refinement; my scipy port must match the reference
    exactly and the batched MLE within tolerance."""
    from memento_tpu.inference.asl import (asl_counting, gev_refine,
                                           refine_flagged)

    rng = np.random.default_rng(12)
    B = 4000
    null = rng.standard_t(df=6, size=B) * 0.05
    stat = np.quantile(null, 0.999) * 1.8  # beyond all but a few draws
    coef = np.concatenate([[stat], null + stat])  # bootstrap centering

    ref_p = RHT._compute_asl(coef.copy(), resampling="bootstrap")

    p, needs = asl_counting(jnp.asarray(coef), "bootstrap", False)
    assert bool(np.asarray(needs))
    counting_p = float(np.asarray(p))
    # my scipy-port refinement == the reference's procedure
    mine_scipy = gev_refine(stat, coef[1:] - stat, counting_p)
    assert np.isclose(mine_scipy, ref_p, rtol=1e-6), (mine_scipy, ref_p)
    # batched Nelder-Mead refinement agrees within fit tolerance
    mine_batch = refine_flagged(coef[None, :], np.array([counting_p]),
                                np.array([True]), "bootstrap")[0]
    assert np.isclose(np.log(max(mine_batch, 1e-300)),
                      np.log(max(ref_p, 1e-300)), atol=0.5), (
        mine_batch, ref_p)

    # degenerate distribution -> NaN on both sides.  (The reference's
    # ``perm_diff == perm_diff.mean()`` check only fires when the mean is
    # EXACT — e.g. 101 copies of 0.7 round to 0.699999... and fall through
    # to the counting path — so probe with an exactly-representable value.)
    ref_nan = RHT._compute_asl(np.full(101, 0.5), resampling="bootstrap")
    p_d, _ = asl_counting(jnp.asarray(np.full(101, 0.5)), "bootstrap", False)
    assert np.isnan(ref_nan) and np.isnan(float(np.asarray(p_d)))


# ---------------------------------------------------------------------------
# C. End to end — run_ht_1d / run_ht_2d vs _ht_1d / _ht_2d
# ---------------------------------------------------------------------------

def _ref_ht_1d_gene(groups, asf_groups, tm, trv, mv, covariate, treatment,
                    nc, B, j, **kwargs):
    np.random.seed(1000 + j)  # _unique_expr + _fill draw from np.random
    return RHT._ht_1d(
        true_mean=[tm[r, j] for r in range(len(groups))],
        true_res_var=[trv[r, j] for r in range(len(groups))],
        cells=[groups[r][:, [j]] for r in range(len(groups))],
        approx_sf=asf_groups,
        covariate=covariate,
        treatment=treatment,
        Nc_list=nc.astype(float),
        num_boot=B,
        mv_fit=[mv] * len(groups),
        q=[Q] * len(groups),
        _estimator_1d=REST._get_estimator_1d("hyper_relative"),
        **kwargs)


@pytest.mark.parametrize("resampling,approx", [
    ("bootstrap", False), ("permutation", True),
])
def test_ht_1d_end_to_end_vs_reference(resampling, approx):
    from memento_tpu.inference.ht import run_ht_1d
    from memento_tpu.ops.estimators import HYPER_RELATIVE

    groups, asf_groups, covariate, treatment, nc = _dataset_1d(seed=21)
    tm, tv, trv, mv = _observed_1d(groups, asf_groups)
    B = 2000
    g = tm.shape[1]

    got = run_ht_1d(
        jax.random.key(0),
        groups=groups,
        approx_sf=asf_groups,
        true_mean=tm,
        true_res_var=trv,
        mv_coeffs=np.tile(mv, (len(groups), 1)),
        q=np.full(len(groups), Q),
        covariate=covariate,
        treatment=treatment,
        num_boot=B,
        model=HYPER_RELATIVE,
        resampling=resampling,
        approx=approx,
        tile_size=16,
    )

    for j in range(g):
        ref = _ref_ht_1d_gene(groups, asf_groups, tm, trv, mv, covariate,
                              treatment, nc, B, j,
                              resampling=resampling, approx=approx)
        ref_mc, ref_mse, ref_masl = ref[0], ref[1], ref[2]
        ref_vc, ref_vse, ref_vasl = ref[3], ref[4], ref[5]
        if np.isscalar(ref_mc) and np.isnan(ref_mc):
            assert np.isnan(got["mean_coef"][j, 0]), j
            continue
        # observed coefficients are deterministic given the true moments
        # (NaN = the reference's one-arm-survivors degenerate-contrast case;
        # locations must MATCH)
        np.testing.assert_allclose(got["mean_coef"][j, 0], ref_mc[0],
                                   rtol=1e-4, atol=1e-6, err_msg=str(j),
                                   equal_nan=True)
        np.testing.assert_allclose(got["var_coef"][j, 0], ref_vc[0],
                                   rtol=1e-4, atol=1e-6, err_msg=str(j),
                                   equal_nan=True)
        # SEs agree within bootstrap MC tolerance
        assert _se_close(got["mean_se"][j, 0], ref_mse[0]), (
            j, got["mean_se"][j, 0], ref_mse[0])
        assert _se_close(got["var_se"][j, 0], ref_vse[0]), (
            j, got["var_se"][j, 0], ref_vse[0])
        # p-values agree within MC tolerance
        assert _mc_close(float(ref_masl[0]), got["mean_pval"][j, 0], B), (
            j, ref_masl[0], got["mean_pval"][j, 0])
        assert _mc_close(float(ref_vasl[0]), got["var_pval"][j, 0], B), (
            j, ref_vasl[0], got["var_pval"][j, 0])


def test_ht_1d_resample_rep_vs_reference():
    """Hierarchical replicate bootstrap: observed coefficients exact, SEs
    within MC tolerance (assignments are independent draws per side)."""
    from memento_tpu.inference.ht import run_ht_1d
    from memento_tpu.ops.estimators import HYPER_RELATIVE

    # higher baseline expression -> healthy variance estimates in every
    # group, so most genes survive to the regression on both sides
    groups, asf_groups, covariate, treatment, nc = _dataset_1d(
        seed=31, g=6, base_offset=2.0)
    tm, tv, trv, mv = _observed_1d(groups, asf_groups)
    B = 1200

    got = run_ht_1d(
        jax.random.key(5),
        groups=groups,
        approx_sf=asf_groups,
        true_mean=tm,
        true_res_var=trv,
        mv_coeffs=np.tile(mv, (len(groups), 1)),
        q=np.full(len(groups), Q),
        covariate=covariate,
        treatment=treatment,
        num_boot=B,
        model=HYPER_RELATIVE,
        resampling="bootstrap",
        resample_rep=True,
        tile_size=8,
    )

    checked = 0
    for j in range(tm.shape[1]):
        ref = _ref_ht_1d_gene(groups, asf_groups, tm, trv, mv, covariate,
                              treatment, nc, B, j,
                              resampling="bootstrap", resample_rep=True)
        if np.isscalar(ref[0]) and np.isnan(ref[0]):
            assert np.isnan(got["mean_coef"][j, 0]), j
            continue
        np.testing.assert_allclose(got["mean_coef"][j, 0], ref[0][0],
                                   rtol=1e-4, atol=1e-6, err_msg=str(j),
                                   equal_nan=True)
        assert _se_close(got["mean_se"][j, 0], ref[1][0], tol=0.35), (
            j, got["mean_se"][j, 0], ref[1][0])
        assert _mc_close(float(ref[2][0]), got["mean_pval"][j, 0], B), (
            j, ref[2][0], got["mean_pval"][j, 0])
        checked += 1
    assert checked >= 4


def test_ht_2d_end_to_end_vs_reference():
    from memento_tpu.inference.ht import run_ht_2d
    from memento_tpu.ops.estimators import HYPER_RELATIVE

    rng = np.random.default_rng(41)
    n, R = 500, 4
    treat_of_group = np.array([0.0, 0.0, 1.0, 1.0])
    g = 6
    blocks = []
    for r in range(R):
        z = rng.gamma(2.0, 1.0, size=(n, 1))
        lam = z * (0.8 + rng.random(g))[None, :]
        # correlate gene 0 with gene 1 via the shared latent z; add a
        # treatment-dependent correlation shift on the (0, 1) pair
        lam[:, 1] = z.ravel() * (1.0 + 0.6 * treat_of_group[r])
        X = rng.poisson(lam * Q).astype(np.float64)
        blocks.append(X)
    X_all = sparse.csc_matrix(np.concatenate(blocks, 0))
    asf = _binned_sf(X_all)
    groups = [sparse.csc_matrix(b) for b in blocks]
    asf_groups = [asf[r * n:(r + 1) * n] for r in range(R)]
    covariate = np.ones((R, 1))
    treatment = treat_of_group.reshape(-1, 1)
    nc = np.full(R, n)
    idx1 = np.array([0, 0, 2])
    idx2 = np.array([1, 2, 3])
    P = len(idx1)
    B = 2000

    # observed correlations per group from the reference's own sparse path
    true_corr = np.zeros((R, P))
    for r in range(R):
        cov = REST._hyper_cov_relative(
            groups[r].tocsc(), n_obs=n, size_factor=asf_groups[r], q=Q,
            idx1=idx1, idx2=idx2)
        m, v = REST._hyper_1d_relative(
            groups[r].tocsc(), n_obs=n, q=Q, size_factor=asf_groups[r])
        v = np.asarray(v).ravel()
        true_corr[r] = REST._corr_from_cov(
            np.asarray(cov, np.float64).copy(), v[idx1].copy(),
            v[idx2].copy())

    got = run_ht_2d(
        jax.random.key(7),
        groups=groups,
        approx_sf=asf_groups,
        true_corr=true_corr,
        q=np.full(R, Q),
        covariate=covariate,
        treatment=treatment,
        num_boot=B,
        model=HYPER_RELATIVE,
        resampling="bootstrap",
        idx1=idx1,
        idx2=idx2,
        tile_size=4,
    )

    est_1d = REST._get_estimator_1d("hyper_relative")
    est_cov = REST._get_estimator_cov("hyper_relative")
    for p_i in range(P):
        np.random.seed(2000 + p_i)
        ref = RHT._ht_2d(
            true_corr=[true_corr[r, p_i] for r in range(R)],
            cells=[groups[r][:, [idx1[p_i], idx2[p_i]]] for r in range(R)],
            approx_sf=asf_groups,
            covariate=covariate,
            treatment=treatment,
            Nc_list=nc.astype(float),
            num_boot=B,
            q=[Q] * R,
            _estimator_1d=est_1d,
            _estimator_cov=est_cov,
            resampling="bootstrap")
        if np.isscalar(ref[0]) and np.isnan(ref[0]):
            assert np.isnan(got["corr_coef"][p_i, 0]), p_i
            continue
        np.testing.assert_allclose(got["corr_coef"][p_i, 0], ref[0][0],
                                   rtol=1e-4, atol=1e-6, err_msg=str(p_i),
                                   equal_nan=True)
        assert _se_close(got["corr_se"][p_i, 0], ref[1][0], tol=0.3), (
            p_i, got["corr_se"][p_i, 0], ref[1][0])
        assert _mc_close(float(ref[2][0]), got["corr_pval"][p_i, 0], B), (
            p_i, ref[2][0], got["corr_pval"][p_i, 0])
