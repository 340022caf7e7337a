"""Statistical validation tests — automated ports of the reference's
validation notebooks (SURVEY.md §4):

- estimator accuracy vs ground truth across capture efficiencies
  (``analysis/simulation/estimator_validation.ipynb``)
- bootstrap fidelity vs a true cell-resampling bootstrap
  (``analysis/simulation/bootstrap_validation.ipynb``)
- null p-value calibration / lambda_GC
  (``analysis/simulation/calibration.ipynb``)
"""

import numpy as np
import pytest
import scipy.sparse as sparse

import jax
import jax.numpy as jnp

from memento_tpu.ops.bootstrap import bootstrap_1d
from memento_tpu.ops.compress import compress_group
from memento_tpu.ops.estimators import get_noise_model, mean_var_sparse
from memento_tpu.ops.size_factor import bin_size_factor
from memento_tpu.utils.stats import concordance, lambda_gc


def simulate_truth(rng, n_cells=3000, n_genes=150):
    """Gamma-Poisson transcriptomes with known relative means/variances."""
    base_mean = np.exp(rng.uniform(np.log(1.0), np.log(50.0), n_genes))
    theta = 3.0
    lam = rng.gamma(theta, base_mean / theta, size=(n_cells, n_genes))
    z = rng.poisson(lam)  # pre-capture counts
    rel = base_mean / base_mean.sum()
    true_var_rel = (base_mean + base_mean**2 / theta) / base_mean.sum() ** 2
    return z, rel, true_var_rel


@pytest.mark.parametrize("q", [0.05, 0.15, 0.4])
def test_estimator_accuracy_across_q(rng, q):
    """Hypergeometric estimator recovers relative means/variances from
    captured counts, across capture efficiencies."""
    z, rel_mean, rel_var = simulate_truth(rng)
    x = rng.binomial(z, q)  # binomial thinning ~ capture
    X = sparse.csr_matrix(x.astype(np.float64))
    sf = np.asarray(X.sum(axis=1)).ravel()
    sf = sf / sf.mean()
    m, v = mean_var_sparse(X, sf, q, "hyper_relative")

    # concordance in log space for the means
    cc_mean = concordance(np.log(m), np.log(rel_mean * z.sum(1).mean() * q))
    assert cc_mean > 0.95, f"mean concordance {cc_mean} too low at q={q}"
    # variances are noisier; require strong rank agreement
    from scipy.stats import spearmanr

    valid = (v > 0) & np.isfinite(v)
    rho = spearmanr(v[valid], rel_var[valid]).statistic
    assert rho > 0.8, f"variance rank corr {rho} too low at q={q}"


def test_poisson_vs_hyper_estimators(rng):
    """Means agree; the hypergeometric variance estimate exceeds Poisson's
    (its correction subtracts (1-q) * sum(x/sf^2) instead of the full
    sum, ref estimator.py:123 vs :174)."""
    z, _, _ = simulate_truth(rng, n_cells=2000)
    q = 0.4
    x = rng.binomial(z, q)
    X = sparse.csr_matrix(x.astype(np.float64))
    sf = np.asarray(X.sum(axis=1)).ravel()
    sf = sf / sf.mean()
    m_h, v_h = mean_var_sparse(X, sf, q, "hyper_relative")
    m_p, v_p = mean_var_sparse(X, sf, q, "poi_relative")
    np.testing.assert_allclose(m_h, m_p, rtol=1e-9)
    assert np.nanmean(v_h) > np.nanmean(v_p)


def test_bootstrap_fidelity_vs_true_bootstrap(rng):
    """The unique-value compressed bootstrap must reproduce the replicate
    distribution of a brute-force cell-resampling bootstrap (the reference
    validates via EMD sweeping num_bins, bootstrap_validation.ipynb)."""
    n, B = 2000, 2000
    q = 0.1
    x = rng.poisson(rng.gamma(2.0, 1.0, size=n))
    sf = rng.random(n) * 2 + 0.3
    sf = sf / sf.mean()
    approx_sf = bin_size_factor(sf, num_bins=30)

    # brute force: resample cells, recompute the estimator each time
    means = np.empty(B)
    variances = np.empty(B)
    for b in range(B):
        idx = rng.integers(0, n, n)
        xb, sb = x[idx], approx_sf[idx]
        m1 = (xb / sb).mean()
        m2 = (xb**2 / sb**2).mean() - (1 - q) * (xb / sb**2).mean()
        means[b] = m1
        variances[b] = m2 - m1**2

    # compressed bootstrap on device
    X = sparse.csr_matrix(x.reshape(-1, 1).astype(np.float64))
    comp = compress_group(X, approx_sf, backend="numpy")
    model = get_noise_model("hyper_relative")
    bm, bv = bootstrap_1d(
        jax.random.key(0),
        jnp.asarray(comp.values),
        jnp.asarray(comp.counts),
        jnp.asarray(comp.inv_sf),
        jnp.asarray(comp.inv_sf_sq),
        comp.n_obs,
        q,
        model,
        B,
    )
    bm = np.asarray(bm)[0]
    bv = np.asarray(bv)[0]

    # same center and spread (bootstrap SE) within a few percent
    assert abs(bm.mean() - means.mean()) / means.mean() < 0.02
    assert abs(bm.std() - means.std()) / means.std() < 0.1
    assert abs(bv.mean() - variances.mean()) / abs(variances.mean()) < 0.05
    assert abs(bv.std() - variances.std()) / variances.std() < 0.15

    from scipy.stats import wasserstein_distance

    emd = wasserstein_distance(bm, means) / means.std()
    assert emd < 0.15, f"normalized EMD {emd} too high"


def test_bootstrap_emd_num_bins_sweep(rng):
    """EMD between the compressed bootstrap and a true cell-resampling
    bootstrap (exact size factors) falls as num_bins grows and is small by
    ~30 bins — the selection criterion of the reference's
    bootstrap_validation.ipynb (sweeps 1..90, picks ~30-60)."""
    from scipy.stats import wasserstein_distance

    n, B = 2000, 1500
    q = 0.1
    x = rng.poisson(rng.gamma(2.0, 1.0, size=n))
    sf = rng.random(n) * 2 + 0.3
    sf = sf / sf.mean()

    # gold standard: resample cells, exact size factors
    means = np.empty(B)
    for b in range(B):
        idx = rng.integers(0, n, n)
        xb, sb = x[idx], sf[idx]
        means[b] = (xb / sb).mean()

    model = get_noise_model("hyper_relative")
    emd = {}
    for nb in (1, 5, 30, 60):
        approx_sf = bin_size_factor(sf, num_bins=nb)
        X = sparse.csr_matrix(x.reshape(-1, 1).astype(np.float64))
        comp = compress_group(X, approx_sf, backend="numpy")
        bm, _ = bootstrap_1d(
            jax.random.key(0),
            jnp.asarray(comp.values),
            jnp.asarray(comp.counts),
            jnp.asarray(comp.inv_sf),
            jnp.asarray(comp.inv_sf_sq),
            comp.n_obs,
            q,
            model,
            B,
        )
        emd[nb] = wasserstein_distance(np.asarray(bm)[0], means) / means.std()

    # coarse binning is visibly worse; >=30 bins reproduce the true
    # bootstrap within a small fraction of its spread and adding more bins
    # no longer helps much (the flattening the reference observed)
    assert emd[1] > 2 * emd[30], emd
    assert emd[30] < 0.15, emd
    assert emd[60] < 0.15, emd
    assert emd[5] >= emd[30] * 0.5, emd


def test_null_calibration_lambda_gc(rng):
    """Random group labels on null data -> uniform p-values, lambda_GC ~ 1
    (the reference's calibration.ipynb criterion)."""
    import pandas as pd

    import memento_tpu as mt
    from memento_tpu.models.simulate import simulate_two_groups

    X, cond, rep, qs = simulate_two_groups(
        n_cells_per_group=500, n_genes=80, q=0.1, de_genes=None,
        n_replicates=2, rng=rng,
    )
    # scramble condition labels -> everything is null
    shuffled = rng.permutation(cond)
    obs = pd.DataFrame(
        {
            "condition": shuffled.astype(str),
            "replicate": rep.astype(str),
            "capture_q": qs,
        }
    )
    adata = mt.AnnData(sparse.csr_matrix(X.astype(np.float64)), obs=obs)
    mt.setup_memento(adata, q_column="capture_q", filter_mean_thresh=0.01,
                     trim_percent=0.3)
    mt.create_groups(adata, label_columns=["condition", "replicate"])
    mt.compute_1d_moments(adata, min_perc_group=0.5)
    gdf = mt.get_groups(adata)
    covariate = pd.DataFrame(np.ones((len(gdf), 1)), index=gdf.index)
    treatment = pd.DataFrame(
        {"tx": gdf["condition"].astype(int).values}, index=gdf.index
    )
    mt.ht_1d_moments(adata, covariate=covariate, treatment=treatment,
                     num_boot=500, boot_chunk=500, tile_size=80,
                     resampling="bootstrap")
    res = mt.get_1d_ht_result(adata)
    pv = res.de_pval.values
    pv = pv[np.isfinite(pv)]
    assert len(pv) > 40
    lam = lambda_gc(pv)
    assert 0.5 < lam < 2.0, f"lambda_GC {lam} out of calibration range"
    # gross uniformity: no more than 20% below 0.05
    assert (pv < 0.05).mean() < 0.2
    assert pv.mean() > 0.3


def test_dc_power_planted_correlation_change(rng):
    """Differential-correlation test detects a planted correlation change
    (the reference's hypothesis_test_validation.ipynb DC criterion): genes
    (0, 1) share a latent factor in condition 1 only; genes (2, 3) stay
    independent in both conditions."""
    import pandas as pd

    import memento_tpu as mt

    n, g, q = 1500, 40, 0.2
    base = np.linspace(4.0, 10.0, g)

    def one_group(cond, rep_seed):
        grng = np.random.default_rng(rep_seed)
        lam = grng.gamma(3.0, base / 3.0, size=(n, g))
        if cond == 1:
            # shared latent factor -> strong positive corr between 0 and 1
            latent = grng.gamma(2.0, 0.5, size=n)
            lam[:, 0] *= latent
            lam[:, 1] *= latent
        return grng.poisson(lam * q)

    Xs, conds, reps = [], [], []
    for rep in range(2):
        for cond in (0, 1):
            Xs.append(one_group(cond, 100 + 10 * rep + cond))
            conds.append(np.full(n, cond))
            reps.append(np.full(n, rep))
    X = np.vstack(Xs)
    obs = pd.DataFrame(
        {
            "condition": np.concatenate(conds).astype(str),
            "replicate": np.concatenate(reps).astype(str),
            "capture_q": np.full(X.shape[0], q),
        }
    )
    adata = mt.AnnData(sparse.csr_matrix(X.astype(np.float64)), obs=obs)
    mt.setup_memento(adata, q_column="capture_q", filter_mean_thresh=0.01,
                     trim_percent=0.3)
    mt.create_groups(adata, label_columns=["condition", "replicate"])
    mt.compute_1d_moments(adata, min_perc_group=0.9)
    genes = adata.var.index.tolist()
    pairs = [("gene_0", "gene_1"), ("gene_10", "gene_11")]
    assert all(a in genes and b in genes for a, b in pairs)
    mt.compute_2d_moments(adata, gene_pairs=pairs)
    gdf = mt.get_groups(adata)
    covariate = pd.DataFrame(np.ones((len(gdf), 1)), index=gdf.index)
    treatment = pd.DataFrame(
        {"tx": gdf["condition"].astype(int).values}, index=gdf.index
    )
    mt.ht_2d_moments(adata, covariate=covariate, treatment=treatment,
                     num_boot=400, resampling="bootstrap", seed=1)
    res = mt.get_2d_ht_result(adata)
    planted = res[(res.gene_1 == "gene_0") & (res.gene_2 == "gene_1")].iloc[0]
    null = res[(res.gene_1 == "gene_10") & (res.gene_2 == "gene_11")].iloc[0]
    assert planted.corr_coef > 0.15, planted
    assert planted.corr_pval < 0.01, planted
    assert null.corr_pval > 0.05, null


def test_power_increases_with_cells(rng):
    """Power on a planted DE effect grows with cell count while the null
    stays calibrated (the reference's power-vs-n_cells criterion,
    ``analysis/simulation/hypothesis_test_validation.ipynb``)."""
    import pandas as pd

    import memento_tpu as mt
    from memento_tpu.models.simulate import simulate_two_groups

    planted = np.arange(6)

    def detection_rate(n_cells, seed):
        X, cond, rep, qs = simulate_two_groups(
            n_cells_per_group=n_cells, n_genes=30, q=0.1,
            de_genes=planted, de_lfc=0.4, n_replicates=1,
            rng=np.random.default_rng(seed),
        )
        obs = pd.DataFrame({"condition": cond.astype(str), "capture_q": qs})
        ad = mt.AnnData(sparse.csr_matrix(X.astype(np.float64)), obs=obs)
        mt.setup_memento(ad, q_column="capture_q", filter_mean_thresh=0.01,
                         trim_percent=0.3)
        mt.create_groups(ad, label_columns=["condition"])
        mt.compute_1d_moments(ad, min_perc_group=0.5)
        gdf = mt.get_groups(ad)
        cov = pd.DataFrame(np.ones((len(gdf), 1)), index=gdf.index)
        tx = pd.DataFrame({"tx": gdf["condition"].astype(int).values},
                          index=gdf.index)
        mt.ht_1d_moments(ad, covariate=cov, treatment=tx, num_boot=200,
                         resampling="bootstrap", approx=True, seed=3)
        res = mt.get_1d_ht_result(ad)
        names = [f"gene_{i}" for i in planted]
        de = res[res.gene.isin(names)]
        null = res[~res.gene.isin(names)]
        power = (de.de_pval < 0.05).mean()
        fpr = (null.de_pval.dropna() < 0.05).mean()
        return power, fpr

    p_small, f_small = detection_rate(100, 11)
    p_large, f_large = detection_rate(2000, 12)
    assert p_large >= p_small, (p_small, p_large)
    assert p_large > 0.8, p_large
    assert f_large < 0.25, f_large


def test_dv_inflation_matches_oracle(rng):
    """The DV null inflation at >2 pooled groups is the METHOD's, not this
    implementation's: on the same shuffled-label null data the framework's
    DV p-values and the clean-room numpy oracle's agree in lambda_GC and
    tail mass (``examples/dv_calibration.py`` runs the full-size version;
    ref ``analysis/simulation/calibration.ipynb`` publishes a numeric
    lambda only for the mean test)."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "dv_calibration",
        os.path.join(os.path.dirname(__file__), "..", "examples",
                     "dv_calibration.py"),
    )
    dv = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(dv)

    from memento_tpu.inference.ht import run_ht_1d
    from memento_tpu.ops.estimators import HYPER_RELATIVE
    from memento_tpu.ops.mv_regression import fit_mv_regressor
    from memento_tpu.api import _residual_variance_np

    R, n, g, B = 4, 2500, 320, 400
    X = dv.simulate_null(rng, R * n, g)
    labels = rng.permutation(np.repeat(np.arange(R), n))
    groups = [X[labels == r].tocsc() for r in range(R)]
    sf = np.asarray(X.sum(axis=1)).ravel()
    sf = sf / sf.mean()
    asf = bin_size_factor(sf, 30)
    asf_groups = [asf[labels == r] for r in range(R)]
    tm, tv = [], []
    for r in range(R):
        m, v = mean_var_sparse(groups[r], sf[labels == r], 0.1)
        tm.append(m)
        tv.append(v)
    tm, tv = np.array(tm), np.array(tv)
    mv = fit_mv_regressor(tm.ravel(), tv.ravel())
    trv = np.stack([_residual_variance_np(tm[r], tv[r], mv)
                    for r in range(R)])
    covariate = np.ones((R, 1))
    treatment = (np.arange(R) % 2).astype(float).reshape(R, 1)
    nc = np.full(R, n)

    got = run_ht_1d(
        jax.random.key(5), groups=groups, approx_sf=asf_groups,
        true_mean=tm, true_res_var=trv, mv_coeffs=np.tile(mv, (R, 1)),
        q=np.full(R, 0.1), covariate=covariate, treatment=treatment,
        num_boot=B, model=HYPER_RELATIVE, resampling="bootstrap",
        tile_size=160,
    )
    fw_dv = np.asarray(got["var_pval"][:, 0])

    o_rng = np.random.default_rng(77)
    o_dv = np.full(g, np.nan)
    dense = [np.asarray(grp.todense()) for grp in groups]
    for j in range(g):
        _, o_dv[j], _ = dv.oracle_pvals(
            [dense[r][:, j] for r in range(R)], asf_groups,
            tm[:, j], trv[:, j], mv, covariate, treatment, nc, B, o_rng)

    lam_fw = lambda_gc(fw_dv[np.isfinite(fw_dv)])
    lam_or = lambda_gc(o_dv[np.isfinite(o_dv)])
    # identical inflation within lambda sampling noise at 320 genes
    assert abs(np.log(lam_fw / lam_or)) < np.log(1.45), (lam_fw, lam_or)
    t_fw = float(np.nanmean(fw_dv < 0.05))
    t_or = float(np.nanmean(o_dv < 0.05))
    assert abs(t_fw - t_or) < 0.05, (t_fw, t_or)
