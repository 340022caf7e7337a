"""Custom estimator tuples through the full API (reference custom API)."""

import numpy as np
import pandas as pd
import scipy.sparse as sparse

import jax.numpy as jnp

import memento_tpu as mt
from memento_tpu.models.simulate import simulate_two_groups


def custom_poisson_1d(data, n_obs, q, size_factor=None):
    """A user-written estimator with the reference's tuple/sparse dual
    signature (mirrors ``_poisson_1d_relative``, ref estimator.py:114-133),
    JAX-traceable on the tuple path."""
    if isinstance(data, tuple):
        size_factor = size_factor if size_factor is not None else (1, 1)
        m1 = (data[0] * data[1] * size_factor[0]).sum(axis=0) / n_obs
        m2 = (
            data[0] ** 2 * data[1] * size_factor[1]
            - data[0] * data[1] * size_factor[1]
        ).sum(axis=0) / n_obs
        return [m1, m2 - m1 * m1]
    # sparse path (host): numpy/scipy
    row_weight = (1.0 / size_factor).reshape(1, -1)
    m1 = np.asarray(row_weight @ data).ravel() / n_obs
    m2 = (
        np.asarray((row_weight**2) @ data.power(2)).ravel() / n_obs
        - np.asarray((row_weight**2) @ data).ravel() / n_obs
    )
    return [m1, m2 - m1 * m1]


def custom_cov(data, n_obs, q, size_factor, idx1=None, idx2=None):
    raise NotImplementedError  # not exercised in this test


def custom_poisson_cov(data, n_obs, q, size_factor, idx1=None, idx2=None):
    """User-written pairwise covariance with the reference's dual signature
    (mirrors ``_poisson_cov_relative``, ref estimator.py:136-162):
    tuple path ``(expr1[U,1], expr2[U,1], rvs[U,B])`` is JAX-traceable."""
    if isinstance(data, tuple):
        m1 = (data[0] * data[2] * size_factor[0]).sum(axis=0) / n_obs
        m2 = (data[1] * data[2] * size_factor[0]).sum(axis=0) / n_obs
        mx = (data[0] * data[1] * data[2] * size_factor[1]).sum(axis=0) / n_obs
        return mx - m1 * m2
    # sparse path (host): numpy/scipy
    row_weight = (1.0 / size_factor).reshape(-1, 1)
    X = data[:, idx1].multiply(row_weight).tocsr()
    Y = data[:, idx2].multiply(row_weight).tocsr()
    prod = np.asarray(X.multiply(Y).sum(axis=0)).ravel() / n_obs
    overlap = idx1 == idx2
    if overlap.any():
        diag = np.asarray(
            data[:, idx1[overlap]].multiply(row_weight**2).sum(axis=0)
        ).ravel() / n_obs
        prod[overlap] -= diag
    m1 = np.asarray(X.mean(axis=0)).ravel()
    m2 = np.asarray(Y.mean(axis=0)).ravel()
    return prod - m1 * m2


def test_custom_estimator_matches_registry_poisson(rng):
    X, cond, rep, qs = simulate_two_groups(
        n_cells_per_group=400, n_genes=20, q=0.1,
        de_genes=np.arange(3), de_lfc=0.8, n_replicates=2, rng=rng,
    )
    obs = pd.DataFrame(
        {"condition": cond.astype(str), "replicate": rep.astype(str),
         "capture_q": qs}
    )

    def run(estimator_type):
        adata = mt.AnnData(sparse.csr_matrix(X.astype(np.float64)), obs=obs.copy())
        mt.setup_memento(adata, q_column="capture_q", filter_mean_thresh=0.01,
                         trim_percent=0.3, estimator_type=estimator_type)
        mt.create_groups(adata, label_columns=["condition", "replicate"])
        mt.compute_1d_moments(adata, min_perc_group=0.5)
        gdf = mt.get_groups(adata)
        cov = pd.DataFrame(np.ones((len(gdf), 1)), index=gdf.index)
        tx = pd.DataFrame({"tx": gdf["condition"].astype(int).values},
                          index=gdf.index)
        mt.ht_1d_moments(adata, covariate=cov, treatment=tx, num_boot=150,
                         resampling="bootstrap", tile_size=24, seed=0)
        return mt.get_1d_ht_result(adata)

    res_custom = run((custom_poisson_1d, custom_cov))
    res_registry = run("poi_relative")

    # observed moments are deterministic -> coefficients must match exactly
    np.testing.assert_allclose(
        res_custom.de_coef.values, res_registry.de_coef.values,
        rtol=1e-6, equal_nan=True,
    )
    # bootstrap machinery works: SEs finite and same scale
    ok = np.isfinite(res_custom.de_se) & np.isfinite(res_registry.de_se) & (
        res_registry.de_se > 0
    )
    assert ok.sum() >= 10
    ratio = res_custom.de_se[ok] / res_registry.de_se[ok]
    assert np.median(np.abs(np.log(ratio))) < 0.4
    # planted genes (those surviving the expression filter): effect present
    # (low-expression planted genes have limited power at this tiny scale,
    # so require detection of at least one plus consistent positive effects)
    planted = res_custom[res_custom.gene.isin(["gene_0", "gene_1", "gene_2"])]
    assert len(planted) >= 1
    assert (planted.de_pval < 0.1).any()
    assert planted.de_coef.mean() > 0.2


def test_custom_estimator_2d_matches_registry_poisson(rng):
    X, cond, rep, qs = simulate_two_groups(
        n_cells_per_group=400, n_genes=12, q=0.15,
        de_genes=np.arange(2), de_lfc=0.6, n_replicates=2, rng=rng,
    )
    obs = pd.DataFrame(
        {"condition": cond.astype(str), "replicate": rep.astype(str),
         "capture_q": qs}
    )

    def run(estimator_type):
        adata = mt.AnnData(sparse.csr_matrix(X.astype(np.float64)), obs=obs.copy())
        mt.setup_memento(adata, q_column="capture_q", filter_mean_thresh=0.01,
                         trim_percent=0.3, estimator_type=estimator_type)
        mt.create_groups(adata, label_columns=["condition", "replicate"])
        mt.compute_1d_moments(adata, min_perc_group=0.5)
        genes = adata.var.index.tolist()
        pairs = [(genes[0], g) for g in genes[1:5]]
        mt.compute_2d_moments(adata, gene_pairs=pairs)
        gdf = mt.get_groups(adata)
        cov = pd.DataFrame(np.ones((len(gdf), 1)), index=gdf.index)
        tx = pd.DataFrame({"tx": gdf["condition"].astype(int).values},
                          index=gdf.index)
        mt.ht_2d_moments(adata, covariate=cov, treatment=tx, num_boot=120,
                         resampling="bootstrap", seed=0)
        return mt.get_2d_ht_result(adata)

    res_custom = run((custom_poisson_1d, custom_poisson_cov))
    res_registry = run("poi_relative")

    # observed correlations are deterministic -> coefficients match exactly
    np.testing.assert_allclose(
        res_custom.corr_coef.values, res_registry.corr_coef.values,
        rtol=1e-5, equal_nan=True,
    )
    ok = np.isfinite(res_custom.corr_se) & np.isfinite(res_registry.corr_se) & (
        res_registry.corr_se > 0
    )
    assert ok.sum() >= 2
    ratio = res_custom.corr_se[ok] / res_registry.corr_se[ok]
    assert np.median(np.abs(np.log(ratio))) < 0.5


def numpy_only_hyper_1d(data, n_obs, q, size_factor=None):
    """A VERBATIM reference-style numpy estimator (ref estimator.py:165-185)
    that cannot trace under JAX: np.asarray on a tracer raises.  Exercises
    the pure_callback host path."""
    if isinstance(data, tuple):
        size_factor = size_factor if size_factor is not None else (1, 1)
        expr = np.asarray(data[0], dtype=np.float64)  # forces host arrays
        rvs = np.asarray(data[1], dtype=np.float64)
        isf = np.asarray(size_factor[0], dtype=np.float64)
        isf2 = np.asarray(size_factor[1], dtype=np.float64)
        m1 = (expr * rvs * isf).sum(axis=0) / n_obs
        m2 = (expr**2 * rvs * isf2 - (1 - q) * expr * rvs * isf2).sum(
            axis=0) / n_obs
        return [m1, m2 - m1**2]
    row_weight = (1.0 / size_factor).reshape(1, -1)
    row_weight_sq = row_weight**2
    m1 = np.asarray(row_weight @ data).ravel() / n_obs
    m2 = (np.asarray(row_weight_sq @ data.power(2)).ravel() / n_obs
          - (1 - q) * np.asarray(row_weight_sq @ data).ravel() / n_obs)
    return [m1, m2 - m1**2]


def jnp_hyper_1d(data, n_obs, q, size_factor=None):
    """The same math, JAX-traceable (tuple path only)."""
    m1 = (data[0] * data[1] * size_factor[0]).sum(axis=0) / n_obs
    m2 = (data[0] ** 2 * data[1] * size_factor[1]
          - (1 - q) * data[0] * data[1] * size_factor[1]).sum(axis=0) / n_obs
    return [m1, m2 - m1**2]


def test_numpy_only_estimator_pure_callback_matches_traceable(rng):
    """bootstrap_1d_custom: the numpy-only estimator takes the host
    pure_callback path and produces IDENTICAL numbers to the traceable
    formulation on the same key (same draws, same math)."""
    import jax

    from memento_tpu.ops.bootstrap import (_estimator_1d_traceable,
                                           bootstrap_1d_custom)

    assert _estimator_1d_traceable(jnp_hyper_1d, 16, 32)
    assert not _estimator_1d_traceable(numpy_only_hyper_1d, 16, 32)

    t, u, b = 5, 16, 64
    values = jnp.asarray(rng.integers(0, 6, (t, u)).astype(np.float32))
    counts = jnp.asarray(rng.integers(0, 50, (t, u)).astype(np.float32))
    isf = jnp.asarray(rng.random((t, u)).astype(np.float32) + 0.5)
    key = jax.random.key(3)
    m_np, v_np = bootstrap_1d_custom(
        key, numpy_only_hyper_1d, values, counts, isf, isf * isf,
        jnp.float32(400.0), jnp.float32(0.1), b)
    m_tr, v_tr = bootstrap_1d_custom(
        key, jnp_hyper_1d, values, counts, isf, isf * isf,
        jnp.float32(400.0), jnp.float32(0.1), b)
    np.testing.assert_allclose(np.asarray(m_np), np.asarray(m_tr),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(v_np), np.asarray(v_tr),
                               rtol=1e-4, atol=1e-5)


def test_numpy_only_estimator_full_api(rng):
    """A stock reference-style numpy estimator tuple runs through the FULL
    1D pipeline (observed moments via its sparse branch, bootstrap via
    pure_callback) and matches the hyper_relative registry run."""
    X, cond, rep, qs = simulate_two_groups(
        n_cells_per_group=300, n_genes=14, q=0.1,
        de_genes=np.arange(2), de_lfc=0.8, n_replicates=2, rng=rng,
    )
    obs = pd.DataFrame(
        {"condition": cond.astype(str), "replicate": rep.astype(str),
         "capture_q": qs}
    )

    def run(estimator_type):
        adata = mt.AnnData(sparse.csr_matrix(X.astype(np.float64)),
                           obs=obs.copy())
        mt.setup_memento(adata, q_column="capture_q",
                         filter_mean_thresh=0.01, trim_percent=0.3,
                         estimator_type=estimator_type)
        mt.create_groups(adata, label_columns=["condition", "replicate"])
        mt.compute_1d_moments(adata, min_perc_group=0.5)
        gdf = mt.get_groups(adata)
        cov = pd.DataFrame(np.ones((len(gdf), 1)), index=gdf.index)
        tx = pd.DataFrame({"tx": gdf["condition"].astype(int).values},
                          index=gdf.index)
        mt.ht_1d_moments(adata, covariate=cov, treatment=tx, num_boot=120,
                         resampling="bootstrap", tile_size=16, seed=0)
        return mt.get_1d_ht_result(adata)

    res_np = run((numpy_only_hyper_1d, custom_cov))
    res_reg = run("hyper_relative")
    np.testing.assert_allclose(res_np.de_coef.values, res_reg.de_coef.values,
                               rtol=1e-5, equal_nan=True)
    ok = np.isfinite(res_np.de_se) & np.isfinite(res_reg.de_se) & (
        res_reg.de_se > 0)
    assert ok.sum() >= 8
    assert np.median(np.abs(np.log(res_np.de_se[ok] / res_reg.de_se[ok]))) < 0.4
