"""Degenerate-input hardening for the public API.

The reference's NaN-sentinel behavior under sparse/degenerate inputs is
load-bearing (SURVEY.md §7 "NaN semantics"); these probe the boundaries.
"""

import numpy as np
import pandas as pd
import pytest
import scipy.sparse as sparse

import memento_tpu as mt


def _adata(X, cond=None, rng=None):
    n = X.shape[0]
    obs = pd.DataFrame(
        {
            "condition": (cond if cond is not None
                          else np.zeros(n, int)).astype(str),
            "capture_q": np.full(n, 0.1),
        }
    )
    return mt.AnnData(sparse.csr_matrix(np.asarray(X, dtype=np.float64)),
                      obs=obs)


def test_single_group_one_sample(rng):
    """One group + all-ones treatment = one-sample statistics."""
    X = rng.poisson(1.0, size=(400, 15))
    adata = _adata(X)
    mt.setup_memento(adata, q_column="capture_q", filter_mean_thresh=0.01,
                     trim_percent=0.3)
    mt.create_groups(adata, label_columns=["condition"])
    mt.compute_1d_moments(adata, min_perc_group=0.5)
    g = mt.get_groups(adata)
    ones = pd.DataFrame(np.ones((1, 1)), index=g.index)
    mt.ht_1d_moments(adata, covariate=ones, treatment=ones, num_boot=100,
                     resampling="bootstrap", tile_size=16)
    res = mt.get_1d_ht_result(adata)
    m_df, v_df, _ = mt.get_1d_moments(adata)
    # one-sample coef = the group's log mean
    grp = [c for c in m_df.columns if c != "gene"][0]
    np.testing.assert_allclose(res.de_coef.values, m_df[grp].values,
                               rtol=1e-4, atol=1e-5)
    assert np.isfinite(res.de_se).all()


def test_dead_gene_nan_live_gene_finite(rng):
    """A dead gene yields NaN sentinels; surrounding genes stay valid.

    (Needs a realistic gene count: with a handful of genes, size factors are
    dominated by each gene itself and the hypergeometric variance correctly
    degenerates — matching the reference's assumptions, not a bug.)
    """
    # overdispersed counts keep corrected variances positive at this size
    X = rng.poisson(rng.gamma(2.0, 1.0, size=(600, 30)))
    X[:, 1] = 0  # dead gene
    cond = (rng.random(600) < 0.5).astype(int)
    adata = _adata(X, cond)
    mt.setup_memento(adata, q_column="capture_q", filter_mean_thresh=0.001,
                     trim_percent=0.5)
    mt.create_groups(adata, label_columns=["condition"])
    mt.compute_1d_moments(adata, min_perc_group=0.5, filter_genes=False)
    g = mt.get_groups(adata)
    cov = pd.DataFrame(np.ones((2, 1)), index=g.index)
    tx = pd.DataFrame({"t": g["condition"].astype(int).values}, index=g.index)
    mt.ht_1d_moments(adata, covariate=cov, treatment=tx, num_boot=80,
                     resampling="bootstrap", tile_size=32)
    res = mt.get_1d_ht_result(adata)
    assert res.shape[0] == 30
    assert np.isnan(res.de_pval.iloc[1])  # dead gene -> NaN
    assert np.isfinite(res.de_pval).sum() >= 20


def test_tiny_groups(rng):
    """Groups with a handful of cells don't crash; results may be NaN."""
    X = rng.poisson(1.0, size=(24, 8))
    cond = np.repeat([0, 1, 2, 3], 6)  # four 6-cell groups
    adata = _adata(X, cond)
    mt.setup_memento(adata, q_column="capture_q", filter_mean_thresh=0.001,
                     trim_percent=0.5)
    mt.create_groups(adata, label_columns=["condition"])
    mt.compute_1d_moments(adata, min_perc_group=0.2, filter_genes=False)
    g = mt.get_groups(adata)
    cov = pd.DataFrame(np.ones((4, 1)), index=g.index)
    tx = pd.DataFrame({"t": (g["condition"].astype(int) % 2).values},
                      index=g.index)
    mt.ht_1d_moments(adata, covariate=cov, treatment=tx, num_boot=50,
                     resampling="bootstrap", tile_size=8)
    res = mt.get_1d_ht_result(adata)
    assert res.shape[0] == 8  # no crash; values may be NaN


def test_gene_list_subselection(rng):
    X = rng.poisson(2.0, size=(300, 12))
    cond = (rng.random(300) < 0.5).astype(int)
    adata = _adata(X, cond)
    mt.setup_memento(adata, q_column="capture_q", filter_mean_thresh=0.001,
                     trim_percent=0.5)
    mt.create_groups(adata, label_columns=["condition"])
    keep = ["gene_2", "gene_5", "gene_7"]
    mt.compute_1d_moments(adata, min_perc_group=0.5, gene_list=keep)
    assert adata.var.index.tolist() == keep
    g = mt.get_groups(adata)
    cov = pd.DataFrame(np.ones((2, 1)), index=g.index)
    tx = pd.DataFrame({"t": g["condition"].astype(int).values}, index=g.index)
    mt.ht_1d_moments(adata, covariate=cov, treatment=tx, num_boot=60,
                     resampling="bootstrap", tile_size=8)
    assert mt.get_1d_ht_result(adata).shape[0] == 3


def test_not_inplace_copies(rng):
    X = rng.poisson(1.0, size=(200, 10))
    adata = _adata(X)
    out = mt.setup_memento(adata, q_column="capture_q", inplace=False)
    assert "memento" in out.uns and "memento" not in adata.uns


def test_setup_asserts_q_below_one(rng):
    X = rng.poisson(1.0, size=(50, 5))
    adata = _adata(X)
    adata.obs["capture_q"] = 1.5
    with pytest.raises(AssertionError):
        mt.setup_memento(adata, q_column="capture_q")
