"""End-to-end public-API pipeline tests on simulated data.

Exercises the full reference protocol (SURVEY.md §1):
setup_memento -> create_groups -> compute_1d_moments ->
{get_1d_moments | ht_1d_moments -> get_1d_ht_result} and the 2D branch.
"""

import numpy as np
import pandas as pd
import pytest
import scipy.sparse as sparse

import memento_tpu as mt
from memento_tpu.models.simulate import simulate_two_groups


@pytest.fixture(scope="module")
def sim_adata():
    rng = np.random.default_rng(7)
    X, cond, rep, qs = simulate_two_groups(
        n_cells_per_group=600,
        n_genes=40,
        q=0.1,
        de_genes=np.arange(5),
        de_lfc=0.6,
        dv_genes=np.arange(5, 10),
        dv_scale=3.0,
        n_replicates=2,
        rng=rng,
    )
    obs = pd.DataFrame(
        {
            "condition": cond.astype(str),
            "replicate": rep.astype(str),
            "capture_q": qs,
        }
    )
    var = pd.DataFrame(index=[f"G{i}" for i in range(X.shape[1])])
    return mt.AnnData(sparse.csr_matrix(X.astype(np.float64)), obs=obs, var=var)


@pytest.fixture(scope="module")
def pipeline(sim_adata):
    adata = sim_adata.copy()
    mt.setup_memento(adata, q_column="capture_q", filter_mean_thresh=0.01,
                     trim_percent=0.3)
    mt.create_groups(adata, label_columns=["condition", "replicate"])
    mt.compute_1d_moments(adata, min_perc_group=0.5)
    groups_df = mt.get_groups(adata)
    covariate = pd.DataFrame(np.ones((groups_df.shape[0], 1)),
                             index=groups_df.index, columns=["intercept"])
    treatment = pd.DataFrame(
        {"tx": (groups_df["condition"].astype(int)).values},
        index=groups_df.index,
    )
    mt.ht_1d_moments(
        adata, covariate=covariate, treatment=treatment, num_boot=400,
        resampling="bootstrap", boot_chunk=400, tile_size=40,
    )
    return adata


def test_setup_state(sim_adata):
    adata = sim_adata.copy()
    mt.setup_memento(adata, q_column="capture_q")
    uns = adata.uns["memento"]
    for key in ["q_column", "all_q", "estimator_type", "filter_mean_thresh",
                "num_bins", "least_variable_genes", "all_1d_moments"]:
        assert key in uns
    assert "memento_size_factor" in adata.obs
    assert abs(adata.obs["memento_size_factor"].mean() - 1.0) < 0.05


def test_groups(pipeline):
    uns = pipeline.uns["memento"]
    assert len(uns["groups"]) == 4
    df = mt.get_groups(pipeline)
    assert set(df.columns) == {"condition", "replicate"}
    total = sum(c.shape[0] for c in uns["group_cells"].values())
    assert total == pipeline.shape[0]


def test_1d_moments_and_getters(pipeline):
    mean_df, var_df, counts = mt.get_1d_moments(pipeline)
    assert mean_df.shape[0] == pipeline.shape[1]
    assert len(counts) == 4
    # grouped aggregation path
    gm, gv = mt.get_1d_moments(pipeline, groupby="condition")
    assert gm.shape[0] == pipeline.shape[1]
    assert gm.shape[1] == 3  # gene + 2 conditions


def test_ht_1d_detects_planted_effects(pipeline):
    res = mt.get_1d_ht_result(pipeline)
    assert list(res.columns) == [
        "gene", "tx", "de_coef", "de_se", "de_pval", "dv_coef", "dv_se",
        "dv_pval",
    ]
    de = res[res.gene.isin([f"G{i}" for i in range(5)])]
    null = res[res.gene.isin([f"G{i}" for i in range(10, 40)])]
    # power on planted DE genes
    assert (de.de_pval < 0.05).mean() >= 0.8
    assert de.de_coef.mean() > 0.3
    # null calibration
    assert (null.de_pval < 0.05).mean() < 0.25
    # SEs finite and positive for well-behaved genes
    assert (de.de_se > 0).all()


def test_ht_1d_detects_variability(pipeline):
    res = mt.get_1d_ht_result(pipeline)
    dv = res[res.gene.isin([f"G{i}" for i in range(5, 10)])]
    assert (dv.dv_pval < 0.1).mean() >= 0.6
    assert dv.dv_coef.mean() > 0


def test_2d_pipeline(pipeline):
    genes = pipeline.var.index.tolist()
    pairs = [(genes[0], genes[1]), (genes[2], genes[3]),
             (genes[1], genes[0]), (genes[4], genes[4])]
    mt.compute_2d_moments(pipeline, pairs)
    m2 = pipeline.uns["memento"]["2d_moments"]
    assert len(m2["gene_idx_1"]) == 4

    corr_df, counts = mt.get_2d_moments(pipeline)
    assert corr_df.shape[0] == 4

    groups_df = mt.get_groups(pipeline)
    covariate = pd.DataFrame(np.ones((groups_df.shape[0], 1)),
                             index=groups_df.index)
    treatment = pd.DataFrame(
        {"tx": (groups_df["condition"].astype(int)).values},
        index=groups_df.index,
    )
    mt.ht_2d_moments(pipeline, covariate=covariate, treatment=treatment,
                     num_boot=200, boot_chunk=200, tile_size=8,
                     resampling="bootstrap")
    res = mt.get_2d_ht_result(pipeline)
    assert res.shape[0] == 4
    # duplicate unordered pair gets identical result
    assert res.corr_coef.iloc[0] == res.corr_coef.iloc[2]
    # self pair is NaN
    assert np.isnan(res.corr_coef.iloc[3])


def test_corr_matrix(pipeline):
    group = pipeline.uns["memento"]["groups"][0]
    corr = mt.get_corr_matrix(pipeline, group)
    g = pipeline.shape[1]
    assert corr.shape == (g, g)
    finite = np.isfinite(corr)
    assert finite.mean() > 0.5
    assert np.nanmax(np.abs(corr[finite])) <= 1.0
    # symmetric where finite
    np.testing.assert_allclose(corr[finite & finite.T],
                               corr.T[finite & finite.T], atol=1e-5)


def test_prepare_to_save(pipeline):
    adata = pipeline
    before = dict(adata.uns["memento"]["mv_regressor"])
    mt.prepare_to_save(adata, keep=True)
    for v in adata.uns["memento"]["mv_regressor"].values():
        assert isinstance(v, str)
    # restore for other tests
    adata.uns["memento"]["mv_regressor"] = before


def test_mean_only_mode(sim_adata):
    adata = sim_adata.copy()
    mt.setup_memento(adata, q_column="capture_q", estimator_type="mean_only")
    mt.create_groups(adata, label_columns=["condition"])
    mt.compute_1d_moments(adata, min_perc_group=0.5)
    groups_df = mt.get_groups(adata)
    covariate = pd.DataFrame(np.ones((groups_df.shape[0], 1)),
                             index=groups_df.index)
    treatment = pd.DataFrame(
        {"tx": (groups_df["condition"].astype(int)).values},
        index=groups_df.index,
    )
    mt.ht_1d_moments(adata, covariate=covariate, treatment=treatment,
                     num_boot=100, boot_chunk=100, tile_size=40,
                     resampling="bootstrap")
    res = mt.get_1d_ht_result(adata)
    de = res[res.gene.isin([f"G{i}" for i in range(5)])]
    assert (de.de_pval < 0.1).mean() >= 0.6


def test_treatment_for_gene(sim_adata):
    """eQTL-style per-gene treatment subsets."""
    adata = sim_adata.copy()
    mt.setup_memento(adata, q_column="capture_q", filter_mean_thresh=0.01)
    mt.create_groups(adata, label_columns=["condition", "replicate"])
    mt.compute_1d_moments(adata, min_perc_group=0.5)
    groups_df = mt.get_groups(adata)
    covariate = pd.DataFrame(np.ones((groups_df.shape[0], 1)),
                             index=groups_df.index)
    treatment = pd.DataFrame(
        {
            "snp1": (groups_df["condition"].astype(int)).values,
            "snp2": (groups_df["replicate"].astype(int)).values,
        },
        index=groups_df.index,
    )
    tfg = {}
    for i, gname in enumerate(adata.var.index):
        tfg[gname] = ["snp1"] if i % 2 == 0 else ["snp1", "snp2"]
    mt.ht_1d_moments(adata, covariate=covariate, treatment=treatment,
                     treatment_for_gene=tfg, num_boot=100, boot_chunk=100,
                     tile_size=40, resampling="bootstrap")
    res = mt.get_1d_ht_result(adata)
    want_rows = sum(len(v) for v in tfg.values())
    assert res.shape[0] == want_rows
    sizes = res.groupby("gene", sort=False).size()
    assert all(sizes[g] == len(tfg[g]) for g in sizes.index)
