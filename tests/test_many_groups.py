"""CROP-seq-style configuration: many replicate groups (guides) at once.

Mirrors BASELINE.json config 3: batched hypothesis tests across ~dozens of
perturbation groups with a per-guide treatment design.
"""

import numpy as np
import pandas as pd
import scipy.sparse as sparse

import memento_tpu as mt


def test_many_groups_guide_vs_control(rng):
    n_guides = 24  # groups: 24 guides incl. controls
    cells_per_guide = 120
    n_genes = 25
    q = 0.1

    base = np.exp(rng.uniform(np.log(2.0), np.log(15.0), n_genes))
    Xs, guide_labels = [], []
    target_gene = 0
    for g in range(n_guides):
        mu = base.copy()
        is_targeting = g < 8  # guides 0..7 knock down gene 0
        if is_targeting:
            mu[target_gene] *= 0.4
        lam = rng.gamma(3.0, mu / 3.0, size=(cells_per_guide, n_genes))
        Xs.append(rng.poisson(lam * q))
        guide_labels.append(np.full(cells_per_guide, f"guide{g:02d}"))
    X = np.vstack(Xs)
    obs = pd.DataFrame(
        {
            "guide": np.concatenate(guide_labels),
            "capture_q": np.full(X.shape[0], q),
        }
    )
    adata = mt.AnnData(sparse.csr_matrix(X.astype(np.float64)), obs=obs)
    mt.setup_memento(adata, q_column="capture_q", filter_mean_thresh=0.01,
                     trim_percent=0.3)
    mt.create_groups(adata, label_columns=["guide"])
    mt.compute_1d_moments(adata, min_perc_group=0.8)

    gdf = mt.get_groups(adata)
    assert len(gdf) == n_guides
    covariate = pd.DataFrame(np.ones((n_guides, 1)), index=gdf.index)
    treatment = pd.DataFrame(
        {"targeting": [1.0 if int(g[5:]) < 8 else 0.0 for g in gdf["guide"]]},
        index=gdf.index,
    )
    mt.ht_1d_moments(adata, covariate=covariate, treatment=treatment,
                     num_boot=200, resampling="bootstrap", tile_size=32)
    res = mt.get_1d_ht_result(adata)

    target_row = res[res.gene == "gene_0"]
    others = res[res.gene != "gene_0"]
    assert len(target_row) == 1
    assert target_row.de_coef.iloc[0] < -0.4  # knockdown detected
    assert target_row.de_pval.iloc[0] < 0.01
    assert (others.de_pval < 0.05).mean() < 0.2  # other genes mostly null
