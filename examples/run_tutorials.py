"""Run all four tutorial flows (docs/tutorials.md) end to end on the demo
file — executable mirrors of the reference's four notebooks
(ref ``docs/source/tutorials/``: ifn_mono_moments, ifn_mono_ht,
2d_one_sample_pbmc, genetics_tutorial).

Usage:  python examples/make_demo_h5ad.py demo.h5ad
        python examples/run_tutorials.py demo.h5ad [--num-boot B]
"""

import sys

import numpy as np
import pandas as pd

import memento_tpu as mt
from memento_tpu.io.h5ad import read_h5ad


def main(path, num_boot=2000):
    # ---- Tutorial 1: estimating moments (ifn_mono_moments) ---------------
    adata = read_h5ad(path)
    adata = adata[np.asarray(adata.obs["cell"].astype(str) ==
                             "CD14+ Monocytes")]
    mt.setup_memento(adata, q_column="capture_q", filter_mean_thresh=0.01,
                     trim_percent=0.3)
    mt.create_groups(adata, label_columns=["stim"])
    mt.compute_1d_moments(adata, min_perc_group=0.5)
    mean_df, var_df, cell_counts = mt.get_1d_moments(adata)
    print(f"[1] moments: {mean_df.shape[0]} genes x "
          f"{mean_df.shape[1] - 1} groups; cells/group {cell_counts}")

    # ---- Tutorial 2: differential mean & variability (ifn_mono_ht) -------
    adata = read_h5ad(path)
    mt.setup_memento(adata, q_column="capture_q", filter_mean_thresh=0.01,
                     trim_percent=0.3)
    mt.create_groups(adata, label_columns=["stim", "ind"])
    mt.compute_1d_moments(adata, min_perc_group=0.5)
    groups = mt.get_groups(adata)
    covariate = pd.DataFrame(np.ones((len(groups), 1)), index=groups.index)
    treatment = pd.DataFrame(
        {"stim": (groups["stim"].astype(str) == "stim").astype(float)},
        index=groups.index)
    mt.ht_1d_moments(adata, covariate=covariate, treatment=treatment,
                     num_boot=num_boot, resampling="bootstrap", tile_size=64)
    res = mt.get_1d_ht_result(adata)
    isg = res[res.gene.str.startswith("ISG")]
    print(f"[2] DE: median planted p={np.nanmedian(isg.de_pval):.2e}, "
          f"median planted coef={np.nanmedian(isg.de_coef):.2f} "
          f"(planted log-fc {np.log(2.0):.2f})")
    assert np.nanmedian(isg.de_pval) < 0.05

    # ---- Tutorial 3: one-sample 2D correlation (2d_one_sample_pbmc) ------
    genes = adata.var.index.tolist()
    anchor = genes[0]
    pairs = [(anchor, g) for g in genes[1:6]]
    mt.compute_2d_moments(adata, pairs)
    ones = pd.DataFrame(np.ones((len(groups), 1)), index=groups.index)
    mt.ht_2d_moments(adata, covariate=ones, treatment=ones,
                     num_boot=num_boot, resampling="bootstrap", tile_size=64)
    corr = mt.get_2d_ht_result(adata)
    print(f"[3] one-sample corr: {len(corr)} pairs, "
          f"finite={np.isfinite(corr.corr_coef).sum()}")

    # ---- Tutorial 4: eQTL / genetics mode (genetics_tutorial) ------------
    adata = read_h5ad(path)
    mt.setup_memento(adata, q_column="capture_q", filter_mean_thresh=0.01,
                     trim_percent=0.3, estimator_type="mean_only")
    mt.create_groups(adata, label_columns=["stim", "ind"])
    mt.compute_1d_moments(adata, min_perc_group=0.5)
    groups = mt.get_groups(adata)
    covariate = pd.DataFrame(np.ones((len(groups), 1)), index=groups.index)
    rng = np.random.default_rng(0)
    snps = pd.DataFrame(
        {f"snp{i}": rng.integers(0, 3, len(groups)).astype(float)
         for i in range(3)},
        index=groups.index)
    gene_names = adata.var.index.tolist()
    tfg = {g: [f"snp{i % 3}", f"snp{(i + 1) % 3}"]
           for i, g in enumerate(gene_names)}
    mt.ht_1d_moments(adata, covariate=covariate, treatment=snps,
                     treatment_for_gene=tfg, num_boot=num_boot,
                     resampling="permutation", approx=True, tile_size=64)
    eqtl = mt.get_1d_ht_result(adata)
    print(f"[4] eQTL: {len(eqtl)} gene-SNP tests, "
          f"finite p={np.isfinite(eqtl.de_pval).mean():.2f}")
    print("TUTORIALS OK")


if __name__ == "__main__":
    path = sys.argv[1] if len(sys.argv) > 1 else "demo_interferon_like.h5ad"
    nb = 2000
    if "--num-boot" in sys.argv:
        nb = int(sys.argv[sys.argv.index("--num-boot") + 1])
    main(path, num_boot=nb)
