"""Runnable end-to-end demo: differential expression / variability /
correlation on simulated data (CPU-friendly).

    python examples/demo_de.py

Simulates a two-condition, two-replicate dataset with planted effects and
runs the full memento-tpu pipeline, printing the top hits.
"""

import os
import sys

# hermetic CPU run even under environments that pin a TPU platform
os.environ.setdefault("JAX_PLATFORMS", "cpu")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import pandas as pd
import scipy.sparse as sparse

import jax

import memento_tpu as mt
from memento_tpu.models.simulate import simulate_two_groups
from memento_tpu.utils.stats import fdrcorrect


def main():
    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass

    rng = np.random.default_rng(0)
    X, cond, rep, qs = simulate_two_groups(
        n_cells_per_group=800,
        n_genes=80,
        q=0.1,
        de_genes=np.arange(5),       # genes 0-4: higher mean in condition 1
        de_lfc=0.7,
        dv_genes=np.arange(5, 10),   # genes 5-9: higher variability
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
    adata = mt.AnnData(sparse.csr_matrix(X.astype(np.float64)), obs=obs)

    # --- the memento protocol ------------------------------------------
    mt.setup_memento(adata, q_column="capture_q", filter_mean_thresh=0.01,
                     trim_percent=0.3)
    mt.create_groups(adata, label_columns=["condition", "replicate"])
    mt.compute_1d_moments(adata, min_perc_group=0.5)

    groups = mt.get_groups(adata)
    covariate = pd.DataFrame(np.ones((len(groups), 1)), index=groups.index)
    treatment = pd.DataFrame(
        {"tx": groups["condition"].astype(int).values}, index=groups.index
    )

    mt.ht_1d_moments(adata, covariate=covariate, treatment=treatment,
                     num_boot=500, resampling="bootstrap")
    res = mt.get_1d_ht_result(adata)
    res["de_fdr"] = fdrcorrect(res.de_pval.values)
    res["dv_fdr"] = fdrcorrect(res.dv_pval.values)

    print("\nTop differential-mean hits:")
    print(res.nsmallest(6, "de_pval")[["gene", "de_coef", "de_se", "de_pval",
                                       "de_fdr"]].to_string(index=False))
    print("\nTop differential-variability hits:")
    print(res.nsmallest(6, "dv_pval")[["gene", "dv_coef", "dv_se", "dv_pval",
                                       "dv_fdr"]].to_string(index=False))

    # --- gene-pair differential correlation -----------------------------
    genes = adata.var.index.tolist()
    pairs = [(genes[0], genes[1]), (genes[10], genes[11])]
    mt.compute_2d_moments(adata, pairs)
    mt.ht_2d_moments(adata, covariate=covariate, treatment=treatment,
                     num_boot=300, resampling="bootstrap")
    print("\nDifferential correlation:")
    print(mt.get_2d_ht_result(adata).to_string(index=False))


if __name__ == "__main__":
    main()
