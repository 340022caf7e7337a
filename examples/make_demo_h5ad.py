"""Generate a small interferon-like demo .h5ad for the tutorials.

The reference tutorials run on ``interferon_filtered.h5ad`` (Kang et al.
IFN-beta PBMCs; ref ``docs/source/tutorials/``), which does not ship with
either repo.  This script simulates a stand-in with the same shape of
metadata — ``stim`` condition, ``ind`` donor replicates, ``cell`` type — and
a planted interferon-response program (genes ``ISG0..ISG9`` up-regulated in
``stim``), so every tutorial flow runs end to end and finds real signal.

Usage:  python examples/make_demo_h5ad.py [out.h5ad] [--cells-per-group N]
"""

import sys

import numpy as np
import pandas as pd
import scipy.sparse as sparse


def make_demo(path="demo_interferon_like.h5ad", cells_per_group=400,
              n_genes=80, seed=0):
    rng = np.random.default_rng(seed)
    n_isg = 10
    base = np.exp(rng.uniform(np.log(0.1), np.log(5.0), n_genes))
    genes = [f"ISG{i}" for i in range(n_isg)] + [
        f"GENE{i}" for i in range(n_genes - n_isg)
    ]

    blocks, obs_rows = [], []
    for stim in ("ctrl", "stim"):
        for ind in ("101", "102"):
            lam = base.copy()
            if stim == "stim":
                lam[:n_isg] *= 2.0
            # donor-level wobble — replicates are not identical
            lam = lam * np.exp(rng.normal(0.0, 0.05, n_genes))
            disp = rng.gamma(3.0, lam / 3.0, size=(cells_per_group, n_genes))
            blocks.append(rng.poisson(disp * 0.1))
            obs_rows.append(pd.DataFrame({
                "stim": np.repeat(stim, cells_per_group),
                "ind": np.repeat(ind, cells_per_group),
                "cell": np.repeat("CD14+ Monocytes", cells_per_group),
                "capture_q": np.full(cells_per_group, 0.1),
            }))

    X = sparse.csr_matrix(np.vstack(blocks).astype(np.float32))
    obs = pd.concat(obs_rows, ignore_index=True)
    obs.index = [f"cell{i}" for i in range(X.shape[0])]
    obs["stim"] = obs["stim"].astype("category")
    obs["ind"] = obs["ind"].astype("category")
    var = pd.DataFrame(index=genes)

    from memento_tpu.containers import AnnData
    from memento_tpu.io.h5ad import write_h5ad

    write_h5ad(path, AnnData(X, obs=obs, var=var))
    print(f"wrote {path}: {X.shape[0]} cells x {X.shape[1]} genes "
          f"({n_isg} planted ISGs)")
    return path


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "demo_interferon_like.h5ad"
    n = 400
    if "--cells-per-group" in sys.argv:
        n = int(sys.argv[sys.argv.index("--cells-per-group") + 1])
    make_demo(out, cells_per_group=n)
