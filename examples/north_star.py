"""North-star scale run: FULL transcriptome, measured — not extrapolated.

    python examples/north_star.py            # 20k genes x 200k cells x B=10k

Runs the complete public-API pipeline (``setup_memento`` →
``create_groups`` → ``compute_1d_moments`` → ``ht_1d_moments``) at the
full-width configuration the reference never attempts in one process
(its live benchmark is 3,531 genes, ref ``analysis/simulation/runtime/
plots.ipynb``; production lupus runs shard eQTL blocks across jobs,
ref ``analysis/lupus/run_memento.py:92-109``), and prints a phase
breakdown plus one JSON summary line.

Environment knobs: NS_CELLS, NS_GENES, NS_BOOT, NS_TILE, NS_CACHE (path to
an .npz used to cache the simulated counts across runs).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import pandas as pd
import scipy.sparse as sparse

N_CELLS = int(os.environ.get("NS_CELLS", 200_000))
N_GENES = int(os.environ.get("NS_GENES", 20_000))
NUM_BOOT = int(os.environ.get("NS_BOOT", 10_000))
TILE = int(os.environ.get("NS_TILE", 0)) or None


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def simulate(n_cells, n_genes, q=0.1, seed=0):
    """Full-transcriptome-shaped counts: log-uniform base means spanning
    the observed scRNA dynamic range, Poisson capture at q."""
    rng = np.random.default_rng(seed)
    base = np.exp(rng.uniform(np.log(0.05), np.log(3.0), n_genes))
    blocks = []
    chunk = 10_000
    for start in range(0, n_cells, chunk):
        m = min(chunk, n_cells - start)
        lam = rng.gamma(2.0, base / 2.0, size=(m, n_genes)).astype(np.float32)
        blocks.append(sparse.csr_matrix(
            rng.poisson(lam * q).astype(np.float32)))
        log(f"  simulated {start + m}/{n_cells} cells")
    return sparse.vstack(blocks).tocsr()


def main():
    import jax

    from memento_tpu.utils import enable_compile_cache

    enable_compile_cache()

    import memento_tpu as mt
    from memento_tpu.utils import profiling

    log(f"devices: {jax.devices()}")
    phases = {}

    t = time.time()
    cache = os.environ.get("NS_CACHE", "")
    if cache and os.path.exists(cache):
        X = sparse.load_npz(cache).tocsr()
        assert X.shape == (N_CELLS, N_GENES), X.shape
        log(f"loaded cached counts from {cache}")
    else:
        X = simulate(N_CELLS, N_GENES)
        if cache:
            sparse.save_npz(cache, X)
    phases["simulate"] = time.time() - t
    log(f"nnz = {X.nnz} ({X.nnz / X.shape[0] / X.shape[1]:.4f} density)")

    rng = np.random.default_rng(1)
    cond = (np.arange(N_CELLS) >= N_CELLS // 2).astype(int)
    obs = pd.DataFrame({
        "condition": cond.astype(str),
        "capture_q": np.full(N_CELLS, 0.1),
    })
    adata = mt.AnnData(X, obs=obs)

    t = time.time()
    mt.setup_memento(adata, q_column="capture_q", filter_mean_thresh=0.0,
                     trim_percent=0.1)
    mt.create_groups(adata, label_columns=["condition"])
    phases["setup"] = time.time() - t
    log(f"setup: {phases['setup']:.1f}s")

    t = time.time()
    mt.compute_1d_moments(adata, min_perc_group=0.0)
    phases["moments_1d"] = time.time() - t
    g = adata.shape[1]
    log(f"compute_1d_moments: {phases['moments_1d']:.1f}s ({g} genes kept)")

    groups = mt.get_groups(adata)
    covariate = pd.DataFrame(np.ones((len(groups), 1)), index=groups.index)
    treatment = pd.DataFrame(
        {"tx": groups["condition"].astype(int).values}, index=groups.index)

    profiling.reset_timings()
    t = time.time()
    mt.ht_1d_moments(adata, covariate=covariate, treatment=treatment,
                     num_boot=NUM_BOOT, resampling="bootstrap",
                     tile_size=TILE, verbose=1)
    phases["ht_1d"] = time.time() - t
    log(f"ht_1d_moments: {phases['ht_1d']:.1f}s "
        f"({g / phases['ht_1d']:.1f} genes/s at B={NUM_BOOT})")
    profiling.report(file=sys.stderr)

    res = mt.get_1d_ht_result(adata)
    finite = float(np.isfinite(res.de_pval.values).mean())
    log(f"finite de_pvals: {finite:.4f}")

    # stall-excluded steady state, computed (not narrated): see
    # profiling.steady_state
    steady = profiling.steady_state(phases["ht_1d"], "ht1d", g)

    print(json.dumps({
        "config": {"cells": N_CELLS, "genes_in": N_GENES, "genes_tested": g,
                   "num_boot": NUM_BOOT},
        "phases_s": {k: round(v, 2) for k, v in phases.items()},
        "ht_genes_per_s": round(g / phases["ht_1d"], 2),
        "ms_per_gene": round(phases["ht_1d"] / g * 1000, 3),
        "ht_oneoff_s": steady["oneoff_s"],
        "ht_steady_genes_per_s": steady["steady_items_per_s"],
        "steady_ms_per_gene": round(1000.0 /
                                    max(steady["steady_items_per_s"], 1e-9),
                                    3),
        "finite_pval_frac": finite,
    }))


if __name__ == "__main__":
    main()
