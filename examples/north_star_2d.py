"""North-star 2D (differential-correlation) scale run — measured.

    NS_CACHE=/tmp/ns_counts.npz python examples/north_star_2d.py

Runs the full 2D public-API pipeline (``compute_2d_moments`` →
``ht_2d_moments`` → ``get_2d_ht_result``) on 10,000 gene pairs over 200k
cells at B=1,000 — the scale of the reference's production correlation
analyses, which it fans out over worker processes exactly like the 1D
(ref ``main.py:418-520``; the reference publishes no 2D benchmark).

Environment knobs: NS_CELLS, NS_GENES, NS_PAIRS, NS_BOOT, NS_TILE,
NS_CACHE (shared with north_star.py).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import pandas as pd
import scipy.sparse as sparse

N_CELLS = int(os.environ.get("NS_CELLS", 200_000))
N_GENES = int(os.environ.get("NS_GENES", 20_000))
N_PAIRS = int(os.environ.get("NS_PAIRS", 10_000))
NUM_BOOT = int(os.environ.get("NS_BOOT", 1_000))
TILE = int(os.environ.get("NS_TILE", 0)) or None


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax

    import memento_tpu as mt
    from north_star import simulate

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
    phases["load"] = time.time() - t

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
    mt.compute_1d_moments(adata, min_perc_group=0.0)
    phases["setup+1d"] = time.time() - t
    log(f"setup+1d: {phases['setup+1d']:.1f}s")

    # pairs among the most-expressed genes (correlation tests on barely
    # expressed genes are NaN in reference semantics too)
    expr = np.asarray(adata.X.sum(axis=0)).ravel()
    top = np.argsort(expr)[::-1][:4000]
    rng = np.random.default_rng(7)
    p1 = rng.integers(0, len(top), N_PAIRS)
    p2 = (p1 + 1 + rng.integers(0, len(top) - 1, N_PAIRS)) % len(top)
    i1, i2 = top[p1], top[p2]
    names = adata.var.index.values
    gene_pairs = list(zip(names[i1], names[i2]))

    t = time.time()
    mt.compute_2d_moments(adata, gene_pairs)
    phases["moments_2d"] = time.time() - t
    log(f"compute_2d_moments: {phases['moments_2d']:.1f}s ({N_PAIRS} pairs)")

    groups = mt.get_groups(adata)
    covariate = pd.DataFrame(np.ones((len(groups), 1)), index=groups.index)
    treatment = pd.DataFrame(
        {"tx": groups["condition"].astype(int).values}, index=groups.index)

    from memento_tpu.utils import profiling
    profiling.reset_timings()

    t = time.time()
    mt.ht_2d_moments(adata, covariate=covariate, treatment=treatment,
                     num_boot=NUM_BOOT, resampling="bootstrap",
                     tile_size=TILE, verbose=1)
    phases["ht_2d"] = time.time() - t
    log(f"ht_2d_moments: {phases['ht_2d']:.1f}s "
        f"({N_PAIRS / phases['ht_2d']:.1f} pairs/s at B={NUM_BOOT})")

    res = mt.get_2d_ht_result(adata)
    finite = float(np.isfinite(res.corr_pval.values).mean())
    log(f"finite corr_pvals: {finite:.4f}")
    profiling.report(file=sys.stderr)

    # stall-excluded steady state, computed (not narrated): see
    # profiling.steady_state
    steady = profiling.steady_state(phases["ht_2d"], "ht2d", N_PAIRS)

    print(json.dumps({
        "config": {"cells": N_CELLS, "genes": N_GENES, "pairs": N_PAIRS,
                   "num_boot": NUM_BOOT},
        "phases_s": {k: round(v, 2) for k, v in phases.items()},
        "ht_pairs_per_s": round(N_PAIRS / phases["ht_2d"], 2),
        "ms_per_pair": round(phases["ht_2d"] / N_PAIRS * 1000, 3),
        "ht_oneoff_s": steady["oneoff_s"],
        "ht_steady_pairs_per_s": steady["steady_items_per_s"],
        "finite_pval_frac": finite,
    }))


if __name__ == "__main__":
    main()
