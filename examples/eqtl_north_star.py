"""eQTL production-shape scale run — measured (VERDICT r3 item 5).

    NS_CACHE=/tmp/ns_counts.npz python examples/eqtl_north_star.py

The reference's heaviest real workload is ``treatment_for_gene`` eQTL
blocks: per-gene SNP subsets, B=3000-5000, tens of thousands of gene-SNP
tests fanned over ~90 CPUs (ref ``analysis/lupus/run_memento.py:40-52,
104-109``).  This runs >=50,000 gene-SNP tests (10,240 genes x ~5 SNPs
each, Kt up to 8) at B=5,000 with bootstrap resampling and counting+GEV
p-values through the public run_ht_1d path with a padded per-gene
treatment tensor.

Env knobs: EQTL_GENES, EQTL_BOOT, EQTL_KT, NS_CELLS, NS_GENES, NS_CACHE.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import scipy.sparse as sparse

N_CELLS = int(os.environ.get("NS_CELLS", 200_000))
N_GENES = int(os.environ.get("NS_GENES", 20_000))
EQTL_GENES = int(os.environ.get("EQTL_GENES", 10_240))
EQTL_BOOT = int(os.environ.get("EQTL_BOOT", 5_000))
EQTL_KT = int(os.environ.get("EQTL_KT", 8))
TILE = int(os.environ.get("EQTL_TILE", 1024))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax

    from memento_tpu.inference.ht import run_ht_1d
    from memento_tpu.ops.estimators import get_noise_model, mean_var_sparse
    from memento_tpu.ops.mv_regression import fit_mv_regressor
    from memento_tpu.api import _residual_variance_np
    from memento_tpu.ops.size_factor import (bin_size_factor,
                                             estimate_size_factor)
    from memento_tpu.utils import enable_compile_cache, profiling
    from north_star import simulate

    enable_compile_cache(os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
    log(f"devices: {jax.devices()}")

    cache = os.environ.get("NS_CACHE", "")
    if cache and os.path.exists(cache):
        X = sparse.load_npz(cache).tocsr()[:, :EQTL_GENES]
    else:
        X = simulate(N_CELLS, EQTL_GENES)
    n, g = X.shape
    log(f"{n} cells x {g} genes")

    q = 0.1
    model = get_noise_model("hyper_relative")
    half = n // 2
    groups = [X[:half].tocsc(), X[half:].tocsc()]
    sf = estimate_size_factor(X, mask=np.ones(g, bool), shrinkage=0.5)
    approx_sf = bin_size_factor(sf, num_bins=30)
    offs = [0, half, n]
    tm, tv = [], []
    for r in range(2):
        m, v = mean_var_sparse(groups[r], sf[offs[r]:offs[r + 1]], q)
        tm.append(m)
        tv.append(v)
    tm, tv = np.array(tm), np.array(tv)
    mv = fit_mv_regressor(tm.ravel(), tv.ravel())
    trv = np.stack([_residual_variance_np(tm[r], tv[r], mv)
                    for r in range(2)])

    # per-gene SNP sets: 1..EQTL_KT dosage columns in {0,1,2}
    rng = np.random.default_rng(11)
    nt = rng.integers(1, EQTL_KT + 1, g)
    tens = np.zeros((g, 2, EQTL_KT))
    for i in range(g):
        tens[i, :, : nt[i]] = rng.integers(0, 3, (2, nt[i]))
    n_tests = int(nt.sum())
    log(f"{n_tests} gene-SNP tests (mean {nt.mean():.2f} SNPs/gene, "
        f"Kt padded to {EQTL_KT}) at B={EQTL_BOOT}")

    profiling.reset_timings()
    t0 = time.time()
    res = run_ht_1d(
        key=jax.random.key(0),
        groups=groups,
        approx_sf=[approx_sf[offs[r]:offs[r + 1]] for r in range(2)],
        true_mean=tm,
        true_res_var=trv,
        mv_coeffs=np.tile(mv, (2, 1)),
        q=np.full(2, q),
        covariate=np.ones((2, 1)),
        treatment=tens,
        num_boot=EQTL_BOOT,
        model=model,
        sampler="auto",
        resampling="bootstrap",
        approx=False,
        boot_chunk=EQTL_BOOT,
        tile_size=TILE,
        verbose=True,
    )
    wall = time.time() - t0
    profiling.report(file=sys.stderr)

    # only real (non-padded) treatment columns count
    valid = np.zeros((g, EQTL_KT), bool)
    for i in range(g):
        valid[i, : nt[i]] = True
    finite = float(np.isfinite(res["mean_pval"][valid]).mean())
    steady = profiling.steady_state(wall, "ht1d", n_tests)
    print(json.dumps({
        "config": {"cells": n, "genes": g, "tests": n_tests,
                   "num_boot": EQTL_BOOT, "kt_max": EQTL_KT, "tile": TILE},
        "wall_s": round(wall, 2),
        "tests_per_s": round(n_tests / wall, 1),
        "oneoff_s": steady["oneoff_s"],
        "steady_tests_per_s": steady["steady_items_per_s"],
        "finite_pval_frac": round(finite, 4),
    }))


if __name__ == "__main__":
    main()
