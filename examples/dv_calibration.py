"""DV (differential-variability) null-calibration investigation.

Question (VERDICT r1): the framework's shuffled-label run shows
lambda_GC(DV) ~ 1.2 while DE sits at ~0.96 — is that inflation an
implementation artifact, or a property of the method itself?

Instrument: the clean-room numpy oracle (``tests/oracle.py`` — an
independent reimplementation of the reference's per-gene flow, ref
``/root/reference/memento/hypothesis_test.py:144-300``) run on the SAME
null dataset as the framework.  If oracle and framework agree on the
inflation, the cause is the algorithm (bootstrap of the log residual
variance), not this implementation.  The reference's own calibration
notebook (``analysis/simulation/calibration.ipynb`` cell 40) publishes a
numeric lambda_GC only for the MEAN test (0.996) and shows the DV null
only as a histogram, so no published number exists to compare against.

Also reports a variance-diagnostic: the ratio of the median bootstrap SE
of log-residual-variance to the empirical cross-group spread of the
observed log-residual-variance.  A ratio < 1 means the bootstrap
underestimates the sampling noise of the DV statistic -> inflated
lambda_GC, implicating the method.

    JAX_PLATFORMS=cpu python examples/dv_calibration.py

Env knobs: DV_CELLS (per group), DV_GENES, DV_BOOT, DV_SEED.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

import numpy as np
import scipy.sparse as sparse
import scipy.stats as st

N_PER_GROUP = int(os.environ.get("DV_CELLS", 8000))
N_GENES = int(os.environ.get("DV_GENES", 1024))
NUM_BOOT = int(os.environ.get("DV_BOOT", 800))
N_GROUPS = int(os.environ.get("DV_GROUPS", 2))
SEED = int(os.environ.get("DV_SEED", 0))
Q = 0.1


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def lambda_gc(pvals):
    pvals = np.asarray(pvals, float)
    pvals = pvals[np.isfinite(pvals)]
    return float(np.median(st.norm.ppf(pvals / 2) ** 2) / st.chi2.ppf(0.5, df=1))


def simulate_null(rng, n_cells, n_genes):
    """Overdispersed (NB-ish) counts with NO group structure."""
    base = np.exp(rng.uniform(np.log(0.1), np.log(3.0), n_genes))
    lam = rng.gamma(2.0, base / 2.0, size=(n_cells, n_genes))
    return sparse.csr_matrix(rng.poisson(lam * Q).astype(np.float32))


def oracle_pvals(x_groups, asf_groups, tm, trv, mv, covariate, treatment,
                 nc, num_boot, rng):
    """Numpy oracle: bootstrap DE+DV p-values for one gene (counting ASL)."""
    import oracle

    n_groups = len(x_groups)
    boot_mean = np.full((n_groups, num_boot + 1), np.nan)
    boot_var = np.full((n_groups, num_boot + 1), np.nan)
    good = np.zeros(n_groups, bool)
    for r in range(n_groups):
        if not np.isfinite(tm[r]) or not np.isfinite(trv[r]) or tm[r] == 0 \
           or trv[r] <= 0:
            continue
        vals, sfs, cnts = oracle.unique_compress(x_groups[r], asf_groups[r])
        if len(vals) <= 1:
            continue
        n = len(x_groups[r])
        draws = rng.multinomial(n, cnts / cnts.sum(), size=num_boot).T
        inv_sf = 1.0 / sfs
        with np.errstate(invalid="ignore"):
            m1 = (vals[:, None] * draws * inv_sf[:, None]).sum(0) / n
            m2 = ((vals[:, None] ** 2 - (1 - Q) * vals[:, None])
                  * draws * (inv_sf ** 2)[:, None]).sum(0) / n
            mean = m1
            var = m2 - m1 ** 2
            rv = oracle.residual_variance(mean, var, mv)
        mbad = ~(np.isfinite(mean) & (mean > 0))
        vbad = ~(np.isfinite(rv) & (rv > 0))
        if mbad.all() or vbad.all():
            continue
        mean[mbad] = rng.choice(mean[~mbad], mbad.sum())
        rv[vbad] = rng.choice(rv[~vbad], vbad.sum())
        boot_mean[r, 0] = np.log(tm[r])
        boot_var[r, 0] = np.log(trv[r])
        boot_mean[r, 1:] = np.log(mean)
        boot_var[r, 1:] = np.log(rv)
        good[r] = True
    if good.sum() < 2:
        return np.nan, np.nan, np.nan
    import oracle as o

    C, T = covariate[good], treatment[good]
    w = nc[good].astype(float)

    def pv(boot):
        bt = o.wls_residualize(C, boot[good], w)
        tt = o.wls_residualize(C, T, w)
        coef = o.cross_coef(tt, bt, w)[0]
        stat, null = coef[0], coef[1:] - coef[0]
        ec = int(((null > abs(stat)) | (null < -abs(stat))).sum())
        return (ec + 1) / (len(null) + 1)

    # bootstrap SE of the log-rv replicates (diagnostic)
    se_logrv = float(np.nanmean(np.nanstd(boot_var[good][:, 1:], axis=1)))
    return pv(boot_mean), pv(boot_var), se_logrv


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")

    from memento_tpu.inference.ht import run_ht_1d
    from memento_tpu.ops.estimators import HYPER_RELATIVE, mean_var_sparse
    from memento_tpu.ops.mv_regression import fit_mv_regressor
    from memento_tpu.ops.size_factor import bin_size_factor
    from memento_tpu.api import _residual_variance_np

    rng = np.random.default_rng(SEED)
    n = N_PER_GROUP
    R = N_GROUPS
    X = simulate_null(rng, R * n, N_GENES)
    # shuffled labels => exact null
    labels = rng.permutation(np.repeat(np.arange(R), n))
    groups = [X[labels == r].tocsc() for r in range(R)]

    sf = np.asarray(X.sum(axis=1)).ravel()
    sf = sf / sf.mean()
    asf = bin_size_factor(sf, 30)
    asf_groups = [asf[labels == r] for r in range(R)]

    tm, tv = [], []
    for r in range(R):
        m, v = mean_var_sparse(groups[r], sf[labels == r], Q)
        tm.append(m)
        tv.append(v)
    tm, tv = np.array(tm), np.array(tv)
    mv = fit_mv_regressor(tm.ravel(), tv.ravel())
    trv = np.stack([_residual_variance_np(tm[r], tv[r], mv) for r in range(R)])
    covariate = np.ones((R, 1))
    treatment = (np.arange(R) % 2).astype(float).reshape(R, 1)
    nc = np.full(R, n)

    log(f"framework run: {N_GENES} genes, {R}x{n} cells, B={NUM_BOOT}")
    t = time.time()
    got = run_ht_1d(
        jax.random.key(SEED),
        groups=groups,
        approx_sf=asf_groups,
        true_mean=tm,
        true_res_var=trv,
        mv_coeffs=np.tile(mv, (R, 1)),
        q=np.full(R, Q),
        covariate=covariate,
        treatment=treatment,
        num_boot=NUM_BOOT,
        model=HYPER_RELATIVE,
        resampling="bootstrap",
        tile_size=256,
    )
    log(f"framework done in {time.time() - t:.1f}s")
    fw_de = np.asarray(got["mean_pval"][:, 0])
    fw_dv = np.asarray(got["var_pval"][:, 0])

    log("oracle loop ...")
    t = time.time()
    o_rng = np.random.default_rng(1234 + SEED)
    o_de = np.full(N_GENES, np.nan)
    o_dv = np.full(N_GENES, np.nan)
    se_logrv = np.full(N_GENES, np.nan)
    dense = [np.asarray(g.todense()) for g in groups]
    for j in range(N_GENES):
        o_de[j], o_dv[j], se_logrv[j] = oracle_pvals(
            [dense[r][:, j] for r in range(R)], asf_groups,
            tm[:, j], trv[:, j], mv, covariate, treatment, nc,
            NUM_BOOT, o_rng)
        if (j + 1) % 256 == 0:
            log(f"  oracle {j + 1}/{N_GENES}")
    log(f"oracle done in {time.time() - t:.1f}s")

    # diagnostic: does the bootstrap SE of log-rv match the empirical
    # cross-group spread of the observed treatment contrast under the null?
    tx = treatment[:, 0] == 1
    n_t, n_c = int(tx.sum()), int((~tx).sum())
    with np.errstate(invalid="ignore", divide="ignore"):
        obs_diff = (np.nanmean(np.log(trv[tx]), axis=0)
                    - np.nanmean(np.log(trv[~tx]), axis=0))
    emp_sd = float(np.nanstd(obs_diff))
    boot_sd = float(np.nanmedian(se_logrv) * np.sqrt(1.0 / n_t + 1.0 / n_c))

    out = {
        "config": {"genes": N_GENES, "cells_per_group": n, "groups": R,
                   "B": NUM_BOOT, "seed": SEED},
        "lambda_gc": {
            "framework_de": round(lambda_gc(fw_de), 3),
            "framework_dv": round(lambda_gc(fw_dv), 3),
            "oracle_de": round(lambda_gc(o_de), 3),
            "oracle_dv": round(lambda_gc(o_dv), 3),
        },
        "dv_se_diagnostic": {
            "empirical_sd_of_null_dv_stat": round(emp_sd, 4),
            "bootstrap_sd_of_dv_stat": round(boot_sd, 4),
            "ratio_boot_over_empirical": round(boot_sd / emp_sd, 3),
        },
        "frac_p05": {
            "framework_dv": round(float(np.nanmean(fw_dv < 0.05)), 4),
            "oracle_dv": round(float(np.nanmean(o_dv < 0.05)), 4),
        },
    }
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
