"""Utility subsystems: blocks/checkpointing, profiling, stats helpers."""

import numpy as np
import pytest

from memento_tpu.utils.blocks import clear_checkpoints, run_blocks
from memento_tpu.utils import profiling
from memento_tpu.utils.stats import concordance, fdrcorrect, fdrcorrection, lambda_gc


def test_run_blocks_and_resume(tmp_path):
    calls = []

    def run_block(start, stop):
        calls.append((start, stop))
        return {"x": np.arange(start, stop, dtype=float),
                "y": np.arange(start, stop, dtype=float) * 2}

    out = run_blocks(10, 4, run_block, checkpoint_dir=str(tmp_path))
    np.testing.assert_array_equal(out["x"], np.arange(10))
    np.testing.assert_array_equal(out["y"], np.arange(10) * 2)
    assert calls == [(0, 4), (4, 8), (8, 10)]

    # resume: no recomputation
    calls.clear()
    out2 = run_blocks(10, 4, run_block, checkpoint_dir=str(tmp_path))
    np.testing.assert_array_equal(out2["x"], np.arange(10))
    assert calls == []

    assert clear_checkpoints(str(tmp_path)) == 3
    out3 = run_blocks(10, 4, run_block, checkpoint_dir=str(tmp_path))
    assert calls == [(0, 4), (4, 8), (8, 10)]
    np.testing.assert_array_equal(out3["x"], np.arange(10))


def test_run_blocks_no_checkpoint():
    out = run_blocks(5, 2, lambda a, b: {"v": np.ones(b - a)})
    assert out["v"].shape == (5,)


def test_profiling_phases():
    profiling.reset_timings()
    with profiling.phase("alpha"):
        pass
    with profiling.phase("alpha"):
        pass
    with profiling.phase("beta"):
        pass
    t = profiling.timings()
    assert t["alpha"]["count"] == 2
    assert t["beta"]["count"] == 1
    rep = profiling.report()
    assert "alpha" in rep and "beta" in rep
    # max(s) column distinguishes one slow (compile) call from uniform
    # per-tile overhead when attributing orchestrator phases
    assert "max(s)" in rep


def test_fdrcorrection_matches_bh():
    pvals = np.array([0.001, 0.008, 0.039, 0.041, 0.042, 0.06, 0.074, 0.205,
                      0.212, 0.216, 0.222, 0.251, 0.269, 0.275, 0.34, 0.341,
                      0.384, 0.569, 0.594, 0.696, 0.762, 0.94, 0.942, 0.975,
                      0.986])
    alpha = 0.25
    rej, q = fdrcorrection(pvals, alpha=alpha)
    # independent step-up oracle: largest k with p_(k) <= k/m * alpha
    m = len(pvals)
    order = np.argsort(pvals)
    ps = pvals[order]
    ks = np.nonzero(ps <= (np.arange(1, m + 1) / m) * alpha)[0]
    want_rej = np.zeros(m, bool)
    if len(ks):
        want_rej[order[: ks.max() + 1]] = True
    np.testing.assert_array_equal(rej, want_rej)
    assert want_rej.sum() > 0
    assert np.all(q >= pvals - 1e-12)  # q-values dominate raw p-values
    assert np.all(np.diff(q[order]) >= -1e-12)


def test_fdrcorrect_nan_passthrough():
    p = np.array([0.01, np.nan, 0.5, np.nan])
    fdr = fdrcorrect(p)
    assert fdr[1] == 1.0 and fdr[3] == 1.0
    assert fdr[0] <= 0.5


def test_lambda_gc_uniform(rng):
    p = rng.random(20000)
    assert abs(lambda_gc(p) - 1.0) < 0.05


def test_concordance_perfect_and_shifted(rng):
    x = rng.normal(size=500)
    assert concordance(x, x) == pytest.approx(1.0)
    assert concordance(x, x + 2.0) < 0.5
    assert np.isnan(concordance(np.array([np.nan]), np.array([1.0])))


def test_util_compat_shim():
    """memento.util.* drop-in names resolve (reference analyses pattern)."""
    import numpy as np

    import memento_tpu as mt

    fdr = mt.util._fdrcorrect(np.array([0.01, np.nan, 0.5]))
    assert fdr.shape == (3,) and fdr[1] == 1.0
    assert hasattr(mt.simulate, "capture_sampling")


def test_ht_1d_checkpoint_resume(tmp_path):
    """Checkpointed ht_1d_moments resumes from saved blocks with identical
    results (and matches a fresh checkpointed run)."""
    import numpy as np
    import pandas as pd
    import scipy.sparse as sparse

    import memento_tpu as mt
    from memento_tpu.models.simulate import simulate_two_groups

    rng = np.random.default_rng(7)
    X, cond, rep, qs = simulate_two_groups(
        n_cells_per_group=250, n_genes=24, q=0.1,
        de_genes=np.arange(2), de_lfc=0.8, n_replicates=1, rng=rng,
    )
    obs = pd.DataFrame({"condition": cond.astype(str), "capture_q": qs})

    def setup():
        ad = mt.AnnData(sparse.csr_matrix(X.astype(np.float64)), obs=obs.copy())
        mt.setup_memento(ad, q_column="capture_q", filter_mean_thresh=0.01,
                         trim_percent=0.3)
        mt.create_groups(ad, label_columns=["condition"])
        mt.compute_1d_moments(ad, min_perc_group=0.5)
        return ad

    kw = dict(num_boot=100, resampling="bootstrap", approx=True, seed=0,
              checkpoint_block=8, verbose=0)
    ad = setup()
    gdf = mt.get_groups(ad)
    cov = pd.DataFrame(np.ones((len(gdf), 1)), index=gdf.index)
    tx = pd.DataFrame({"tx": gdf["condition"].astype(int).values},
                      index=gdf.index)
    ckpt = str(tmp_path / "ck")
    mt.ht_1d_moments(ad, covariate=cov, treatment=tx, checkpoint_dir=ckpt, **kw)
    first = mt.get_1d_ht_result(ad)

    # simulate a crash: delete the LAST block, keep earlier ones, rerun
    import os
    blocks = sorted(os.listdir(ckpt))
    assert len(blocks) >= 2
    os.remove(os.path.join(ckpt, blocks[-1]))
    ad2 = setup()
    mt.ht_1d_moments(ad2, covariate=cov, treatment=tx, checkpoint_dir=ckpt, **kw)
    second = mt.get_1d_ht_result(ad2)
    np.testing.assert_allclose(first.de_coef.values, second.de_coef.values,
                               equal_nan=True)
    np.testing.assert_allclose(first.de_pval.values, second.de_pval.values,
                               equal_nan=True)


def test_run_blocks_meta_mismatch_raises(tmp_path):
    """A resumed block from a different run config must raise, not silently
    concatenate stale results (ADVICE r1: blocks are keyed by index only)."""
    import pytest

    def run_block(a, b):
        return {"v": np.arange(a, b, dtype=float)}

    run_blocks(10, 4, run_block, checkpoint_dir=str(tmp_path),
               meta={"seed": 0, "num_boot": 100})
    # same meta: resumes fine
    run_blocks(10, 4, run_block, checkpoint_dir=str(tmp_path),
               meta={"seed": 0, "num_boot": 100})
    # different seed: must raise
    with pytest.raises(ValueError, match="different run"):
        run_blocks(10, 4, run_block, checkpoint_dir=str(tmp_path),
                   meta={"seed": 1, "num_boot": 100})
    # different block size: must raise (block index no longer aligns)
    with pytest.raises(ValueError, match="different run"):
        run_blocks(10, 5, run_block, checkpoint_dir=str(tmp_path),
                   meta={"seed": 0, "num_boot": 100})
