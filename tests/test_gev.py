"""Batched GEV tail refinement vs the serial scipy oracle.

The batch path (``inference.gev``) must reproduce the reference procedure
(ref ``/root/reference/memento/hypothesis_test.py:94-141``) that
``inference.asl.gev_refine`` implements with scipy: same 300->60 tail
schedule, same KS gate, same fallback behavior — with MLE fits matching
``scipy.stats.genextreme.fit`` closely enough that refined p-values agree.
"""

import numpy as np
import pytest
import scipy.stats as sstats

from memento_tpu.inference.asl import gev_refine
from memento_tpu.inference.gev import (
    gev_fit_batch,
    gev_nll,
    gev_refine_batch,
    ks_pvalue_batch,
    pwm_start,
)


def test_gev_fit_matches_scipy_nll(rng):
    """Batched MLE achieves scipy's likelihood (or better) on GEV samples."""
    m, L = 24, 300
    cs = rng.uniform(-0.4, 0.4, m)
    data = np.stack([
        sstats.genextreme.rvs(cs[i], loc=rng.normal(),
                              scale=0.5 + rng.random(), size=L,
                              random_state=100 + i)
        for i in range(m)
    ])
    params, ok = gev_fit_batch(data)
    assert ok.all()
    sp = np.stack([sstats.genextreme.fit(data[i]) for i in range(m)])
    nll_batch = gev_nll(params, data)
    nll_scipy = gev_nll(sp, data)
    assert np.all(nll_batch <= nll_scipy + 0.15)


def test_ks_pvalue_matches_scipy(rng):
    """Batched KS p-value == scipy.stats.kstest for fitted params."""
    m, L = 8, 200
    data = np.stack([
        sstats.genextreme.rvs(0.1, size=L, random_state=i) for i in range(m)
    ])
    params, _ = gev_fit_batch(data)
    got = ks_pvalue_batch(np.sort(data, axis=1), params)
    for i in range(m):
        _, p_ref = sstats.kstest(data[i], "genextreme", args=tuple(params[i]))
        np.testing.assert_allclose(got[i], p_ref, rtol=1e-8)


def test_pwm_start_reasonable(rng):
    data = np.sort(sstats.genextreme.rvs(0.2, loc=3.0, scale=2.0, size=5000,
                                         random_state=0))[None, :]
    c, loc, scale = pwm_start(data)[0]
    assert abs(c - 0.2) < 0.1
    assert abs(loc - 3.0) < 0.3
    assert abs(scale - 2.0) < 0.3


def test_refine_batch_matches_serial_scipy(rng):
    """End-to-end refined p-values match the serial scipy path per row."""
    m, B = 24, 1000
    stats = rng.uniform(0.3, 1.0, m) * np.sign(rng.normal(size=m))
    nulls = rng.normal(0, 0.12, (m, B)) * (1 + 0.3 * rng.random((m, 1)))
    fallbacks = np.full(m, 1.0 / (B + 1))
    got = gev_refine_batch(stats, nulls, fallbacks)
    ref = np.array([
        gev_refine(stats[i], nulls[i], fallbacks[i]) for i in range(m)
    ])
    used_fb_got = got == fallbacks
    used_fb_ref = ref == fallbacks
    # identical accept/fallback decisions
    np.testing.assert_array_equal(used_fb_got, used_fb_ref)
    both = ~used_fb_got
    lg = np.log10(np.maximum(got[both], 1e-300))
    lr = np.log10(np.maximum(ref[both], 1e-300))
    diff = np.abs(lg - lr)
    # near-exact agreement except where the KS gate lands on a different
    # tail length right at its 0.05 boundary (both outcomes are "the
    # procedure"; the p-values differ immaterially)
    assert np.quantile(diff, 0.9) < 0.01
    assert np.max(diff) < 0.25


def test_refine_batch_nonfinite_rows_fall_back_to_serial(rng):
    """Rows with non-finite null entries route through the scipy path."""
    m, B = 4, 600
    stats = np.full(m, 0.8)
    nulls = rng.normal(0, 0.1, (m, B))
    nulls[1, ::7] = np.nan
    nulls[3, :] = np.nan  # wholly invalid -> fallback
    fallbacks = np.full(m, 1.0 / (B + 1))
    got = gev_refine_batch(stats, nulls, fallbacks)
    assert np.isfinite(got).all()
    assert got[3] == fallbacks[3]
    ref1 = gev_refine(stats[1], nulls[1][np.isfinite(nulls[1])], fallbacks[1])
    np.testing.assert_allclose(got[1], ref1, rtol=1e-6)


def test_refine_batch_degenerate_null_falls_back():
    """A constant null can't satisfy the KS gate: counting fallback kept."""
    B = 500
    stats = np.array([0.5])
    nulls = np.zeros((1, B))
    fallbacks = np.array([1.0 / (B + 1)])
    got = gev_refine_batch(stats, nulls, fallbacks)
    assert got[0] == fallbacks[0]


def test_refine_flagged_batch_shape(rng):
    """refine_flagged refines exactly the flagged subset in-place-shape."""
    from memento_tpu.inference.asl import refine_flagged

    t, kt, B = 6, 2, 800
    coef = rng.normal(0, 0.1, (t, kt, B + 1))
    coef[0, 0, 0] = 2.0  # extreme observed -> would have been flagged
    pvals = np.full((t, kt), 0.5)
    pvals[0, 0] = 1.0 / (B + 1)
    needs = np.zeros((t, kt), bool)
    needs[0, 0] = True
    out = refine_flagged(coef, pvals, needs, "bootstrap")
    assert out.shape == pvals.shape
    assert (out[~needs] == 0.5).all()
    assert np.isfinite(out[0, 0])


def test_refine_batch_warns_below_tail_schedule(rng):
    """num_boot < 300 clips the tail schedule -> ONE loud RuntimeWarning."""
    import warnings

    from memento_tpu.inference import gev as gev_mod

    B = 120  # < TAIL_SCHEDULE[0]
    stats = np.array([0.9, 0.3])
    nulls = rng.normal(0, 0.1, (2, B))
    fallbacks = np.full(2, 1.0 / (B + 1))
    gev_mod._WARNED_SMALL_B = False  # reset the once-per-process latch
    with pytest.warns(RuntimeWarning, match="num_boot"):
        got = gev_refine_batch(stats, nulls, fallbacks)
    assert got.shape == (2,)

    # warns ONCE per process: a second small-B call (e.g. the next tile of a
    # long run) stays silent even under an error filter
    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)
        gev_refine_batch(stats, nulls, fallbacks)

    # and no warning at a healthy B
    gev_mod._WARNED_SMALL_B = False
    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)
        gev_refine_batch(stats, rng.normal(0, 0.1, (2, 600)), fallbacks)
