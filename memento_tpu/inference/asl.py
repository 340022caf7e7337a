"""Achieved significance levels (C12 in SURVEY.md).

Mirrors ``_compute_asl`` (ref ``/root/reference/memento/hypothesis_test.py:
57-141``) as a two-stage design:

1. a fully vectorized on-device pass computing the normal-approximation
   p-value and the two-sided extreme-count p-value for every test, plus a
   flag marking tests whose extreme count is small enough (<= 10) that the
   reference would refit a generalized-extreme-value tail;
2. a host-side refinement (`gev_refine`) running the reference's GEV/KS
   procedure only for the flagged (rare) tests — keeping the iterative
   scipy MLE off the device critical path (SURVEY.md §7 step 4).
"""

from __future__ import annotations

import warnings

import jax.numpy as jnp
import jax.scipy.stats as jstats
import numpy as np

GEV_COUNT_THRESHOLD = 10


def asl_counting(coef, resampling: str, approx: bool):
    """Vectorized first-stage ASL.

    Args:
      coef: ``[..., B+1]`` regression coefficients; column 0 observed.
      resampling: 'bootstrap' (null = coef[1:] - coef[0]) or 'permutation'
        (null = coef[1:]) — ref ``hypothesis_test.py:66-71``.
      approx: use the two-sided normal fit (ref ``hypothesis_test.py:77-83``).

    Returns:
      (pval, needs_gev):
        pval ``[...]`` float; NaN where the distribution is degenerate.
        needs_gev ``[...]`` bool; always False when ``approx``.
    """
    if resampling not in ("bootstrap", "permutation"):
        raise ValueError("resampling must be 'bootstrap' or 'permutation'")

    stat = coef[..., 0]
    null = coef[..., 1:]
    if resampling == "bootstrap":
        null = null - stat[..., None]

    finite = jnp.isfinite(null)
    n_finite = finite.sum(-1)

    # degenerate: all values (incl. observed) equal to their PLAIN mean —
    # the reference's ``np.all(perm_diff == perm_diff.mean())`` (ref
    # hypothesis_test.py:62): any NaN poisons the mean and every comparison
    # is then False, so a row with NaNs is NEVER degenerate (an all-NaN
    # row falls through to the counting path and yields p = 1.0, matching
    # the reference's GEV-failure fallback — tests/test_reference_parity.py)
    mean_all = jnp.mean(coef, axis=-1)
    degenerate = jnp.all(coef == mean_all[..., None], axis=-1)

    if approx:
        null_f = jnp.where(finite, null, jnp.nan)
        mu = jnp.nanmean(null_f, axis=-1)
        sd = jnp.sqrt(jnp.nanmean((null_f - mu[..., None]) ** 2, axis=-1))
        abs_stat = jnp.abs(stat)
        sd = jnp.maximum(sd, 1e-300)
        p = jstats.norm.sf(abs_stat, mu, sd) + jstats.norm.cdf(-abs_stat, mu, sd)
        p = jnp.where(degenerate, jnp.nan, p)
        return p, jnp.zeros_like(degenerate)

    abs_stat = jnp.abs(stat)[..., None]
    extreme = ((null > abs_stat) | (null < -abs_stat)) & finite
    ec = extreme.sum(-1)
    p = (ec + 1.0) / (n_finite + 1.0)
    p = jnp.where(degenerate, jnp.nan, p)
    needs = (ec <= GEV_COUNT_THRESHOLD) & ~degenerate & (n_finite > 0)
    return p, needs


def gev_refine(stat: float, null: np.ndarray, fallback: float) -> float:
    """Reference GEV tail refinement for one test (host, scipy).

    Fits ``scipy.stats.genextreme`` to shrinking sorted tails (300 -> 50 in
    steps of 30), accepting a fit when the KS p-value exceeds 0.05, and sums
    the scaled tail CDF/SF (ref ``hypothesis_test.py:94-141``).  Returns the
    counting ``fallback`` when fitting fails.
    """
    import scipy.stats as sstats

    null = null[np.isfinite(null)]
    if null.size == 0:
        return fallback
    perm_dist = np.sort(null)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        try:
            left_asl = None
            n_exec = 300
            while n_exec > 50:
                tail = perm_dist[:n_exec]
                params = sstats.genextreme.fit(tail)
                _, ks_p = sstats.kstest(tail, "genextreme", args=params)
                if ks_p > 0.05:
                    val = sstats.genextreme.cdf(-abs(stat), *params)
                    left_asl = (n_exec / perm_dist.shape[0]) * val
                    break
                n_exec -= 30
            if left_asl is None:
                return fallback
            n_exec = 300
            while n_exec > 50:
                tail = perm_dist[-n_exec:]
                params = sstats.genextreme.fit(tail)
                _, ks_p = sstats.kstest(tail, "genextreme", args=params)
                if ks_p > 0.05:
                    val = sstats.genextreme.sf(abs(stat), *params)
                    return (n_exec / perm_dist.shape[0]) * val + left_asl
                n_exec -= 30
            return fallback
        except Exception:
            return fallback


def refine_flagged(coef: np.ndarray, pvals: np.ndarray, needs: np.ndarray,
                   resampling: str) -> np.ndarray:
    """Apply GEV refinement to every flagged test (batched, see
    ``inference.gev``).

    Args:
      coef: ``[..., B+1]`` host array of coefficients.
      pvals / needs: outputs of ``asl_counting`` (host arrays).

    Returns:
      refined p-values, same shape as ``pvals``.
    """
    from .gev import gev_refine_batch

    out = pvals.copy()
    needs = np.asarray(needs, bool)
    if not needs.any():
        return out
    rows = np.asarray(coef[needs], np.float64)
    stats = rows[:, 0]
    nulls = rows[:, 1:]
    if resampling == "bootstrap":
        nulls = nulls - stats[:, None]
    out[needs] = gev_refine_batch(stats, nulls, out[needs])
    return out


__all__ = ["asl_counting", "gev_refine", "refine_flagged", "GEV_COUNT_THRESHOLD"]
