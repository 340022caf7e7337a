"""Size-factor estimation, shrinkage, and binning.

Re-implements the reference's size-factor pipeline (C6/C16 in SURVEY.md):

- ``estimate_size_factor``: total-count or masked+shrunk size factors
  (ref ``/root/reference/memento/estimator.py:49-81``; we fix the reference's
  ``total=False, mask=None`` UnboundLocalError path by validating arguments).
- ``bin_size_factor``: quantize size factors into ``num_bins`` equal-width
  bins, replacing each cell's factor by its bin mean; cells at the global
  maximum keep their exact value (ref ``main.py:138-153``).  The binning is
  what makes unique-value compression effective — the bootstrap then only
  distinguishes (expression value, sf-bin) combos.

Host-side numpy is used: size factors are computed once per dataset over
sparse inputs; the device pipeline consumes only the resulting per-cell
vectors.  An equivalent pure-JAX path over dense tiles is provided for the
device-streaming/data-parallel story.
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sparse

from .estimators import EstimatorType, is_absolute


def estimate_size_factor(
    X,
    estimator_type: EstimatorType = "hyper_relative",
    shrinkage: float = 0.5,
    mask=None,
    total: bool = False,
):
    """Per-cell size factors.

    Args:
      X: ``[N, G]`` sparse or dense count matrix.
      estimator_type: 'absolute' models return all-ones (ref
        ``estimator.py:59-60``).
      shrinkage: additive shrinkage quantile for the masked path (ref
        ``estimator.py:74``).
      mask: optional boolean gene mask (least-variable genes); when given the
        masked total counts are shrunk and normalized by their mean (ref
        ``estimator.py:71-76``).
      total: plain total counts, unnormalized (ref ``estimator.py:64-69``).

    Returns:
      ``[N]`` float array.
    """
    n_obs = X.shape[0]
    if is_absolute(estimator_type):
        return np.ones(n_obs)
    if not total and mask is None:
        raise ValueError("one of total=True or mask=... is required")

    # fused native CSR pass: row totals + masked totals in one sweep
    # (X.multiply(mask) below allocates a full nnz-sized temporary)
    native_sums = None
    if sparse.issparse(X) and X.format == "csr":
        from ..native import row_sums_csr_native

        native_sums = row_sums_csr_native(
            X, mask=np.asarray(mask) if mask is not None else None)

    if native_sums is not None:
        row_tot, nrc = native_sums
    elif sparse.issparse(X):
        row_tot = np.asarray(X.sum(axis=1)).reshape(-1)
    else:
        row_tot = np.asarray(X).sum(axis=1)

    if mask is not None:
        if native_sums is None:
            mask = np.asarray(mask)
            if sparse.issparse(X):
                nrc = np.asarray(
                    X.multiply(mask.reshape(1, -1)).sum(axis=1)).reshape(-1)
            else:
                nrc = (np.asarray(X) * mask.reshape(1, -1)).sum(axis=1)
        nrc = nrc + np.quantile(nrc, shrinkage)  # additive shrinkage
        return nrc / nrc.mean()

    return row_tot.astype(np.float64)


def bin_size_factor(size_factor, num_bins: int = 30):
    """Quantize size factors to bin means (ref ``main.py:138-153``).

    Equal-width bins over [min, max] (scipy ``binned_statistic`` semantics);
    each cell's factor is replaced by its bin's mean; the maximal cell(s)
    keep their exact value.

    Returns:
      approx_sf: ``[N]`` quantized factors (<= num_bins + 1 distinct values).
    """
    size_factor = np.asarray(size_factor, dtype=np.float64)
    lo, hi = size_factor.min(), size_factor.max()
    if hi == lo:
        return size_factor.copy()
    edges = np.linspace(lo, hi, num_bins + 1)
    # bin index in [0, num_bins-1]; right edge inclusive
    idx = np.clip(np.searchsorted(edges, size_factor, side="right") - 1, 0, num_bins - 1)
    sums = np.bincount(idx, weights=size_factor, minlength=num_bins)
    cnts = np.bincount(idx, minlength=num_bins)
    with np.errstate(invalid="ignore"):
        means = sums / cnts
    # Empty bins never appear in idx, so NaN means are never gathered, but the
    # reference clips indices into populated range; gather is safe as-is.
    approx = means[idx]
    approx[size_factor == hi] = hi  # ref main.py:146-147
    return approx


def factorize_approx_sf(approx_sf):
    """Map quantized size factors to dense bin ids.

    Returns:
      (bin_values, bin_ids): ``bin_values[bin_ids] == approx_sf``.
      ``bin_values`` is sorted ascending; there are at most num_bins+1 of
      them.  These integer ids drive the exact unique-value compression
      (replacing the reference's random-projection float hash,
      ``bootstrap.py:62-67``).
    """
    bin_values, bin_ids = np.unique(np.asarray(approx_sf), return_inverse=True)
    return bin_values, bin_ids.astype(np.int32)


__all__ = ["estimate_size_factor", "bin_size_factor", "factorize_approx_sf"]
