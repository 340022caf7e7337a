"""Pairwise covariance and all-by-all correlation matrices (C5/C18).

Two paths:

- ``cov_sparse_pairs``: host-side exact covariances for explicit gene-pair
  lists (mirrors ``_hyper_cov_relative``'s sparse branch, ref
  ``/root/reference/memento/estimator.py:207-233``).
- ``corr_matrix_device``: the G x G symmetric correlation matrix
  (ref ``_hyper_corr_symmetric``, ``estimator.py:236-270``) computed as a
  blocked weighted Gram matrix on device — cells stream through in dense
  tiles and accumulate ``(WX)^T (WX)`` with MXU matmuls, the one O(G^2 N)
  op in the framework (SURVEY.md §3.5).  Shardable over cells (psum) and
  over G x G output tiles (the "tensor parallel" analog of SURVEY.md §2.2).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sparse

from .estimators import NoiseModel
from .transport import compact_transport_dtype


def cov_sparse_pairs(X, size_factor, q, idx1, idx2, model: NoiseModel):
    """Exact covariance for pair lists from sparse data (host path).

    cov_p = (1/N) sum_c x1 x2 / sf^2
            - [idx1==idx2] * c * (1/N) sum_c x1 / sf^2
            - ((1/N) sum x1/sf) ((1/N) sum x2/sf)

    Note the reference computes the mean terms as means of the
    *sqrt-weighted* columns (``X.mean(axis=0)`` of ``x/sf``), identical to
    ``(1/N) sum x/sf``.
    """
    X = X.tocsc() if sparse.issparse(X) else sparse.csc_matrix(X)
    n = X.shape[0]
    sf = np.asarray(size_factor, dtype=np.float64)
    w = (1.0 / sf).reshape(1, -1)
    w2 = w**2
    idx1 = np.asarray(idx1)
    idx2 = np.asarray(idx2)

    s1 = np.asarray(w @ X).ravel() / n  # per-gene mean of x/sf
    s1sq = np.asarray(w2 @ X).ravel() / n  # per-gene mean of x/sf^2

    from ..native import pair_prods_csc_native

    prod = pair_prods_csc_native(X, (1.0 / sf) ** 2, idx1, idx2)
    if prod is not None:
        prod = prod / n
    else:
        X1 = X[:, idx1]
        X2 = X[:, idx2]
        inv2 = sparse.diags((1.0 / sf) ** 2)
        prod = np.asarray((X1.multiply(inv2 @ X2)).sum(axis=0)).ravel() / n

    c = float(np.asarray(model.var_correction(q)))
    same = idx1 == idx2
    prod = prod - np.where(same, c * s1sq[idx1], 0.0)
    return prod - s1[idx1] * s1[idx2]


def _kahan_add(acc, comp, update):
    """One compensated-summation step: (acc, comp) += update.

    Keeps the across-block accumulation error O(eps) instead of
    O(n_blocks * eps) — the f32 Gram sums feed a cancelling
    ``S/n - outer(m, m)`` subtraction downstream, so error growth over a
    10^6-cell stream directly corrupts correlations.  (XLA does not apply
    unsafe float reassociation, so the compensation survives compilation.)
    """
    y = update - comp
    t = acc + y
    comp = (t - acc) - y
    return t, comp


@functools.partial(jax.jit, donate_argnums=(3, 4, 5, 6, 7, 8))
def _gram_update(xb, inv_sf_b, inv_sf_sq_b, S, s1, sdiag, cS, cs1, csdiag):
    """Accumulate one dense cell block into the compensated Gram stats.

    ``xb`` may arrive as a compact integer dtype (transport form); the
    f32 cast happens here on device."""
    xb = xb.astype(jnp.float32)
    wx = xb * inv_sf_b[:, None]
    S, cS = _kahan_add(
        S, cS, jnp.dot(wx.T, wx, preferred_element_type=jnp.float32)
    )
    s1, cs1 = _kahan_add(s1, cs1, wx.sum(axis=0))
    sdiag, csdiag = _kahan_add(sdiag, csdiag,
                               (inv_sf_sq_b[:, None] * xb).sum(axis=0))
    return S, s1, sdiag, cS, cs1, csdiag


def corr_matrix_device(X, size_factor, q, var, model: NoiseModel,
                       block: int = 2048, row_block: Optional[int] = None,
                       out_dtype=None):
    """All-by-all correlation matrix via blocked device matmuls.

    Args:
      X: ``[N, G]`` sparse/dense counts for one group.
      size_factor: ``[N]`` exact size factors.
      q: group capture efficiency.
      var: ``[G]`` per-gene variances (1d moments) for the denominator.
      block: cells per streamed dense tile.
      row_block: when set, the Gram matrix is pulled to host and finished
        in ``[row_block, G]`` slices (peak extra host memory = one slice of
        f64 temporaries instead of ~4 full G x G arrays — required at 20k+
        genes on small hosts).
      out_dtype: output dtype (default float64; float32 halves the result).

    Returns:
      ``[G, G]`` numpy array with the reference's semantics
      (ref ``estimator.py:256-268``): invalid variances or out-of-range
      values -> NaN, values within +-1.05 clipped to [-1, 1].
    """
    n, g = X.shape
    sf = np.asarray(size_factor, dtype=np.float64)
    S = jnp.zeros((g, g), jnp.float32)
    s1 = jnp.zeros((g,), jnp.float32)
    sdiag = jnp.zeros((g,), jnp.float32)
    cS = jnp.zeros((g, g), jnp.float32)
    cs1 = jnp.zeros((g,), jnp.float32)
    csdiag = jnp.zeros((g,), jnp.float32)
    issp = sparse.issparse(X)
    Xc = X.tocsr() if issp else np.asarray(X)
    tdtype = compact_transport_dtype(Xc) or np.float32
    for start in range(0, n, block):
        stop = min(start + block, n)
        xb = Xc[start:stop]
        xb = np.asarray(xb.todense()) if issp else xb
        S, s1, sdiag, cS, cs1, csdiag = _gram_update(
            jnp.asarray(np.asarray(xb, tdtype)),
            jnp.asarray(1.0 / sf[start:stop], jnp.float32),
            jnp.asarray(1.0 / sf[start:stop] ** 2, jnp.float32),
            S, s1, sdiag, cS, cs1, csdiag,
        )
    c = float(np.asarray(model.var_correction(q)))
    if row_block is None:
        out = finish_corr_host(S, s1, sdiag, var, n, c)
        return out.astype(out_dtype) if out_dtype is not None else out
    s1_h, sdiag_h = np.asarray(s1), np.asarray(sdiag)
    out = np.empty((g, g), dtype=out_dtype or np.float64)
    for r0 in range(0, g, row_block):
        r1 = min(r0 + row_block, g)
        out[r0:r1] = finish_corr_rows(np.asarray(S[r0:r1]), r0, s1_h,
                                      sdiag_h, var, n, c)
    return out


def finish_corr_rows(S_rows, row_start, s1, sdiag, var, n, c):
    """Finish a ``[Rb, G]`` row slice of the Gram matrix in host float64.

    ``row_start`` locates the slice so the diagonal noise correction lands
    on the right entries.  Same semantics as ``finish_corr_host`` (which is
    the full-range special case).
    """
    S_rows = np.asarray(S_rows, dtype=np.float64)
    s1 = np.asarray(s1, dtype=np.float64)
    sdiag = np.asarray(sdiag, dtype=np.float64)
    rb, g = S_rows.shape

    prod = S_rows / n
    ri = np.arange(rb)
    ci = ri + row_start
    on_diag = ci < g
    prod[ri[on_diag], ci[on_diag]] -= c * sdiag[ci[on_diag]] / n
    cov = prod - np.outer(s1[row_start:row_start + rb] / n, s1 / n)

    var = np.asarray(var, dtype=np.float64).copy()
    var[var <= 0] = np.nan
    denom = np.sqrt(np.outer(var[row_start:row_start + rb], var))
    with np.errstate(invalid="ignore", divide="ignore"):
        corr = cov / denom
    corr = np.where(np.abs(corr) <= 1.05, np.clip(corr, -1.0, 1.0), np.nan)
    corr[~np.isfinite(denom)] = np.nan
    return corr


def finish_corr_host(S, s1, sdiag, var, n, c):
    """Gram statistics -> correlation matrix, in host float64.

    The ``S/n - outer(m, m)`` subtraction is catastrophically cancelling in
    f32 at large n, so both the single-device and the mesh-sharded paths
    gather their (already-f32) Gram statistics and finish here
    (ref ``estimator.py:256-268`` semantics: invalid variances or
    out-of-range values -> NaN, values within +-1.05 clipped to [-1, 1]).
    """
    return finish_corr_rows(S, 0, s1, sdiag, var, n, c)


__all__ = ["cov_sparse_pairs", "corr_matrix_device", "finish_corr_host",
           "finish_corr_rows"]
