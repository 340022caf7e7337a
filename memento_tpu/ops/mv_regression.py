"""Mean-variance regression and residual variance (C7 in SURVEY.md).

The reference fits a degree-2 polynomial of log-variance against log-mean
over valid genes and defines residual variance as
``rv = exp(log v - poly(log m))`` (ref ``/root/reference/memento/
estimator.py:84-111``).  Here the polyfit is a closed-form 3x3 normal-
equation solve (jit-friendly, batched), and the residual-variance transform
is a pure elementwise op applied per bootstrap replicate on device.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def fit_mv_regressor(mean, var):
    """Degree-2 polyfit of log var vs log mean over valid genes.

    Mirrors ``_fit_mv_regressor`` (ref ``estimator.py:84-93``): genes with
    non-positive mean or variance are excluded.  Returns coefficients in
    ``np.polyfit`` order (highest degree first): ``[c2, c1, c0]``.

    Host path (numpy): the fit happens a handful of times per dataset.
    """
    mean = np.asarray(mean, dtype=np.float64)
    var = np.asarray(var, dtype=np.float64)
    cond = (mean > 0) & (var > 0) & np.isfinite(mean) & np.isfinite(var)
    m, v = np.log(mean[cond]), np.log(var[cond])
    if m.size < 3:
        return np.array([0.0, 0.0, 0.0])
    return np.polyfit(m, v, 2)


def fit_mv_regressor_jax(log_mean, log_var, valid_mask):
    """Batched on-device degree-2 weighted LSQ polyfit.

    Args:
      log_mean, log_var: ``[..., G]``.
      valid_mask: ``[..., G]`` boolean/float weights (invalid genes get 0).

    Returns:
      coeffs ``[..., 3]`` in polyfit order [c2, c1, c0].
    """
    w = valid_mask.astype(log_mean.dtype)
    x = jnp.where(valid_mask, log_mean, 0.0)
    y = jnp.where(valid_mask, log_var, 0.0)
    # Vandermonde columns [x^2, x, 1]
    V = jnp.stack([x * x, x, jnp.ones_like(x)], axis=-1)  # [..., G, 3]
    Vw = V * w[..., None]
    A = jnp.einsum("...gi,...gj->...ij", Vw, V)
    b = jnp.einsum("...gi,...g->...i", Vw, y)
    # Ridge epsilon guards rank deficiency on degenerate tiles.
    A = A + 1e-8 * jnp.eye(3, dtype=A.dtype)
    return jnp.linalg.solve(A, b[..., None])[..., 0]


def polyval2(coeffs, x):
    """Evaluate ``c2*x^2 + c1*x + c0`` with broadcastable batch dims.

    Args:
      coeffs: ``[..., 3]``;  x: ``[..., K]`` (batch dims broadcast).
    """
    c2, c1, c0 = coeffs[..., 0:1], coeffs[..., 1:2], coeffs[..., 2:3]
    return c2 * x * x + c1 * x + c0


def residual_variance(mean, var, coeffs):
    """``rv = exp(log var - poly(log mean))`` with the reference's NaN
    semantics: invalid where mean<=0 or var<=0 (ref ``estimator.py:103-111``).

    Args:
      mean, var: ``[..., K]`` (replicates and/or genes).
      coeffs: ``[..., 3]`` polynomial per batch element (broadcast over K).
    """
    valid = (mean > 0) & (var > 0)
    safe_m = jnp.where(valid, mean, 1.0)
    safe_v = jnp.where(valid, var, 1.0)
    rv = jnp.exp(jnp.log(safe_v) - polyval2(coeffs, jnp.log(safe_m)))
    return jnp.where(valid, rv, jnp.nan)


__all__ = [
    "fit_mv_regressor",
    "fit_mv_regressor_jax",
    "polyval2",
    "residual_variance",
]
