"""Method-of-moments estimators under capture-noise models (L0 numeric core).

Re-designs the reference estimator layer (``/root/reference/memento/
estimator.py:19-292``) as *batched, fused JAX reductions* instead of per-call
scipy sparse dot products.  Every estimator is expressed through a small set
of sufficient statistics so that:

- observed (per-group) moments are exact weighted reductions over cells that
  can be computed from sparse data on host OR from streamed dense tiles on
  device (with ``psum`` merges for cell-sharded data parallelism), and
- bootstrap moments are contractions of the same weights against multinomial
  count matrices, batched over genes and replicates (MXU-friendly).

Noise models
------------
``hyper_relative``  (ref ``estimator.py:165-185``)::

    M1  = (1/N) sum_c x_c / sf_c
    M2  = (1/N) sum_c x_c^2 / sf_c^2  -  (1-q) * (1/N) sum_c x_c / sf_c^2
    var = M2 - M1^2

``poi_relative``    (ref ``estimator.py:114-133``): same with ``(1-q) -> 1``.
``*_absolute``      : same formulas with ``sf ≡ 1`` (the reference registry
declares these but the implementations are missing — ``estimator.py:21-28``
references undefined functions; we implement the evident intent).
``mean_only``       (ref ``estimator.py:188-204``): returns ``[M1+1, 10]``.

The variance correction is the single scalar ``c``:  ``c = 1-q`` for the
hypergeometric model, ``c = 1`` for Poisson, applied to the ``sum x/sf^2``
term.  This unification is what lets one fused kernel serve every model.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sparse


# ---------------------------------------------------------------------------
# Noise-model registry
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class NoiseModel:
    """A capture-noise generative model.

    Attributes:
      name: registry key.
      relative: whether expression is scaled by per-cell size factors.
      poisson: if True the variance correction ``c`` is 1, else ``1-q``.
      mean_only: if True variance is replaced by the sentinel 10 and the mean
        is shifted by +1 (ref ``estimator.py:204``).
    """

    name: str
    relative: bool = True
    poisson: bool = False
    mean_only: bool = False

    def var_correction(self, q):
        """The coefficient ``c`` of the ``sum x/sf^2`` term in M2.

        Array-module agnostic: works for python/numpy floats (host, float64)
        and jax arrays (device) alike.
        """
        if self.poisson:
            return q * 0 + 1.0
        return 1.0 - q


HYPER_RELATIVE = NoiseModel("hyper_relative")
HYPER_ABSOLUTE = NoiseModel("hyper_absolute", relative=False)
POI_RELATIVE = NoiseModel("poi_relative", poisson=True)
POI_ABSOLUTE = NoiseModel("poi_absolute", relative=False, poisson=True)
MEAN_ONLY = NoiseModel("mean_only", mean_only=True)

_REGISTRY = {
    m.name: m
    for m in [HYPER_RELATIVE, HYPER_ABSOLUTE, POI_RELATIVE, POI_ABSOLUTE, MEAN_ONLY]
}

# Custom estimators: the reference allows passing a ``(fn_1d, fn_cov)`` tuple
# (``estimator.py:31-32,45-46``).  We accept either a NoiseModel, a registry
# string, or such a tuple of callables.
EstimatorType = Union[str, NoiseModel, Tuple[Callable, Callable]]


def get_noise_model(estimator_type: EstimatorType) -> Optional[NoiseModel]:
    """Resolve the noise model; returns None for custom callable tuples."""
    if isinstance(estimator_type, NoiseModel):
        return estimator_type
    if isinstance(estimator_type, str):
        if estimator_type not in _REGISTRY:
            raise ValueError(
                f"unknown estimator_type {estimator_type!r}; "
                f"available: {sorted(_REGISTRY)}"
            )
        return _REGISTRY[estimator_type]
    return None  # custom (fn_1d, fn_cov)


def is_absolute(estimator_type: EstimatorType) -> bool:
    m = get_noise_model(estimator_type)
    if m is None:
        return False
    return not m.relative


# ---------------------------------------------------------------------------
# Moments from sufficient statistics
# ---------------------------------------------------------------------------


def mean_var_from_suffstats(s1, s2, s1sq, n_obs, q, model: NoiseModel):
    """Mean and variance from the three weighted sums.

    Args:
      s1:   ``sum_c x_c / sf_c``         (any leading batch shape, gene last)
      s2:   ``sum_c x_c^2 / sf_c^2``
      s1sq: ``sum_c x_c / sf_c^2``
      n_obs: number of cells (scalar or broadcastable)
      q: capture efficiency (scalar or broadcastable)
      model: noise model.

    Returns:
      (mean, var) arrays, or (mean+1, 10) for mean_only
      (ref ``estimator.py:165-204``).  Array-module agnostic (numpy stays
      float64 on host; jax arrays stay on device).
    """
    m1 = s1 / n_obs
    if model.mean_only:
        return m1 + 1.0, m1 * 0 + 10.0
    c = model.var_correction(q)
    m2 = s2 / n_obs - c * s1sq / n_obs
    var = m2 - m1 * m1
    return m1, var


def cov_from_suffstats(sxy, s1x, s1y, s_diag, n_obs, q, same_gene, model: NoiseModel):
    """Covariance between two genes from weighted cross sums.

    cov = (1/N) sum x*y/sf^2  -  [same_gene] * c * (1/N) sum x/sf^2
          - ((1/N) sum x/sf) * ((1/N) sum y/sf)

    Mirrors ``_hyper_cov_relative`` / ``_poisson_cov_relative``
    (ref ``estimator.py:136-162,207-233``): the noise correction applies only
    on the diagonal (gene paired with itself).

    Args:
      sxy: ``sum x*y/sf^2``;  s1x/s1y: ``sum x/sf`` per gene;
      s_diag: ``sum x/sf^2`` (for the overlap correction);
      same_gene: boolean (or 0/1) indicating the pair is (g, g).
    """
    c = model.var_correction(q)
    same = same_gene * 1.0  # bool -> float, module-agnostic
    prod = sxy / n_obs - same * (c * s_diag / n_obs)
    return prod - (s1x / n_obs) * (s1y / n_obs)


# ---------------------------------------------------------------------------
# Dense-tile device paths (cell-streaming / data-parallel building blocks)
# ---------------------------------------------------------------------------


def suffstats_dense(X, inv_sf, inv_sf_sq):
    """Per-gene sufficient statistics from a dense cell x gene tile.

    Args:
      X: ``[N, G]`` float tile of counts (padded cells must be zero rows).
      inv_sf: ``[N]`` 1/size_factor (zero for padded cells).
      inv_sf_sq: ``[N]`` 1/size_factor^2.

    Returns:
      (s1, s2, s1sq): each ``[G]``.  These are exact partial sums: summing
      them across cell shards (``jax.lax.psum`` over the data axis) yields
      the full-dataset statistics — the cell-block data parallelism of
      SURVEY.md §2.2.
    """
    # X may arrive in a compact integer transport dtype (UMI counts are
    # small ints — int8/int16 ships 4-8x fewer bytes than the accumulator
    # dtype and the cast back is exact); compute in the weights' precision
    X = X.astype(inv_sf.dtype)
    s1 = inv_sf @ X
    s2 = inv_sf_sq @ (X * X)
    s1sq = inv_sf_sq @ X
    return s1, s2, s1sq


def suffstats_sparse(X, size_factor):
    """Host-side exact sufficient statistics from a scipy sparse matrix.

    Functionally equivalent to the reference's row-weight sparse dot products
    (``estimator.py:177-180``) but returning reusable sufficient statistics.
    CSR input takes the fused native pass (one OpenMP sweep, f64
    accumulation) — the scipy formulation below costs a CSC conversion plus
    an ``X.power(2)`` temporary, both multi-GB at atlas scale.
    """
    if sparse.issparse(X) and X.format == "csr":
        from ..native import suffstats_csr_native

        out = suffstats_csr_native(X, size_factor)
        if out is not None:
            return out
    if sparse.issparse(X) and X.format == "csc":
        from ..native import suffstats_csc_native

        out = suffstats_csc_native(X, size_factor)
        if out is not None:
            return out
    X = X.tocsc() if sparse.issparse(X) else sparse.csc_matrix(X)
    inv_sf = (1.0 / np.asarray(size_factor)).reshape(1, -1)
    inv_sf_sq = inv_sf**2
    s1 = np.asarray(inv_sf @ X).ravel()
    s2 = np.asarray(inv_sf_sq @ X.power(2)).ravel()
    s1sq = np.asarray(inv_sf_sq @ X).ravel()
    return s1, s2, s1sq


def mean_var_sparse(X, size_factor, q, estimator_type: EstimatorType = "hyper_relative"):
    """Observed per-gene mean/variance from sparse data (host path).

    Mirrors ``_hyper_1d_relative``'s sparse branch (ref
    ``estimator.py:175-185``).
    """
    model = get_noise_model(estimator_type)
    n_obs = X.shape[0]
    if model is not None and not model.relative:
        size_factor = np.ones(n_obs)
    s1, s2, s1sq = suffstats_sparse(X, size_factor)
    m, v = mean_var_from_suffstats(s1, s2, s1sq, n_obs, q, model)
    return np.asarray(m), np.asarray(v)


# ---------------------------------------------------------------------------
# Compressed-tuple paths (the bootstrap hot loop)
# ---------------------------------------------------------------------------


def bootstrap_weights_1d(values, inv_sf, inv_sf_sq, q, model: NoiseModel):
    """Precompute per-unique-bin weights for the bootstrap moment contraction.

    With unique expression values ``x_u`` and multiplicities ``n_ub`` for
    bootstrap replicate ``b`` (ref ``estimator.py:171-174``)::

        M1_b = sum_u (x_u / sf_u)                     * n_ub / N
        M2_b = sum_u (x_u^2 - c x_u) / sf_u^2         * n_ub / N

    so the replicate moments are two weighted contractions with weights
    ``a_u = x_u * inv_sf_u`` and ``d_u = (x_u^2 - c*x_u) * inv_sf_sq_u``.

    Args:
      values: ``[..., U]`` unique expression values.
      inv_sf / inv_sf_sq: ``[..., U]`` reciprocal (squared) size factors.
      q: capture efficiency, broadcastable against the batch dims.

    Returns:
      (a, d): weight arrays ``[..., U]``.
    """
    c = model.var_correction(q)[..., None] if jnp.ndim(q) else model.var_correction(q)
    a = values * inv_sf
    d = (values * values - c * values) * inv_sf_sq
    return a, d


def mean_var_compressed(values, counts, inv_sf, inv_sf_sq, n_obs, q,
                        model: NoiseModel):
    """Replicate moments from compressed (value, count) tuples.

    Args:
      values, inv_sf, inv_sf_sq: ``[..., U]``.
      counts: ``[..., U, B]`` multiplicities per bootstrap replicate.
      n_obs: cells per replicate (scalar/broadcastable).

    Returns:
      (mean, var): ``[..., B]``.
    """
    n_obs = jnp.asarray(n_obs, dtype=jnp.float32)
    if model.mean_only:
        a = values * inv_sf
        m1 = jnp.einsum("...u,...ub->...b", a, counts) / n_obs
        return m1 + 1.0, jnp.full_like(m1, 10.0)
    a, d = bootstrap_weights_1d(values, inv_sf, inv_sf_sq, q, model)
    m1 = jnp.einsum("...u,...ub->...b", a, counts) / n_obs
    m2 = jnp.einsum("...u,...ub->...b", d, counts) / n_obs
    return m1, m2 - m1 * m1


def cov_compressed(v1, v2, counts, inv_sf, inv_sf_sq, n_obs):
    """Replicate covariance from jointly-compressed pair tuples.

    Mirrors the tuple branch of ``_hyper_cov_relative``
    (ref ``estimator.py:214-218``): no diagonal correction because the two
    genes are distinct in the 2D testing path.

    Args:
      v1, v2: ``[..., U]`` unique expression values of the two genes.
      counts: ``[..., U, B]``.

    Returns:
      cov ``[..., B]``.
    """
    n_obs = jnp.asarray(n_obs, dtype=jnp.float32)
    m1 = jnp.einsum("...u,...ub->...b", v1 * inv_sf, counts) / n_obs
    m2 = jnp.einsum("...u,...ub->...b", v2 * inv_sf, counts) / n_obs
    mx = jnp.einsum("...u,...ub->...b", v1 * v2 * inv_sf_sq, counts) / n_obs
    return mx - m1 * m2


def corr_from_cov(cov, var_1, var_2):
    """Covariance -> correlation with the reference's sentinel semantics.

    Mirrors ``_corr_from_cov`` (ref ``estimator.py:273-292``) EXACTLY: the
    reference initializes the output to a 5.0 sentinel, overwrites only
    entries whose variance product is finite-positive, then clips to
    [-1, 1] — so an entry with a non-positive (or NaN) variance comes out
    as **1.0**, not NaN (the ``corr > 1`` clip swallows the sentinel).
    Downstream both sides treat |corr| == 1 as invalid (group skipped,
    ref ``hypothesis_test.py:325``), but bootstrap replicates with an
    invalid variance enter the null distribution as 1.0 — verified
    side-by-side against the actual reference code in
    ``tests/test_reference_parity.py``.  A NaN covariance stays NaN.
    """
    invalid = ~(var_1 > 0) | ~(var_2 > 0)  # includes NaN variances
    safe_v1 = jnp.where(invalid, 1.0, var_1)
    safe_v2 = jnp.where(invalid, 1.0, var_2)
    corr = cov / jnp.sqrt(safe_v1 * safe_v2)
    return jnp.where(invalid, 1.0, jnp.clip(corr, -1.0, 1.0))


__all__ = [
    "NoiseModel",
    "HYPER_RELATIVE",
    "HYPER_ABSOLUTE",
    "POI_RELATIVE",
    "POI_ABSOLUTE",
    "MEAN_ONLY",
    "get_noise_model",
    "is_absolute",
    "mean_var_from_suffstats",
    "cov_from_suffstats",
    "suffstats_dense",
    "suffstats_sparse",
    "mean_var_sparse",
    "bootstrap_weights_1d",
    "mean_var_compressed",
    "cov_compressed",
    "corr_from_cov",
]
