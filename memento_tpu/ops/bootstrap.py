"""Fused bootstrap moment evaluation (L1 resampling engine).

Replaces the reference's per-gene ``_bootstrap_1d`` / ``_bootstrap_2d``
(ref ``/root/reference/memento/bootstrap.py:74-157``) with gene-tiled,
replicate-vectorized device programs: one call produces the bootstrap
mean/variance (or cov/var1/var2) for an entire padded gene tile at once.
The count draws never leave the device — sampling and the weighted moment
contraction fuse under jit.
"""

from __future__ import annotations

import jax.numpy as jnp

from .estimators import NoiseModel, cov_compressed, mean_var_compressed
from .sampling import bootstrap_counts


def bootstrap_1d(key, values, counts, inv_sf, inv_sf_sq, n_obs, q,
                 model: NoiseModel, num_boot: int,
                 sampler: str = "multinomial"):
    """Bootstrap replicate means/variances for a tile of genes in one group.

    Args:
      values, counts, inv_sf, inv_sf_sq: ``[T, U]`` padded compressed tiles
        (``CompressedGroup`` arrays).
      n_obs: cells in the group.
      q: group capture efficiency.
      model: noise model.
      num_boot: replicates B.

    Returns:
      (mean, var): ``[T, B]`` float32.  Genes whose compression collapsed to
      <= 1 unique combo should be masked by the caller (the reference returns
      NaN for those, ``bootstrap.py:97-98``).
    """
    draws = bootstrap_counts(key, counts, n_obs, num_boot, sampler)
    return mean_var_compressed(values, draws, inv_sf, inv_sf_sq, n_obs, q, model)


def bootstrap_2d(key, values_1, values_2, counts, inv_sf, inv_sf_sq, n_obs, q,
                 model: NoiseModel, num_boot: int,
                 sampler: str = "multinomial"):
    """Bootstrap cov/var1/var2 for a tile of gene pairs in one group.

    Mirrors ``_bootstrap_2d`` (ref ``bootstrap.py:119-157``): a single joint
    resample drives the covariance and both marginal variances.

    Args:
      values_1, values_2, counts, inv_sf, inv_sf_sq: ``[P, U]`` padded joint
        compressed tiles (``CompressedPairGroup`` arrays).

    Returns:
      (cov, var_1, var_2): ``[P, B]``.
    """
    draws = bootstrap_counts(key, counts, n_obs, num_boot, sampler)
    cov = cov_compressed(values_1, values_2, draws, inv_sf, inv_sf_sq, n_obs)
    _, var_1 = mean_var_compressed(values_1, draws, inv_sf, inv_sf_sq, n_obs, q, model)
    _, var_2 = mean_var_compressed(values_2, draws, inv_sf, inv_sf_sq, n_obs, q, model)
    return cov, var_1, var_2


def observed_moments_compressed(values, counts, inv_sf, inv_sf_sq, n_obs, q,
                                model: NoiseModel):
    """Observed (non-resampled) moments from the compressed tiles.

    Equivalent to evaluating the estimator on the original multiplicities —
    used by the device-resident pipeline when exact size factors were used
    for the compression.
    """
    m, v = mean_var_compressed(
        values, counts[..., None], inv_sf, inv_sf_sq, n_obs, q, model
    )
    return m[..., 0], v[..., 0]


__all__ = ["bootstrap_1d", "bootstrap_2d", "observed_moments_compressed"]
