"""Fused bootstrap moment evaluation (L1 resampling engine).

Replaces the reference's per-gene ``_bootstrap_1d`` / ``_bootstrap_2d``
(ref ``/root/reference/memento/bootstrap.py:74-157``) with gene-tiled,
replicate-vectorized device programs.  Sampling and the weighted moment
contraction run inside ONE ``lax.scan`` over unique-value bins
(``fused_bootstrap_sums``): the multinomial count tensor ``[T, U, B]`` is
never materialized, the carries are just the running weighted sums.

Samplers: ``'cascade'`` (Gaussian/Poisson-table hybrid; default — ~20x
faster than rejection sampling on TPU) and ``'multinomial'`` (exact BTRS
conditional binomials; golden path for parity tests).  The legacy
materialized samplers ('poisson', 'gaussian') route through
``bootstrap_counts`` + an explicit contraction.
"""

from __future__ import annotations

import jax.numpy as jnp

from .estimators import NoiseModel, cov_compressed, mean_var_compressed
from .sampling import bootstrap_counts, fused_bootstrap_sums


def bootstrap_1d(key, values, counts, inv_sf, inv_sf_sq, n_obs, q,
                 model: NoiseModel, num_boot: int,
                 sampler: str = "cascade"):
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
    if sampler in ("poisson", "gaussian"):
        draws = bootstrap_counts(key, counts, n_obs, num_boot, sampler)
        return mean_var_compressed(values, draws, inv_sf, inv_sf_sq, n_obs, q,
                                   model)

    n_obs = jnp.asarray(n_obs, jnp.float32)
    c = model.var_correction(q)
    a = values * inv_sf  # M1 weights (ref estimator.py:173)
    if model.mean_only:
        sums = fused_bootstrap_sums(key, counts, a[..., None], n_obs,
                                    num_boot, sampler)
        m1 = sums[..., 0, :] / n_obs
        return m1 + 1.0, jnp.full_like(m1, 10.0)
    d = (values * values - c * values) * inv_sf_sq  # M2 weights (ref :174)
    weights = jnp.stack([a, d], axis=-1)
    sums = fused_bootstrap_sums(key, counts, weights, n_obs, num_boot, sampler)
    m1 = sums[..., 0, :] / n_obs
    m2 = sums[..., 1, :] / n_obs
    return m1, m2 - m1 * m1


def bootstrap_2d(key, values_1, values_2, counts, inv_sf, inv_sf_sq, n_obs, q,
                 model: NoiseModel, num_boot: int,
                 sampler: str = "cascade"):
    """Bootstrap cov/var1/var2 for a tile of gene pairs in one group.

    Mirrors ``_bootstrap_2d`` (ref ``bootstrap.py:119-157``): a single joint
    resample drives the covariance and both marginal variances.

    Args:
      values_1, values_2, counts, inv_sf, inv_sf_sq: ``[P, U]`` padded joint
        compressed tiles (``CompressedPairGroup`` arrays).

    Returns:
      (cov, var_1, var_2): ``[P, B]``.
    """
    if sampler in ("poisson", "gaussian"):
        draws = bootstrap_counts(key, counts, n_obs, num_boot, sampler)
        cov = cov_compressed(values_1, values_2, draws, inv_sf, inv_sf_sq,
                             n_obs)
        _, var_1 = mean_var_compressed(values_1, draws, inv_sf, inv_sf_sq,
                                       n_obs, q, model)
        _, var_2 = mean_var_compressed(values_2, draws, inv_sf, inv_sf_sq,
                                       n_obs, q, model)
        return cov, var_1, var_2

    n_obs = jnp.asarray(n_obs, jnp.float32)
    c = model.var_correction(q)
    a1 = values_1 * inv_sf
    a2 = values_2 * inv_sf
    dxy = values_1 * values_2 * inv_sf_sq
    d1 = (values_1 * values_1 - c * values_1) * inv_sf_sq
    d2 = (values_2 * values_2 - c * values_2) * inv_sf_sq
    weights = jnp.stack([a1, a2, dxy, d1, d2], axis=-1)
    sums = fused_bootstrap_sums(key, counts, weights, n_obs, num_boot, sampler)
    m1 = sums[..., 0, :] / n_obs
    m2 = sums[..., 1, :] / n_obs
    mx = sums[..., 2, :] / n_obs
    cov = mx - m1 * m2
    var_1 = sums[..., 3, :] / n_obs - m1 * m1
    var_2 = sums[..., 4, :] / n_obs - m2 * m2
    return cov, var_1, var_2


def bootstrap_1d_custom(key, custom_fn, values, counts, inv_sf, inv_sf_sq,
                        n_obs, q, num_boot: int, sampler: str = "multinomial"):
    """Bootstrap with a user-supplied 1D estimator (reference custom API).

    The reference accepts custom ``(fn_1d, fn_cov)`` estimators called as
    ``fn(data=(expr[U,1], rvs[U,B]), n_obs=..., q=..., size_factor=
    (inv_sf[U,1], inv_sf_sq[U,1]))`` returning ``[mean, var]``
    (ref ``estimator.py:31-32``, ``bootstrap.py:106-110``).  Any
    JAX-traceable function with that signature works here; it is vmapped
    over the gene tile on materialized resample counts (the fused weighted-
    sum path only applies to the built-in moment structure).

    Args:
      values, counts, inv_sf, inv_sf_sq: ``[T, U]`` compressed tiles.

    Returns:
      (mean, var): ``[T, B]``.
    """
    if sampler in ("cascade", "cascade_pallas"):
        sampler = "multinomial"
    draws = bootstrap_counts(key, counts, n_obs, num_boot, sampler)  # [T,U,B]

    def per_gene(v, d, isf, isf2):
        out = custom_fn(
            data=(v[:, None], d),
            n_obs=n_obs,
            q=q,
            size_factor=(isf[:, None], isf2[:, None]),
        )
        return out[0], out[1]

    import jax

    return jax.vmap(per_gene)(values, draws, inv_sf, inv_sf_sq)


def bootstrap_2d_custom(key, custom_1d, custom_cov, values_1, values_2,
                        counts, inv_sf, inv_sf_sq, n_obs, q, num_boot: int,
                        sampler: str = "multinomial"):
    """Bootstrap cov/var1/var2 with user-supplied estimators.

    The reference calls a custom covariance estimator as
    ``fn_cov(data=(expr1[U,1], expr2[U,1], rvs[U,B]), n_obs=..., q=...,
    size_factor=(inv_sf, inv_sf_sq))`` and the 1D estimator on each marginal
    (ref ``bootstrap.py:141-155``).  Any JAX-traceable pair with those
    signatures works here; they are vmapped over the pair tile on
    materialized resample counts.

    Args:
      values_1, values_2, counts, inv_sf, inv_sf_sq: ``[P, U]`` joint
        compressed tiles.

    Returns:
      (cov, var_1, var_2): ``[P, B]``.
    """
    if sampler in ("cascade", "cascade_pallas"):
        sampler = "multinomial"
    draws = bootstrap_counts(key, counts, n_obs, num_boot, sampler)  # [P,U,B]

    def per_pair(v1, v2, d, isf, isf2):
        sf = (isf[:, None], isf2[:, None])
        cov = custom_cov(
            data=(v1[:, None], v2[:, None], d), n_obs=n_obs, q=q,
            size_factor=sf,
        )
        _, var_1 = custom_1d(data=(v1[:, None], d), n_obs=n_obs, q=q,
                             size_factor=sf)
        _, var_2 = custom_1d(data=(v2[:, None], d), n_obs=n_obs, q=q,
                             size_factor=sf)
        return cov, var_1, var_2

    import jax

    return jax.vmap(per_pair)(values_1, values_2, draws, inv_sf, inv_sf_sq)


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


__all__ = [
    "bootstrap_1d",
    "bootstrap_2d",
    "bootstrap_1d_custom",
    "bootstrap_2d_custom",
    "observed_moments_compressed",
]
