"""Resampling count generation for the bootstrap (C9 in SURVEY.md).

The reference draws ``num_boot`` multinomial resamples of the unique-value
multiplicities per gene with numpy (ref ``/root/reference/memento/
bootstrap.py:102-103,135-137``).  Here the draws are generated on device with
counter-based Threefry keys derived per (gene, group), so results are
reproducible and independent of how the gene axis is tiled or sharded across
devices (SURVEY.md §2.2 "RNG").

Three samplers are provided:

- ``multinomial``: exact conditional-binomial cascade (jax.random.multinomial)
  — matches the reference's resampling distribution exactly.
- ``poisson``: independent Poisson counts with the same means — the classic
  "Poisson bootstrap"; asymptotically equivalent, embarrassingly parallel,
  and much faster on TPU (no sequential scan over bins).  The reference
  itself carries this variant in a commented-out line (``bootstrap.py:136``).
- ``gaussian``: normal approximation to the multinomial counts with the exact
  mean/variance and no cross-bin covariance; cheapest, useful for screening.

Padded bins (count 0) get probability 0 and therefore draw 0 under every
sampler, so the padded layout needs no masks in the hot loop.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

SAMPLERS = ("multinomial", "poisson", "gaussian")


def bootstrap_counts(key, counts, n_obs, num_boot: int,
                     sampler: str = "multinomial"):
    """Draw bootstrap multiplicities for padded unique-value tiles.

    Args:
      key: PRNG key.
      counts: ``[..., U]`` observed multiplicities (float; pads are 0).
      n_obs: total cells (scalar) — equals ``counts.sum(-1)`` on real bins.
      num_boot: number of replicates B.
      sampler: one of ``SAMPLERS``.

    Returns:
      ``[..., U, B]`` float32 resampled multiplicities.
    """
    counts = jnp.asarray(counts, dtype=jnp.float32)
    n_obs = jnp.asarray(n_obs, dtype=jnp.float32)
    batch = counts.shape[:-1]
    u = counts.shape[-1]
    probs = counts / n_obs

    if sampler == "multinomial":
        draws = jax.random.multinomial(
            key, n_obs, probs, shape=(num_boot, *batch, u)
        )
    elif sampler == "poisson":
        draws = jax.random.poisson(
            key, counts, shape=(num_boot, *batch, u)
        ).astype(jnp.float32)
    elif sampler == "gaussian":
        # multinomial marginal moments: mean = N p, var = N p (1-p)
        eps = jax.random.normal(key, (num_boot, *batch, u))
        draws = counts + eps * jnp.sqrt(jnp.maximum(counts * (1.0 - probs), 0.0))
        draws = jnp.maximum(draws, 0.0)
    else:
        raise ValueError(f"unknown sampler {sampler!r}; options: {SAMPLERS}")

    # [B, ..., U] -> [..., U, B]
    return jnp.moveaxis(draws, 0, -1)


def fold_key(key, *indices):
    """Derive a deterministic subkey from integer coordinates.

    Counter-based derivation means the same (gene, group) pair always sees
    the same stream no matter which device/tile processes it.
    """
    for ix in indices:
        key = jax.random.fold_in(key, ix)
    return key


__all__ = ["bootstrap_counts", "fold_key", "SAMPLERS"]
