"""Sharded execution: data-parallel moment accumulation and gene-sharded
hypothesis testing over a device mesh.

Two building blocks (SURVEY.md §2.2, §7):

- ``dp_suffstats``: cells stream in dense blocks sharded over the ``data``
  axis; each shard computes its partial weighted sums; ``psum`` over the
  data axis yields exact full-dataset sufficient statistics (the estimators
  are pure moment sums, so data parallelism is exact).
- ``sharded_ht_1d_tile``: the flagship hypothesis-test tile with its gene
  axis sharded over the ``model`` axis.  Tests for different genes are
  independent, so this is communication-free SPMD — XLA's GSPMD partitioner
  splits the whole kernel from the input shardings alone.
"""

from __future__ import annotations


from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

shard_map = jax.shard_map

from ..ops.estimators import NoiseModel, mean_var_from_suffstats, suffstats_dense
from ..inference.ht import ht_1d_tile


def dp_suffstats(mesh: Mesh, x_block, inv_sf, inv_sf_sq):
    """Exact per-gene sufficient statistics with cell-sharded data parallel.

    Args:
      mesh: mesh with a ``data`` axis.
      x_block: ``[N, G]`` dense counts (N divisible by the data-axis size;
        pad with zero rows).
      inv_sf / inv_sf_sq: ``[N]`` reciprocal size factors (0 on padding).

    Returns:
      (s1, s2, s1sq): replicated ``[G]`` statistics (full-dataset sums).
    """

    def local(xb, w, w2):
        s1, s2, s1sq = suffstats_dense(xb, w, w2)
        s1 = jax.lax.psum(s1, "data")
        s2 = jax.lax.psum(s2, "data")
        s1sq = jax.lax.psum(s1sq, "data")
        return s1, s2, s1sq

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P("data", None), P("data"), P("data")),
        out_specs=(P(), P(), P()),
    )
    return fn(x_block, inv_sf, inv_sf_sq)


def dp_mean_var(mesh: Mesh, x_block, inv_sf, inv_sf_sq, n_obs, q,
                model: NoiseModel):
    """Data-parallel observed moments: ``dp_suffstats`` + the closed-form
    moment transform, all inside one jit."""
    s1, s2, s1sq = dp_suffstats(mesh, x_block, inv_sf, inv_sf_sq)
    return mean_var_from_suffstats(s1, s2, s1sq, n_obs, q, model)


def shard_ht_inputs(mesh: Mesh, args: Tuple, gene_axis_of: dict):
    """Device_put HT tile inputs with the gene axis sharded over ``model``.

    Args:
      args: positional array args of ``ht_1d_tile``.
      gene_axis_of: map from arg position to the axis index carrying genes
        (absent = replicated).
    """
    out = []
    for i, a in enumerate(args):
        if i in gene_axis_of:
            spec = [None] * jnp.ndim(a)
            spec[gene_axis_of[i]] = "model"
            sh = NamedSharding(mesh, P(*spec))
        else:
            sh = NamedSharding(mesh, P())
        out.append(jax.device_put(a, sh))
    return tuple(out)


# gene-carrying axes of ht_1d_tile's positional args:
#   key, values[R,T,U], counts, inv_sf, inv_sf_sq, n_unique[R,T],
#   true_mean[R,T], true_res_var[R,T], mv_coeffs, q, n_obs, covariate,
#   treatment[T,R,Kt]
HT1D_GENE_AXES = {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 6: 1, 7: 1, 12: 0}


def sharded_ht_1d_tile(mesh: Mesh, *args, **static_kwargs):
    """Run ``ht_1d_tile`` with its gene axis sharded over the model axis.

    The tile's gene dimension T must be divisible by the model-axis size.
    Inputs are placed with NamedShardings and GSPMD propagates the partition
    through the whole kernel (bootstrap draws, moment contractions,
    regressions are all elementwise over genes).
    """
    placed = shard_ht_inputs(mesh, args, HT1D_GENE_AXES)
    return ht_1d_tile(*placed, **static_kwargs)


__all__ = [
    "dp_suffstats",
    "dp_mean_var",
    "sharded_ht_1d_tile",
    "shard_ht_inputs",
    "HT1D_GENE_AXES",
]
