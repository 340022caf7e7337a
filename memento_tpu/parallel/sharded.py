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
from ..inference.ht import ht_1d_tile, ht_2d_tile


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

# pair-carrying axes of ht_2d_tile's positional args (the differential-
# correlation test fans out over gene PAIRS exactly like the 1D test fans
# out over genes — ref main.py:501 uses the same joblib pool for both):
#   key, values_1[R,P,U], values_2[R,P,U], counts, inv_sf, inv_sf_sq,
#   true_corr[R,P], q, n_obs, covariate, treatment[P,R,Kt]
HT2D_PAIR_AXES = {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 6: 1, 10: 0}


def sharded_ht_1d_tile(mesh: Mesh, *args, **static_kwargs):
    """Run ``ht_1d_tile`` with its gene axis sharded over the model axis.

    The tile's gene dimension T must be divisible by the model-axis size.
    Inputs are placed with NamedShardings and GSPMD propagates the partition
    through the whole kernel (bootstrap draws, moment contractions,
    regressions are all elementwise over genes).
    """
    placed = shard_ht_inputs(mesh, args, HT1D_GENE_AXES)
    return ht_1d_tile(*placed, **static_kwargs)


def sharded_ht_2d_tile(mesh: Mesh, *args, **static_kwargs):
    """Run ``ht_2d_tile`` with its pair axis sharded over the model axis.

    Pair tests are independent (communication-free SPMD), so GSPMD splits
    the whole differential-correlation kernel from the input shardings
    alone; the tile's pair dimension P must be divisible by the model-axis
    size.
    """
    placed = shard_ht_inputs(mesh, args, HT2D_PAIR_AXES)
    return ht_2d_tile(*placed, **static_kwargs)


# ---------------------------------------------------------------------------
# 2-D sharded G x G correlation (the "tensor parallel" analog, SURVEY.md §2.2)
# ---------------------------------------------------------------------------


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def corr_matrix_sharded(mesh: Mesh, X, size_factor, q, var, model,
                        block: int = 4096, row_block: int = 4096,
                        out_dtype=None):
    """All-by-all G x G correlation with the output sharded 2-D over the mesh.

    The Gram accumulator ``S[G, G]`` is laid out ``P(axis0, axis1)`` over both
    mesh axes; each streamed cell block is replicated, and GSPMD partitions
    every ``(wx)^T (wx)`` update into per-device ``[G/d0, G/d1]`` output
    tiles — communication-free, with memory and FLOPs scaling 1/D.  This is
    the TPU equivalent of the reference's dense ``(X.T * Y).toarray()/N``
    product (ref ``estimator.py:255``) at gene counts where G x G no longer
    fits one device.

    Args:
      mesh: a 2-axis mesh (e.g. ``('data', 'model')``).
      X: ``[N, G]`` sparse/dense counts for one group.
      size_factor: ``[N]`` exact size factors.
      var: ``[G]`` per-gene variances for the denominator.
      row_block: rows of S gathered and finished per step — the host never
        holds more than one ``[row_block, G]`` f64 temporary on top of the
        output, so the 2-D sharding's memory benefit survives the finish.
      out_dtype: output dtype (default float64; float32 halves the host
        footprint of a 50k-gene matrix).

    Returns:
      ``[G, G]`` numpy array (gathered to host in row blocks).
    """
    import numpy as np
    import scipy.sparse as sparse

    from ..ops.corr import _gram_update

    a0, a1 = mesh.axis_names[0], mesh.axis_names[-1]
    d0, d1 = mesh.shape[a0], mesh.shape[a1]
    n, g = X.shape
    gp = _round_up(g, max(d0 * d1, 1))

    sharding = NamedSharding(mesh, P(a0, a1))
    repl = NamedSharding(mesh, P())
    S = jax.jit(
        lambda: jnp.zeros((gp, gp), jnp.float32), out_shardings=sharding
    )()
    cS = jax.jit(
        lambda: jnp.zeros((gp, gp), jnp.float32), out_shardings=sharding
    )()
    s1 = jax.device_put(jnp.zeros((gp,), jnp.float32), repl)
    sdiag = jax.device_put(jnp.zeros((gp,), jnp.float32), repl)
    cs1 = jax.device_put(jnp.zeros((gp,), jnp.float32), repl)
    csdiag = jax.device_put(jnp.zeros((gp,), jnp.float32), repl)

    from ..ops.transport import compact_transport_dtype

    sf = np.asarray(size_factor, dtype=np.float64)
    issp = sparse.issparse(X)
    Xc = X.tocsr() if issp else np.asarray(X)
    tdtype = compact_transport_dtype(Xc) or np.float32
    for start in range(0, n, block):
        stop = min(start + block, n)
        xb = Xc[start:stop]
        xb = np.asarray(xb.todense()) if issp else np.asarray(xb)
        if gp > g:
            xb = np.pad(xb, ((0, 0), (0, gp - g)))
        S, s1, sdiag, cS, cs1, csdiag = _gram_update(
            jax.device_put(jnp.asarray(np.asarray(xb, tdtype)), repl),
            jax.device_put(jnp.asarray(1.0 / sf[start:stop], jnp.float32),
                           repl),
            jax.device_put(jnp.asarray(1.0 / sf[start:stop] ** 2,
                                       jnp.float32), repl),
            S, s1, sdiag, cS, cs1, csdiag,
        )

    # Finish on host in float64 (the ``S/n - outer(m, m)`` cancellation
    # needs f64, see ``ops.corr.finish_corr_host``) — but gather S in ROW
    # BLOCKS so the 2-D sharding's memory benefit is not thrown away at the
    # end: peak extra host memory is one [row_block, G] f64 slice.
    from ..ops.corr import finish_corr_rows

    c = float(np.asarray(model.var_correction(q)))
    s1_h = np.asarray(s1)
    sdiag_h = np.asarray(sdiag)
    var_p = np.concatenate([np.asarray(var, np.float64),
                            np.full(gp - g, np.nan)])
    out = np.empty((g, g), dtype=out_dtype or np.float64)
    # one traced slice fn (r0 is a traced scalar -> a single executable per
    # distinct block height, not one per block)
    slice_rows = jax.jit(
        lambda s, r0, take: jax.lax.dynamic_slice_in_dim(s, r0, take, 0),
        static_argnums=(2,),
        out_shardings=NamedSharding(mesh, P(None, a1)),
    )
    rbp = min(row_block, gp)
    for r0 in range(0, g, rbp):
        take = min(rbp, gp - r0)  # slice stays in bounds of the padded S
        s_rows = np.asarray(slice_rows(S, np.int32(r0), take))
        nrows = min(g - r0, take)
        out[r0:r0 + nrows] = finish_corr_rows(
            s_rows[:nrows], r0, s1_h, sdiag_h, var_p, float(n), c
        )[:, :g]
    return out


__all__ = [
    "dp_suffstats",
    "dp_mean_var",
    "sharded_ht_1d_tile",
    "sharded_ht_2d_tile",
    "shard_ht_inputs",
    "HT1D_GENE_AXES",
    "HT2D_PAIR_AXES",
    "corr_matrix_sharded",
]
