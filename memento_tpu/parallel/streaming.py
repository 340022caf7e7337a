"""Streaming data-parallel input pipeline (cell-block DP, SURVEY.md §2.2).

The reference holds the full sparse matrix in one process and computes
observed moments with scipy row-weight dot products (ref
``/root/reference/memento/estimator.py:177-180``).  For datasets that exceed
one host/device, this module streams dense cell blocks through a
device-resident sufficient-statistic accumulator sharded over the mesh's
``data`` axis: each device reduces its cell shard, ``psum`` merges the
partials, and the accumulator carries only ``3 x [G]`` floats — moments are
exact sums, so cell-block data parallelism changes nothing statistically.

One block shape is used for every step (the final block is zero-padded), so
the whole stream compiles exactly once.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sparse

from ..ops.estimators import NoiseModel, mean_var_from_suffstats
from .sharded import dp_suffstats


@functools.partial(jax.jit, static_argnums=(0,), donate_argnums=(4, 5, 6))
def _acc_step(mesh, xb, w, w2, s1, s2, s1sq):
    p1, p2, p1sq = dp_suffstats(mesh, xb, w, w2)
    return s1 + p1, s2 + p2, s1sq + p1sq


def stream_suffstats(mesh, X, size_factor, block: int = 8192):
    """Exact per-gene sufficient statistics via cell-block streaming DP.

    Args:
      mesh: mesh with a ``data`` axis (cells sharded over it).
      X: ``[N, G]`` scipy sparse or dense counts (host side; in a true
        multi-host deployment each host streams only its row range).
      size_factor: ``[N]`` per-cell size factors.
      block: cells per streamed step (rounded up to the data-axis size).

    Returns:
      (s1, s2, s1sq): ``[G]`` float64 numpy arrays (full-dataset sums).
    """
    n, g = X.shape
    n_data = mesh.shape[mesh.axis_names[0]]
    block = max(n_data, (block // n_data) * n_data)

    sf = np.asarray(size_factor, dtype=np.float64)
    issp = sparse.issparse(X)
    Xr = X.tocsr() if issp else np.asarray(X)

    s1 = jnp.zeros((g,), jnp.float32)
    s2 = jnp.zeros((g,), jnp.float32)
    s1sq = jnp.zeros((g,), jnp.float32)
    for start in range(0, n, block):
        stop = min(start + block, n)
        xb = Xr[start:stop]
        xb = np.asarray(xb.todense()) if issp else np.asarray(xb)
        w = 1.0 / sf[start:stop]
        w2 = w * w
        if stop - start < block:  # zero-pad the final block (zero weights)
            pad = block - (stop - start)
            xb = np.pad(xb, ((0, pad), (0, 0)))
            w = np.pad(w, (0, pad))
            w2 = np.pad(w2, (0, pad))
        s1, s2, s1sq = _acc_step(
            mesh,
            jnp.asarray(xb, jnp.float32),
            jnp.asarray(w, jnp.float32),
            jnp.asarray(w2, jnp.float32),
            s1, s2, s1sq,
        )
    return (
        np.asarray(s1, dtype=np.float64),
        np.asarray(s2, dtype=np.float64),
        np.asarray(s1sq, dtype=np.float64),
    )


def stream_mean_var(mesh, X, size_factor, q, model: NoiseModel,
                    block: int = 8192):
    """Observed per-gene moments via the streaming DP pipeline.

    Drop-in for ``ops.estimators.mean_var_sparse`` when a mesh is available
    (same semantics; float32 accumulation on device).
    """
    n_obs = X.shape[0]
    if not model.relative:
        size_factor = np.ones(n_obs)
    s1, s2, s1sq = stream_suffstats(mesh, X, size_factor, block)
    m, v = mean_var_from_suffstats(s1, s2, s1sq, n_obs, q, model)
    return np.asarray(m), np.asarray(v)


__all__ = ["stream_suffstats", "stream_mean_var"]
