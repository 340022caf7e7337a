"""Streaming data-parallel input pipeline (cell-block DP, SURVEY.md §2.2).

The reference holds the full sparse matrix in one process and computes
observed moments with scipy row-weight dot products in float64 (ref
``/root/reference/memento/estimator.py:177-180``).  For datasets that exceed
one host/device, this module streams dense cell blocks through device
sufficient-statistic reductions sharded over the mesh's ``data`` axis: each
device reduces its cell shard, ``psum`` merges the partials, and the
per-block partials accumulate on the host in float64 — moments are exact
sums, so cell-block data parallelism changes nothing statistically.

Numerics: the ``m2 - m1^2`` cancellation downstream amplifies any error in
the sums, and a pure-f32 running accumulator (round 1) could lose most of a
high-expression gene's variance digits by 10^6 cells.  Two precisions:

- ``precision='high'`` (default): per-block partials are computed in
  float64 on device (under ``jax.enable_x64()``) and accumulated in host
  float64 — bit-comparable to the reference's f64 scipy path.
- ``precision='fast'``: per-block partials in float32 (half the transfer
  and compute; fine for <=8192-cell blocks where intra-block f32 error is
  ~1e-7 relative), still accumulated across blocks in host float64.

One block shape is used for every step (the final block is zero-padded), so
the whole stream compiles exactly once; block launches are async — partials
are pulled only after every block is enqueued.
"""

from __future__ import annotations

import contextlib
import functools

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sparse

from ..ops.estimators import NoiseModel, mean_var_from_suffstats
from .sharded import dp_suffstats


@functools.partial(jax.jit, static_argnums=(0,))
def _block_suffstats(mesh, xb, w, w2):
    return dp_suffstats(mesh, xb, w, w2)


def stream_suffstats(mesh, X, size_factor, block: int = 8192,
                     precision: str = "high"):
    """Exact per-gene sufficient statistics via cell-block streaming DP.

    Args:
      mesh: mesh with a ``data`` axis (cells sharded over it).
      X: ``[N, G]`` scipy sparse or dense counts (host side; see
        ``stream_suffstats_multihost`` for the per-process row-range entry
        point in a multi-host deployment).
      size_factor: ``[N]`` per-cell size factors.
      block: cells per streamed step (rounded up to the data-axis size).
      precision: 'high' (f64 device partials) or 'fast' (f32 partials);
        both accumulate across blocks in host float64.

    Returns:
      (s1, s2, s1sq): ``[G]`` float64 numpy arrays (full-dataset sums).
    """
    if precision not in ("high", "fast"):
        raise ValueError("precision must be 'high' or 'fast'")
    n, g = X.shape
    n_data = mesh.shape[mesh.axis_names[0]]
    block = max(n_data, (block // n_data) * n_data)

    sf = np.asarray(size_factor, dtype=np.float64)
    issp = sparse.issparse(X)
    Xr = X.tocsr() if issp else np.asarray(X)

    dtype = jnp.float64 if precision == "high" else jnp.float32
    x64 = jax.enable_x64() if precision == "high" else contextlib.nullcontext()

    # Compact transport: integral counts ship as the smallest int dtype
    # (the device cast back to the accumulator dtype is EXACT, so even
    # precision='high' results are unchanged) — 8x fewer host->device
    # bytes than f64 dense blocks, which are the dominant cost of this
    # path (docs/performance.md "DP streaming" note).
    from ..ops.transport import compact_transport_dtype

    tdtype = compact_transport_dtype(Xr)

    partials = []
    with x64:
        for start in range(0, n, block):
            stop = min(start + block, n)
            xb = Xr[start:stop]
            xb = np.asarray(xb.todense()) if issp else np.asarray(xb)
            xb = np.asarray(xb, tdtype) if tdtype is not None \
                else np.asarray(xb, np.float64 if precision == "high"
                                else np.float32)
            w = 1.0 / sf[start:stop]
            w2 = w * w
            if stop - start < block:  # zero-pad final block (zero weights)
                pad = block - (stop - start)
                xb = np.pad(xb, ((0, pad), (0, 0)))
                w = np.pad(w, (0, pad))
                w2 = np.pad(w2, (0, pad))
            partials.append(_block_suffstats(
                mesh,
                jnp.asarray(xb),
                jnp.asarray(w, dtype),
                jnp.asarray(w2, dtype),
            ))

    s1 = np.zeros(g, np.float64)
    s2 = np.zeros(g, np.float64)
    s1sq = np.zeros(g, np.float64)
    for p1, p2, p1sq in partials:
        s1 += np.asarray(p1, np.float64)
        s2 += np.asarray(p2, np.float64)
        s1sq += np.asarray(p1sq, np.float64)
    return s1, s2, s1sq


def stream_mean_var(mesh, X, size_factor, q, model: NoiseModel,
                    block: int = 8192, precision: str = "high"):
    """Observed per-gene moments via the streaming DP pipeline.

    Drop-in for ``ops.estimators.mean_var_sparse`` when a mesh is available;
    the moment transform runs on the host float64 sums, matching the
    reference's f64 arithmetic (ref ``estimator.py:165-185``).
    """
    n_obs = X.shape[0]
    if not model.relative:
        size_factor = np.ones(n_obs)
    s1, s2, s1sq = stream_suffstats(mesh, X, size_factor, block, precision)
    m, v = mean_var_from_suffstats(s1, s2, s1sq, n_obs, q, model)
    return np.asarray(m), np.asarray(v)


__all__ = ["stream_suffstats", "stream_mean_var"]
