"""Multi-host deployment scaffolding (SURVEY.md §2.2 "DCN between hosts").

The reference is strictly single-node (joblib workers, ref
``/root/reference/memento/main.py:397,501``); its production pattern for
scale is manually sharding gene lists across invocations
(``analysis/lupus/run_memento.py:92-109``).  This module provides the
TPU-native multi-host story: one controller process per host
(``initialize``), each host ingesting only its own row range of the cell
matrix (``process_row_range``), local per-host device reductions, and a
single cross-host sum over DCN (``allreduce_suffstats``) — sufficient
statistics are plain sums, so the result is exactly the single-host answer.

Verified end-to-end by ``tests/test_distributed.py`` with a real 2-process
``jax.distributed`` launch (gloo collectives on CPU devices).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.estimators import NoiseModel, mean_var_from_suffstats


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None,
               **kwargs) -> None:
    """Join (or start) the multi-controller runtime.

    Thin wrapper over ``jax.distributed.initialize``; on managed TPU pods
    all three arguments are auto-detected and may be omitted.
    """
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        **kwargs,
    )


def process_row_range(n_rows: int,
                      process_id: Optional[int] = None,
                      num_processes: Optional[int] = None) -> Tuple[int, int]:
    """Contiguous, balanced [start, stop) row range owned by this process.

    Each host loads only ``X[start:stop]`` of the global cell matrix — the
    input pipeline never materializes the full dataset on any one host.
    """
    pid = jax.process_index() if process_id is None else process_id
    nproc = jax.process_count() if num_processes is None else num_processes
    base, rem = divmod(n_rows, nproc)
    start = pid * base + min(pid, rem)
    stop = start + base + (1 if pid < rem else 0)
    return start, stop


def process_tile_starts(starts, process_id: Optional[int] = None,
                        num_processes: Optional[int] = None) -> list:
    """Round-robin assignment of tile start offsets to this process.

    Gene/pair hypothesis tests are embarrassingly parallel (the reference's
    production runs shard gene lists across invocations by hand,
    ``analysis/lupus/run_memento.py:92-109``); round-robin over tile starts
    balances ragged per-tile compression cost across hosts while keeping
    every tile's GLOBAL start offset — so per-tile RNG key folds match the
    single-process run exactly.
    """
    pid = jax.process_index() if process_id is None else process_id
    nproc = jax.process_count() if num_processes is None else num_processes
    return list(starts)[pid::nproc]


def merge_disjoint_rows(out: dict, owned: np.ndarray,
                        precision: str = "high") -> dict:
    """Merge per-process result dicts whose row ownership is disjoint.

    Each process holds full-size ``[N, ...]`` arrays but has only filled the
    rows in its ``owned`` mask; rows are owned by exactly one process, so a
    cross-host sum with non-owned rows zeroed reconstructs the global result
    exactly (including NaN sentinels in owned rows: NaN + 0 = NaN).

    The ownership masks are validated collectively: every row must be
    owned by EXACTLY one process (processes that resolved different tile
    sizes — e.g. unequal local device counts rounding ``tile_size``
    differently — would otherwise silently double or zero rows).
    """
    keys = sorted(out)
    shape = np.shape(out[keys[0]])
    mask = np.broadcast_to(
        np.asarray(owned, np.float64).reshape(
            (-1,) + (1,) * (len(shape) - 1)), shape).copy()
    arrs = [mask]
    for k in keys:
        a = np.array(out[k], np.float64, copy=True)
        a[~owned] = 0.0
        arrs.append(a)
    merged = allreduce_hostsums(*arrs, precision=precision)
    owners = merged[0][..., 0] if len(shape) > 1 else merged[0]
    # allreduce_hostsums telescopes each partial as partial/n_local summed
    # over local devices, so a legitimate owner count of 1 can come back as
    # e.g. 3*(1/3) != 1.0 exactly — compare against the nearest integer
    # with a tolerance instead of exact float equality.  The tolerance must
    # cover precision='fast' (~n_devices * 1e-7 relative per the
    # allreduce_hostsums docstring): owner counts are small integers, so
    # 1e-2 is safely below the 0-vs-1-vs-2 spacing while covering any
    # realistic device count.
    ok = np.isclose(owners, 1.0, rtol=0, atol=1e-2)
    if not np.all(ok):
        bad = np.nonzero(~ok)[0]
        raise RuntimeError(
            f"inconsistent distributed tile partition: {bad.size} rows are "
            f"owned by {owners[bad[0]]:.0f} processes (first bad row "
            f"{bad[0]}); every process must resolve the same tile_size — "
            "pass tile_size explicitly when hosts have unequal device "
            "counts")
    return {k: np.asarray(m) for k, m in zip(keys, merged[1:])}


def local_data_mesh() -> Mesh:
    """A per-host mesh over this process's addressable devices only.

    Local reductions (cell blocks -> per-host partial sums) run here; only
    the tiny ``[G]`` partials cross hosts afterwards, so the bulk of the
    traffic stays on-host/ICI and DCN carries O(G) floats once.
    """
    return Mesh(np.array(jax.local_devices()), ("data",))


def global_data_mesh() -> Mesh:
    """A 1-D mesh over every device of every process (process-major)."""
    return Mesh(np.array(jax.devices()), ("data",))


def allreduce_hostsums(*partials: np.ndarray,
                       precision: str = "high") -> Tuple[np.ndarray, ...]:
    """Sum per-process host arrays across all processes (DCN collective).

    Each process contributes one set of equally-shaped float64 arrays;
    every process receives the global sums.  Implemented as a
    process-sharded global array reduced with one jitted ``sum`` — XLA
    lowers the cross-host part to a DCN all-reduce.

    ``precision='high'`` reduces in float64 under ``jax.enable_x64`` (exact:
    the moments match a single-host f64 run bit-for-bit up to summation
    order); ``'fast'`` ships float32 with a hi/lo split that recovers the
    per-process f64->f32 rounding (error ~#devices * 1e-7 relative) for
    backends where f64 collectives are unavailable or slow.
    """
    mesh = global_data_mesh()
    n_local = len(jax.local_devices())
    sharding = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())
    stacked = np.stack([np.asarray(p, np.float64) for p in partials])
    k = stacked.shape[0]
    # every local device carries partial/n_local so the device-axis sum
    # telescopes to the per-process partial exactly once
    if precision == "high":
        with jax.enable_x64():
            local_rows = np.repeat(stacked[None, ...] / n_local, n_local,
                                   axis=0)
            arr = jax.make_array_from_process_local_data(
                sharding, local_rows.astype(np.float64)
            )
            summed = jax.jit(lambda a: a.sum(axis=0), out_shardings=repl)(arr)
            out = np.asarray(summed, np.float64)
    else:
        # split each f64 partial into hi + lo f32 halves so the f32
        # collective still recovers the pre-split f64 values
        hi = np.float32(stacked)
        lo = np.float32(stacked - hi)
        local_rows = np.repeat(
            np.concatenate([hi, lo], axis=0)[None, ...] / n_local, n_local,
            axis=0,
        )
        arr = jax.make_array_from_process_local_data(
            sharding, local_rows.astype(np.float32)
        )
        summed = jax.jit(lambda a: a.sum(axis=0), out_shardings=repl)(arr)
        summed = np.asarray(summed, np.float64)
        out = summed[:k] + summed[k:]
    return tuple(out[i] for i in range(k))


def stream_suffstats_multihost(X_local, size_factor_local,
                               block: int = 8192,
                               precision: str = "high"):
    """Global per-gene sufficient statistics from per-host row ranges.

    Args:
      X_local: ``[N_local, G]`` this host's row range of the cell matrix
        (see ``process_row_range``).
      size_factor_local: ``[N_local]`` matching size factors.

    Returns:
      (s1, s2, s1sq): ``[G]`` float64 global sums, identical on every host.
    """
    from .streaming import stream_suffstats

    mesh = local_data_mesh()
    s1, s2, s1sq = stream_suffstats(mesh, X_local, size_factor_local,
                                    block=block, precision=precision)
    return allreduce_hostsums(s1, s2, s1sq, precision=precision)


def stream_mean_var_multihost(X_local, size_factor_local, n_obs_global: int,
                              q: float, model: NoiseModel,
                              block: int = 8192, precision: str = "high"):
    """Observed global moments from per-host row ranges (multi-host DP)."""
    if not model.relative:
        size_factor_local = np.ones(X_local.shape[0])
    s1, s2, s1sq = stream_suffstats_multihost(
        X_local, size_factor_local, block=block, precision=precision
    )
    m, v = mean_var_from_suffstats(s1, s2, s1sq, n_obs_global, q, model)
    return np.asarray(m), np.asarray(v)


__all__ = [
    "initialize",
    "process_row_range",
    "process_tile_starts",
    "merge_disjoint_rows",
    "local_data_mesh",
    "global_data_mesh",
    "allreduce_hostsums",
    "stream_suffstats_multihost",
    "stream_mean_var_multihost",
]
