"""Lightweight tracing/observability (aux subsystem).

The reference's only instrumentation is ad-hoc ``time.time()`` calls inside
``_bootstrap_1d(return_times=True)`` (ref ``/root/reference/memento/
bootstrap.py:89-114``) and joblib verbosity levels.  This module provides a
structured replacement: named phase timers with a process-global registry,
an optional JAX device profiler hook, and a progress callback used by the
orchestrators.

Device timing caveat: on asynchronous backends ``block_until_ready`` may
return before remote execution finishes (observed on tunneled TPU
backends); ``sync_pull`` forces real completion by pulling a reduced scalar.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Optional

_TIMINGS: Dict[str, list] = defaultdict(list)


@contextlib.contextmanager
def phase(name: str):
    """Time a named phase; accumulate into the global registry."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        _TIMINGS[name].append(time.perf_counter() - t0)


def sync_pull(tree) -> float:
    """Force true completion of device work by pulling one reduced scalar."""
    import jax
    import jax.numpy as jnp

    leaves = jax.tree_util.tree_leaves(tree)
    total = sum(
        jnp.nansum(leaf) for leaf in leaves if hasattr(leaf, "dtype")
    )
    return float(total)


def timings() -> Dict[str, dict]:
    """Summary of all recorded phases."""
    out = {}
    for name, vals in _TIMINGS.items():
        out[name] = {
            "count": len(vals),
            "total_s": sum(vals),
            "mean_s": sum(vals) / len(vals),
            "max_s": max(vals),
        }
    return out


def reset_timings() -> None:
    _TIMINGS.clear()


def report(file=None) -> str:
    """Human-readable phase report."""
    lines = [f"{'phase':<32}{'count':>8}{'total(s)':>12}{'mean(s)':>12}"]
    for name, s in sorted(timings().items(), key=lambda kv: -kv[1]["total_s"]):
        lines.append(
            f"{name:<32}{s['count']:>8}{s['total_s']:>12.3f}{s['mean_s']:>12.4f}"
        )
    text = "\n".join(lines)
    if file is not None:
        print(text, file=file)
    return text


@contextlib.contextmanager
def device_trace(logdir: Optional[str] = None):
    """Wrap a region in the JAX device profiler (TensorBoard trace) when a
    logdir is given; no-op otherwise."""
    if logdir is None:
        yield
        return
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


__all__ = ["phase", "sync_pull", "timings", "reset_timings", "report",
           "device_trace"]
