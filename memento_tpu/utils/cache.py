"""Persistent-compilation-cache helper (aux subsystem: warm starts).

The reference has no compilation story (NumPy/scipy run immediately); a
jit-compiled TPU pipeline pays its first-tile compile on every cold
process — 1-6 minutes for the HT tile executables through a
remote-compile backend.  JAX's persistent cache eliminates that cost for
repeated shapes, and its key is stable across processes and across
source-line-only edits (the canonicalized module hash strips debug info,
including inside the Mosaic kernel payload — verified empirically against
``ht_1d_tile``), so a warmed cache directory is a durable artifact.

``enable_compile_cache`` is called by ``bench.py`` and the example
drivers; library users embedding memento_tpu in their own entry points
should call it once before the first pipeline run.
"""

from __future__ import annotations

import os
from typing import Optional

_DEFAULT_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")


def enable_compile_cache(path: Optional[str] = None,
                         min_compile_secs: float = 0.1) -> Optional[str]:
    """Point JAX's persistent compilation cache at ``path``.

    Args:
      path: cache directory (created on first write).  Defaults to
        ``.jax_cache/`` next to the package, which ships pre-warmed with
        the benchmark-shape executables.
      min_compile_secs: write threshold.  0.1 s (not JAX's 1 s default)
        because even trivial helper jits (``threefry_seed``,
        ``convert_element_type``) cost ~0.35 s each through a
        remote-compile RPC and there are dozens per cold process.

    Returns:
      The cache directory in effect, or None if configuration failed
      (old JAX without these flags) — callers proceed uncached.
    """
    import jax

    path = path or _DEFAULT_DIR
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          float(min_compile_secs))
    except Exception:
        return None
    return path


__all__ = ["enable_compile_cache"]
