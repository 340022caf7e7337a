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


def cache_key_probe() -> dict:
    """Per-component digests of JAX's compilation-cache key for a canonical
    tiny computation — the diagnostic for cross-session cache-key drift.

    ROUND_NOTES r3 observed the bench-shape executables re-keying between
    sessions while another shape still hit, i.e. SOME key component is
    session-scoped.  The key is a chained sha256 over named components
    (computation, jaxlib version, backend version, XLA flags,
    compile_options, accelerator_config, compression, custom_hook —
    ``jax._src.cache_key.get``).  This probe hashes each component
    SEPARATELY for a fixed ``x + 1`` jit, so two sessions' probe files diff
    to exactly the drifting component.  Committed probes live in
    ``CACHEKEY_PROBE_r*.json``; run ``python -m memento_tpu.utils.cache``
    to print the current session's.

    Returns a dict of component name -> hex digest (plus plaintext
    platform info), or {"error": ...} if jax internals moved.
    """
    import hashlib
    import json  # noqa: F401  (callers dump the result)

    import numpy as np

    try:
        import jax
        import jax.numpy as jnp
        from jax._src import cache_key as ck
        from jax._src import compiler, xla_bridge

        backend = xla_bridge.get_backend()
        devices = np.array([jax.devices()[0]])
        lowered = jax.jit(lambda x: x + 1.0).lower(jnp.zeros((8,), jnp.float32))
        module = lowered.compiler_ir()
        options = compiler.get_compile_options(num_replicas=1,
                                               num_partitions=1)
        out = {
            "platform": backend.platform,
            "platform_version": backend.platform_version,
            "jaxlib": ck.jaxlib_version_str,
        }

        def digest(fn):
            h = hashlib.sha256()
            fn(h)
            return h.hexdigest()

        out["computation"] = digest(
            lambda h: ck._hash_computation(h, module,
                                           ck.IgnoreCallbacks.NO))
        out["backend_version"] = digest(
            lambda h: ck._hash_platform(h, backend))
        out["xla_flags"] = digest(
            lambda h: ck._hash_xla_flags(h, ck.get_flag_prefixes()))
        out["compile_options"] = digest(
            lambda h: ck._hash_serialized_compile_options(
                h, options, strip_device_assignment=False))
        out["accelerator_config"] = digest(
            lambda h: ck._hash_accelerator_config(h, devices))
        out["custom_hook"] = digest(
            lambda h: ck._hash_string(h, ck.custom_hook()))
        out["full_key"] = ck.get(module, devices, options, backend)
        return out
    except Exception as e:  # diagnostic tool: never crash the caller
        return {"error": f"{type(e).__name__}: {e}"}


if __name__ == "__main__":
    import json as _json

    print(_json.dumps(cache_key_probe(), indent=1))


__all__ = ["enable_compile_cache", "cache_key_probe"]
