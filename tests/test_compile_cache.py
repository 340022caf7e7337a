"""enable_compile_cache points JAX's persistent cache at a directory and
entries actually land there (cross-process warm starts, utils/cache.py)."""

import os

import jax
import jax.numpy as jnp

from memento_tpu.utils import enable_compile_cache


def test_cache_writes_entry(tmp_path):
    cachedir = str(tmp_path / "jc")
    old_dir = jax.config.jax_compilation_cache_dir
    old_min = jax.config.jax_persistent_cache_min_compile_time_secs
    try:
        got = enable_compile_cache(cachedir, min_compile_secs=0.0)
        assert got == cachedir

        @jax.jit
        def f(x):
            return jnp.tanh(x) @ x.T + x.sum()

        f(jnp.ones((32, 32))).block_until_ready()
        entries = os.listdir(cachedir)
        assert entries, "no persistent cache entry written"
        assert any("jit_f" in e for e in entries)
    finally:
        jax.config.update("jax_compilation_cache_dir", old_dir)
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", old_min)


def test_default_dir_is_repo_local():
    from memento_tpu.utils import cache

    assert os.path.basename(cache._DEFAULT_DIR) == ".jax_cache"
    # next to the package, i.e. the repo root that ships pre-warmed
    assert os.path.isdir(os.path.dirname(cache._DEFAULT_DIR))
