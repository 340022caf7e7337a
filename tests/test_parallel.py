"""Multi-device sharding tests on a virtual 8-device CPU mesh.

The axon sitecustomize locks this process at 1 CPU device (see conftest), so
these tests run the sharded code in a scrubbed subprocess with
``--xla_force_host_platform_device_count=8``.
"""

import subprocess
import sys
from pathlib import Path

import pytest

from conftest import scrubbed_env

REPO = Path(__file__).resolve().parent.parent


def _run(code: str, n_devices: int = 8, timeout: int = 600):
    proc = subprocess.run(
        [sys.executable, "-c", code],
        env=scrubbed_env(n_devices),
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=timeout,
    )
    if proc.returncode != 0:
        raise AssertionError(
            f"subprocess failed\nstdout:\n{proc.stdout}\nstderr:\n"
            f"{proc.stderr[-3000:]}"
        )
    return proc.stdout


def test_dryrun_multichip_8_devices():
    out = _run(
        "import __graft_entry__ as ge; ge.dryrun_multichip(8)"
    )
    assert "dryrun_multichip ok" in out


def test_entry_compiles():
    out = _run(
        "import jax, __graft_entry__ as ge\n"
        "fn, args = ge.entry()\n"
        "out = jax.jit(fn)(*args)\n"
        "jax.block_until_ready(out)\n"
        "print('entry ok', [o.shape for o in out])\n",
        n_devices=1,
    )
    assert "entry ok" in out


def test_dp_suffstats_matches_single_device():
    """psum-merged cell-sharded sufficient statistics == unsharded sums."""
    out = _run(
        """
import numpy as np, jax, jax.numpy as jnp
from memento_tpu.parallel.mesh import make_mesh
from memento_tpu.parallel.sharded import dp_suffstats
from memento_tpu.ops.estimators import suffstats_dense

rng = np.random.default_rng(0)
x = rng.poisson(1.0, size=(64, 24)).astype(np.float32)
w = (rng.random(64) + 0.5).astype(np.float32)
mesh = make_mesh(shape=(8, 1))
s = dp_suffstats(mesh, jnp.asarray(x), jnp.asarray(1/w), jnp.asarray(1/w**2))
ref = suffstats_dense(jnp.asarray(x), jnp.asarray(1/w), jnp.asarray(1/w**2))
for a, b in zip(s, ref):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4)
print('dp ok')
"""
    )
    assert "dp ok" in out


def test_gene_sharded_ht_matches_replicated():
    """The gene-sharded HT tile must produce identical results to the
    unsharded run (same keys, same math, different partitioning)."""
    out = _run(
        """
import numpy as np, jax
from __graft_entry__ import _example_tile
from memento_tpu.parallel.mesh import make_mesh
from memento_tpu.parallel.sharded import sharded_ht_1d_tile
from memento_tpu.inference.ht import ht_1d_tile
from memento_tpu.ops.estimators import HYPER_RELATIVE

static = dict(num_boot=32, model=HYPER_RELATIVE, sampler='multinomial',
              one_sample=False, resampling='bootstrap', approx=False,
              resample_rep=False, boot_chunk=32)
args = _example_tile(r=2, t=32, u=16)
ref = ht_1d_tile(*args, **static)
mesh = make_mesh(shape=(1, 8))
with mesh:
    got = sharded_ht_1d_tile(mesh, *args, **static)
for k in ['mean_coef', 'var_coef', 'mean_pval', 'var_pval']:
    np.testing.assert_allclose(np.asarray(got[k]), np.asarray(ref[k]),
                               rtol=1e-4, atol=1e-6, equal_nan=True)
print('sharded ht ok')
"""
    )
    assert "sharded ht ok" in out
