"""Pallas fused cascade kernel.

Interpret mode stubs the TPU PRNG (all-zero bits), so on CPU we can only
check plumbing/shapes/conservation with deterministic draws; the
statistical parity tests run on real TPU hardware (skipped otherwise) and
were additionally validated manually (SE ratio median 1.000, p-value
max diff 5e-4 vs the XLA cascade at B=512).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from jax.experimental.pallas import tpu as pltpu

from memento_tpu.ops.pallas_kernels import fused_bootstrap_sums_pallas

ON_TPU = jax.default_backend() == "tpu"


def _tile(rng, t=10, u=24, n=20000):
    counts = np.zeros((t, u), np.float32)
    for i in range(t):
        k = rng.integers(10, u)
        small = rng.integers(1, 40, size=k - 1).astype(np.float32)
        counts[i, 1:k] = small
        counts[i, 0] = n - small.sum()
    return counts


def test_pallas_plumbing_interpret(rng):
    """Shapes, padding, and exact total conservation under interpret mode
    (PRNG stubbed to zeros -> deterministic central draws)."""
    n = 20000
    counts = _tile(rng, t=10, u=24, n=n)
    w = np.ones((10, 24, 1), np.float32)
    with pltpu.force_tpu_interpret_mode():
        sums = np.asarray(
            fused_bootstrap_sums_pallas(jax.random.key(0), counts, w,
                                        float(n), 130)
        )
    assert sums.shape == (10, 1, 130)
    # weight-1 contraction = total draws = N exactly (conditioning)
    np.testing.assert_allclose(sums[:, 0, :], n, rtol=1e-5)


def test_pallas_per_row_n_interpret(rng):
    """Rows with different trial counts conserve their own totals."""
    counts = _tile(rng, t=4, u=16, n=1000)
    counts[2] *= 2  # row with 2x the cells
    n_rows = counts.sum(axis=1)
    w = np.ones((4, 16, 1), np.float32)
    with pltpu.force_tpu_interpret_mode():
        sums = np.asarray(
            fused_bootstrap_sums_pallas(jax.random.key(0), counts, w,
                                        jnp.asarray(n_rows), 64)
        )
    for i in range(4):
        np.testing.assert_allclose(sums[i, 0, :], n_rows[i], rtol=1e-5)


def test_pallas_all_small_bins_interpret(rng):
    """Tiles whose occupied bins are all below the CLT boundary exercise the
    table-only predicated branch (no Gaussian rows anywhere in a block);
    ragged zero tails exercise the block-skip predicate.  Conservation must
    still be exact through the branch selection."""
    t, u = 8, 48
    counts = np.zeros((t, u), np.float32)
    for i in range(t):
        k = int(rng.integers(12, u))  # ragged occupancy
        counts[i, :k] = rng.integers(1, 7, size=k).astype(np.float32)  # < tau
    n_rows = counts.sum(axis=1)
    w = np.ones((t, u, 2), np.float32)
    with pltpu.force_tpu_interpret_mode():
        sums = np.asarray(
            fused_bootstrap_sums_pallas(jax.random.key(0), counts, w,
                                        jnp.asarray(n_rows), 70)
        )
    for i in range(t):
        np.testing.assert_allclose(sums[i, :, :], n_rows[i], rtol=1e-5)


@pytest.mark.skipif(not ON_TPU, reason="real TPU PRNG required")
def test_pallas_matches_cascade_distribution(rng):
    from memento_tpu.ops.sampling import fused_bootstrap_sums

    n, B = 20000, 2000
    counts = _tile(rng, t=8, u=32, n=n)
    w = rng.random((8, 32, 2)).astype(np.float32)
    a = np.asarray(
        fused_bootstrap_sums(jax.random.key(0), jnp.asarray(counts),
                             jnp.asarray(w), float(n), B, "cascade")
    )
    b = np.asarray(
        fused_bootstrap_sums_pallas(jax.random.key(1), counts, w, float(n), B)
    )
    for i in range(8):
        for wi in range(2):
            sd = a[i, wi].std()
            assert abs(a[i, wi].mean() - b[i, wi].mean()) < 0.15 * sd + 1e-6
            assert abs(b[i, wi].std() / sd - 1) < 0.15


def test_pallas_multichunk_interpret(rng, monkeypatch):
    """U > chunk runs as chained chunk launches; totals still conserve
    exactly across the carried remaining/sums.  (A tiny chunk keeps the
    interpret-mode emulator fast; on hardware the chunk is 256.)"""
    from memento_tpu.ops import pallas_kernels

    monkeypatch.setattr(pallas_kernels, "PALLAS_CHUNK", 16)
    n = 50000
    t, u = 6, 40  # 3 chunks of 16 (padded)
    counts = np.zeros((t, u), np.float32)
    for i in range(t):
        k = rng.integers(20, u)
        small = rng.integers(1, 20, size=k - 1).astype(np.float32)
        counts[i, 1:k] = small
        counts[i, 0] = n - small.sum()
    w = np.ones((t, u, 2), np.float32)
    with pltpu.force_tpu_interpret_mode():
        sums = np.asarray(
            fused_bootstrap_sums_pallas(jax.random.key(0), counts, w,
                                        float(n), 70)
        )
    assert sums.shape == (t, 2, 70)
    np.testing.assert_allclose(sums[:, 0, :], n, rtol=1e-5)
    np.testing.assert_allclose(sums[:, 1, :], n, rtol=1e-5)


def test_pallas_bchunk_interpret(rng, monkeypatch):
    """B > PALLAS_B_CHUNK runs lane chunks as the inner grid dimension of
    one launch (iid PRNG streams); totals conserve."""
    from memento_tpu.ops import pallas_kernels

    monkeypatch.setattr(pallas_kernels, "PALLAS_B_CHUNK", 128)
    n = 9000
    counts = _tile(rng, t=4, u=16, n=n)
    w = np.ones((4, 16, 1), np.float32)
    with pltpu.force_tpu_interpret_mode():
        sums = np.asarray(
            pallas_kernels.fused_bootstrap_sums_pallas(
                jax.random.key(0), counts, w, float(n), 300
            )
        )
    assert sums.shape == (4, 1, 300)
    np.testing.assert_allclose(sums[:, 0, :], n, rtol=1e-5)


def test_pallas_bchunk_and_uchunk_interpret(rng, monkeypatch):
    """Both chunk axes at once: the U-chunk lax.scan carries the full-width
    [T, B_pad] remaining/sums blocks across launches while each launch's
    grid sweeps (row programs x lane chunks).  Totals must conserve exactly
    through the carried state for every lane chunk."""
    from memento_tpu.ops import pallas_kernels

    monkeypatch.setattr(pallas_kernels, "PALLAS_CHUNK", 16)
    monkeypatch.setattr(pallas_kernels, "PALLAS_B_CHUNK", 128)
    n = 30000
    t, u = 5, 40  # 3 U-chunks of 16 (padded)
    counts = np.zeros((t, u), np.float32)
    for i in range(t):
        k = rng.integers(20, u)
        small = rng.integers(1, 20, size=k - 1).astype(np.float32)
        counts[i, 1:k] = small
        counts[i, 0] = n - small.sum()
    w = np.ones((t, u, 2), np.float32)
    with pltpu.force_tpu_interpret_mode():
        sums = np.asarray(
            pallas_kernels.fused_bootstrap_sums_pallas(
                jax.random.key(0), counts, w, float(n), 300  # 3 lane chunks
            )
        )
    assert sums.shape == (t, 2, 300)
    np.testing.assert_allclose(sums[:, 0, :], n, rtol=1e-5)
    np.testing.assert_allclose(sums[:, 1, :], n, rtol=1e-5)
