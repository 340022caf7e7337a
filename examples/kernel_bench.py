"""Micro-benchmark: the fused cascade Pallas kernel vs the XLA scan.

    python examples/kernel_bench.py          # on the TPU (JAX_PLATFORMS=axon)

Measures the north-star bootstrap tile (T=1024 rows x U=1024 bins x
B=10,000 replicates, W=3 weighted sums) plus the headline B=1000 tile.
The timing forces a scalar pull (the axon backend's block_until_ready
does not truly sync).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp


def bench(fn, reps=3, label=""):
    t = time.time()
    float(jnp.sum(fn()))  # compile + run
    print(f"  [{label}] compile+first: {time.time() - t:.2f}s", flush=True)
    times = []
    for _ in range(reps):
        t = time.time()
        float(jnp.sum(fn()))
        times.append(time.time() - t)
    print(f"  [{label}] best {min(times):.3f}s  median "
          f"{float(np.median(times)):.3f}s  all {[round(x, 3) for x in times]}",
          flush=True)
    return min(times)


def main():
    from memento_tpu.ops.pallas_kernels import fused_bootstrap_sums_pallas
    from memento_tpu.ops.sampling import fused_bootstrap_sums

    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)

    for (t_dim, u_dim, b) in [(1024, 1024, 10_000), (1024, 600, 1000)]:
        print(f"tile T={t_dim} U={u_dim} B={b}", flush=True)
        # uniform row totals (the XLA scan path takes a scalar n_obs; the
        # pallas path accepts either)
        # n chosen above the max possible row sum (u_dim * 39) so topping up
        # bin 0 never goes negative — the cascade requires a valid
        # multiplicity vector (non-negative, summing to n)
        n = 50000
        counts = rng.integers(1, 40, size=(t_dim, u_dim)).astype(np.float32)
        counts[:, 0] += n - counts.sum(1)
        assert (counts >= 0).all() and np.allclose(counts.sum(1), n)
        weights = rng.random((t_dim, u_dim, 3)).astype(np.float32)
        counts = jnp.asarray(counts)
        weights = jnp.asarray(weights)
        key = jax.random.key(0)

        bench(lambda: fused_bootstrap_sums_pallas(key, counts, weights,
                                                  float(n), b),
              label=f"pallas B={b}")
        bench(lambda: fused_bootstrap_sums(key, counts, weights, float(n), b,
                                           "cascade"),
              label=f"xla    B={b}")


if __name__ == "__main__":
    main()
