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


def ragged_counts(rng, t_dim, u_dim, n):
    """A realistic ragged tile: per-row occupied-bin counts drawn like a
    real compression output (most rows use a fraction of U; zero padding
    beyond), multiplicities geometric-ish with a heavy bin 0."""
    occ = np.clip(
        (rng.gamma(2.0, 0.2, t_dim) * u_dim).astype(int), 8, u_dim)
    counts = np.zeros((t_dim, u_dim), np.float32)
    for i, o in enumerate(occ):
        c = rng.integers(1, 12, size=o).astype(np.float32)
        c[0] += n - c.sum()
        counts[i, :o] = c
    assert (counts >= 0).all() and np.allclose(counts.sum(1), n)
    return counts


def print_roofline(counts, b, measured_s, label):
    from memento_tpu.utils.roofline import roofline

    r = roofline(np.asarray(counts), b, measured_s)
    print(
        f"  [{label}] roofline: {r['useful_draws_per_s']:.3g} draws/s | "
        f"{r['achieved_weighted_ops_per_s']:.3g} weighted-op/s "
        f"({r['vpu_utilization']:.1%} of VPU peak, raw "
        f"{r['vpu_utilization_raw']:.1%}) | HBM {r['hbm_gb']:.2f} GB "
        f"({r['hbm_utilization']:.1%} of BW) | bound={r['limiting_resource']}"
        f" | gap {r['speed_of_light_gap']:.2f}x | table loop "
        f"{r['table_share']:.0%} of ALU ops "
        f"(mean {r['mean_table_iters']:.1f} iters)",
        flush=True,
    )
    return r


def main():
    import json

    from memento_tpu.ops.pallas_kernels import fused_bootstrap_sums_pallas
    from memento_tpu.ops.sampling import fused_bootstrap_sums

    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    records = []

    for (t_dim, u_dim, b, ragged) in [
        (1024, 1024, 10_000, False),
        (1024, 600, 1000, False),
        (1024, 1024, 10_000, True),
    ]:
        kind = "ragged" if ragged else "dense"
        print(f"tile T={t_dim} U={u_dim} B={b} ({kind})", flush=True)
        # n chosen above the max possible row sum (u_dim * 39) so topping up
        # bin 0 never goes negative — the cascade requires a valid
        # multiplicity vector (non-negative, summing to n)
        n = 50000
        if ragged:
            counts = ragged_counts(rng, t_dim, u_dim, n)
        else:
            counts = rng.integers(1, 40, size=(t_dim, u_dim)).astype(
                np.float32)
            counts[:, 0] += n - counts.sum(1)
        assert (counts >= 0).all() and np.allclose(counts.sum(1), n)
        weights = rng.random((t_dim, u_dim, 3)).astype(np.float32)
        counts_np = counts
        counts = jnp.asarray(counts)
        weights = jnp.asarray(weights)
        key = jax.random.key(0)

        best = bench(lambda: fused_bootstrap_sums_pallas(key, counts, weights,
                                                         float(n), b),
                     label=f"pallas B={b} {kind}")
        r = print_roofline(counts_np, b, best, f"pallas B={b} {kind}")
        records.append({"tile": [t_dim, u_dim, b], "kind": kind,
                        "pallas_best_s": best,
                        "roofline": {k: (round(v, 6) if isinstance(v, float)
                                         else v) for k, v in r.items()}})
        if not ragged:
            bench(lambda: fused_bootstrap_sums(key, counts, weights, float(n),
                                               b, "cascade"),
                  label=f"xla    B={b}")
    print(json.dumps(records))


if __name__ == "__main__":
    main()
