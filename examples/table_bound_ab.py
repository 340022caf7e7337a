"""Interleaved A/B: truncated-Poisson table trip-count bound (r5 stretch).

    python examples/table_bound_ab.py      # on the TPU

The r4 bound analysis left one untried lever on the cascade kernel: the
table loop (46% of kernel time per the ablation).  A branchless binary
search over the 32-entry CDF is architecturally blocked on the VPU —
the probe index differs per replicate lane, and Mosaic has no per-lane
gather (dynamic lane indexing does not lower), so each probe would cost a
32-term one-hot dot (160 wide ops for 5 probes vs ~2*n_iter<=64 for the
linear scan).  The remaining lever is the adaptive trip count itself:
the default bound lam + 6*sqrt(lam) + 6 covers the right tail to
P < ~1e-9; a 5*sqrt+4 bound still keeps the per-draw miss below ~1e-7
(graceful: a missed draw clips at the truncation point) while cutting
average steps ~20-25%.

Runs both variants INTERLEAVED in one process (per the measurement
discipline in ROUND_NOTES — chip throughput drifts between sessions) on
the north-star tile and prints medians plus a distribution sanity check.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from memento_tpu.ops.pallas_kernels import fused_bootstrap_sums_pallas
from memento_tpu.utils import enable_compile_cache

from kernel_bench import ragged_counts  # noqa: E402


def run(variant, key, counts, weights, n, b):
    out = fused_bootstrap_sums_pallas(key, counts, weights, n, b,
                                      table_bound=variant)
    return out


def main():
    enable_compile_cache()
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    t_dim, u_dim, b = 1024, 1024, 10_000
    n = 100_000.0
    counts = jnp.asarray(ragged_counts(rng, t_dim, u_dim, int(n)))
    w = jnp.asarray(rng.random((t_dim, u_dim, 2)).astype(np.float32))
    key = jax.random.key(7)

    variants = {"base(6,6)": (6.0, 6.0), "tight(5,4)": (5.0, 4.0)}
    # compile both first
    for name, v in variants.items():
        t0 = time.time()
        float(jnp.sum(run(v, key, counts, w, n, b)))
        print(f"compile+first [{name}]: {time.time() - t0:.2f}s", flush=True)

    times = {k: [] for k in variants}
    for rep in range(5):
        for name, v in variants.items():
            t0 = time.time()
            float(jnp.sum(run(v, key, counts, w, n, b)))
            times[name].append(time.time() - t0)
    for name in variants:
        ts = times[name]
        print(f"[{name}] best {min(ts):.3f}s median {np.median(ts):.3f}s "
              f"all {[round(x, 3) for x in ts]}", flush=True)

    # distribution sanity: per-row first-weight sums must agree in mean/std
    # within MC tolerance between bounds (different tail truncation only)
    outs = {}
    for name, v in variants.items():
        outs[name] = np.asarray(run(v, key, counts, w, n, b)[:, 0, :])
    a, bb = outs["base(6,6)"], outs["tight(5,4)"]
    mean_rel = np.abs(a.mean(1) - bb.mean(1)) / np.maximum(np.abs(a.mean(1)),
                                                           1e-9)
    std_rel = np.abs(a.std(1) - bb.std(1)) / np.maximum(a.std(1), 1e-9)
    print(f"mean rel diff: max {mean_rel.max():.2e} "
          f"median {np.median(mean_rel):.2e}")
    print(f"std rel diff:  max {std_rel.max():.2e} "
          f"median {np.median(std_rel):.2e}")


if __name__ == "__main__":
    main()
