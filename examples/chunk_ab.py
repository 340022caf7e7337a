"""Interleaved A/B: Pallas bin-unroll length (PALLAS_CHUNK) on the
north-star tile — the one unroll parameter never swept (r4 swept lane
chunks; the r4 bound analysis blamed instruction issue/scheduling of the
big unrolled program, so a shorter unroll with more carry round-trips vs
a longer one with more scheduling pressure is a real open A/B).

    python examples/chunk_ab.py      # on the TPU
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


def main():
    enable_compile_cache()
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    t_dim, u_dim, b = 1024, 1024, 10_000
    n = 100_000.0
    counts = jnp.asarray(ragged_counts(rng, t_dim, u_dim, int(n)))
    w = jnp.asarray(rng.random((t_dim, u_dim, 2)).astype(np.float32))
    key = jax.random.key(7)

    variants = {"c128": 128, "c256(default)": 256, "c512": 512}
    outs = {}
    for name, c in variants.items():
        t0 = time.time()
        outs[name] = float(jnp.sum(fused_bootstrap_sums_pallas(
            key, counts, w, n, b, chunk_bins=c)))
        print(f"compile+first [{name}]: {time.time() - t0:.2f}s", flush=True)

    times = {k: [] for k in variants}
    for rep in range(4):
        for name, c in variants.items():
            t0 = time.time()
            float(jnp.sum(fused_bootstrap_sums_pallas(
                key, counts, w, n, b, chunk_bins=c)))
            times[name].append(time.time() - t0)
    for name in variants:
        ts = times[name]
        print(f"[{name}] best {min(ts):.3f}s median {np.median(ts):.3f}s "
              f"all {[round(x, 3) for x in ts]}", flush=True)


if __name__ == "__main__":
    main()
