"""G x G correlation matrix at transcriptome scale — measured.

    NS_CACHE=/tmp/ns_counts.npz python examples/corr_north_star.py

Runs ``get_corr_matrix``'s engine (``ops.corr.corr_matrix_device``) on one
group of 20,000 genes x >=100,000 cells — the one O(G^2 N) op in the
framework (ref ``/root/reference/memento/estimator.py:236-270``; SURVEY.md
§3.5).  Reports the phase split (host densify+upload, device Gram
accumulation, gather+f64 finish) so link-bound vs compute-bound is explicit.

Env knobs: NS_CELLS (total; one 50% group is used), NS_GENES, NS_CACHE
(shared with north_star.py), CORR_BLOCK, CORR_ROW_BLOCK.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import scipy.sparse as sparse

N_CELLS = int(os.environ.get("NS_CELLS", 200_000))
N_GENES = int(os.environ.get("NS_GENES", 20_000))
BLOCK = int(os.environ.get("CORR_BLOCK", 4096))
ROW_BLOCK = int(os.environ.get("CORR_ROW_BLOCK", 4096))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from memento_tpu.ops.corr import _gram_update, finish_corr_rows
    from memento_tpu.ops.transport import compact_transport_dtype
    from memento_tpu.ops.estimators import get_noise_model, mean_var_sparse
    from memento_tpu.ops.size_factor import estimate_size_factor
    from memento_tpu.utils import enable_compile_cache
    from north_star import simulate

    enable_compile_cache(os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
    log(f"devices: {jax.devices()}")
    phases = {}

    t = time.time()
    cache = os.environ.get("NS_CACHE", "")
    if cache and os.path.exists(cache):
        X = sparse.load_npz(cache).tocsr()
        assert X.shape == (N_CELLS, N_GENES), X.shape
    else:
        X = simulate(N_CELLS, N_GENES)
        if cache:
            sparse.save_npz(cache, X)
    half = N_CELLS // 2
    Xg = X[:half].tocsr()  # one group, as get_corr_matrix uses
    n, g = Xg.shape
    phases["load"] = time.time() - t
    log(f"group: {n} cells x {g} genes, nnz={Xg.nnz}")

    t = time.time()
    sf = estimate_size_factor(Xg, total=True)
    sf = sf / sf.mean()
    _, var = mean_var_sparse(Xg, sf, 0.1)
    model = get_noise_model("hyper_relative")
    phases["setup"] = time.time() - t

    # inlined corr_matrix_device with per-phase timing: densify+upload /
    # device-gram (forced sync at the end) / gather+finish
    q = 0.1
    S = jnp.zeros((g, g), jnp.float32)
    s1 = jnp.zeros((g,), jnp.float32)
    sdiag = jnp.zeros((g,), jnp.float32)
    cS = jnp.zeros((g, g), jnp.float32)
    cs1 = jnp.zeros((g,), jnp.float32)
    csdiag = jnp.zeros((g,), jnp.float32)
    tdtype = compact_transport_dtype(Xg) or np.float32
    log(f"transport dtype: {np.dtype(tdtype).name} "
        f"({n * g * np.dtype(tdtype).itemsize / 1e9:.2f} GB dense upload)")

    t = time.time()
    upload_s = 0.0
    for start in range(0, n, BLOCK):
        stop = min(start + BLOCK, n)
        tu = time.time()
        xb = np.asarray(Xg[start:stop].todense(), dtype=tdtype)
        xb_dev = jnp.asarray(xb)
        ws = jnp.asarray(1.0 / sf[start:stop], jnp.float32)
        w2s = jnp.asarray(1.0 / sf[start:stop] ** 2, jnp.float32)
        upload_s += time.time() - tu
        S, s1, sdiag, cS, cs1, csdiag = _gram_update(
            xb_dev, ws, w2s, S, s1, sdiag, cS, cs1, csdiag)
        if start == 0:
            log(f"first block dispatched at {time.time() - t:.1f}s")
    # force completion of the async gram chain
    sync = float(jnp.sum(s1))
    phases["gram_stream"] = time.time() - t
    phases["gram_stream_host_side"] = upload_s
    log(f"gram stream: {phases['gram_stream']:.1f}s "
        f"(host densify+upload {upload_s:.1f}s), sync={sync:.3g}")

    t = time.time()
    c = float(np.asarray(model.var_correction(q)))
    s1_h, sdiag_h = np.asarray(s1), np.asarray(sdiag)
    out = np.empty((g, g), dtype=np.float32)
    gather_s = 0.0
    for r0 in range(0, g, ROW_BLOCK):
        r1 = min(r0 + ROW_BLOCK, g)
        tg = time.time()
        s_rows = np.asarray(S[r0:r1])
        gather_s += time.time() - tg
        out[r0:r1] = finish_corr_rows(s_rows, r0, s1_h, sdiag_h, var,
                                      float(n), c)
    phases["gather_finish"] = time.time() - t
    phases["gather_only"] = gather_s

    finite = float(np.isfinite(out).mean())
    offdiag = out[np.triu_indices(g, 1)]
    total = sum(v for k, v in phases.items()
                if k in ("gram_stream", "gather_finish"))
    print(json.dumps({
        "config": {"cells": n, "genes": g, "block": BLOCK,
                   "row_block": ROW_BLOCK,
                   "transport_dtype": np.dtype(tdtype).name},
        "phases_s": {k: round(v, 2) for k, v in phases.items()},
        "corr_total_s": round(total, 2),
        "cellpairs_per_s": round(n * g * g / total, 1),
        "finite_frac": round(finite, 4),
        "offdiag_mean_abs": round(float(np.nanmean(np.abs(offdiag))), 5),
        "device_gb": round(2 * g * g * 4 / 1e9, 2),
        "result_gb": round(g * g * 4 / 1e9, 2),
    }))


if __name__ == "__main__":
    main()
