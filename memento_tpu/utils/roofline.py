"""Speed-of-light accounting for the fused cascade bootstrap kernel.

BASELINE.json's north star demands "the bootstrap inner loop at
speed-of-light per chip" — this module turns that into a number: an exact
static count of the VPU work and HBM traffic the Pallas cascade kernel
(``ops/pallas_kernels.py``) performs for a given tile, mirroring the
kernel's occupancy predication bin by bin, compared against the chip's
peak rates.

The accounting walks the same decisions the kernel makes:

- rows are occupancy-sorted and processed in 8-row sublane blocks;
- a bin whose 8-row block is entirely empty costs only a predicate;
- a block-bin with any row's expected count >= tau runs Box-Muller +
  Cornish-Fisher over all ``b_pad`` lanes;
- a block-bin with any 0 < lam < tau runs the truncated-Poisson table
  loop, whose trip count is the kernel's adaptive bound
  ``min(32, ceil(lam_tab + 6*sqrt(lam_tab) + 6))``.

Peak-rate assumptions (TPU v5e / "v5 lite", one TensorCore per chip):

- VPU: (8, 128) vector unit with 4 independent ALUs at ~940 MHz
  -> ~3.85e12 f32 elementwise ops/s.  Transcendentals (log, exp, cos,
  sqrt, rsqrt) retire at a fraction of ALU rate; they are counted
  separately and charged ``TRANSCENDENTAL_COST`` ALU-equivalents each
  (a published-architecture-level estimate, not a measured per-op
  latency — the roofline reports both raw and weighted utilization).
- HBM: ~819 GB/s.

These are architecture constants from public TPU v5e documentation; on a
different chip generation pass explicit peaks to ``roofline``.
"""

from __future__ import annotations

import numpy as np

V5E_VPU_F32_OPS = 8 * 128 * 4 * 0.94e9  # lanes x sublanes x ALUs x clock
V5E_HBM_BYTES_PER_S = 819e9
TRANSCENDENTAL_COST = 4.0  # ALU-op equivalents per log/exp/cos/sqrt

_TAU = 8.0
_K_TABLE = 32
_PALLAS_CHUNK = 256
_PALLAS_B_CHUNK = 2048

# Static per-lane op counts read off ``_cascade_chunk_kernel``.  "ops" are
# f32 vector-ALU operations; "transc" are transcendental invocations.
#
# _gauss per lane: 2x _uniform_from_bits (shift, bitcast, cast, mul, max =
# ~4 ops each), z = sqrt(-2 log u1) * cos(2pi u2) (mul, mul + log, sqrt,
# cos), m/gam/s (rem*ratio; 1-2r; m*(1-r) - gam^2/18 - 1/12 under sqrt+max
# = ~9 ops + 1 sqrt), g = round(m + s*z + gam*(z^2-1)/6), clip, select
# (~9 ops).  PRNG bit generation itself runs on the dedicated PRNG unit;
# charged 1 op per 32-bit word drawn (2 words here).
_GAUSS_OPS = 4 * 2 + 2 + 9 + 9 + 2
_GAUSS_TRANSC = 4  # log, sqrt, cos, sqrt(s)

# _table per lane: u3 conversion (~4 ops + 1 word), pmf0 = exp(-lam)
# (1 transc, amortized over lanes but charged per lane conservatively),
# loop n_iter x (compare+add for t_acc, mul+mul for pmf update, add for
# cdf = 5 ops), then p_cond (2), variance rescale (3 ops + 1 sqrt),
# mean shift (3), clip (2), select (1).
_TABLE_FIXED_OPS = 4 + 1 + 2 + 3 + 3 + 2 + 1
_TABLE_OPS_PER_ITER = 5
_TABLE_TRANSC = 2  # exp(-lam), sqrt(1 - p_cond)

# epilogue per lane: 2 boundary selects, W fma pairs (mul+add), remaining
# update (1 sub) — W filled in at call time.
_EPILOGUE_OPS = 2 + 1


def cascade_tile_cost(counts: np.ndarray, num_boot: int, w_dim: int = 3,
                      tau: float = _TAU) -> dict:
    """Exact static work/traffic model of ``fused_bootstrap_sums_pallas``.

    Args:
      counts: ``[T, U]`` multiplicities as the kernel receives them
        (zeros = ragged-U padding).
      num_boot: replicates B.
      w_dim: weighted sums per row.

    Returns:
      dict with alu_ops, transc_ops, weighted_ops (ALU-equivalents),
      hbm_bytes, useful_draws, lane_draws, fired/empty block-bin counts,
      and the table-loop share of the total.
    """
    counts = np.asarray(counts, np.float64)
    t_dim, u_dim = counts.shape
    b_pad = ((num_boot + 127) // 128) * 128
    b_chunk = min(b_pad, _PALLAS_B_CHUNK)
    n_bc = (b_pad + b_chunk - 1) // b_chunk
    b_pad = n_bc * b_chunk
    t_pad = ((t_dim + 7) // 8) * 8
    if t_pad != t_dim:
        counts = np.pad(counts, ((0, t_pad - t_dim), (0, 0)))
    u_pad = ((u_dim + _PALLAS_CHUNK - 1) // _PALLAS_CHUNK) * _PALLAS_CHUNK
    if u_pad != u_dim:
        counts = np.pad(counts, ((0, 0), (0, u_pad - u_dim)))

    # the kernel's occupancy sort: group rows of similar length so block
    # predicates fire
    order = np.argsort((counts > 0).sum(axis=1), kind="stable")
    lam = counts[order].reshape(t_pad // 8, 8, u_pad)  # [blocks, 8, U]

    lam_max = lam.max(axis=1)  # [blocks, U]
    fired = lam_max > 0
    need_gauss = lam_max >= tau
    lam_tab = np.where((lam > 0) & (lam < tau), lam, 0.0).max(axis=1)
    need_table = lam_tab > 0
    n_iter = np.where(
        need_table,
        np.minimum(_K_TABLE, np.ceil(lam_tab + 6.0 * np.sqrt(lam_tab) + 6.0)),
        0.0,
    )

    # element throughput: every vector instruction in the kernel covers an
    # (8 sublanes x b lanes) block, and all lane chunks run every fired
    # block-bin — so each per-lane op charge above counts 8 * b_pad f32
    # element-ops against the VPU's element peak
    lanes = float(b_pad) * 8.0
    gauss_ops = need_gauss.sum() * _GAUSS_OPS * lanes
    gauss_transc = need_gauss.sum() * _GAUSS_TRANSC * lanes
    table_ops = (need_table * (_TABLE_FIXED_OPS + _TABLE_OPS_PER_ITER
                               * n_iter)).sum() * lanes
    table_transc = need_table.sum() * _TABLE_TRANSC * lanes
    epilogue_ops = fired.sum() * (_EPILOGUE_OPS + 2 * w_dim) * lanes

    alu = float(gauss_ops + table_ops + epilogue_ops)
    transc = float(gauss_transc + table_transc)
    weighted = alu + TRANSCENDENTAL_COST * transc

    # HBM traffic: per U-chunk scan step the kernel streams the cascade
    # parameters once and round-trips the aliased carries (remaining +
    # sums); the final output leaves once more for the host of the sums.
    n_chunks = u_pad // _PALLAS_CHUNK
    param_bytes = n_chunks * t_pad * _PALLAS_CHUNK * (3 + w_dim) * 4
    carry_bytes = n_chunks * 2 * t_pad * (1 + w_dim) * b_pad * 4
    out_bytes = t_pad * w_dim * b_pad * 4
    hbm_bytes = float(param_bytes + carry_bytes + out_bytes)

    useful_draws = float((counts > 0).sum()) * num_boot
    lane_draws = float(fired.sum()) * lanes  # incl. padding rows and lanes
    return {
        "alu_ops": alu,
        "transc_ops": transc,
        "weighted_ops": weighted,
        "table_loop_ops": float(table_ops),
        "table_share": float(table_ops) / max(alu, 1.0),
        "hbm_bytes": hbm_bytes,
        "useful_draws": useful_draws,
        "lane_draws": lane_draws,
        "block_bins_fired": int(fired.sum()),
        "block_bins_empty": int((~fired).sum()),
        "gauss_bins": int(need_gauss.sum()),
        "table_bins": int(need_table.sum()),
        "mean_table_iters": float(n_iter[need_table].mean())
        if need_table.any() else 0.0,
        "b_pad": b_pad,
    }


def roofline(counts: np.ndarray, num_boot: int, measured_s: float,
             w_dim: int = 3,
             vpu_ops_per_s: float = V5E_VPU_F32_OPS,
             hbm_bytes_per_s: float = V5E_HBM_BYTES_PER_S) -> dict:
    """Roofline verdict for one measured kernel execution.

    Returns achieved rates, the compute/memory time bounds, utilization
    against each peak, and the limiting resource.
    """
    cost = cascade_tile_cost(counts, num_boot, w_dim=w_dim)
    t_compute_raw = cost["alu_ops"] / vpu_ops_per_s
    t_compute = cost["weighted_ops"] / vpu_ops_per_s
    t_memory = cost["hbm_bytes"] / hbm_bytes_per_s
    bound = max(t_compute, t_memory)
    return {
        **cost,
        "measured_s": float(measured_s),
        "useful_draws_per_s": cost["useful_draws"] / measured_s,
        "lane_draws_per_s": cost["lane_draws"] / measured_s,
        "achieved_alu_ops_per_s": cost["alu_ops"] / measured_s,
        "achieved_weighted_ops_per_s": cost["weighted_ops"] / measured_s,
        "hbm_gb": cost["hbm_bytes"] / 1e9,
        "t_compute_bound_s": t_compute,
        "t_compute_bound_raw_s": t_compute_raw,
        "t_memory_bound_s": t_memory,
        "vpu_utilization": t_compute / measured_s,
        "vpu_utilization_raw": t_compute_raw / measured_s,
        "hbm_utilization": t_memory / measured_s,
        "limiting_resource": "vpu" if t_compute >= t_memory else "hbm",
        "speed_of_light_gap": measured_s / max(bound, 1e-12),
    }


__all__ = [
    "cascade_tile_cost",
    "roofline",
    "V5E_VPU_F32_OPS",
    "V5E_HBM_BYTES_PER_S",
    "TRANSCENDENTAL_COST",
]
