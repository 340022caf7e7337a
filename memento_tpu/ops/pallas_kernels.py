"""Pallas TPU kernels: the fused cascade bootstrap (flagship custom kernel).

Implements the same algorithm as ``ops.sampling.fused_bootstrap_sums`` with
the whole conditional-binomial cascade resident in VMEM: one grid program
owns an 8-gene sublane block, walks the U bins in a statically unrolled
on-chip loop, draws the cascade samples from the in-kernel PRNG
(``pltpu.prng_random_bits``), and accumulates the weighted sums — HBM sees
only the compressed inputs and the ``[T, W, B]`` output.

Mosaic notes (learned the hard way):
- dynamic lane-dimension indexing (``ref[:, u]`` with traced ``u``) does not
  lower — the U loop is a static Python unroll so every column index is a
  constant strided slice;
- the truncated-Poisson CDF is rebuilt iteratively in-kernel
  (``pmf_{k+1} = pmf_k * lam / (k+1)``) instead of passing a table, which
  removes both a [T, U, K] input and all dynamic table indexing;
- interpret mode stubs the TPU PRNG (all-zero bits), so statistical tests
  for this kernel only run on real TPU hardware (see tests/test_pallas.py).

Selected via ``sampler='cascade_pallas'``; numerically it draws from the
same approximating family as ``'cascade'`` (different random streams).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .sampling import CASCADE_TAU

_TWO_PI = 6.283185307179586
_K_TABLE = 32  # truncation: P[Poisson(tau) > 32] < 4e-12 at tau=8


def _uniform_from_bits(bits):
    """Random bits -> float32 uniform in (0, 1).

    The bits arrive as int32; an arithmetic shift would sign-extend and
    produce negative "uniforms" (observed as fat-tailed Box-Muller draws) —
    bitcast to uint32 first for a logical shift.
    """
    u32 = pltpu.bitcast(bits, jnp.uint32) >> 8  # top 24 bits, logical shift
    # Mosaic can't cast uint32->f32; the value now fits in 24 bits, so a
    # bitcast back to int32 is lossless and positive.
    u = pltpu.bitcast(u32, jnp.int32).astype(jnp.float32) * (1.0 / (1 << 24))
    return jnp.maximum(u, 1e-7)


def _cascade_chunk_kernel(seed_ref, off_ref, pred_ref, rem_in_ref,
                          sums_in_ref, ratio_ref, lam_ref, ctail_ref, w_ref,
                          rem_out_ref, sums_out_ref, draws_ref, draws_b_ref, *, u_dim,
                          w_dim, b_pad, tau, n_bc, u_total,
                          reseed_per_bin: bool = True, blk: int = 8):
    """One (8-gene, b_pad-replicate) block over one U-chunk of the cascade.

    The carries (``remaining`` trials and the weighted sums) arrive as
    inputs and leave as (aliased) outputs, so chunks of arbitrary-U genes
    chain through a ``lax.scan`` — one compiled kernel serves every U.
    ``off_ref`` holds the chunk's global bin offset (PRNG stream index).

    Per-bin work is PREDICATED on the 8-row block's occupancy, which is why
    the carries live in the output refs rather than registers:
      - bins whose 8 rows all have count 0 (ragged-U padding — typically
        40-60% of a real tile's slots) cost only an SMEM read + branch;
      - all-small bins (lam < tau for every row, the common case for the
        2D joint compression) skip the Box-Muller/Cornish-Fisher path;
      - all-large bins skip the truncated-Poisson table loop.
    Draws land in per-bin VMEM scratch blocks so each predicated
    sub-branch can contribute its rows without materializing both
    samplers.

    The bin loop is PAIR-FUSED (round 4, measured +13% on the north-star
    tile): the raw-sample generation of two consecutive bins is
    independent of the ``remaining`` carry — their Box-Muller draws and
    truncated-Poisson CDF scans (fused into ONE fori_loop with two
    chains, trip count = the pair's max) overlap, and only the cheap
    remaining-dependent affine construction (conditional mean/variance,
    Cornish-Fisher, clipping, weighted-sum update) runs sequentially per
    bin.  RNG: one stream per (program, pair) — only even bin offsets
    seed, so streams stay provably disjoint.

    The predicates and the adaptive table trip count arrive PRECOMPUTED
    per (8-row block, bin), packed into one SMEM int32 array
    (``pred_ref[row_program, u] = niter << 2 | gauss << 1 | table``; 0 =
    empty bin): measured in round 4, deriving them in-kernel from
    cross-lane maxima cost ~3 us of vector->scalar synchronization per
    fired bin (constant in the lane width — the kernel was latency-bound
    on the scalar unit, not ALU-throughput-bound; see utils/roofline.py).
    """
    # Distinct PRNG stream per (gene-row program, replicate-lane chunk, bin),
    # PROVABLY non-overlapping: each program (linear id over the 2-D grid)
    # owns the exclusive seed range [seed + pid*u_total, ... + u_total) —
    # n_bc and u_total are static, so no pair of (program, bin) tuples can
    # alias regardless of grid size (unlike the earlier fixed prime strides,
    # which collided for tile_size >= ~8k rows with B > 2048).
    pid = pl.program_id(0) * jnp.int32(n_bc) + pl.program_id(1)
    base_seed = seed_ref[0] + pid * jnp.int32(u_total)
    off = off_ref[0]
    if not reseed_per_bin:
        # one stream per (program, chunk launch): bins consume bits
        # sequentially.  Distinctness across programs/launches holds because
        # the per-program seed ranges are exclusive (above) and each launch
        # seeds at its own chunk offset.
        pltpu.prng_seed(base_seed + off)

    rem_out_ref[:, :] = rem_in_ref[:, :]
    sums_out_ref[:, :] = sums_in_ref[:, :]

    # pred_ref is blocked in 8-program groups ([8, chunk] SMEM window,
    # Mosaic's minimum block granularity): a whole-array SMEM spec
    # overflowed the 1 MB SMEM at 16k-row tiles (2 MB for [2048, 256] s32
    # — caught by the r5 2D north star).  This program's row within the
    # window is its grid index mod 8.
    pred_row = pl.program_id(0) % 8
    for u0 in range(0, u_dim, 2):
        ua, ub = u0, u0 + 1
        pred_a = pred_ref[pred_row, ua]
        pred_b = pred_ref[pred_row, ub]
        lam_a = lam_ref[:, ua].reshape(blk, 1)
        lam_b = lam_ref[:, ub].reshape(blk, 1)

        if reseed_per_bin:  # one stream per PAIR (only even offsets used)
            pltpu.prng_seed(base_seed + off + jnp.int32(u0))

        # ---- phase 1: raw samples, independent of `remaining` ----
        @pl.when((pred_a & 2) > 0)
        def _gauss_a(lam=lam_a):
            bits = pltpu.prng_random_bits((blk, 2 * b_pad))
            u1 = _uniform_from_bits(bits[:, :b_pad])
            u2 = _uniform_from_bits(bits[:, b_pad:])
            z = jnp.sqrt(-2.0 * jnp.log(u1)) * jnp.cos(_TWO_PI * u2)
            draws_ref[:, :] = jnp.where(lam < tau, 0.0, z)

        @pl.when((pred_b & 2) > 0)
        def _gauss_b(lam=lam_b):
            bits = pltpu.prng_random_bits((blk, 2 * b_pad))
            u1 = _uniform_from_bits(bits[:, :b_pad])
            u2 = _uniform_from_bits(bits[:, b_pad:])
            z = jnp.sqrt(-2.0 * jnp.log(u1)) * jnp.cos(_TWO_PI * u2)
            draws_b_ref[:, :] = jnp.where(lam < tau, 0.0, z)

        @pl.when(((pred_a | pred_b) & 1) > 0)
        def _table_pair(lam_a=lam_a, lam_b=lam_b, pred_a=pred_a,
                        pred_b=pred_b):
            bits3 = pltpu.prng_random_bits((blk, 2 * b_pad))
            u3a = _uniform_from_bits(bits3[:, :b_pad])
            u3b = _uniform_from_bits(bits3[:, b_pad:])

            def table_step(k, carry):
                ta, tb, ca, cb, pa, pb = carry
                ta = ta + (u3a > ca).astype(jnp.float32)
                tb = tb + (u3b > cb).astype(jnp.float32)
                kf = k.astype(jnp.float32) + 1.0
                pa = pa * lam_a / kf
                pb = pb * lam_b / kf
                return ta, tb, ca + pa, cb + pb, pa, pb

            pa0 = jnp.exp(-lam_a) * jnp.ones((blk, b_pad), jnp.float32)
            pb0 = jnp.exp(-lam_b) * jnp.ones((blk, b_pad), jnp.float32)
            n_iter = jnp.maximum(pred_a >> 2, pred_b >> 2)
            z0 = jnp.zeros((blk, b_pad), jnp.float32)
            ta, tb, _, _, _, _ = jax.lax.fori_loop(
                0, n_iter, table_step, (z0, z0, pa0, pb0, pa0, pb0))

            @pl.when((pred_a & 1) > 0)
            def _store_a(lam=lam_a, t=ta):
                prev = draws_ref[:, :]
                draws_ref[:, :] = jnp.where(lam < tau, t, prev)

            @pl.when((pred_b & 1) > 0)
            def _store_b(lam=lam_b, t=tb):
                prev = draws_b_ref[:, :]
                draws_b_ref[:, :] = jnp.where(lam < tau, t, prev)

        # ---- phase 2: sequential remaining-dependent construction ----
        for u, pred, lam, dref in ((ua, pred_a, lam_a, draws_ref),
                                   (ub, pred_b, lam_b, draws_b_ref)):
            @pl.when(pred > 0)
            def _epilogue(u=u, lam=lam, dref=dref):
                ratio = ratio_ref[:, u].reshape(blk, 1)
                ctail = ctail_ref[:, u].reshape(blk, 1)
                remaining = rem_out_ref[:, :]
                raw = dref[:, :]

                # gauss rows: draws from the stored z
                m = remaining * ratio
                gam = 1.0 - 2.0 * ratio
                sdev = jnp.sqrt(jnp.maximum(
                    m * (1.0 - ratio) - gam * gam * (1.0 / 18.0)
                    - 1.0 / 12.0, 0.0))
                g = jnp.clip(
                    jnp.round(m + sdev * raw
                              + gam * (raw * raw - 1.0) * (1.0 / 6.0)),
                    0.0, remaining)
                # table rows: conditional-mean shift + variance rescale
                p_cond = lam / jnp.maximum(ctail, 1.0)
                t = lam + (raw - lam) * jnp.sqrt(
                    jnp.maximum(1.0 - p_cond, 0.0))
                t = t + ratio * (remaining - ctail)
                t = jnp.clip(t, 0.0, remaining)

                draws = jnp.where(lam < tau, t, g)
                draws = jnp.where(ratio >= 1.0 - 1e-6, remaining, draws)
                draws = jnp.where(ratio <= 0.0, jnp.zeros_like(draws),
                                  draws)
                for wi in range(w_dim):
                    sl = slice(wi * blk, (wi + 1) * blk)
                    sums_out_ref[sl, :] = (
                        sums_out_ref[sl, :]
                        + w_ref[:, u, wi].reshape(blk, 1) * draws)
                rem_out_ref[:, :] = remaining - draws


# U bins processed per kernel launch: bounds the static unroll (compile
# time) while amortizing the carry round-trip over 256 bins.
PALLAS_CHUNK = 256

# Replicate lanes per grid program.  The kernel's VMEM working set is
# ~15 [8, b_chunk] f32 buffers; past ~2048 lanes Mosaic starts spilling to
# HBM and the kernel falls off a cliff (measured: B=10k one-shot is >100x
# slower than 5 x B=2k).  Replicates are iid, so lane chunks take different
# PRNG streams and run as the inner grid dimension of one launch.
PALLAS_B_CHUNK = 2048


@functools.partial(jax.jit, static_argnames=("num_boot", "interpret",
                                             "reseed_per_bin", "table_bound",
                                             "chunk_bins", "rows_blk"))
def fused_bootstrap_sums_pallas(key, counts, weights, n_obs, num_boot: int,
                                interpret: bool = False,
                                reseed_per_bin: bool = True,
                                table_bound: tuple = (5.0, 4.0),
                                chunk_bins: int = 0,
                                rows_blk: int = 16):
    """Pallas analog of ``fused_bootstrap_sums`` (cascade sampler only).

    Genes of arbitrary U are supported: the cascade runs as a ``lax.scan``
    over 256-bin chunks of one compiled kernel, with the per-replicate
    ``remaining``-trials vector and the weighted sums carried between
    launches (aliased in/out, so the carry round-trip costs one HBM pass
    per 256 bins instead of per bin as in the XLA scan path).

    Args:
      counts: ``[T, U]`` multiplicities (2D — fold any batch dims first).
      weights: ``[T, U, W]``.
      n_obs: scalar or ``[T]`` per-row total trials (rows from different
        groups carry different cell counts).
      num_boot: replicates B.

    Returns:
      sums ``[T, W, B]`` float32.
    """
    counts = jnp.asarray(counts, jnp.float32)
    weights = jnp.asarray(weights, jnp.float32)
    t_dim, u_dim = counts.shape
    w_dim = weights.shape[-1]
    b_pad = ((num_boot + 127) // 128) * 128
    # Large replicate counts run as independent lane chunks (iid draws on
    # distinct PRNG streams) to keep the kernel's working set in VMEM.  The
    # chunks are a SECOND GRID DIMENSION of one kernel launch — Mosaic
    # pipelines the per-chunk programs (and keeps the shared ratio/lam/ctail
    # blocks resident across the inner grid axis) instead of the serial
    # lax.map-of-launches this used before (measured: 3.76 s vs 3.95 s for
    # the T=1024 x U=1024 x B=10k tile — the kernel is VPU-bound on the
    # truncated-Poisson table loop, so the win is launch overhead only).
    # rows_blk=16 (default) measured r5: 0.725 s vs 0.812 s at blk=8 on the
    # north-star tile (+10.7%) — the per-bin scalar fixed cost (the kernel's
    # established bound) amortizes over 16 rows; blk=32 is slightly worse
    # with 3.5x the compile time.  Distribution + conservation re-validated
    # on hardware at blk=16.
    if rows_blk % 8:
        raise ValueError(f"rows_blk must be a multiple of 8; got {rows_blk}")
    blk = rows_blk
    b_chunk = min(b_pad, PALLAS_B_CHUNK)
    n_bc = b_pad // b_chunk if b_pad % b_chunk == 0 else b_pad // b_chunk + 1
    b_pad = n_bc * b_chunk
    t_pad = ((t_dim + blk - 1) // blk) * blk

    n_rows = jnp.broadcast_to(jnp.asarray(n_obs, jnp.float32), (t_dim,))
    if t_pad != t_dim:
        counts = jnp.pad(counts, ((0, t_pad - t_dim), (0, 0)))
        weights = jnp.pad(weights, ((0, t_pad - t_dim), (0, 0), (0, 0)))
        n_rows = jnp.pad(n_rows, (0, t_pad - t_dim), constant_values=1.0)

    # The kernel predicates each bin on its 8-row block's occupancy
    # (pl.when in _cascade_chunk_kernel), but one long row keeps every bin
    # of its block alive — so group rows of similar length: sort rows by
    # occupied-slot count (compression emits real combos as a prefix), run
    # the kernel on the sorted tile, and un-permute the output.  Cost is a
    # [T] argsort + gathers, noise next to the sampling itself.
    row_order = jnp.argsort((counts > 0).sum(axis=1))
    inv_order = jnp.argsort(row_order)
    counts = counts[row_order]
    weights = weights[row_order]
    n_rows = n_rows[row_order]

    # the bin loop is PAIR-FUSED (independent table/Box-Muller chains of
    # consecutive bins overlap; measured 13% on the north-star tile), so
    # the chunk width must be even.  chunk_bins overrides the unroll length
    # for A/Bs (0 = the default PALLAS_CHUNK).
    if chunk_bins and chunk_bins % 2:
        raise ValueError(
            f"chunk_bins must be even (pair-fused bin loop); got {chunk_bins}")
    chunk = min(chunk_bins or PALLAS_CHUNK, u_dim + (u_dim % 2))
    u_pad = ((u_dim + chunk - 1) // chunk) * chunk
    if u_pad != u_dim:  # zero-count bins are inert (ratio 0 -> draws 0)
        counts = jnp.pad(counts, ((0, 0), (0, u_pad - u_dim)))
        weights = jnp.pad(weights, ((0, 0), (0, u_pad - u_dim), (0, 0)))
    n_chunks = u_pad // chunk

    # conditional-binomial parameters from the GLOBAL tail sums
    ctail = jnp.cumsum(counts[:, ::-1], axis=-1)[:, ::-1]
    ratio = jnp.where(ctail > 0, counts / jnp.maximum(ctail, 1.0), 0.0)
    ratio = jnp.clip(ratio, 0.0, 1.0)
    ratio = jnp.where((ctail > 0) & (counts >= ctail), 1.0, ratio)

    # Per-(8-row block, bin) predicates + adaptive table trip counts,
    # precomputed here so the kernel branches on SMEM scalars instead of
    # deriving them from cross-lane maxima (each in-kernel derivation cost
    # a vector->scalar sync; measured ~3 us per fired bin, the dominant
    # kernel cost — see the kernel docstring).
    lam_blk = counts.reshape(t_pad // blk, blk, u_pad)
    colmax = lam_blk.max(axis=1)  # [TB, U]
    lam_tab = jnp.where((lam_blk > 0) & (lam_blk < CASCADE_TAU), lam_blk,
                        0.0).max(axis=1)
    gauss_arr = (colmax >= CASCADE_TAU).astype(jnp.int32)
    table_arr = (lam_tab > 0).astype(jnp.int32)
    # Adaptive trip count: lam + a*sqrt(lam) + c.  Default (5, 4) — round-5
    # interleaved A/B on the north-star tile: 0.813 s vs 0.859 s for the
    # old (6, 6) (+5.4%), with per-draw right-tail miss probability < ~1e-8
    # across the lam <= tau range and graceful failure (a missed draw clips
    # at the truncation point, so moments shift by < 1e-7 relative —
    # measured mean diff 5e-7 max over 1024 rows at B=10k).  A branchless
    # binary search over the CDF is architecturally blocked: the probe
    # index differs per replicate LANE and Mosaic has no per-lane gather,
    # so each probe costs a 32-term one-hot contraction (worse than the
    # linear scan it replaces).
    ta_s, ta_c = table_bound
    niter_arr = jnp.where(
        table_arr > 0,
        jnp.minimum(
            jnp.float32(_K_TABLE),
            jnp.ceil(lam_tab + jnp.float32(ta_s) * jnp.sqrt(lam_tab)
                     + jnp.float32(ta_c)),
        ),
        0.0,
    ).astype(jnp.int32)
    # packed per-(block, bin) scalar: niter << 2 | gauss << 1 | table.
    # A fired bin always has gauss or table set (colmax > 0 implies some
    # lam >= tau or some 0 < lam < tau), so pred > 0 <=> occupied.
    pred_arr = (niter_arr << 2) | (gauss_arr << 1) | table_arr
    # rows padded to the [8, chunk] SMEM block granularity (see kernel)
    tb = pred_arr.shape[0]
    tb_pad = ((tb + 7) // 8) * 8
    if tb_pad != tb:
        pred_arr = jnp.pad(pred_arr, ((0, tb_pad - tb), (0, 0)))

    seed = jax.random.key_data(key).ravel()[-1].astype(jnp.int32)

    kernel = functools.partial(
        _cascade_chunk_kernel,
        u_dim=chunk,
        w_dim=w_dim,
        b_pad=b_chunk,
        tau=CASCADE_TAU,
        n_bc=n_bc,
        u_total=u_pad,
        reseed_per_bin=reseed_per_bin,
        blk=blk,
    )

    def to_chunks(x):  # [T, u_pad, ...] -> [n_chunks, T, chunk, ...]
        shape = (x.shape[0], n_chunks, chunk) + x.shape[2:]
        return jnp.moveaxis(x.reshape(shape), 1, 0)

    xs = (
        to_chunks(pred_arr),
        to_chunks(ratio),
        to_chunks(counts),
        to_chunks(ctail),
        to_chunks(weights),
        (jnp.arange(n_chunks, dtype=jnp.int32) * chunk),
    )

    rem0 = jnp.broadcast_to(n_rows[:, None], (t_pad, b_pad))
    sums0 = jnp.zeros((t_pad * w_dim, b_pad), jnp.float32)

    # grid = (gene-row programs, replicate-lane chunks).  The lane axis is
    # the inner (fastest) one so the shared cascade parameters (ratio/lam/
    # ctail/weights), whose index maps ignore j, stay resident in VMEM
    # while the lane chunks sweep.
    call = pl.pallas_call(
        kernel,
        grid=(t_pad // blk, n_bc),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # seed
            pl.BlockSpec(memory_space=pltpu.SMEM),  # chunk bin offset
            pl.BlockSpec((8, chunk), lambda i, j: (i // 8, 0),
                         memory_space=pltpu.SMEM),  # packed predicates
            pl.BlockSpec((blk, b_chunk), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),  # remaining (carry in)
            pl.BlockSpec((blk * w_dim, b_chunk), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),  # sums (carry in)
            pl.BlockSpec((blk, chunk), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),  # ratio
            pl.BlockSpec((blk, chunk), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),  # lam (counts)
            pl.BlockSpec((blk, chunk), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),  # ctail
            pl.BlockSpec((blk, chunk, w_dim), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),  # weights
        ],
        out_specs=[
            pl.BlockSpec((blk, b_chunk), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((blk * w_dim, b_chunk), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t_pad, b_pad), jnp.float32),
            jax.ShapeDtypeStruct((t_pad * w_dim, b_pad), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((blk, b_chunk), jnp.float32),
                        pltpu.VMEM((blk, b_chunk), jnp.float32)],  # draws a/b
        input_output_aliases={3: 0, 4: 1},
        interpret=interpret,
    )

    def step(carry, x):
        rem, sums = carry
        pred_c, ratio_c, lam_c, ctail_c, w_c, off = x
        rem, sums = call(seed[None], off[None], pred_c, rem, sums, ratio_c,
                         lam_c, ctail_c, w_c)
        return (rem, sums), None

    (rem_f, out), _ = jax.lax.scan(step, (rem0, sums0), xs)
    del rem_f
    # [t_pad * W, b_pad] with per-program [8*W] rows -> [T, W, B]
    out = out.reshape(t_pad // blk, w_dim, blk, b_pad).transpose(0, 2, 1, 3)
    out = out.reshape(t_pad, w_dim, b_pad)
    out = out[inv_order]  # undo the occupancy sort
    return out[:t_dim, :, :num_boot]


__all__ = ["fused_bootstrap_sums_pallas"]
