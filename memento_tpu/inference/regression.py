"""Weighted meta-regression across replicate groups (C11/C13 in SURVEY.md).

The reference residualizes the bootstrap statistic matrices and the treatment
on the covariates with weighted ``sklearn.LinearRegression`` fits (with
intercept), then computes the treatment effect as a closed-form weighted
cross-coefficient (ref ``/root/reference/memento/hypothesis_test.py:242-300,
367-415``).  Here everything is closed-form WLS linear algebra, batched over
genes with ``vmap`` — no sklearn, no per-gene Python.

Group dropping (the reference subsets rows to ``good_idxs``) is expressed as
zero weights: a group with weight 0 contributes nothing to any weighted sum,
which is numerically identical to removing the row.  Callers must replace
values in bad rows by finite dummies (0) before calling.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-12

# ssA below this fraction of the raw treatment's second moment is treated as
# "no residual contrast" (the reference's exact-lstsq 0/0 -> NaN case); the
# ridge residual of an in-span treatment is O(1e-6) relative -> ssA O(1e-12),
# while a real contrast gives ssA of order the treatment variance.
DEGENERATE_RTOL = 1e-9


def wls_residualize(covariate, y, weights):
    """Residualize ``y`` on ``covariate`` (plus intercept) under WLS.

    Equivalent to ``y - LinearRegression().fit(C, y, w).predict(C)``
    (ref ``hypothesis_test.py:269-271``).

    Args:
      covariate: ``[R, K]``.
      y: ``[R, M]`` (any number of response columns).
      weights: ``[R]`` nonnegative; zero rows are excluded from the fit.

    Returns:
      ``[R, M]`` residuals (rows with zero weight contain garbage-but-finite
      values; downstream weighted sums ignore them).
    """
    R = covariate.shape[0]
    C = jnp.concatenate([jnp.ones((R, 1), covariate.dtype), covariate], axis=1)
    Cw = C * weights[:, None]
    A = C.T @ Cw  # [K+1, K+1]
    # Trace-scaled ridge: users routinely pass a covariate that already
    # contains an intercept column (the reference's sklearn LinearRegression
    # absorbs the resulting rank deficiency via lstsq); the scaled ridge
    # yields the same projection residuals to O(1e-6) without an SVD.
    lam = 1e-6 * jnp.trace(A) / A.shape[0] + 1e-30
    A = A + lam * jnp.eye(A.shape[0], dtype=A.dtype)
    beta = jnp.linalg.solve(A, Cw.T @ y)
    return y - C @ beta


def cross_coef(A, B, weights, scale=None):
    """Weighted cross regression coefficient (ref ``hypothesis_test.py:
    218-228``): slope of each column of B on each column of A under weighted
    simple regression.

    Args:
      A: ``[R, Kt]`` treatments; B: ``[R, M]`` statistics; weights ``[R]``.
      scale: optional ``[Kt]`` reference magnitude for the degeneracy
        check — the RAW (pre-residualization) treatment's weighted second
        moment.  Without it the check compares against A's own second
        moment, which misses the one-arm case when A is already the tiny
        ridge residual (r5 review finding).

    Returns:
      ``[Kt, M]``.
    """
    # The reference's plain divisions (ref hypothesis_test.py:218-228) turn
    # a treatment with no residual contrast — e.g. every surviving group in
    # the same arm, where sklearn's exact lstsq leaves residual 0 — into
    # 0/0 = NaN coefficients (downstream: empty null, p-value 1.0).  The
    # trace-scaled ridge in wls_residualize leaves an O(1e-6) residual
    # instead of an exact 0, so the degenerate case is detected by a
    # scale-relative threshold rather than exact 0/0; an epsilon guard here
    # would instead emit garbage finite coefficients (caught side-by-side
    # in tests/test_reference_parity.py).  A fully-dropped gene (all
    # weights 0) comes out NaN and is nanified by the tile epilogues.
    wsum = weights.sum()
    A_c = A - (weights[:, None] * A).sum(0) / wsum
    B_c = B - (weights[:, None] * B).sum(0) / wsum
    ssA = (weights[:, None] * A_c * A_c).sum(0) / wsum  # [Kt]
    if scale is None:
        scale = (weights[:, None] * A * A).sum(0) / wsum  # [Kt]
    dead = ssA <= DEGENERATE_RTOL * scale
    num = (A_c * weights[:, None]).T @ B_c / wsum  # [Kt, M]
    return jnp.where(dead[:, None], jnp.nan, num / (ssA[:, None] + _EPS))


def cross_coef_resampled(A, B, weights, scale=None):
    """Hierarchical-bootstrap cross coefficient (ref ``hypothesis_test.py:
    231-239``): per-column resampled replicate sets.

    Args:
      A: ``[R, M, Kt]`` resampled treatments; B: ``[R, M]`` resampled stats;
      weights: ``[R, M]`` resampled group weights.
      scale: optional ``[Kt]`` raw-treatment second moment for the
        degeneracy check (see ``cross_coef``), broadcast over the
        resampled columns.

    Returns:
      ``[Kt, M]``.
    """
    # A resampled replicate set with no treatment contrast (all draws from
    # one arm) is NaN in the reference (exact 0/0, ref hypothesis_test.py:
    # 231-239) and those NaN columns are excluded from the null by the
    # finite filter; detected here by the same scale-relative threshold as
    # cross_coef (see there and tests/test_reference_parity.py).  Callers
    # guarantee wsum > 0 (resampled_indices only draws live rows).
    wsum = weights.sum(0)  # [M]
    B_c = B - (weights * B).sum(0) / wsum
    A_c = A - (A * weights[..., None]).sum(0) / wsum[:, None]
    ssA = (A_c**2 * weights[..., None]).sum(0) / wsum[:, None]  # [M, Kt]
    if scale is None:
        scale = (A**2 * weights[..., None]).sum(0) / wsum[:, None]  # [M, Kt]
    else:
        scale = scale[None, :]
    dead = ssA <= DEGENERATE_RTOL * scale
    num = jnp.einsum("rmk,rm->mk", A_c * weights[..., None], B_c)  # [M, Kt]
    return jnp.where(dead, jnp.nan, num / wsum[:, None] / (ssA + _EPS)).T


def resampled_indices(key, num_rep: int, num_boot: int, good=None):
    """Random hierarchical-bootstrap assignments (ref ``hypothesis_test.py:
    275-278``): column 0 keeps the observed configuration.

    The reference subsets to surviving groups BEFORE resampling, so its
    replicate draws are uniform over live rows only.  In the padded tile
    representation dropped groups stay as zero-weight rows; with ``good``
    given, live rows draw uniformly from live rows (matching the
    reference's distribution) and dead rows keep their own index (their
    zero weight excludes them from every weighted sum).

    Returns:
      (rep_assign, iter_assign): both ``[R, B]`` int32, where column 0 is
      (arange(R), 0).
    """
    k1, k2 = jax.random.split(key)
    if good is None:
        rep = jax.random.randint(k1, (num_rep, num_boot), 0, num_rep)
    else:
        good = jnp.asarray(good, bool)
        n_good = jnp.maximum(good.sum().astype(jnp.int32), 1)
        order = jnp.argsort(~good, stable=True)  # live rows first
        u = jax.random.randint(k1, (num_rep, num_boot), 0, n_good)
        rep = jnp.where(good[:, None], order[u],
                        jnp.arange(num_rep, dtype=order.dtype)[:, None])
    rep = rep.at[:, 0].set(jnp.arange(num_rep))
    it = jax.random.randint(k2, (num_rep, num_boot), 0, num_boot) + 1
    it = it.at[:, 0].set(0)
    return rep, it


def meta_regress(covariate, treatment, stats, weights, one_sample: bool,
                 resample_rep: bool = False, key=None, one_sample_g=None):
    """Full meta-regression for one gene: coefficients for every treatment
    column against every bootstrap column.

    Mirrors ``_regress_1d`` / ``_regress_2d`` minus the ASL step
    (ref ``hypothesis_test.py:242-291,367-408``).

    Args:
      covariate: ``[R, K]``.
      treatment: ``[R, Kt]``.
      stats: ``[R, B+1]`` statistic matrix; column 0 is the observed value.
      weights: ``[R]`` cell counts (0 = dropped group).
      one_sample: static flag — treatment identically 1 means the statistic
        is the weighted average itself (ref ``hypothesis_test.py:262-265``;
        the reference checks the WHOLE per-gene treatment matrix, so this
        is a per-gene property, not per-column).
      resample_rep: hierarchical bootstrap over replicate groups.
      key: PRNG key (required when resample_rep).
      one_sample_g: optional traced scalar bool — per-gene one-sample flag
        for eQTL-mode tiles mixing one-sample and regression genes (the
        reference evaluates its check per worker call, ref
        ``hypothesis_test.py:262``).  Both paths are computed and selected;
        the one-sample statistic broadcasts across the Kt slots (the
        reference emits a single row there).

    Returns:
      coef ``[Kt, B+1]``, column 0 observed.  Under resample_rep the last
      column of regression genes is NaN padding (the reference's resampled
      coefficient matrix has B columns while its one-sample average keeps
      all B+1; padding unifies the shapes and the NaN is dropped by the
      downstream finite filters).
    """
    if one_sample and one_sample_g is None:
        wsum = weights.sum() + _EPS
        avg = (weights[:, None] * stats).sum(0) / wsum
        return avg[None, :]

    stats_t = wls_residualize(covariate, stats, weights)
    treat_t = wls_residualize(covariate, treatment, weights)
    # degeneracy reference magnitude: the RAW treatment's weighted second
    # moment — comparing ssA against the residualized treatment's own
    # moment would miss the one-arm-survivor case whenever the ridge
    # residual varies (r5 review finding; see cross_coef)
    wsum_w = weights.sum() + _EPS
    raw_scale = (weights[:, None] * treatment * treatment).sum(0) / wsum_w

    if resample_rep:
        num_rep = stats.shape[0]
        num_boot = stats.shape[1] - 1
        rep, it = resampled_indices(key, num_rep, num_boot,
                                    good=weights > 0)
        stats_rs = stats_t[rep, it]  # [R, B]
        treat_rs = treat_t[rep]  # [R, B, Kt]
        w_rs = weights[rep]  # [R, B]
        coef = cross_coef_resampled(treat_rs, stats_rs, w_rs,
                                    scale=raw_scale)
        # pad to B+1 so one-sample genes keep their full B+1-column average
        coef = jnp.concatenate(
            [coef, jnp.full(coef.shape[:-1] + (1,), jnp.nan, coef.dtype)],
            axis=-1)
    else:
        coef = cross_coef(treat_t, stats_t, weights, scale=raw_scale)

    if one_sample_g is not None:
        wsum = weights.sum() + _EPS
        avg = (weights[:, None] * stats).sum(0) / wsum  # [B+1]
        avg = jnp.broadcast_to(avg[None, :], coef.shape)
        coef = jnp.where(one_sample_g, avg, coef)
    return coef


__all__ = [
    "wls_residualize",
    "cross_coef",
    "cross_coef_resampled",
    "resampled_indices",
    "meta_regress",
]
