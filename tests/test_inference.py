"""Meta-regression and ASL vs oracle implementations."""

import numpy as np
import jax
import jax.numpy as jnp

from memento_tpu.inference import regression as reg
from memento_tpu.inference.asl import asl_counting, gev_refine

import oracle


def test_wls_residualize_matches_sklearn_style(rng):
    R, K, M = 6, 2, 5
    C = rng.normal(size=(R, K))
    Y = rng.normal(size=(R, M))
    w = rng.random(R) + 0.2
    got = np.asarray(reg.wls_residualize(jnp.asarray(C), jnp.asarray(Y), jnp.asarray(w)))
    want = oracle.wls_residualize(C, Y, w)
    # device kernels run float32; tolerance reflects f32 solve conditioning
    np.testing.assert_allclose(got, want, rtol=5e-2, atol=5e-3)


def test_cross_coef_matches_oracle(rng):
    R, Kt, M = 8, 3, 7
    A = rng.normal(size=(R, Kt))
    B = rng.normal(size=(R, M))
    w = rng.random(R) + 0.2
    got = np.asarray(reg.cross_coef(jnp.asarray(A), jnp.asarray(B), jnp.asarray(w)))
    want = oracle.cross_coef(A, B, w)
    np.testing.assert_allclose(got, want, rtol=5e-2, atol=5e-3)


def test_zero_weight_equals_row_drop(rng):
    """A zero-weight group must behave exactly like a removed row."""
    R, Kt, M = 6, 1, 4
    A = rng.normal(size=(R, Kt))
    B = rng.normal(size=(R, M))
    C = rng.normal(size=(R, 1))
    w = rng.random(R) + 0.2
    w0 = w.copy()
    w0[2] = 0.0
    keep = np.arange(R) != 2

    full = np.asarray(
        reg.meta_regress(
            jnp.asarray(C), jnp.asarray(A), jnp.asarray(B), jnp.asarray(w0),
            one_sample=False,
        )
    )
    dropped = np.asarray(
        reg.meta_regress(
            jnp.asarray(C[keep]), jnp.asarray(A[keep]), jnp.asarray(B[keep]),
            jnp.asarray(w[keep]), one_sample=False,
        )
    )
    np.testing.assert_allclose(full, dropped, rtol=1e-3, atol=1e-4)


def test_one_sample_weighted_average(rng):
    R, M = 5, 6
    B = rng.normal(size=(R, M))
    w = rng.random(R) + 0.2
    got = np.asarray(
        reg.meta_regress(
            jnp.zeros((R, 1)), jnp.ones((R, 1)), jnp.asarray(B), jnp.asarray(w),
            one_sample=True,
        )
    )
    want = np.average(B, axis=0, weights=w).reshape(1, -1)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_asl_counting_matches_reference_formula(rng):
    B = 999
    coef = rng.normal(size=(4, B + 1)).astype(np.float32)
    coef[0, 0] = 5.0  # extreme stat -> tiny count -> flagged for GEV
    p, needs = asl_counting(jnp.asarray(coef), "bootstrap", approx=False)
    p, needs = np.asarray(p), np.asarray(needs)
    for i in range(4):
        stat = coef[i, 0]
        null = coef[i, 1:] - stat
        ec = ((null > abs(stat)) | (null < -abs(stat))).sum()
        want = (ec + 1) / (B + 1)
        np.testing.assert_allclose(p[i], want, rtol=1e-6)
        assert needs[i] == (ec <= 10)


def test_asl_permutation_null(rng):
    B = 500
    coef = rng.normal(size=(1, B + 1)).astype(np.float32)
    p_b, _ = asl_counting(jnp.asarray(coef), "bootstrap", approx=False)
    p_p, _ = asl_counting(jnp.asarray(coef), "permutation", approx=False)
    stat = coef[0, 0]
    null_p = coef[0, 1:]
    ec = ((null_p > abs(stat)) | (null_p < -abs(stat))).sum()
    np.testing.assert_allclose(np.asarray(p_p)[0], (ec + 1) / (B + 1), rtol=1e-6)
    assert not np.allclose(np.asarray(p_b), np.asarray(p_p))


def test_asl_approx_normal(rng):
    import scipy.stats as sstats

    B = 2000
    coef = np.concatenate([[2.5], rng.normal(0, 1, B)]).reshape(1, -1)
    p, _ = asl_counting(jnp.asarray(coef, dtype=jnp.float32), "permutation",
                        approx=True)
    mu, sd = sstats.norm.fit(coef[0, 1:])
    want = sstats.norm.sf(2.5, mu, sd) + sstats.norm.cdf(-2.5, mu, sd)
    np.testing.assert_allclose(np.asarray(p)[0], want, rtol=1e-3)


def test_asl_degenerate_is_nan():
    coef = np.ones((1, 101), dtype=np.float32)
    p, needs = asl_counting(jnp.asarray(coef), "bootstrap", approx=False)
    assert np.isnan(np.asarray(p)[0])
    assert not np.asarray(needs)[0]


def test_gev_refine_reasonable(rng):
    """GEV refinement of an extreme stat should give a small finite p below
    the counting bound."""
    null = rng.normal(0, 1, 2000)
    stat = 6.0
    fallback = 1 / 2001
    p = gev_refine(stat, null, fallback)
    assert np.isfinite(p)
    assert p <= fallback * 2  # refined tail estimate is in the same regime


def test_resampled_indices_column0():
    rep, it = reg.resampled_indices(jax.random.key(0), 5, 100)
    rep, it = np.asarray(rep), np.asarray(it)
    np.testing.assert_array_equal(rep[:, 0], np.arange(5))
    np.testing.assert_array_equal(it[:, 0], 0)
    assert rep.min() >= 0 and rep.max() < 5
    assert it.min() >= 0 and it.max() <= 100


def test_fill_invalid(rng):
    from memento_tpu.inference.ht import fill_invalid

    vals = rng.normal(size=(3, 50)).astype(np.float32)
    valid = vals > 0
    valid[2] = False  # a dead row
    filled, dead = fill_invalid(jax.random.key(0), jnp.asarray(vals), jnp.asarray(valid))
    filled, dead = np.asarray(filled), np.asarray(dead)
    assert dead.tolist() == [False, False, True]
    # valid entries untouched; invalid entries replaced by some valid value
    for i in range(2):
        np.testing.assert_array_equal(filled[i][valid[i]], vals[i][valid[i]])
        assert np.all(np.isin(filled[i][~valid[i]], vals[i][valid[i]]))


def test_fill_invalid_matches_searchsorted_semantics(rng):
    """Donor lookup semantics pin: order[k] of argsort(~valid, stable)
    equals searchsorted(cumsum(valid), k+1) — the uniform-donor contract
    the implementation must keep regardless of formulation (r4 measured
    the argsort as the fastest TPU lowering; searchsorted ran 3-6x
    slower)."""
    import jax
    import jax.numpy as jnp

    from memento_tpu.inference.ht import fill_invalid

    def searchsorted_fill(key, vals, valid):
        cum = jnp.cumsum(valid.astype(jnp.int32), axis=-1)
        n_valid = jnp.maximum(cum[..., -1], 1)
        u = jax.random.uniform(key, vals.shape)
        pick = jnp.minimum((u * n_valid[..., None]).astype(jnp.int32),
                           (n_valid - 1)[..., None])
        b = vals.shape[-1]
        donor_idx = jax.vmap(
            lambda c, p: jnp.searchsorted(c, p + 1, side="left")
        )(cum.reshape(-1, b), pick.reshape(-1, b)).reshape(pick.shape)
        donor_idx = jnp.minimum(donor_idx, b - 1)
        return jnp.where(valid, vals,
                         jnp.take_along_axis(vals, donor_idx, axis=-1))

    key = jax.random.key(3)
    vals = jnp.asarray(rng.normal(size=(4, 7, 129)).astype(np.float32))
    valid = jnp.asarray(rng.random((4, 7, 129)) > 0.4)
    got, _ = fill_invalid(key, vals, valid)
    np.testing.assert_array_equal(
        np.asarray(got), np.asarray(searchsorted_fill(key, vals, valid)))


def test_degenerate_contrast_nan_with_real_covariate(rng):
    """One-arm-survivor genes must yield NaN coefficients even when the
    covariate has a non-intercept column (the ridge residual then VARIES,
    so the degeneracy check must compare against the RAW treatment scale —
    r5 review finding)."""
    import jax.numpy as jnp

    from memento_tpu.inference.regression import meta_regress

    R, B = 4, 200
    covariate = np.column_stack([np.ones(R), [0.2, 0.7, 1.3, 0.4]])
    treatment = np.ones((R, 1))  # all surviving rows in one arm
    stats = rng.normal(0, 1, (R, B + 1))
    weights = np.array([100.0, 120.0, 90.0, 110.0])
    coef = np.asarray(meta_regress(
        jnp.asarray(covariate, jnp.float32), jnp.asarray(treatment, jnp.float32),
        jnp.asarray(stats, jnp.float32), jnp.asarray(weights, jnp.float32),
        one_sample=False))
    assert np.isnan(coef).all(), coef[:, :4]


def test_resample_rep_one_sample_keeps_full_boot_columns(rng):
    """Dynamic one-sample genes under resample_rep must keep the full
    B+1-column weighted average (reference hypothesis_test.py:262-265
    checks one-sample BEFORE the resampling branch)."""
    import jax
    import jax.numpy as jnp

    from memento_tpu.inference.regression import meta_regress

    R, B = 4, 64
    covariate = np.ones((R, 1), np.float32)
    treatment = np.ones((R, 1), np.float32)
    stats = rng.normal(0, 1, (R, B + 1)).astype(np.float32)
    weights = np.array([10.0, 20.0, 30.0, 40.0], np.float32)
    coef = np.asarray(meta_regress(
        jnp.asarray(covariate), jnp.asarray(treatment), jnp.asarray(stats),
        jnp.asarray(weights), one_sample=False, resample_rep=True,
        key=jax.random.key(0), one_sample_g=jnp.asarray(True)))
    assert coef.shape[-1] == B + 1
    avg = (weights[:, None] * stats).sum(0) / weights.sum()
    np.testing.assert_allclose(coef[0], avg, rtol=1e-5)
    # regression genes (one_sample_g False) get the NaN pad in the LAST col
    coef2 = np.asarray(meta_regress(
        jnp.asarray(covariate),
        jnp.asarray(np.array([[0.], [0.], [1.], [1.]], np.float32)),
        jnp.asarray(stats), jnp.asarray(weights), one_sample=False,
        resample_rep=True, key=jax.random.key(0),
        one_sample_g=jnp.asarray(False)))
    assert coef2.shape[-1] == B + 1
    # last column is the pad; most non-pad columns are finite (one-arm
    # resampled draws are legitimately NaN per reference semantics)
    assert np.isnan(coef2[0, -1])
    assert np.isfinite(coef2[0, :-1]).mean() > 0.5
