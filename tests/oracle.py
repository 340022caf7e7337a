"""Independent numpy oracle implementing the reference's math.

Written directly from the formulas (method-of-moments under hypergeometric /
Poisson capture, ref ``/root/reference/memento/estimator.py``) so framework
kernels can be checked against a second implementation.  Kept deliberately
simple and loop-heavy — clarity over speed.
"""

import numpy as np


def hyper_mean_var(X, sf, q):
    """Dense-oracle of ``_hyper_1d_relative`` (ref estimator.py:165-185)."""
    X = np.asarray(X, dtype=np.float64)
    sf = np.asarray(sf, dtype=np.float64)
    n = X.shape[0]
    m1 = (X / sf[:, None]).sum(0) / n
    m2 = (X**2 / sf[:, None] ** 2).sum(0) / n - (1 - q) * (
        X / sf[:, None] ** 2
    ).sum(0) / n
    return m1, m2 - m1**2


def poisson_mean_var(X, sf):
    """Dense-oracle of ``_poisson_1d_relative`` (ref estimator.py:114-133)."""
    X = np.asarray(X, dtype=np.float64)
    sf = np.asarray(sf, dtype=np.float64)
    n = X.shape[0]
    m1 = (X / sf[:, None]).sum(0) / n
    m2 = (X**2 / sf[:, None] ** 2).sum(0) / n - (X / sf[:, None] ** 2).sum(0) / n
    return m1, m2 - m1**2


def hyper_cov(x, y, sf, q, same_gene=False):
    """Pairwise covariance oracle (ref estimator.py:207-233)."""
    x = np.asarray(x, np.float64)
    y = np.asarray(y, np.float64)
    sf = np.asarray(sf, np.float64)
    n = len(x)
    mx = (x * y / sf**2).sum() / n
    if same_gene:
        mx -= (1 - q) * (x / sf**2).sum() / n
    return mx - ((x / sf).sum() / n) * ((y / sf).sum() / n)


def residual_variance(mean, var, coeffs):
    """Oracle of ``_residual_variance`` (ref estimator.py:103-111)."""
    mean = np.asarray(mean, dtype=np.float64)
    var = np.asarray(var, dtype=np.float64)
    rv = np.full(mean.shape, np.nan)
    cond = (mean > 0) & (var > 0)
    poly = np.poly1d(coeffs)
    rv[cond] = np.exp(np.log(var[cond]) - poly(np.log(mean[cond])))
    return rv


def unique_compress(x, approx_sf):
    """Oracle of ``_unique_expr`` for one gene (ref bootstrap.py:40-71),
    with exact (value, sf) uniqueness instead of the random hash."""
    pairs = {}
    for xi, si in zip(x, approx_sf):
        pairs[(xi, si)] = pairs.get((xi, si), 0) + 1
    vals = np.array([k[0] for k in pairs], dtype=np.float64)
    sfs = np.array([k[1] for k in pairs], dtype=np.float64)
    cnts = np.array(list(pairs.values()), dtype=np.float64)
    return vals, sfs, cnts


def cross_coef(A, B, w):
    """Oracle of ``_cross_coef`` (ref hypothesis_test.py:218-228)."""
    A = np.asarray(A, np.float64)
    B = np.asarray(B, np.float64)
    w = np.asarray(w, np.float64)
    A_c = A - np.average(A, axis=0, weights=w)
    B_c = B - np.average(B, axis=0, weights=w)
    ssA = np.average(A_c**2, axis=0, weights=w)
    return A_c.T @ np.diag(w) @ B_c / w.sum() / ssA[:, None]


def wls_residualize(C, Y, w):
    """sklearn LinearRegression(fit_intercept=True) weighted residuals."""
    C1 = np.column_stack([np.ones(len(C)), C])
    W = np.diag(w)
    beta = np.linalg.lstsq(np.sqrt(W) @ C1, np.sqrt(W) @ Y, rcond=None)[0]
    return Y - C1 @ beta
