"""Compact transport dtype selection (ops.transport) — exactness guards."""

import numpy as np
import scipy.sparse as sparse

from memento_tpu.ops.transport import compact_transport_dtype


def test_small_counts_int8():
    X = sparse.csr_matrix(np.array([[0, 3], [100, 0]], dtype=np.float64))
    assert compact_transport_dtype(X) == np.int8


def test_mid_counts_int16():
    X = sparse.csr_matrix(np.array([[0, 300.0]]))
    assert compact_transport_dtype(X) == np.int16


def test_boundary_values_use_smallest_dtype():
    """int8/int16 maxima (127, 32767) are exactly representable — they must
    ship in the small dtype, not the next size up."""
    assert compact_transport_dtype(
        sparse.csr_matrix(np.array([[127.0]]))) == np.int8
    assert compact_transport_dtype(
        sparse.csr_matrix(np.array([[32767.0]]))) == np.int16
    assert compact_transport_dtype(
        sparse.csr_matrix(np.array([[32768.0]]))) == np.float32


def test_negative_values_refuse_compact():
    """Integral but negative (e.g. batch-corrected layers) would WRAP in
    int8 — must fall back to float transport."""
    X = sparse.csr_matrix(np.array([[-200.0, 100.0]]))
    assert compact_transport_dtype(X) is None


def test_fractional_values_refuse_compact():
    X = sparse.csr_matrix(np.array([[0.5, 2.0]]))
    assert compact_transport_dtype(X) is None


def test_huge_ints_refuse_compact():
    """Integers above 2^24 are not exact in float32: no compact shipping."""
    X = sparse.csr_matrix(np.array([[0.0, float(1 << 25)]]))
    assert compact_transport_dtype(X) is None


def test_dense_input_refuses_probe():
    """Probing a dense matrix would materialize full-size temporaries."""
    assert compact_transport_dtype(np.ones((4, 4))) is None


def test_empty_sparse():
    X = sparse.csr_matrix((3, 4))
    assert compact_transport_dtype(X) == np.int8


def test_corr_matrix_negative_data_still_correct():
    """End-to-end: corr_matrix_device on a matrix with negative integral
    values matches the f64 formulation (no int8 wraparound)."""
    from memento_tpu.ops.corr import corr_matrix_device
    from memento_tpu.ops.estimators import get_noise_model

    rng = np.random.default_rng(0)
    n, g = 400, 12
    X = rng.poisson(1.0, (n, g)).astype(np.float64)
    X[0, 0] = -200.0  # integral, negative
    Xs = sparse.csr_matrix(X)
    sf = np.abs(X).sum(1) + 1.0
    sf /= sf.mean()
    var = rng.random(g) + 0.1
    model = get_noise_model("hyper_relative")
    got = corr_matrix_device(Xs, sf, 0.1, var, model, block=128)

    # f64 oracle of the same Gram formulation
    w = (1.0 / sf)[:, None]
    wx = X * w
    S = wx.T @ wx
    s1 = wx.sum(0)
    sdiag = ((1.0 / sf**2)[:, None] * X).sum(0)
    from memento_tpu.ops.corr import finish_corr_host
    c = float(np.asarray(model.var_correction(0.1)))
    ref = finish_corr_host(S, s1, sdiag, var, float(n), c)
    np.testing.assert_allclose(got, ref, rtol=5e-4, atol=5e-5, equal_nan=True)
