"""Native (C++) data-plane kernels with graceful fallback.

The hot host-side op is unique-value compression: one O(nnz) pass packing
(expression value, size-factor bin) combos into padded tiles.  The C++
implementation (``compress.cpp``) is built into ``_native.so`` by the
Makefile here and loaded via ctypes; when absent, callers fall back to the
vectorized numpy path in ``memento_tpu.ops.compress``.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None
compress_group_native = None


def _load():
    global _LIB
    if _LIB is not None:
        return _LIB
    path = os.path.join(os.path.dirname(__file__), "_native.so")
    if not os.path.exists(path):
        return None
    _LIB = ctypes.CDLL(path)
    return _LIB


def available() -> bool:
    return _load() is not None


def _compress_group_native(X, approx_sf, pad_multiple=8, min_u=8):
    """ctypes wrapper around the C++ packer (CSC input)."""
    import scipy.sparse as sparse

    lib = _load()
    if lib is None:
        return None
    from ..ops.compress import CompressedGroup
    from ..ops.size_factor import factorize_approx_sf

    X = X.tocsc() if sparse.issparse(X) else sparse.csc_matrix(X)
    n_cells, n_genes = X.shape
    bin_values, bin_ids = factorize_approx_sf(approx_sf)
    nbins = len(bin_values)

    indptr = np.ascontiguousarray(X.indptr, dtype=np.int64)
    indices = np.ascontiguousarray(X.indices, dtype=np.int64)
    data = np.ascontiguousarray(np.round(X.data), dtype=np.int64)
    bins = np.ascontiguousarray(bin_ids, dtype=np.int32)
    binvals = np.ascontiguousarray(bin_values, dtype=np.float64)

    n_unique = np.zeros(n_genes, dtype=np.int32)
    # first pass: count uniques per gene to size the output
    lib.count_unique(
        ctypes.c_int64(n_cells),
        ctypes.c_int64(n_genes),
        ctypes.c_int32(nbins),
        indptr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        indices.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        data.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        bins.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        n_unique.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    u_max = int(n_unique.max()) if n_genes else min_u
    u_max = max(min_u, ((u_max + pad_multiple - 1) // pad_multiple) * pad_multiple)

    values = np.zeros((n_genes, u_max), dtype=np.float32)
    counts = np.zeros((n_genes, u_max), dtype=np.float32)
    inv_sf = np.ones((n_genes, u_max), dtype=np.float32)
    # compact-transport bin ids (0 = padding) when they fit uint8
    with_bins = nbins + 1 <= 255 and hasattr(lib, "pack_unique_bins")
    sf_bin = np.zeros((n_genes, u_max), dtype=np.uint8) if with_bins else None
    common = (
        ctypes.c_int64(n_cells),
        ctypes.c_int64(n_genes),
        ctypes.c_int32(nbins),
        ctypes.c_int64(u_max),
        indptr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        indices.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        data.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        bins.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        binvals.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        values.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        counts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        inv_sf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    if with_bins:
        lib.pack_unique_bins(
            *common,
            sf_bin.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        )
    else:
        lib.pack_unique(*common)
    return CompressedGroup(
        values=values,
        counts=counts,
        inv_sf=inv_sf,
        inv_sf_sq=(inv_sf * inv_sf).astype(np.float32),
        n_obs=n_cells,
        n_unique=n_unique,
        sf_bin=sf_bin,
        bin_inv_sf=np.concatenate([[1.0], 1.0 / binvals]).astype(np.float32)
        if with_bins else None,
    )


if available():  # pragma: no cover - depends on build
    compress_group_native = _compress_group_native
