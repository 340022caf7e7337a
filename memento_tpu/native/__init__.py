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
_LOAD_FAILED = False
compress_group_native = None


_SOURCES = ("compress.cpp", "suffstats.cpp", "pairs.cpp")


def _load():
    global _LIB, _LOAD_FAILED
    if _LIB is not None:
        return _LIB
    if _LOAD_FAILED:
        return None
    here = os.path.dirname(__file__)
    path = os.path.join(here, "_native.so")
    sources = [os.path.join(here, f) for f in _SOURCES]
    stale = os.path.exists(path) and any(
        os.path.exists(s) and os.path.getmtime(s) > os.path.getmtime(path)
        for s in sources
    )
    if not os.path.exists(path) or stale:
        # Best-effort build (fresh checkout / updated sources); callers fall
        # back to the numpy paths when the toolchain is unavailable.  The
        # Makefile compiles to a temp name and renames atomically; an
        # advisory flock serializes concurrent builders (worker fan-out) so
        # only one compiler runs and nobody CDLLs a partial file.
        import subprocess

        lock_path = os.path.join(here, ".build.lock")
        try:
            import fcntl

            with open(lock_path, "w") as lock:
                fcntl.flock(lock, fcntl.LOCK_EX)
                try:
                    # re-check under the lock: another process may have built
                    now_stale = os.path.exists(path) and any(
                        os.path.exists(s)
                        and os.path.getmtime(s) > os.path.getmtime(path)
                        for s in sources
                    )
                    if not os.path.exists(path) or now_stale:
                        subprocess.run(["make"], cwd=here, check=True,
                                       capture_output=True, timeout=120)
                finally:
                    fcntl.flock(lock, fcntl.LOCK_UN)
        except Exception:
            if not os.path.exists(path):
                return None
            import warnings

            warnings.warn(
                "memento_tpu.native: rebuild failed; loading the existing "
                "(possibly stale) _native.so", RuntimeWarning)
    try:
        _LIB = ctypes.CDLL(path)
    except OSError:
        # A stale or foreign-platform binary (e.g. an x86-64 .so on arm64).
        # Try one clean rebuild; if that cannot produce a loadable library,
        # remember the failure so every caller takes the numpy fallback
        # instead of re-raising OSError on each native-path call.
        import subprocess
        import warnings

        try:
            os.remove(path)
            subprocess.run(["make"], cwd=os.path.dirname(path), check=True,
                           capture_output=True, timeout=120)
            _LIB = ctypes.CDLL(path)
        except Exception:
            warnings.warn(
                "memento_tpu.native: _native.so could not be loaded or "
                "rebuilt; falling back to the numpy data-plane paths",
                RuntimeWarning)
            _LOAD_FAILED = True
            return None
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

    if hasattr(lib, "compress_group_compact"):
        # single pass: compact runs at worst-case offsets + numpy scatter
        nnz_col = np.diff(indptr)
        cap_off = np.zeros(n_genes + 1, dtype=np.int64)
        np.cumsum(nbins + nnz_col, out=cap_off[1:])
        total_cap = int(cap_off[-1])
        cv = np.empty(total_cap, dtype=np.float32)
        ccnt = np.empty(total_cap, dtype=np.float32)
        cisf = np.empty(total_cap, dtype=np.float32)
        with_bins = nbins + 1 <= 255
        cbin = np.empty(total_cap, dtype=np.uint8) if with_bins else None
        n_unique = np.zeros(n_genes, dtype=np.int32)
        if n_genes:
            lib.compress_group_compact(
                ctypes.c_int64(n_cells),
                ctypes.c_int64(n_genes),
                ctypes.c_int32(nbins),
                indptr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                indices.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                data.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                bins.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                binvals.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                cap_off.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                cv.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                ccnt.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                cisf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                cbin.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
                if with_bins else ctypes.POINTER(ctypes.c_uint8)(),
                n_unique.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            )
        u_max = int(n_unique.max()) if n_genes else min_u
        u_max = max(min_u,
                    ((u_max + pad_multiple - 1) // pad_multiple) * pad_multiple)
        values = np.zeros((n_genes, u_max), dtype=np.float32)
        counts = np.zeros((n_genes, u_max), dtype=np.float32)
        inv_sf = np.ones((n_genes, u_max), dtype=np.float32)
        sf_bin = (np.zeros((n_genes, u_max), dtype=np.uint8)
                  if with_bins else None)
        if n_genes and n_unique.any():
            rows = np.repeat(np.arange(n_genes), n_unique)
            starts = np.concatenate(([0], np.cumsum(n_unique)[:-1]))
            cols = np.arange(int(n_unique.sum()), dtype=np.int64) - np.repeat(
                starts, n_unique)
            src = np.repeat(cap_off[:-1], n_unique) + cols
            values[rows, cols] = cv[src]
            counts[rows, cols] = ccnt[src]
            inv_sf[rows, cols] = cisf[src]
            if with_bins:
                sf_bin[rows, cols] = cbin[src]
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


def _compress_range_prep(X, approx_sf):
    """Per-(matrix, size-factor) prep for the range packer, cached on the
    matrix object: the int64 indptr, int32 bin ids, global bin occupancy and
    bin values.  All O(G) or O(N) ONCE — repeated tile calls reuse it, so
    per-tile packing touches only the tile's nonzeros.

    The cache entry HOLDS a reference to the approx_sf array and validates
    with ``is`` — an id()-based key could silently match a NEW size-factor
    array allocated at a freed array's address (r5 review finding)."""
    from ..ops.size_factor import factorize_approx_sf

    prep = getattr(X, "_memento_range_prep", None)
    if prep is not None and prep[0] is approx_sf and prep[1] == X.nnz:
        return prep[2]
    bin_values, bin_ids = factorize_approx_sf(approx_sf)
    indptr = np.ascontiguousarray(X.indptr, dtype=np.int64)
    bins = np.ascontiguousarray(bin_ids, dtype=np.int32)
    binvals = np.ascontiguousarray(bin_values, dtype=np.float64)
    bin_total = np.bincount(bins, minlength=len(bin_values)).astype(np.int64)
    # The kernel truncates data via floor(x + 0.5): exact ONLY for
    # NON-NEGATIVE integral count data — negative values would produce
    # negative histogram codes (out-of-bounds writes in the C++ kernel),
    # and fractional values would round differently from the np.round
    # fallback.  Both fall back to the slicing path.  Chunked so the check
    # never materializes an nnz-sized temporary at atlas scale.
    ok = True
    d = X.data
    step = 1 << 24
    for s in range(0, d.size, step):
        c = d[s:s + step]
        if c.size and (float(c.min()) < 0
                       or not bool(np.all(np.mod(c, 1) == 0))):
            ok = False
            break
    out = (indptr, bins, binvals, bin_total) if ok else None
    try:
        X._memento_range_prep = (approx_sf, X.nnz, out)
    except AttributeError:  # exotic matrix subclasses without __dict__
        pass
    return out


def _compress_group_range_native(X, approx_sf, col_start, col_stop,
                                 pad_multiple=8, min_u=8):
    """Zero-copy column-range packer (CSC input, scipy-native dtypes).

    Packs genes [col_start, col_stop) straight from ``X.indices`` /
    ``X.data`` as stored (int32/int64, float32/float64) — no slicing, no
    int64 conversion, no host ``np.round`` pass.  Returns None when the
    kernel or a supported dtype combination is unavailable (callers fall
    back to the slicing path).
    """
    import scipy.sparse as sparse

    lib = _load()
    if lib is None or not hasattr(lib, "compress_group_compact_range"):
        return None
    if not sparse.issparse(X) or X.format != "csc":
        return None
    if X.indices.dtype not in (np.int32, np.int64):
        return None
    if X.data.dtype not in (np.float32, np.float64):
        return None
    indices = X.indices if X.indices.flags.c_contiguous else \
        np.ascontiguousarray(X.indices)
    data = X.data if X.data.flags.c_contiguous else \
        np.ascontiguousarray(X.data)
    from ..ops.compress import CompressedGroup

    prep = _compress_range_prep(X, approx_sf)
    if prep is None:  # non-integral data: take the rounding slice path
        return None
    indptr, bins, binvals, bin_total = prep
    nbins = len(binvals)
    ncols = col_stop - col_start

    nnz_col = np.diff(indptr[col_start:col_stop + 1])
    cap_off = np.zeros(ncols + 1, dtype=np.int64)
    np.cumsum(nbins + nnz_col, out=cap_off[1:])
    total_cap = int(cap_off[-1])
    cv = np.empty(total_cap, dtype=np.float32)
    ccnt = np.empty(total_cap, dtype=np.float32)
    cisf = np.empty(total_cap, dtype=np.float32)
    with_bins = nbins + 1 <= 255
    cbin = np.empty(total_cap, dtype=np.uint8) if with_bins else None
    n_unique = np.zeros(ncols, dtype=np.int32)
    if ncols:
        lib.compress_group_compact_range(
            ctypes.c_int64(col_start),
            ctypes.c_int64(col_stop),
            ctypes.c_int32(nbins),
            indptr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            indices.ctypes.data_as(ctypes.c_void_p),
            ctypes.c_int32(1 if indices.dtype == np.int64 else 0),
            data.ctypes.data_as(ctypes.c_void_p),
            ctypes.c_int32(1 if data.dtype == np.float32 else 0),
            bins.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            bin_total.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            binvals.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            cap_off.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            cv.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            ccnt.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            cisf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            cbin.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
            if with_bins else ctypes.POINTER(ctypes.c_uint8)(),
            n_unique.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
    u_max = int(n_unique.max()) if ncols else min_u
    u_max = max(min_u,
                ((u_max + pad_multiple - 1) // pad_multiple) * pad_multiple)
    values = np.zeros((ncols, u_max), dtype=np.float32)
    counts = np.zeros((ncols, u_max), dtype=np.float32)
    inv_sf = np.ones((ncols, u_max), dtype=np.float32)
    sf_bin = np.zeros((ncols, u_max), dtype=np.uint8) if with_bins else None
    if ncols and n_unique.any():
        rows = np.repeat(np.arange(ncols), n_unique)
        starts = np.concatenate(([0], np.cumsum(n_unique)[:-1]))
        cols = np.arange(int(n_unique.sum()), dtype=np.int64) - np.repeat(
            starts, n_unique)
        src = np.repeat(cap_off[:-1], n_unique) + cols
        values[rows, cols] = cv[src]
        counts[rows, cols] = ccnt[src]
        inv_sf[rows, cols] = cisf[src]
        if with_bins:
            sf_bin[rows, cols] = cbin[src]
    return CompressedGroup(
        values=values,
        counts=counts,
        inv_sf=inv_sf,
        inv_sf_sq=(inv_sf * inv_sf).astype(np.float32),
        n_obs=X.shape[0],
        n_unique=n_unique,
        sf_bin=sf_bin,
        bin_inv_sf=np.concatenate([[1.0], 1.0 / binvals]).astype(np.float32)
        if with_bins else None,
    )


def _f32_exact(data) -> bool:
    """True when casting ``data`` to float32 is lossless (the native kernels
    compute on f32 inputs; for f64 matrices with non-representable values the
    scipy fallback would diverge, so callers must skip the native path)."""
    if data.dtype != np.float64:
        return True
    d32 = data.astype(np.float32)
    return bool(np.array_equal(d32.astype(np.float64), data))


def _compress_pairs_native(X, approx_sf, idx1, idx2, pad_multiple=8, min_u=8):
    """ctypes wrapper around the C++ joint pair packer (CSC input).

    Same semantics as ``ops.compress._compress_pairs_vectorized`` (oracle).
    One OpenMP merge-plus-histogram pass per pair writes compact runs at
    worst-case offsets (nbins + nnz(a) + nnz(b) slots per pair); the padded
    [P, u_max] tiles are then filled by a ~U-sized numpy gather.
    """
    import scipy.sparse as sparse

    lib = _load()
    if lib is None or not hasattr(lib, "compress_pairs_compact"):
        return None
    from ..ops.compress import CompressedPairGroup
    from ..ops.size_factor import factorize_approx_sf

    X = X.tocsc() if sparse.issparse(X) else sparse.csc_matrix(X)
    n_cells, n_genes = X.shape

    # Zero-copy v2 path: the kernel reads scipy's native int32/int64 index
    # and f32/f64 data buffers as stored — no per-matrix int64 conversion
    # (which cost ~30-60 s and gigabytes at 20k-gene atlas scale).  Only
    # integral count data qualifies (checked once per matrix, cached by
    # _compress_range_prep); otherwise fall back to the rounding path.
    use_v2 = (hasattr(lib, "compress_pairs_compact_v2")
              and X.indices.dtype in (np.int32, np.int64)
              and X.data.dtype in (np.float32, np.float64))
    prep_v2 = _compress_range_prep(X, approx_sf) if use_v2 else None
    if prep_v2 is not None:
        if not bool(X.has_sorted_indices):
            X.sort_indices()
        indptr, bins, binvals, _ = prep_v2
        indices = X.indices if X.indices.flags.c_contiguous else \
            np.ascontiguousarray(X.indices)
        data = X.data if X.data.flags.c_contiguous else \
            np.ascontiguousarray(X.data)
        nbins = len(binvals)
    else:
        bin_values, bin_ids = factorize_approx_sf(approx_sf)
        nbins = len(bin_values)

        # legacy path: int64 conversions cached on the matrix across the
        # per-tile calls of the 2D orchestrator
        prep = getattr(X, "_memento_pairs_prep", None)
        if prep is None:
            if not bool(X.has_sorted_indices):
                X.sort_indices()
            indptr = np.ascontiguousarray(X.indptr, dtype=np.int64)
            indices = np.ascontiguousarray(X.indices, dtype=np.int64)
            data = np.ascontiguousarray(np.round(X.data), dtype=np.int64)
            try:
                X._memento_pairs_prep = (indptr, indices, data)
            except AttributeError:  # matrix subclasses without __dict__
                pass
        else:
            indptr, indices, data = prep
        bins = np.ascontiguousarray(bin_ids, dtype=np.int32)
        binvals = np.ascontiguousarray(bin_values, dtype=np.float64)
    i1 = np.ascontiguousarray(np.asarray(idx1, dtype=np.int64))
    i2 = np.ascontiguousarray(np.asarray(idx2, dtype=np.int64))
    n_pairs = len(i1)

    # worst-case slots per pair: one per sf bin + one per union nonzero
    nnz_col = np.diff(indptr)
    caps = nbins + nnz_col[i1] + nnz_col[i2]
    cap_off = np.zeros(n_pairs + 1, dtype=np.int64)
    np.cumsum(caps, out=cap_off[1:])
    total_cap = int(cap_off[-1])

    cv1 = np.empty(total_cap, dtype=np.float32)
    cv2 = np.empty(total_cap, dtype=np.float32)
    ccnt = np.empty(total_cap, dtype=np.float32)
    cisf = np.empty(total_cap, dtype=np.float32)
    with_bins = nbins + 1 <= 255
    cbin = np.empty(total_cap, dtype=np.uint8) if with_bins else None
    n_unique = np.zeros(n_pairs, dtype=np.int32)
    if n_pairs and prep_v2 is not None:
        lib.compress_pairs_compact_v2(
            ctypes.c_int64(n_cells),
            ctypes.c_int64(n_genes),
            ctypes.c_int64(n_pairs),
            ctypes.c_int32(nbins),
            indptr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            indices.ctypes.data_as(ctypes.c_void_p),
            ctypes.c_int32(1 if indices.dtype == np.int64 else 0),
            data.ctypes.data_as(ctypes.c_void_p),
            ctypes.c_int32(1 if data.dtype == np.float32 else 0),
            bins.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            binvals.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            i1.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            i2.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            cap_off.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            cv1.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            cv2.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            ccnt.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            cisf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            cbin.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)) if with_bins
            else ctypes.POINTER(ctypes.c_uint8)(),
            n_unique.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
    elif n_pairs:
        lib.compress_pairs_compact(
            ctypes.c_int64(n_cells),
            ctypes.c_int64(n_genes),
            ctypes.c_int64(n_pairs),
            ctypes.c_int32(nbins),
            indptr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            indices.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            data.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            bins.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            binvals.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            i1.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            i2.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            cap_off.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            cv1.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            cv2.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            ccnt.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            cisf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            cbin.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)) if with_bins
            else ctypes.POINTER(ctypes.c_uint8)(),
            n_unique.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
    u_max = int(n_unique.max()) if n_pairs else min_u
    u_max = max(min_u, ((u_max + pad_multiple - 1) // pad_multiple) * pad_multiple)

    values_1 = np.zeros((n_pairs, u_max), dtype=np.float32)
    values_2 = np.zeros((n_pairs, u_max), dtype=np.float32)
    counts = np.zeros((n_pairs, u_max), dtype=np.float32)
    inv_sf = np.ones((n_pairs, u_max), dtype=np.float32)
    sf_bin = np.zeros((n_pairs, u_max), dtype=np.uint8) if with_bins else None
    if n_pairs and n_unique.any():
        rows = np.repeat(np.arange(n_pairs), n_unique)
        starts = np.concatenate(([0], np.cumsum(n_unique)[:-1]))
        cols = np.arange(int(n_unique.sum()), dtype=np.int64) - np.repeat(
            starts, n_unique)
        src = np.repeat(cap_off[:-1], n_unique) + cols
        values_1[rows, cols] = cv1[src]
        values_2[rows, cols] = cv2[src]
        counts[rows, cols] = ccnt[src]
        inv_sf[rows, cols] = cisf[src]
        if with_bins:
            sf_bin[rows, cols] = cbin[src]
    return CompressedPairGroup(
        values_1=values_1,
        values_2=values_2,
        counts=counts,
        inv_sf=inv_sf,
        inv_sf_sq=(inv_sf * inv_sf).astype(np.float32),
        n_obs=n_cells,
        n_unique=n_unique,
        sf_bin=sf_bin,
        bin_inv_sf=np.concatenate([[1.0], 1.0 / binvals]).astype(np.float32)
        if with_bins else None,
    )


def _csr_arrays(X):
    """Contiguous (indptr int64, indices int32, data float32) views/copies of
    a scipy CSR matrix; None when indices would overflow int32 or when f64
    data is not exactly float32-representable."""
    import scipy.sparse as sparse

    if not sparse.issparse(X) or X.format != "csr":
        return None
    if X.shape[1] > 2**31 - 1:
        return None
    if not _f32_exact(X.data):
        return None
    indptr = np.ascontiguousarray(X.indptr, dtype=np.int64)
    indices = np.ascontiguousarray(X.indices, dtype=np.int32)
    data = np.ascontiguousarray(X.data, dtype=np.float32)
    return indptr, indices, data


def _check_zero_sf(size_factor, row_nnz):
    """A zero size factor is valid only for an all-zero cell (sf = total
    counts): its inf reciprocal is then never read by the sparse pass.  A
    caller-supplied zero factor on a NON-empty row would silently poison the
    sufficient statistics with inf/nan, so reject it loudly.  ``row_nnz`` is
    a thunk; it is only evaluated in the rare some-sf-is-zero case."""
    sf = np.asarray(size_factor, np.float64)
    zero = sf == 0
    if zero.any() and (np.asarray(row_nnz())[zero] > 0).any():
        raise ValueError(
            "size_factor contains 0 for a cell with nonzero counts; zero "
            "size factors are only valid for all-zero cells")
    return sf


def suffstats_csr_native(X, size_factor):
    """One fused CSR pass -> (s1, s2, s1sq) f64 per gene, or None.

    Replaces the scipy formulation's CSC conversion + X.power(2) temporary
    (multi-GB at atlas scale) with a single OpenMP pass.
    """
    lib = _load()
    if lib is None or not hasattr(lib, "suffstats_csr"):
        return None
    arrs = _csr_arrays(X)
    if arrs is None:
        return None
    indptr, indices, data = arrs
    n, g = X.shape
    sf = _check_zero_sf(size_factor, lambda: np.diff(indptr))
    with np.errstate(divide="ignore"):
        inv_sf = np.ascontiguousarray(1.0 / sf)
    s1 = np.empty(g, np.float64)
    s2 = np.empty(g, np.float64)
    s1sq = np.empty(g, np.float64)
    lib.suffstats_csr(
        ctypes.c_int64(n), ctypes.c_int64(g),
        indptr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        indices.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        data.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        inv_sf.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        s1.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        s2.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        s1sq.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    return s1, s2, s1sq


def suffstats_csc_native(X, size_factor):
    """CSC analog of ``suffstats_csr_native`` (gene columns contiguous)."""
    import scipy.sparse as sparse

    lib = _load()
    if lib is None or not hasattr(lib, "suffstats_csc"):
        return None
    if not sparse.issparse(X) or X.format != "csc" or X.shape[0] > 2**31 - 1:
        return None
    if not _f32_exact(X.data):
        return None
    indptr = np.ascontiguousarray(X.indptr, dtype=np.int64)
    indices = np.ascontiguousarray(X.indices, dtype=np.int32)
    data = np.ascontiguousarray(X.data, dtype=np.float32)
    g = X.shape[1]
    sf = _check_zero_sf(
        size_factor,
        lambda: np.bincount(indices, minlength=X.shape[0]))
    with np.errstate(divide="ignore"):
        inv_sf = np.ascontiguousarray(1.0 / sf)
    s1 = np.empty(g, np.float64)
    s2 = np.empty(g, np.float64)
    s1sq = np.empty(g, np.float64)
    lib.suffstats_csc(
        ctypes.c_int64(g),
        indptr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        indices.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        data.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        inv_sf.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        s1.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        s2.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        s1sq.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    return s1, s2, s1sq


def pair_prods_csc_native(X, inv_sf_sq, idx1, idx2):
    """Per-pair sum of x1*x2/sf^2 over cells from a CSC matrix, or None.

    Sorted-index column intersection per pair (OpenMP over pairs) — avoids
    the scipy column-gather temporaries of the fallback path."""
    import scipy.sparse as sparse

    lib = _load()
    if lib is None or not hasattr(lib, "pair_prods_csc"):
        return None
    if not sparse.issparse(X) or X.format != "csc" or X.shape[0] > 2**31 - 1:
        return None
    if not _f32_exact(X.data):
        return None
    if not bool(X.has_sorted_indices):
        X.sort_indices()
    indptr = np.ascontiguousarray(X.indptr, dtype=np.int64)
    indices = np.ascontiguousarray(X.indices, dtype=np.int32)
    data = np.ascontiguousarray(X.data, dtype=np.float32)
    w2 = np.ascontiguousarray(np.asarray(inv_sf_sq, np.float64))
    i1 = np.ascontiguousarray(np.asarray(idx1, np.int64))
    i2 = np.ascontiguousarray(np.asarray(idx2, np.int64))
    n_pairs = len(i1)
    prod = np.empty(n_pairs, np.float64)
    lib.pair_prods_csc(
        ctypes.c_int64(n_pairs),
        indptr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        indices.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        data.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        w2.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        i1.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        i2.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        prod.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    return prod


def row_sums_csr_native(X, mask=None):
    """One CSR pass -> (row_tot, masked_tot-or-None) f64, or None.

    Replaces X.sum(axis=1) + X.multiply(mask).sum(axis=1) (the latter
    allocates a full nnz-sized temporary)."""
    lib = _load()
    if lib is None or not hasattr(lib, "row_sums_csr"):
        return None
    arrs = _csr_arrays(X)
    if arrs is None:
        return None
    indptr, indices, data = arrs
    n = X.shape[0]
    row_tot = np.empty(n, np.float64)
    if mask is not None:
        mask_u8 = np.ascontiguousarray(np.asarray(mask, bool), np.uint8)
        masked = np.empty(n, np.float64)
        mask_ptr = mask_u8.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
        masked_ptr = masked.ctypes.data_as(ctypes.POINTER(ctypes.c_double))
    else:
        masked = None
        mask_ptr = ctypes.POINTER(ctypes.c_uint8)()
        masked_ptr = ctypes.POINTER(ctypes.c_double)()
    lib.row_sums_csr(
        ctypes.c_int64(n),
        indptr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        indices.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        data.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        mask_ptr, row_tot.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        masked_ptr,
    )
    return row_tot, masked


def col_sums_csr_native(X):
    """One CSR pass -> (col_sum f64, col_nnz int64) per gene, or None."""
    lib = _load()
    if lib is None or not hasattr(lib, "col_sums_csr"):
        return None
    arrs = _csr_arrays(X)
    if arrs is None:
        return None
    indptr, indices, data = arrs
    n, g = X.shape
    col_sum = np.empty(g, np.float64)
    col_nnz = np.empty(g, np.int64)
    lib.col_sums_csr(
        ctypes.c_int64(n), ctypes.c_int64(g),
        indptr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        indices.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        data.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        col_sum.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        col_nnz.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    return col_sum, col_nnz


compress_pairs_native = None
compress_group_range_native = None

if available():  # pragma: no cover - depends on build
    compress_group_native = _compress_group_native
    if hasattr(_LIB, "compress_pairs_compact"):
        compress_pairs_native = _compress_pairs_native
    if hasattr(_LIB, "compress_group_compact_range"):
        compress_group_range_native = _compress_group_range_native
