"""Minimal .h5ad reader/writer (AnnData HDF5 format) built on h5py.

The reference operates on AnnData ``.h5ad`` files (tutorials load
``interferon_filtered.h5ad`` etc.); ``anndata`` is not available in this
environment, so this module implements the format subset the pipeline
needs: CSR/CSC/dense ``X``, ``obs``/``var`` dataframes with numeric, string,
boolean and categorical columns, and nested ``uns`` holding scalars,
arrays, string lists, DataFrames (the ``1d_ht``/``2d_ht`` results) and
sparse matrices — a computed analysis round-trips through disk.

Format notes (anndata >= 0.8 on-disk spec):
- sparse X: group with ``data``/``indices``/``indptr`` and attrs
  ``encoding-type`` ('csr_matrix'/'csc_matrix') and ``shape``.
- dataframes: group with attrs ``encoding-type='dataframe'``, ``_index``
  naming the index dataset, and ``column-order``.
- categoricals: subgroup with ``categories``/``codes`` datasets and attrs
  ``encoding-type='categorical'``, ``ordered``.

Entries that cannot be represented (e.g. per-group sparse CSC slices keyed
by frozenset, python callables) are dropped WITH a warning — the silent
drops of round 1 meant a "saved" analysis could be missing its results.
"""

from __future__ import annotations

import warnings

import numpy as np
import pandas as pd
import scipy.sparse as sparse

from ..containers import AnnData


def _decode(x):
    if isinstance(x, bytes):
        return x.decode()
    return x


def _read_series(node):
    import h5py

    if isinstance(node, h5py.Group):  # categorical
        cats = [_decode(c) for c in node["categories"][...]]
        codes = node["codes"][...]
        ordered = bool(node.attrs.get("ordered", False))
        return pd.Categorical.from_codes(codes, categories=cats,
                                         ordered=ordered)
    arr = node[...]
    if arr.dtype.kind in ("S", "O"):
        return np.array([_decode(v) for v in arr])
    return arr


def _read_df(group):
    index_name = _decode(group.attrs.get("_index", "_index"))
    index = _read_series(group[index_name])
    order = group.attrs.get("column-order", None)
    cols = (
        [_decode(c) for c in order]
        if order is not None
        else [k for k in group.keys() if k != index_name]
    )
    df = pd.DataFrame(index=np.asarray(index).astype(str))
    for c in cols:
        if c == index_name:
            continue
        df[c] = _read_series(group[c])
    return df


def _read_x(node):
    import h5py

    if isinstance(node, h5py.Group):
        enc = _decode(node.attrs.get("encoding-type", "csr_matrix"))
        shape = tuple(node.attrs["shape"])
        mat_cls = sparse.csr_matrix if "csr" in enc else sparse.csc_matrix
        return mat_cls(
            (node["data"][...], node["indices"][...], node["indptr"][...]),
            shape=shape,
        )
    return node[...]


def _read_uns(group):
    import h5py

    out = {}
    for k, v in group.items():
        if isinstance(v, h5py.Group):
            enc = _decode(v.attrs.get("encoding-type", ""))
            if enc in ("csr_matrix", "csc_matrix"):
                out[k] = _read_x(v)
            elif enc == "dataframe":
                out[k] = _read_df(v)
            elif enc == "categorical":
                out[k] = np.asarray(_read_series(v))
            else:
                out[k] = _read_uns(v)
        else:
            val = v[...]
            if val.ndim == 0:
                val = _decode(val.item())
            elif val.dtype.kind in ("S", "O") and val.ndim == 1:
                val = [_decode(x) for x in val]
            elif val.dtype.kind in ("S", "O"):
                val = np.char.decode(val.astype("S"), "utf-8")
            out[k] = val
    return out


def read_h5ad(path) -> AnnData:
    """Read an .h5ad file into the lite AnnData container."""
    import h5py

    with h5py.File(path, "r") as f:
        X = _read_x(f["X"])
        obs = _read_df(f["obs"]) if "obs" in f else None
        var = _read_df(f["var"]) if "var" in f else None
        uns = _read_uns(f["uns"]) if "uns" in f else {}
    return AnnData(X, obs=obs, var=var, uns=uns)


# ---------------------------------------------------------------------------
# writing
# ---------------------------------------------------------------------------


def _write_categorical(group, name, values: pd.Categorical):
    g = group.create_group(name)
    g.attrs["encoding-type"] = "categorical"
    g.attrs["encoding-version"] = "0.2.0"
    g.attrs["ordered"] = bool(values.ordered)
    g.create_dataset(
        "categories",
        data=np.array([str(c).encode() for c in values.categories], dtype="S"),
    )
    g.create_dataset("codes", data=np.asarray(values.codes, dtype=np.int32))


def _write_series(group, name, values):
    if isinstance(values, pd.Categorical) or isinstance(
        getattr(values, "dtype", None), pd.CategoricalDtype
    ):
        _write_categorical(group, name, pd.Categorical(values))
        return
    values = np.asarray(values)
    if values.dtype.kind in ("O", "U"):
        strs = np.array([str(v).encode() for v in values], dtype="S")
        ds = group.create_dataset(name, data=strs)
        ds.attrs["encoding-type"] = "string-array"
    else:
        group.create_dataset(name, data=values)


def _write_df(f, name, df: pd.DataFrame):
    g = f.create_group(name)
    g.attrs["encoding-type"] = "dataframe"
    g.attrs["encoding-version"] = "0.2.0"
    g.attrs["_index"] = "_index"
    g.attrs["column-order"] = np.array(
        [str(c).encode() for c in df.columns], dtype="S"
    )
    _write_series(g, "_index", df.index.values.astype(str))
    for c in df.columns:
        _write_series(g, str(c), df[c].values)


def _write_sparse(f, name, X):
    X = X.tocsr() if not sparse.isspmatrix_csc(X) else X
    g = f.create_group(name)
    g.attrs["encoding-type"] = (
        "csc_matrix" if sparse.isspmatrix_csc(X) else "csr_matrix"
    )
    g.attrs["encoding-version"] = "0.1.0"
    g.attrs["shape"] = np.array(X.shape)
    g.create_dataset("data", data=X.data)
    g.create_dataset("indices", data=X.indices)
    g.create_dataset("indptr", data=X.indptr)


def _write_uns(f, name, d, path=""):
    g = f.create_group(name)
    for k, v in d.items():
        key = str(k)
        kpath = f"{path}/{key}"
        if not isinstance(k, str):
            # e.g. frozenset treatment_for_gene keys in 2D eQTL mode
            warnings.warn(
                f"uns entry {kpath!r}: non-string key {k!r} stringified",
                stacklevel=2,
            )
        if isinstance(v, dict):
            _write_uns(g, key, v, kpath)
        elif isinstance(v, pd.DataFrame):
            _write_df(g, key, v)
        elif sparse.issparse(v):
            _write_sparse(g, key, v)
        elif isinstance(v, str):
            g.create_dataset(key, data=np.bytes_(v))
        elif isinstance(v, (list, tuple)) and all(
            isinstance(x, str) for x in v
        ):
            g.create_dataset(
                key, data=np.array([s.encode() for s in v], dtype="S")
            )
        elif isinstance(v, (bool, np.bool_)):
            g.create_dataset(key, data=bool(v))
        elif np.isscalar(v):
            g.create_dataset(key, data=v)
        else:
            arr = None
            try:
                arr = np.asarray(v)
            except (ValueError, TypeError):
                pass
            if arr is not None and arr.dtype.kind in "ifub":
                g.create_dataset(key, data=arr)
            elif arr is not None and arr.dtype.kind in ("U", "S"):
                g.create_dataset(
                    key,
                    data=np.array([str(x).encode() for x in arr.ravel()],
                                  dtype="S").reshape(arr.shape),
                )
            else:
                warnings.warn(
                    f"uns entry {kpath!r} of type {type(v).__name__} cannot "
                    "be written to h5ad and was dropped (run "
                    "prepare_to_save / strip transient state first)",
                    stacklevel=2,
                )


def write_h5ad(path, adata: AnnData, include_uns: bool = True):
    """Write the lite AnnData container to .h5ad (spec subset).

    Unsupported ``uns`` entries are dropped with a warning; DataFrames
    (``1d_ht``/``2d_ht`` results), sparse matrices, categoricals, numeric /
    string / bool arrays and nested dicts all round-trip.
    """
    import h5py

    with h5py.File(path, "w") as f:
        X = adata.X
        if sparse.issparse(X):
            _write_sparse(f, "X", X.tocsr())
        else:
            ds = f.create_dataset("X", data=np.asarray(X))
            ds.attrs["encoding-type"] = "array"
        _write_df(f, "obs", adata.obs)
        _write_df(f, "var", adata.var)
        if include_uns:
            _write_uns(f, "uns", adata.uns)


__all__ = ["read_h5ad", "write_h5ad"]
