"""Minimal .h5ad reader/writer (AnnData HDF5 format) built on h5py.

The reference operates on AnnData ``.h5ad`` files (tutorials load
``interferon_filtered.h5ad`` etc.); ``anndata`` is not available in this
environment, so this module implements the format subset the pipeline
needs: CSR/CSC/dense ``X``, ``obs``/``var`` dataframes with numeric, string
and categorical columns, and basic nested ``uns``.

Format notes (anndata >= 0.8 on-disk spec):
- sparse X: group with ``data``/``indices``/``indptr`` and attrs
  ``encoding-type`` ('csr_matrix'/'csc_matrix') and ``shape``.
- dataframes: group with attr ``_index`` naming the index dataset and
  ``column-order``; categoricals are subgroups with ``categories``/``codes``.
"""

from __future__ import annotations

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
        return pd.Categorical.from_codes(codes, categories=cats)
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
            out[k] = _read_uns(v)
        else:
            val = v[...]
            if val.ndim == 0:
                val = _decode(val.item())
            elif val.dtype.kind in ("S", "O"):
                val = [_decode(x) for x in val]
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


def _write_series(group, name, values):
    values = np.asarray(values)
    if isinstance(values.dtype, pd.CategoricalDtype) or values.dtype.kind in (
        "O",
        "U",
    ):
        strs = np.array([str(v) for v in values], dtype="S")
        group.create_dataset(name, data=strs)
    else:
        group.create_dataset(name, data=values)


def _write_df(f, name, df):
    g = f.create_group(name)
    g.attrs["_index"] = "_index"
    g.attrs["column-order"] = np.array(
        [c.encode() for c in df.columns], dtype="S"
    )
    _write_series(g, "_index", df.index.values.astype(str))
    for c in df.columns:
        _write_series(g, c, df[c].values)


def _write_uns(f, name, d):
    g = f.create_group(name)
    for k, v in d.items():
        k = str(k)
        if isinstance(v, dict):
            _write_uns(g, k, v)
        elif isinstance(v, str):
            g.create_dataset(k, data=np.bytes_(v))
        elif isinstance(v, (list, tuple)) and v and isinstance(v[0], str):
            g.create_dataset(k, data=np.array([s.encode() for s in v], dtype="S"))
        elif np.isscalar(v):
            g.create_dataset(k, data=v)
        elif isinstance(v, np.ndarray):
            g.create_dataset(k, data=v)
        # silently skip unsupported objects (sparse slices etc.) — callers
        # should run prepare_to_save/strip first, mirroring the reference's
        # AnnData-writability contract (ref main.py:673-682)


def write_h5ad(path, adata: AnnData, include_uns: bool = True):
    """Write the lite AnnData container to .h5ad (spec subset)."""
    import h5py

    with h5py.File(path, "w") as f:
        X = adata.X
        if sparse.issparse(X):
            X = X.tocsr()
            g = f.create_group("X")
            g.attrs["encoding-type"] = "csr_matrix"
            g.attrs["shape"] = np.array(X.shape)
            g.create_dataset("data", data=X.data)
            g.create_dataset("indices", data=X.indices)
            g.create_dataset("indptr", data=X.indptr)
        else:
            f.create_dataset("X", data=np.asarray(X))
        _write_df(f, "obs", adata.obs)
        _write_df(f, "var", adata.var)
        if include_uns:
            _write_uns(f, "uns", _sanitize_uns(adata.uns))


def _sanitize_uns(d):
    """Drop entries that cannot be serialized (sparse group slices, device
    arrays) — equivalent in spirit to the reference's prepare_to_save."""
    out = {}
    for k, v in d.items():
        if isinstance(v, dict):
            sub = _sanitize_uns(v)
            if sub:
                out[str(k)] = sub
        elif isinstance(v, (str, int, float, np.integer, np.floating)):
            out[str(k)] = v
        elif isinstance(v, (list, tuple)):
            if all(isinstance(x, str) for x in v):
                out[str(k)] = list(v)
            else:
                try:
                    out[str(k)] = np.asarray(v, dtype=float)
                except (ValueError, TypeError):
                    pass
        elif isinstance(v, np.ndarray) and v.dtype.kind in "ifub":
            out[str(k)] = v
    return out


__all__ = ["read_h5ad", "write_h5ad"]
