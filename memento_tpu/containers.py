"""AnnData-compatible lightweight container.

The reference framework (memento) operates on ``anndata.AnnData`` objects
(``/root/reference/memento/main.py:26-52``).  ``anndata`` is not available in
this environment, so we provide a minimal, API-compatible container exposing
the subset memento-style pipelines touch:

- ``X``            : cell x gene count matrix (scipy.sparse CSR or ndarray)
- ``obs`` / ``var``: pandas DataFrames indexed by cell / gene names
- ``uns``          : unstructured side-car dict (the pipeline context lives in
                     ``uns['memento']`` exactly like the reference)
- ``shape``, ``copy()``, ``_inplace_subset_var(mask)``, basic slicing

If the real ``anndata`` package is importable we simply re-export it, so user
code written against anndata runs unchanged.
"""

from __future__ import annotations

import copy as _copy

import numpy as np
import pandas as pd
import scipy.sparse as sparse

try:  # pragma: no cover - depends on environment
    from anndata import AnnData  # type: ignore

    HAVE_ANNDATA = True
except ImportError:
    HAVE_ANNDATA = False

    class AnnData:  # type: ignore[no-redef]
        """Minimal AnnData stand-in (see module docstring)."""

        def __init__(self, X, obs=None, var=None, uns=None):
            if sparse.issparse(X):
                X = X.tocsr()
            self.X = X
            n_obs, n_var = X.shape
            if obs is None:
                obs = pd.DataFrame(index=[f"cell_{i}" for i in range(n_obs)])
            elif not isinstance(obs, pd.DataFrame):
                obs = pd.DataFrame(obs)
            if var is None:
                var = pd.DataFrame(index=[f"gene_{i}" for i in range(n_var)])
            elif not isinstance(var, pd.DataFrame):
                var = pd.DataFrame(var)
            if len(obs) != n_obs:
                raise ValueError(f"obs has {len(obs)} rows, X has {n_obs}")
            if len(var) != n_var:
                raise ValueError(f"var has {len(var)} rows, X has {n_var}")
            self.obs = obs
            self.var = var
            self.uns = {} if uns is None else uns

        # -- basic protocol -------------------------------------------------
        @property
        def shape(self):
            return self.X.shape

        @property
        def n_obs(self):
            return self.X.shape[0]

        @property
        def n_vars(self):
            return self.X.shape[1]

        @property
        def obs_names(self):
            return self.obs.index

        @property
        def var_names(self):
            return self.var.index

        def copy(self):
            X = self.X.copy()
            return AnnData(
                X,
                obs=self.obs.copy(),
                var=self.var.copy(),
                uns=_copy.deepcopy(self.uns),
            )

        def _inplace_subset_var(self, mask):
            """Subset genes in place (mirrors anndata's private helper used by
            the reference at ``main.py:229,271``)."""
            mask = np.asarray(mask)
            if mask.dtype == bool:
                idx = np.where(mask)[0]
            else:
                idx = mask
            self.X = self.X[:, idx]
            self.var = self.var.iloc[idx].copy()

        def _inplace_subset_obs(self, mask):
            mask = np.asarray(mask)
            if mask.dtype == bool:
                idx = np.where(mask)[0]
            else:
                idx = mask
            self.X = self.X[idx]
            self.obs = self.obs.iloc[idx].copy()

        def __getitem__(self, key):
            obs_key, var_key = key if isinstance(key, tuple) else (key, slice(None))
            obs_idx = self._resolve(obs_key, self.obs.index)
            var_idx = self._resolve(var_key, self.var.index)
            return AnnData(
                self.X[obs_idx][:, var_idx],
                obs=self.obs.iloc[obs_idx].copy(),
                var=self.var.iloc[var_idx].copy(),
                uns=_copy.deepcopy(self.uns),
            )

        @staticmethod
        def _resolve(key, index):
            n = len(index)
            if isinstance(key, slice):
                return np.arange(n)[key]
            key = np.asarray(key)
            if key.dtype == bool:
                return np.where(key)[0]
            if key.dtype.kind in "iu":
                return key
            return index.get_indexer(key)

        def __repr__(self):
            return (
                f"AnnData(lite) n_obs x n_vars = {self.n_obs} x {self.n_vars}"
            )


__all__ = ["AnnData", "HAVE_ANNDATA"]
