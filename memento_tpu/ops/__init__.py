"""Numeric core: estimators, compression, bootstrap sampling (L0/L1)."""

from . import bootstrap, compress, estimators, mv_regression, sampling, size_factor

__all__ = [
    "bootstrap",
    "compress",
    "estimators",
    "mv_regression",
    "sampling",
    "size_factor",
]
