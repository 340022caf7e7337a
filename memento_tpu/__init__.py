"""memento_tpu: TPU-native single-cell method-of-moments statistics engine.

A from-scratch JAX/XLA/Pallas re-design of the memento methodology
(method-of-moments estimation of mean, residual variance, and gene-gene
correlation under hypergeometric capture noise, with unique-value-compressed
multinomial bootstrap hypothesis testing) — see the reference surface at
``/root/reference/memento/__init__.py:1``.

Public API (13 functions, mirroring the reference):
  setup_memento, create_groups, compute_1d_moments, compute_2d_moments,
  ht_1d_moments, ht_2d_moments, get_1d_moments, get_2d_moments,
  get_1d_ht_result, get_2d_ht_result, prepare_to_save, get_corr_matrix,
  get_groups
"""

from .api import (
    compute_1d_moments,
    compute_2d_moments,
    create_groups,
    get_1d_ht_result,
    get_1d_moments,
    get_2d_ht_result,
    get_2d_moments,
    get_corr_matrix,
    get_groups,
    ht_1d_moments,
    ht_2d_moments,
    prepare_to_save,
    setup_memento,
)
from .containers import AnnData

# reference-compat submodule aliases: analyses access ``memento.util.*`` and
# ``memento.simulate.*`` (ref analysis/ scripts); expose the same paths.
from . import util  # noqa: E402,F401
from .models import simulate  # noqa: E402,F401

__version__ = "0.1.0"

__all__ = [
    "setup_memento",
    "create_groups",
    "compute_1d_moments",
    "compute_2d_moments",
    "ht_1d_moments",
    "ht_2d_moments",
    "get_1d_moments",
    "get_2d_moments",
    "get_1d_ht_result",
    "get_2d_ht_result",
    "prepare_to_save",
    "get_corr_matrix",
    "get_groups",
    "AnnData",
]
