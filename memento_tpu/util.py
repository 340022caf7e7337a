"""Drop-in compatibility shim for ``memento.util``.

The reference's analysis scripts access helpers as ``memento.util.*``
(e.g. ``memento.util._fdrcorrect`` throughout ``analysis/``; the private
slicing helpers at ref ``/root/reference/memento/util.py:8-29``).  This
module exposes the same names over the re-designed implementations in
``memento_tpu.utils.stats`` so such scripts run with an import swap.
"""

from __future__ import annotations

import numpy as np

from .utils.stats import (  # noqa: F401  (re-exports)
    concordance,
    density_scatterplot,
    fdrcorrect as _fdrcorrect,
    fdrcorrection,
    lambda_gc,
    robust_correlation,
    robust_hist,
    robust_linregress,
)


def _select_cells(adata, group):
    """Slice the cells of one group as CSC (ref ``util.py:8-13``)."""
    cell_selector = (adata.obs["memento_group"] == group).values
    return adata.X[cell_selector, :].tocsc()


def _get_gene_idx(adata, gene_list):
    """Indices of each gene in the list (ref ``util.py:16-19``)."""
    return np.array(
        [np.where(adata.var.index == gene)[0][0] for gene in gene_list]
    )


__all__ = [
    "_select_cells",
    "_get_gene_idx",
    "_fdrcorrect",
    "fdrcorrection",
    "density_scatterplot",
    "robust_correlation",
    "robust_linregress",
    "robust_hist",
    "lambda_gc",
    "concordance",
]
