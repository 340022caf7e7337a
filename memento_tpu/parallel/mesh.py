"""Device mesh construction for the two parallel axes of the framework.

The workload has two natural parallel dimensions (SURVEY.md §2.2):

- ``data``  — the cell axis: per-group sufficient statistics are plain sums
  over cells, so cell blocks shard perfectly and merge with ``psum``.
- ``model`` — the gene (or gene-pair) axis: hypothesis tests for different
  genes are independent; gene tiles shard with no communication at all.
  This replaces the reference's joblib process fan-out
  (``/root/reference/memento/main.py:397,501``).

All collectives ride XLA (ICI within a slice, DCN across hosts); there is no
external communication backend.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    shape: Optional[Tuple[int, int]] = None,
    axis_names: Sequence[str] = ("data", "model"),
    devices=None,
) -> Mesh:
    """Build a 2D (data, model) mesh over the available devices.

    Args:
      shape: (n_data, n_model); default puts every device on the model
        (gene) axis — the right default for the bootstrap/test stage, which
        dominates runtime and needs no communication.
      axis_names: mesh axis names.
      devices: explicit device list (default ``jax.devices()``).
    """
    devices = list(jax.devices()) if devices is None else list(devices)
    n = len(devices)
    if shape is None:
        shape = (1, n)
    if shape[0] * shape[1] != n:
        raise ValueError(f"mesh shape {shape} != {n} devices")
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axis_names=tuple(axis_names))


def gene_sharding(mesh: Mesh, rank: int, gene_axis: int) -> NamedSharding:
    """Sharding that splits array axis ``gene_axis`` over the model axis."""
    spec = [None] * rank
    spec[gene_axis] = "model"
    return NamedSharding(mesh, P(*spec))


def cell_sharding(mesh: Mesh, rank: int, cell_axis: int = 0) -> NamedSharding:
    """Sharding that splits array axis ``cell_axis`` over the data axis."""
    spec = [None] * rank
    spec[cell_axis] = "data"
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


__all__ = ["make_mesh", "gene_sharding", "cell_sharding", "replicated", "P"]
