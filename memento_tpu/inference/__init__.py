"""Inference engine: meta-regression, ASL, batched hypothesis tests (L2)."""

from . import asl, ht, regression

__all__ = ["asl", "ht", "regression"]
