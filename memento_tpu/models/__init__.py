"""Generative / statistical models: noise processes and simulation."""

from . import simulate

__all__ = ["simulate"]
