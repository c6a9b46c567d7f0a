"""Utilities: plotting, profiling."""

from . import plot  # noqa: F401

__all__ = ["plot"]
