"""Differentiable ops: PDE stencils, losses, metrics, fused Pallas kernels."""

from . import losses, metrics, pde  # noqa: F401

__all__ = ["pde", "losses", "metrics"]
