"""Differentiable PDE stencil operators (pure JAX reference path).

TPU-native re-implementation of the physics priors of the reference
framework (see /root/reference/src/pde.py:49-212 for the semantics we
match):

* 5-point Laplacian with Neumann (mirror/reflect) boundary conditions,
* central-difference spatial gradients,
* bistable reaction term ``f(u) = u (1 - u) (u - a)``,
* steady-state reaction-diffusion residual ``r = D \nabla^2 u + f(u)``,
* phase-field (Modica-Mortola) interface energy
  ``(eps/2) |\nabla u|^2 + (1/eps) u^2 (1-u)^2``.

Design notes (TPU-first):

- Instead of materialising 3x3 conv kernels and calling a convolution
  (the reference uses ``F.conv2d`` on a ``(1,1,3,3)`` kernel), every
  stencil here is expressed as shifted slices of the reflect-padded
  field.  For single-channel 3x3 stencils this lowers to a handful of
  VPU adds that XLA fuses into one elementwise pass; there is no MXU
  work to win, and no im2col/dim-shuffle overhead to pay.
- All functions operate on the *last two* axes so they are layout
  agnostic: ``(H, W)``, ``(B, H, W)``, ``(B, H, W, 1)`` and vmapped /
  sharded variants all work unchanged.
- Everything is shape-static and jit/vmap/grad/shard_map friendly.
- A fused Pallas kernel implementing the full physics loss in one VMEM
  pass lives in :mod:`..ops.pallas_physics`; this module is the golden
  reference for it (and is itself golden-tested against the PyTorch
  reference semantics in ``tests/test_pde.py``).
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "reflect_pad",
    "laplacian",
    "grad_xy",
    "gradient_magnitude_sq",
    "reaction_term",
    "pde_residual",
    "pde_residual_loss",
    "phase_field_loss",
    "validate_pde_params",
]


def validate_pde_params(diffusion_coeff: float, reaction_threshold: float) -> None:
    """Validate PDE hyper-parameters (mirrors /root/reference/src/pde.py:14-17).

    Only call with concrete Python floats (not tracers).
    """
    if diffusion_coeff <= 0:
        raise ValueError("diffusion_coeff must be positive")
    if not (0 < reaction_threshold < 1):
        raise ValueError("reaction_threshold must be in (0,1)")


def reflect_pad(u: jnp.ndarray) -> jnp.ndarray:
    """Mirror-pad the last two axes by one pixel (Neumann BC).

    Matches ``torch.nn.functional.pad(mode='reflect')``: the edge pixel
    is *not* repeated, i.e. ``[a, b, c] -> [b, a, b, c, b]``.
    """
    pad = [(0, 0)] * (u.ndim - 2) + [(1, 1), (1, 1)]
    return jnp.pad(u, pad, mode="reflect")


def laplacian(u: jnp.ndarray) -> jnp.ndarray:
    """5-point Laplacian with reflect-pad Neumann BCs.

    ``lap[i,j] = u[i-1,j] + u[i+1,j] + u[i,j-1] + u[i,j+1] - 4 u[i,j]``
    with out-of-range indices mirrored.  Semantics of
    /root/reference/src/pde.py:49-79, computed with shifted slices
    instead of a conv.
    """
    p = reflect_pad(u)
    up = p[..., :-2, 1:-1]
    down = p[..., 2:, 1:-1]
    left = p[..., 1:-1, :-2]
    right = p[..., 1:-1, 2:]
    return up + down + left + right - 4.0 * u


def grad_xy(u: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Central-difference gradients (gx, gy) with reflect-pad BCs.

    ``gx[i,j] = (u[i,j+1] - u[i,j-1]) / 2`` and
    ``gy[i,j] = (u[i+1,j] - u[i-1,j]) / 2`` — the same orientation as the
    reference's grad_x/grad_y conv kernels (/root/reference/src/pde.py:32-42).
    Note the reflect BC makes both gradients exactly zero on their
    respective boundary rows/columns.
    """
    p = reflect_pad(u)
    gx = 0.5 * (p[..., 1:-1, 2:] - p[..., 1:-1, :-2])
    gy = 0.5 * (p[..., 2:, 1:-1] - p[..., :-2, 1:-1])
    return gx, gy


def gradient_magnitude_sq(u: jnp.ndarray) -> jnp.ndarray:
    """``|∇u|² = gx² + gy²`` (semantics of /root/reference/src/pde.py:147-178)."""
    gx, gy = grad_xy(u)
    return gx * gx + gy * gy


def reaction_term(u: jnp.ndarray, reaction_threshold: float = 0.5) -> jnp.ndarray:
    """Bistable reaction ``f(u) = u (1-u) (u-a)`` (/root/reference/src/pde.py:81-99)."""
    return u * (1.0 - u) * (u - reaction_threshold)


def pde_residual(
    u: jnp.ndarray,
    diffusion_coeff: float = 1.0,
    reaction_threshold: float = 0.5,
) -> jnp.ndarray:
    """Steady-state RD residual ``r = D ∇²u + f(u)`` (/root/reference/src/pde.py:101-122)."""
    return diffusion_coeff * laplacian(u) + reaction_term(u, reaction_threshold)


def pde_residual_loss(
    u: jnp.ndarray,
    diffusion_coeff: float = 1.0,
    reaction_threshold: float = 0.5,
) -> jnp.ndarray:
    """L2 residual penalty ``mean(r²)`` (/root/reference/src/pde.py:124-145)."""
    r = pde_residual(u, diffusion_coeff, reaction_threshold)
    return jnp.mean(r * r)


def phase_field_loss(u: jnp.ndarray, epsilon: float = 0.05) -> jnp.ndarray:
    """Phase-field interface energy (/root/reference/src/pde.py:180-212).

    ``mean( (eps/2) |∇u|² + (1/eps) u² (1-u)² )``
    """
    gms = gradient_magnitude_sq(u)
    one_minus = 1.0 - u
    double_well = (1.0 / epsilon) * (u * u) * (one_minus * one_minus)
    return jnp.mean((epsilon / 2.0) * gms + double_well)
