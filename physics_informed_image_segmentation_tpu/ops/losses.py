"""Segmentation loss functions (pure functions, jit/vmap/grad friendly).

TPU-native equivalents of /root/reference/src/loss.py:

* soft Dice over the *whole flattened batch* (not per-sample), smooth=1e-6,
* BCE on probabilities (not logits) with torch-compatible log clamping,
* the combined Dice+BCE and Dice+BCE+lambda_RD*PDE+lambda_PF*phase-field
  objectives (each physics term gated on its weight being > 0).

All losses optionally take a ``mask`` broadcastable to ``predictions``
with 1.0 marking valid elements.  The reference never needs one (its
DataLoader yields ragged final batches); we keep batch shapes static for
XLA and mask out padded samples instead, which reproduces the ragged
semantics exactly.

The physics terms can be evaluated either through the pure-JAX stencils
(:mod:`.pde`) or the fused Pallas kernel (:mod:`.pallas_physics`); the
selection is made by the caller (see
:func:`physics_informed_image_segmentation_tpu.train.objective.make_loss_fn`).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from . import pde

__all__ = [
    "soft_dice_loss",
    "bce_loss",
    "dice_bce_loss",
    "dice_bce_pde_loss",
    "loss_components",
]

_SMOOTH = 1e-6
# torch.nn.BCELoss clamps log outputs at -100 so that p in {0, 1} yields a
# finite loss; we reproduce that exactly for golden parity.
_LOG_CLAMP = -100.0


def _masked(x: jnp.ndarray, mask: Optional[jnp.ndarray]) -> jnp.ndarray:
    return x if mask is None else x * mask


def _mask_count(predictions: jnp.ndarray, mask: Optional[jnp.ndarray]) -> jnp.ndarray:
    if mask is None:
        return jnp.asarray(predictions.size, dtype=predictions.dtype)
    return jnp.sum(mask) * (predictions.size / mask.size)


def soft_dice_loss(
    predictions: jnp.ndarray,
    targets: jnp.ndarray,
    smooth: float = _SMOOTH,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Soft Dice loss over the flattened batch (/root/reference/src/loss.py:51-60).

    ``1 - (2*sum(p*t) + s) / (sum(p) + sum(t) + s)`` with a *global*
    flatten — one Dice for the whole batch, exactly like the reference.
    """
    p = _masked(predictions, mask)
    t = _masked(targets, mask)
    intersection = jnp.sum(p * t)
    dice = (2.0 * intersection + smooth) / (jnp.sum(p) + jnp.sum(t) + smooth)
    return 1.0 - dice


# torch binary_cross_entropy_backward clamps the denominator p(1-p) at
# 1e-12 so saturated probabilities (p == 0.0 or 1.0 in f32 — routine once
# the model is confident: sigmoid(x) == 1.0f for x > ~16.6) give a large
# but FINITE gradient.  Naive autodiff through the clipped logs yields
# 0 * inf = NaN at exactly those pixels, which detonates training the
# moment it converges (observed: NaN at epoch 6 of the parity run).
_BCE_GRAD_EPS = 1e-12


def _bce_value(predictions, targets, mask):
    log_p = jnp.clip(jnp.log(predictions), _LOG_CLAMP)
    log_1p = jnp.clip(jnp.log1p(-predictions), _LOG_CLAMP)
    elem = -(targets * log_p + (1.0 - targets) * log_1p)
    elem = _masked(elem, mask)
    return jnp.sum(elem) / _mask_count(predictions, mask)


@jax.custom_vjp
def _bce(predictions, targets, mask):
    return _bce_value(predictions, targets, mask)


def _bce_fwd(predictions, targets, mask):
    return _bce_value(predictions, targets, mask), (predictions, targets, mask)


def _bce_bwd(res, g):
    p, t, mask = res
    scale = g / _mask_count(p, mask)
    # exact torch semantics: (p - t) / clamp_min(p * (1 - p), 1e-12)
    dp = (p - t) / jnp.maximum(p * (1.0 - p), _BCE_GRAD_EPS)
    dp = _masked(dp, mask) * scale
    log_p = jnp.clip(jnp.log(p), _LOG_CLAMP)
    log_1p = jnp.clip(jnp.log1p(-p), _LOG_CLAMP)
    dt = _masked(log_1p - log_p, mask) * scale
    dmask = None if mask is None else jnp.zeros_like(mask)
    return dp, dt, dmask


_bce.defvjp(_bce_fwd, _bce_bwd)


def bce_loss(
    predictions: jnp.ndarray,
    targets: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Binary cross-entropy on probabilities, mean reduction.

    Matches ``torch.nn.BCELoss()`` (/root/reference/src/loss.py:34,63)
    in BOTH directions: the forward's log-clamp at -100 AND the
    backward's ``(p-t)/clamp_min(p(1-p), 1e-12)`` (aten
    ``binary_cross_entropy_backward``), which keeps gradients finite on
    saturated pixels where naive autodiff produces NaN.
    """
    return _bce(predictions, targets, mask)


def dice_bce_loss(
    predictions: jnp.ndarray,
    targets: jnp.ndarray,
    dice_weight: float = 0.5,
    bce_weight: float = 0.5,
    smooth: float = _SMOOTH,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Combined Dice + BCE (/root/reference/src/loss.py:36-68)."""
    return dice_weight * soft_dice_loss(predictions, targets, smooth, mask) + (
        bce_weight * bce_loss(predictions, targets, mask)
    )


def dice_bce_pde_loss(
    predictions: jnp.ndarray,
    targets: jnp.ndarray,
    dice_weight: float = 0.5,
    bce_weight: float = 0.5,
    pde_weight: float = 1e-3,
    phase_field_weight: float = 0.0,
    smooth: float = _SMOOTH,
    diffusion_coeff: float = 1.0,
    reaction_threshold: float = 0.5,
    epsilon: float = 0.05,
    use_reaction_term: bool = True,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Dice + BCE + λ_RD·mean(r²) + λ_PF·phase-field (/root/reference/src/loss.py:114-162).

    ``use_reaction_term=False`` reproduces the diffusion-only ablation
    loss (/root/reference/src/ablation.py:53-86): the residual becomes
    ``r = D ∇²u``.

    The physics terms are *self-supervised*: they see only the
    prediction.  With a mask, padded samples are zeroed before the
    stencils, contributing zero residual on their slots; the mean is
    taken over valid elements only.
    """
    total = dice_bce_loss(predictions, targets, dice_weight, bce_weight, smooth, mask)
    if pde_weight > 0 or phase_field_weight > 0:
        u = _masked(predictions, mask)
        n_valid = _mask_count(predictions, mask)
        scale = predictions.size / n_valid  # rescale mean over valid elements
        if pde_weight > 0:
            if use_reaction_term:
                r = pde.pde_residual(u, diffusion_coeff, reaction_threshold)
            else:
                r = diffusion_coeff * pde.laplacian(u)
            r = _masked(r, mask)
            total = total + pde_weight * jnp.mean(r * r) * scale
        if phase_field_weight > 0:
            gms = _masked(pde.gradient_magnitude_sq(u), mask)
            one_minus = 1.0 - predictions
            dw = (u * u) * _masked(one_minus * one_minus, mask)
            pf = jnp.mean((epsilon / 2.0) * gms + (1.0 / epsilon) * dw) * scale
            total = total + phase_field_weight * pf
    return total


def loss_components(
    predictions: jnp.ndarray,
    targets: jnp.ndarray,
    pde_weight: float = 0.0,
    phase_field_weight: float = 0.0,
    smooth: float = _SMOOTH,
    diffusion_coeff: float = 1.0,
    reaction_threshold: float = 0.5,
    epsilon: float = 0.05,
    mask: Optional[jnp.ndarray] = None,
) -> dict:
    """Per-term loss breakdown used for epoch logging.

    Mirrors the reference's per-batch no-grad recomputation
    (/root/reference/src/train.py:121-150) but runs *inside* the jitted
    step — no host sync.  Always returns all four keys; disabled terms
    report 0.0 (matching the reference CSV schema where absent terms are
    written as 0.0, /root/reference/src/train.py:344-358).
    """
    comps = {
        "dice_loss": soft_dice_loss(predictions, targets, smooth, mask),
        "bce_loss": bce_loss(predictions, targets, mask),
    }
    u = _masked(predictions, mask)
    n_valid = _mask_count(predictions, mask)
    scale = predictions.size / n_valid
    if pde_weight > 0:
        r = _masked(pde.pde_residual(u, diffusion_coeff, reaction_threshold), mask)
        comps["pde_loss"] = jnp.mean(r * r) * scale
    else:
        comps["pde_loss"] = jnp.zeros((), predictions.dtype)
    if phase_field_weight > 0:
        gms = _masked(pde.gradient_magnitude_sq(u), mask)
        one_minus = 1.0 - predictions
        dw = (u * u) * _masked(one_minus * one_minus, mask)
        comps["phase_field_loss"] = (
            jnp.mean((epsilon / 2.0) * gms + (1.0 / epsilon) * dw) * scale
        )
    else:
        comps["phase_field_loss"] = jnp.zeros((), predictions.dtype)
    return comps
