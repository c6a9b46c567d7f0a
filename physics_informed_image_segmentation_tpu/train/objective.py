"""Loss configuration and loss-function factory.

Bundles the hyper-parameters of the reference's criterion objects
(/root/reference/src/loss.py:24-34,86-112 and the diffusion-only
ablation variant /root/reference/src/ablation.py:53-154) into one static
dataclass that is hashable, so jitted train steps specialise on it.

``backend`` selects the physics implementation:
  * ``"jax"``    — pure-JAX stencils (:mod:`..ops.pde`), runs anywhere;
  * ``"pallas"`` — fused Pallas TPU kernel (:mod:`..ops.pallas_physics`);
  * ``"auto"``   — pallas on TPU, jax elsewhere.

The fused kernel holds the whole per-image field in VMEM by design
(that is where its fusion win comes from), so fields larger than
``PALLAS_MAX_FIELD_PIXELS`` fall back to the XLA stencils at trace
time — verified on v5e: 256² compiles and runs, 512² overflows the
Mosaic compiler.  Megapixel fields belong to the spatially-sharded
halo kernel (:mod:`..parallel.halo`), which is blockwise per shard.
"""

from __future__ import annotations

import dataclasses
import jax
import jax.numpy as jnp

from ..ops import losses, pde

__all__ = ["LossConfig", "make_loss_and_components", "PALLAS_MAX_FIELD_PIXELS"]

# Largest H*W the whole-field-in-VMEM Pallas kernel is verified to
# compile for on real hardware (scripts/megapixel_tpu.py probes).
PALLAS_MAX_FIELD_PIXELS = 256 * 256


@dataclasses.dataclass(frozen=True)
class LossConfig:
    """Static objective description (hashable -> jit specialisation)."""

    dice_weight: float = 0.5
    bce_weight: float = 0.5
    pde_weight: float = 0.0
    phase_field_weight: float = 0.0
    smooth: float = 1e-6
    diffusion_coeff: float = 1.0
    reaction_threshold: float = 0.5
    epsilon: float = 0.05
    use_reaction_term: bool = True
    backend: str = "auto"

    def __post_init__(self):
        if self.pde_weight > 0 or self.phase_field_weight > 0:
            pde.validate_pde_params(self.diffusion_coeff, self.reaction_threshold)
        if self.phase_field_weight > 0 and self.epsilon <= 0:
            raise ValueError("epsilon must be positive")

    @property
    def uses_physics(self) -> bool:
        return self.pde_weight > 0 or self.phase_field_weight > 0

    def resolved_backend(self) -> str:
        if self.backend != "auto":
            return self.backend
        return "pallas" if jax.default_backend() == "tpu" else "jax"


def make_loss_and_components(cfg: LossConfig):
    """Returns ``f(pred, target, mask) -> (total_loss, components_dict)``.

    The components dict always has keys dice_loss / bce_loss / pde_loss /
    phase_field_loss (disabled terms are 0.0), mirroring the reference's
    per-batch component logging (/root/reference/src/train.py:121-150)
    but computed in the same pass as the loss — no recomputation, no
    host sync.
    """
    backend = cfg.resolved_backend()
    if backend == "pallas" and cfg.uses_physics:
        from ..ops import pallas_physics

        def loss_fn(pred, target, mask=None):
            h, w = (
                (pred.shape[1], pred.shape[2])
                if pred.ndim == 4
                else pred.shape[-2:]
            )
            if h * w > PALLAS_MAX_FIELD_PIXELS:
                # whole-field kernel would overflow VMEM — XLA stencils
                return _jax_loss_fn(pred, target, mask)
            comps = pallas_physics.fused_loss_components(
                pred,
                target,
                diffusion_coeff=cfg.diffusion_coeff,
                reaction_threshold=cfg.reaction_threshold,
                epsilon=cfg.epsilon,
                use_reaction_term=cfg.use_reaction_term,
                smooth=cfg.smooth,
                mask=mask,
                need_pde=cfg.pde_weight > 0,
                need_phase_field=cfg.phase_field_weight > 0,
            )
            total = (
                cfg.dice_weight * comps["dice_loss"]
                + cfg.bce_weight * comps["bce_loss"]
                + cfg.pde_weight * comps["pde_loss"]
                + cfg.phase_field_weight * comps["phase_field_loss"]
            )
            return total, comps

        _jax_loss_fn = make_loss_and_components(
            dataclasses.replace(cfg, backend="jax")
        )
        return loss_fn

    def loss_fn(pred, target, mask=None):
        comps = {
            "dice_loss": losses.soft_dice_loss(pred, target, cfg.smooth, mask),
            "bce_loss": losses.bce_loss(pred, target, mask),
        }
        zero = jnp.zeros((), pred.dtype)
        u = pred if mask is None else pred * mask
        if cfg.pde_weight > 0:
            if cfg.use_reaction_term:
                r = pde.pde_residual(u, cfg.diffusion_coeff, cfg.reaction_threshold)
            else:
                r = cfg.diffusion_coeff * pde.laplacian(u)
            if mask is not None:
                r = r * mask
                scale = pred.size / (jnp.sum(mask) * (pred.size / mask.size))
            else:
                scale = 1.0
            comps["pde_loss"] = jnp.mean(r * r) * scale
        else:
            comps["pde_loss"] = zero
        if cfg.phase_field_weight > 0:
            gms = pde.gradient_magnitude_sq(u)
            one_minus = 1.0 - pred
            dw = (u * u) * (one_minus * one_minus)
            if mask is not None:
                gms = gms * mask
                dw = dw * mask
                scale = pred.size / (jnp.sum(mask) * (pred.size / mask.size))
            else:
                scale = 1.0
            comps["phase_field_loss"] = (
                jnp.mean((cfg.epsilon / 2.0) * gms + (1.0 / cfg.epsilon) * dw) * scale
            )
        else:
            comps["phase_field_loss"] = zero

        total = (
            cfg.dice_weight * comps["dice_loss"]
            + cfg.bce_weight * comps["bce_loss"]
            + cfg.pde_weight * comps["pde_loss"]
            + cfg.phase_field_weight * comps["phase_field_loss"]
        )
        return total, comps

    return loss_fn
