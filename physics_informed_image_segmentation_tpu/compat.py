"""Drop-in shims with the reference's exact public names and signatures.

The framework's native API is functional (``ops.losses``, ``ops.pde``,
``train.evaluation``); these thin classes/functions give users of the
reference package (`/root/reference/src/__init__.py:35-67`) the same
call sites:

* ``DiceBCELoss`` / ``DiceBCEPDELoss`` — /root/reference/src/loss.py:7-162
* ``PDERegularization`` / ``create_pde_regularization`` —
  /root/reference/src/pde.py:6-232
* ``evaluate_on_test_set`` — /root/reference/src/evaluate.py:476-523
* ``compute_boundary_f1`` (single-sample, ``[0, 0]``-indexed form) —
  /root/reference/src/evaluate.py:125-193

Everything returns JAX arrays and is jit/grad-compatible (the classes
hold only static Python floats, so closures over them re-trace exactly
like keyword arguments would).  Layouts are agnostic: the stencils act
on the last two axes, so torch-style ``(B, 1, H, W)`` inputs work
unchanged.
"""

from __future__ import annotations

import warnings
from pathlib import Path
from typing import Any, Dict, Optional

import jax.numpy as jnp
import numpy as np

from .ops import pde as _pde
from .ops.losses import dice_bce_loss, dice_bce_pde_loss
from .ops.metrics import boundary_f1_per_sample

__all__ = [
    "DiceBCELoss",
    "DiceBCEPDELoss",
    "PDERegularization",
    "create_pde_regularization",
    "evaluate_on_test_set",
    "compute_boundary_f1",
]


class PDERegularization:
    """Reaction-diffusion physics operators with the reference's class API.

    Mirrors /root/reference/src/pde.py:6-212 method-for-method; each
    method delegates to the slice-stencil ops in :mod:`.ops.pde` (the
    reference materialises 3x3 conv kernels — on TPU the stencils fuse
    into one VPU elementwise pass instead).
    """

    def __init__(self, diffusion_coeff: float = 1.0, reaction_threshold: float = 0.5):
        _pde.validate_pde_params(diffusion_coeff, reaction_threshold)
        self.diffusion_coeff = diffusion_coeff
        self.reaction_threshold = reaction_threshold

    def compute_laplacian(self, u: jnp.ndarray) -> jnp.ndarray:
        """5-point Laplacian, reflect-pad Neumann BCs (src/pde.py:49-79)."""
        return _pde.laplacian(u)

    def reaction_term(self, u: jnp.ndarray) -> jnp.ndarray:
        """Bistable reaction ``f(u) = u (1-u) (u-a)`` (src/pde.py:81-99)."""
        return _pde.reaction_term(u, self.reaction_threshold)

    def compute_residual(self, u: jnp.ndarray) -> jnp.ndarray:
        """``r = D ∇²u + f(u)`` (src/pde.py:101-122)."""
        return _pde.pde_residual(u, self.diffusion_coeff, self.reaction_threshold)

    def compute_loss(self, u: jnp.ndarray) -> jnp.ndarray:
        """``mean(r²)`` (src/pde.py:124-145)."""
        return _pde.pde_residual_loss(u, self.diffusion_coeff, self.reaction_threshold)

    def compute_gradient_magnitude(self, u: jnp.ndarray) -> jnp.ndarray:
        """``|∇u|²`` with central differences (src/pde.py:147-178)."""
        return _pde.gradient_magnitude_sq(u)

    def compute_phase_field_loss(
        self, u: jnp.ndarray, epsilon: float = 0.05
    ) -> jnp.ndarray:
        """Phase-field interface energy (src/pde.py:180-212)."""
        if epsilon <= 0:
            raise ValueError("epsilon must be positive")
        return _pde.phase_field_loss(u, epsilon)


def create_pde_regularization(
    diffusion_coeff: float = 1.0, reaction_threshold: float = 0.5
) -> PDERegularization:
    """Factory matching /root/reference/src/pde.py:215-232."""
    return PDERegularization(
        diffusion_coeff=diffusion_coeff, reaction_threshold=reaction_threshold
    )


class DiceBCELoss:
    """Dice + BCE loss with the reference's class API (src/loss.py:7-68).

    Callable: ``loss = DiceBCELoss()(predictions, targets)``.
    """

    def __init__(
        self,
        dice_weight: float = 0.5,
        bce_weight: float = 0.5,
        smooth: float = 1e-6,
    ):
        self.dice_weight = dice_weight
        self.bce_weight = bce_weight
        self.smooth = smooth

    def __call__(self, predictions: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
        return dice_bce_loss(
            predictions,
            targets,
            dice_weight=self.dice_weight,
            bce_weight=self.bce_weight,
            smooth=self.smooth,
        )

    forward = __call__


class DiceBCEPDELoss:
    """Dice + BCE + PDE-regularized loss (src/loss.py:71-162).

    Callable with the reference's constructor keywords; the physics
    terms gate on their weights exactly like the reference's
    ``if self.pde_weight > 0`` branches (static Python floats, so the
    jitted program specialises identically).
    """

    def __init__(
        self,
        dice_weight: float = 0.5,
        bce_weight: float = 0.5,
        pde_weight: float = 1e-3,
        phase_field_weight: float = 0.0,
        smooth: float = 1e-6,
        diffusion_coeff: float = 1.0,
        reaction_threshold: float = 0.5,
        epsilon: float = 0.05,
    ):
        _pde.validate_pde_params(diffusion_coeff, reaction_threshold)
        self.dice_weight = dice_weight
        self.bce_weight = bce_weight
        self.pde_weight = pde_weight
        self.phase_field_weight = phase_field_weight
        self.smooth = smooth
        self.diffusion_coeff = diffusion_coeff
        self.reaction_threshold = reaction_threshold
        self.epsilon = epsilon
        self.pde_regularization = PDERegularization(
            diffusion_coeff=diffusion_coeff, reaction_threshold=reaction_threshold
        )

    def __call__(self, predictions: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
        return dice_bce_pde_loss(
            predictions,
            targets,
            dice_weight=self.dice_weight,
            bce_weight=self.bce_weight,
            pde_weight=self.pde_weight,
            phase_field_weight=self.phase_field_weight,
            smooth=self.smooth,
            diffusion_coeff=self.diffusion_coeff,
            reaction_threshold=self.reaction_threshold,
            epsilon=self.epsilon,
        )

    forward = __call__


def compute_boundary_f1(
    predictions: jnp.ndarray,
    targets: jnp.ndarray,
    threshold: float = 0.5,
    tolerance: int = 2,
    smooth: float = 1e-6,
) -> jnp.ndarray:
    """Single-sample Boundary-F1 — the reference's ``[0, 0]``-indexed form.

    /root/reference/src/evaluate.py:125-193 computes the score of the
    FIRST sample/channel only, whatever the batch size; this twin keeps
    that (quirky) contract.  For the whole batch use
    ``compute_boundary_f1_batch`` / ``ops.metrics.boundary_f1_per_sample``.
    """
    p = jnp.asarray(predictions)
    t = jnp.asarray(targets)
    # Accept both layouts: drop a trailing singleton channel (this
    # package's native (B, H, W, 1)), then index [0, 0] like the
    # reference for leading batch/channel axes (torch's (B, 1, H, W)).
    if p.ndim > 2 and p.shape[-1] == 1:
        p = p[..., 0]
    if t.ndim > 2 and t.shape[-1] == 1:
        t = t[..., 0]
    while p.ndim > 2:
        p = p[0]
    while t.ndim > 2:
        t = t[0]
    score = boundary_f1_per_sample(
        p[None], t[None], threshold=threshold, tolerance=tolerance, smooth=smooth
    )[0]
    return score


def evaluate_on_test_set(
    model: Any,
    test_dir,
    test_json,
    device: Any = None,
    batch_size: int = 8,
    threshold: float = 0.5,
    model_name: str = "Model",
    *,
    dtype: str = "f32",
) -> Dict[str, np.ndarray]:
    """Evaluate a model on a COCO test set — reference signature.

    Matches /root/reference/src/evaluate.py:476-523 positionally:
    ``(model, test_dir, test_json, device, batch_size, threshold,
    model_name)``.  ``device`` is accepted for drop-in compatibility and
    ignored (JAX arrays carry their placement).  ``model`` may be:

    * a ``(module, params)`` or ``(apply_fn, params)`` pair,
    * a checkpoint path (msgpack or ``.pth``) — loaded via
      :func:`..experiments.compare.load_unet_params` with keyword-only
      ``dtype`` (default **f32**, matching the reference's eval
      precision — bf16 eval noise can flip paired-test significance,
      see PARITY_RUN.md),
    * a :class:`.serve.Predictor`, or any object with ``.apply`` and
      ``.params`` — these routes evaluate in whatever compute dtype the
      model object was built with (``dtype`` only applies to the
      checkpoint path); a bf16 Predictor passed while ``dtype='f32'``
      triggers a warning rather than a silent precision downgrade.

    Returns the reference's dict of per-image metric arrays and prints
    the same report.
    """
    from .data import CocoSegmentationSource, DeviceDataset
    from .serve import Predictor
    from .train.evaluation import evaluate_on_dataset

    if isinstance(model, (str, Path)):
        from .experiments.compare import load_unet_params

        module, params = load_unet_params(model, dtype=dtype)
        apply_fn = module.apply
    elif isinstance(model, tuple) and len(model) == 2:
        module, params = model
        apply_fn = getattr(module, "apply", module)
    elif isinstance(model, Predictor):
        model_dtype = getattr(model.model, "dtype", None)
        if dtype == "f32" and model_dtype not in (None, jnp.float32):
            warnings.warn(
                f"evaluate_on_test_set(dtype='f32') received a Predictor whose "
                f"model computes in {jnp.dtype(model_dtype).name}; evaluation "
                "runs in the Predictor's dtype (bf16 eval noise can flip "
                "paired-test significance — rebuild the Predictor with "
                "precision='f32' or pass the checkpoint path instead)",
                stacklevel=2,
            )
        apply_fn, params = model.model.apply, model.params
    elif hasattr(model, "apply") and hasattr(model, "params"):
        apply_fn, params = model.apply, model.params
    else:
        raise TypeError(
            "model must be a checkpoint path, a (module, params) pair, or an "
            "object with .apply/.params"
        )

    src = CocoSegmentationSource(Path(test_dir), Path(test_json))
    data = DeviceDataset.from_numpy(src.images, src.masks)
    return evaluate_on_dataset(
        apply_fn,
        params,
        data,
        batch_size=batch_size,
        model_name=model_name,
        threshold=threshold,
    )
