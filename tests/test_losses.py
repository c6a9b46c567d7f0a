"""Golden tests for loss functions against the PyTorch oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

import torch_oracle as oracle
from physics_informed_image_segmentation_tpu.ops import losses


def _pair(rng, shape=(4, 16, 16)):
    pred = rng.uniform(0.02, 0.98, size=shape).astype(np.float32)
    target = (rng.uniform(size=shape) > 0.5).astype(np.float32)
    return pred, target


def test_dice_bce_matches_torch(rng):
    pred, target = _pair(rng)
    ours = float(losses.dice_bce_loss(jnp.asarray(pred), jnp.asarray(target)))
    ref = float(oracle.dice_bce(torch.from_numpy(pred), torch.from_numpy(target)))
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


@pytest.mark.parametrize(
    "lam_rd,lam_pf,D,a,eps",
    [
        (1e-4, 1e-4, 5.0, 0.5, 0.05),
        (1e-3, 0.0, 1.0, 0.5, 0.05),
        (0.0, 1e-4, 5.0, 0.5, 0.2),
        (0.0, 0.0, 5.0, 0.5, 0.05),
    ],
)
def test_dice_bce_pde_matches_torch(rng, lam_rd, lam_pf, D, a, eps):
    pred, target = _pair(rng)
    ours = float(
        losses.dice_bce_pde_loss(
            jnp.asarray(pred),
            jnp.asarray(target),
            pde_weight=lam_rd,
            phase_field_weight=lam_pf,
            diffusion_coeff=D,
            reaction_threshold=a,
            epsilon=eps,
        )
    )
    ref = float(
        oracle.dice_bce_pde(
            torch.from_numpy(pred)[:, None],
            torch.from_numpy(target)[:, None],
            lam_rd,
            lam_pf,
            D,
            a,
            eps,
        )
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_bce_saturated_predictions_finite():
    """torch BCELoss clamps log at -100; we must not return inf/nan."""
    pred = jnp.asarray([[0.0, 1.0], [0.5, 0.5]], dtype=jnp.float32)
    target = jnp.asarray([[1.0, 0.0], [1.0, 0.0]], dtype=jnp.float32)
    val = float(losses.bce_loss(pred, target))
    assert np.isfinite(val)
    ref = float(
        torch.nn.functional.binary_cross_entropy(
            torch.tensor([[0.0, 1.0], [0.5, 0.5]]), torch.tensor([[1.0, 0.0], [1.0, 0.0]])
        )
    )
    np.testing.assert_allclose(val, ref, rtol=1e-5)


def test_masked_loss_equals_ragged_batch(rng):
    """Masked static batch reproduces the reference's ragged final batch."""
    pred, target = _pair(rng, (5, 8, 8))
    # ragged batch of 3
    ragged = float(
        losses.dice_bce_pde_loss(
            jnp.asarray(pred[:3]),
            jnp.asarray(target[:3]),
            pde_weight=1e-3,
            phase_field_weight=1e-4,
            diffusion_coeff=5.0,
        )
    )
    mask = np.zeros((5, 1, 1), np.float32)
    mask[:3] = 1.0
    masked = float(
        losses.dice_bce_pde_loss(
            jnp.asarray(pred),
            jnp.asarray(target),
            pde_weight=1e-3,
            phase_field_weight=1e-4,
            diffusion_coeff=5.0,
            mask=jnp.asarray(mask),
        )
    )
    np.testing.assert_allclose(masked, ragged, rtol=1e-5)


def test_diffusion_only_ablation_drops_reaction(rng):
    """use_reaction_term=False => residual is D*lap only
    (/root/reference/src/ablation.py:53-86 semantics)."""
    pred, target = _pair(rng)
    from physics_informed_image_segmentation_tpu.ops import pde

    full = losses.dice_bce_pde_loss(
        jnp.asarray(pred), jnp.asarray(target), pde_weight=1e-3, diffusion_coeff=5.0,
        use_reaction_term=False,
    )
    lap = 5.0 * pde.laplacian(jnp.asarray(pred))
    expected = losses.dice_bce_loss(jnp.asarray(pred), jnp.asarray(target)) + 1e-3 * jnp.mean(lap**2)
    np.testing.assert_allclose(float(full), float(expected), rtol=1e-6)


def test_loss_gradient_matches_torch(rng):
    pred, target = _pair(rng, (2, 12, 12))
    g_ours = np.asarray(
        jax.grad(
            lambda p: losses.dice_bce_pde_loss(
                p, jnp.asarray(target), pde_weight=1e-4, phase_field_weight=1e-4,
                diffusion_coeff=5.0,
            )
        )(jnp.asarray(pred))
    )
    pt = torch.from_numpy(pred)[:, None].requires_grad_(True)
    oracle.dice_bce_pde(pt, torch.from_numpy(target)[:, None], 1e-4, 1e-4, 5.0, 0.5, 0.05).backward()
    np.testing.assert_allclose(g_ours, pt.grad.numpy()[:, 0], atol=1e-6)


def test_loss_components_keys(rng):
    pred, target = _pair(rng)
    comps = losses.loss_components(
        jnp.asarray(pred), jnp.asarray(target), pde_weight=1e-4, phase_field_weight=1e-4,
        diffusion_coeff=5.0,
    )
    assert set(comps) == {"dice_loss", "bce_loss", "pde_loss", "phase_field_loss"}
    comps0 = losses.loss_components(jnp.asarray(pred), jnp.asarray(target))
    assert float(comps0["pde_loss"]) == 0.0
    assert float(comps0["phase_field_loss"]) == 0.0
