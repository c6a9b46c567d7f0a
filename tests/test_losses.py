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


class TestSaturatedBCEGradients:
    """Regression: saturated probabilities (exactly 0.0 / 1.0, routine
    once sigmoid logits pass ~16.6 in f32) must give finite gradients
    matching torch's clamped binary_cross_entropy_backward — naive
    autodiff through the clipped logs yields 0*inf = NaN and killed the
    round-2 parity training at epoch 6."""

    def _saturated_pair(self):
        p = np.array([[0.0, 1.0, 0.5, 1.0, 0.0, 0.3]], np.float32)
        t = np.array([[0.0, 1.0, 1.0, 0.0, 1.0, 1.0]], np.float32)
        return p, t

    def test_bce_grad_finite_and_matches_torch(self):
        import torch

        p_np, t_np = self._saturated_pair()
        g = jax.grad(lambda p: losses.bce_loss(p, jnp.asarray(t_np)))(
            jnp.asarray(p_np)
        )
        assert np.isfinite(np.asarray(g)).all()

        pt = torch.tensor(p_np, requires_grad=True)
        torch.nn.BCELoss()(pt, torch.tensor(t_np)).backward()
        np.testing.assert_allclose(
            np.asarray(g), pt.grad.numpy(), rtol=1e-5, atol=0
        )

    def test_dice_bce_pde_grad_finite_at_saturation(self):
        p = jnp.asarray(
            np.clip(np.linspace(0, 1, 64).reshape(1, 8, 8), 0.0, 1.0).astype(
                np.float32
            )
        )
        p = p.at[0, 0, 0].set(0.0).at[0, -1, -1].set(1.0)
        t = jnp.asarray((np.linspace(0, 1, 64).reshape(1, 8, 8) > 0.5).astype(np.float32))
        g = jax.grad(
            lambda x: losses.dice_bce_pde_loss(
                x, t, pde_weight=1e-4, phase_field_weight=1e-4
            )
        )(p)
        assert np.isfinite(np.asarray(g)).all()

    def test_masked_bce_grad_finite(self):
        p = jnp.asarray(np.array([[1.0, 0.0], [0.5, 0.5]], np.float32))
        t = jnp.asarray(np.array([[0.0, 1.0], [1.0, 0.0]], np.float32))
        mask = jnp.asarray(np.array([[1.0, 1.0], [0.0, 0.0]], np.float32))
        g = jax.grad(lambda x: losses.bce_loss(x, t, mask=mask))(p)
        assert np.isfinite(np.asarray(g)).all()
        # masked-out row contributes zero gradient
        np.testing.assert_array_equal(np.asarray(g)[1], np.zeros(2, np.float32))


class TestPallasFieldSizeGuard:
    """backend='pallas'/'auto' must fall back to the XLA stencils for
    fields larger than PALLAS_MAX_FIELD_PIXELS (the whole-field-in-VMEM
    kernel overflows the Mosaic compiler at 512^2 — verified on v5e,
    scripts/megapixel_tpu.py)."""

    def _fn_with_poisoned_pallas(self, monkeypatch):
        from physics_informed_image_segmentation_tpu.ops import pallas_physics
        from physics_informed_image_segmentation_tpu.train.objective import (
            LossConfig,
            make_loss_and_components,
        )

        def boom(*a, **k):
            raise AssertionError("pallas kernel called")

        monkeypatch.setattr(pallas_physics, "fused_loss_components", boom)
        return make_loss_and_components(
            LossConfig(pde_weight=1e-4, phase_field_weight=1e-4, backend="pallas")
        )

    def test_large_field_uses_jax_stencils(self, monkeypatch):
        fn = self._fn_with_poisoned_pallas(monkeypatch)
        p = jnp.full((1, 512, 512, 1), 0.3, jnp.float32)
        t = jnp.zeros((1, 512, 512, 1), jnp.float32)
        total, comps = fn(p, t)  # must NOT touch the poisoned kernel
        assert np.isfinite(float(total))
        assert float(comps["pde_loss"]) > 0

    def test_small_field_uses_pallas(self, monkeypatch):
        fn = self._fn_with_poisoned_pallas(monkeypatch)
        p = jnp.full((1, 64, 64, 1), 0.3, jnp.float32)
        t = jnp.zeros((1, 64, 64, 1), jnp.float32)
        with pytest.raises(AssertionError, match="pallas kernel called"):
            fn(p, t)

    def test_fallback_matches_jax_backend(self):
        from physics_informed_image_segmentation_tpu.train.objective import (
            LossConfig,
            make_loss_and_components,
        )

        rng = np.random.default_rng(0)
        p = jnp.asarray(rng.uniform(0.05, 0.95, (1, 320, 320, 1)).astype(np.float32))
        t = jnp.asarray((rng.uniform(size=(1, 320, 320, 1)) > 0.5).astype(np.float32))
        f_pl = make_loss_and_components(
            LossConfig(pde_weight=1e-4, phase_field_weight=1e-4, backend="pallas")
        )
        f_jx = make_loss_and_components(
            LossConfig(pde_weight=1e-4, phase_field_weight=1e-4, backend="jax")
        )
        ta, ca = f_pl(p, t)
        tb, cb = f_jx(p, t)
        assert float(ta) == float(tb)
        for k in ca:
            assert float(ca[k]) == float(cb[k]), k
