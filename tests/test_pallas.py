"""Fused Pallas physics kernel vs the pure-JAX reference path.

Runs through the Pallas interpreter on CPU; the same kernels compile
with Mosaic on TPU.  Gradient checks are the important ones — the
hand-derived reflect-pad adjoints must match autodiff of the pure
path everywhere, *especially* at boundary pixels.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from physics_informed_image_segmentation_tpu.ops import losses, pallas_physics, pde
from physics_informed_image_segmentation_tpu.ops.pallas_physics import (
    fused_loss_components,
)


def _pair(rng, shape=(3, 16, 16)):
    pred = rng.uniform(0.02, 0.98, size=shape).astype(np.float32)
    target = (rng.uniform(size=shape) > 0.5).astype(np.float32)
    return jnp.asarray(pred), jnp.asarray(target)


PARAMS = dict(
    diffusion_coeff=5.0, reaction_threshold=0.5, epsilon=0.05
)


def _pure_components(pred, target, mask=None, use_reaction=True, **kw):
    p = dict(PARAMS, **kw)
    comps = {
        "dice_loss": losses.soft_dice_loss(pred, target, mask=mask),
        "bce_loss": losses.bce_loss(pred, target, mask=mask),
    }
    u = pred if mask is None else pred * mask
    if use_reaction:
        r = pde.pde_residual(u, p["diffusion_coeff"], p["reaction_threshold"])
    else:
        r = p["diffusion_coeff"] * pde.laplacian(u)
    if mask is not None:
        r = r * mask
        scale = mask.size / jnp.sum(mask)
    else:
        scale = 1.0
    comps["pde_loss"] = jnp.mean(r * r) * scale
    gms = pde.gradient_magnitude_sq(u)
    dw = (u * u) * ((1 - pred) ** 2)
    if mask is not None:
        gms, dw = gms * mask, dw * mask
    comps["phase_field_loss"] = (
        jnp.mean((p["epsilon"] / 2) * gms + (1 / p["epsilon"]) * dw) * scale
    )
    return comps


class TestForward:
    def test_components_match_pure_jax(self, rng):
        pred, target = _pair(rng)
        fused = fused_loss_components(pred, target, **PARAMS)
        pure = _pure_components(pred, target)
        for k in pure:
            np.testing.assert_allclose(
                float(fused[k]), float(pure[k]), rtol=1e-5, err_msg=k
            )

    def test_channel_dim_accepted(self, rng):
        pred, target = _pair(rng)
        a = fused_loss_components(pred[..., None], target[..., None], **PARAMS)
        b = fused_loss_components(pred, target, **PARAMS)
        np.testing.assert_allclose(float(a["pde_loss"]), float(b["pde_loss"]))

    def test_no_reaction_term(self, rng):
        pred, target = _pair(rng)
        fused = fused_loss_components(pred, target, use_reaction_term=False, **PARAMS)
        pure = _pure_components(pred, target, use_reaction=False)
        np.testing.assert_allclose(
            float(fused["pde_loss"]), float(pure["pde_loss"]), rtol=1e-5
        )

    def test_masked_matches_ragged(self, rng):
        pred, target = _pair(rng, (4, 12, 12))
        mask = jnp.asarray([1.0, 1.0, 1.0, 0.0]).reshape(4, 1, 1)
        fused = fused_loss_components(pred, target, mask=mask, **PARAMS)
        ragged = _pure_components(pred[:3], target[:3])
        for k in ragged:
            np.testing.assert_allclose(
                float(fused[k]), float(ragged[k]), rtol=1e-5, err_msg=k
            )

    def test_saturated_predictions_finite(self):
        pred = jnp.asarray(np.array([[[0.0, 1.0], [0.5, 0.25]]], np.float32))
        pred = jnp.tile(pred, (1, 4, 2))  # (1, 8, 4)... make it (1,8,8)
        pred = jnp.concatenate([pred, pred], axis=-1)
        target = jnp.ones_like(pred)
        comps = fused_loss_components(pred, target, **PARAMS)
        for k, v in comps.items():
            assert np.isfinite(float(v)), k

    def test_disabled_terms_zero(self, rng):
        pred, target = _pair(rng)
        comps = fused_loss_components(
            pred, target, need_pde=False, need_phase_field=False, **PARAMS
        )
        assert float(comps["pde_loss"]) == 0.0
        assert float(comps["phase_field_loss"]) == 0.0


class TestGradients:
    @pytest.mark.parametrize("shape", [(2, 8, 8), (1, 16, 12)])
    def test_total_loss_grad_matches_pure(self, rng, shape):
        pred, target = _pair(rng, shape)

        def total_fused(p):
            c = fused_loss_components(p, target, **PARAMS)
            return (
                0.5 * c["dice_loss"] + 0.5 * c["bce_loss"]
                + 1e-4 * c["pde_loss"] + 1e-4 * c["phase_field_loss"]
            )

        def total_pure(p):
            c = _pure_components(p, target)
            return (
                0.5 * c["dice_loss"] + 0.5 * c["bce_loss"]
                + 1e-4 * c["pde_loss"] + 1e-4 * c["phase_field_loss"]
            )

        g_fused = np.asarray(jax.grad(total_fused)(pred))
        g_pure = np.asarray(jax.grad(total_pure)(pred))
        np.testing.assert_allclose(g_fused, g_pure, atol=1e-6)

    def test_rd_grad_boundary_pixels(self, rng):
        """Adjoint fold correctness shows up exactly at the borders."""
        pred, target = _pair(rng, (1, 8, 8))
        g_fused = np.asarray(
            jax.grad(
                lambda p: fused_loss_components(p, target, **PARAMS)["pde_loss"]
            )(pred)
        )
        g_pure = np.asarray(
            jax.grad(lambda p: pde.pde_residual_loss(p, 5.0, 0.5))(pred)
        )
        # compare border ring specifically
        np.testing.assert_allclose(g_fused[0, 0, :], g_pure[0, 0, :], atol=1e-6)
        np.testing.assert_allclose(g_fused[0, -1, :], g_pure[0, -1, :], atol=1e-6)
        np.testing.assert_allclose(g_fused[0, :, 0], g_pure[0, :, 0], atol=1e-6)
        np.testing.assert_allclose(g_fused[0, :, -1], g_pure[0, :, -1], atol=1e-6)
        np.testing.assert_allclose(g_fused, g_pure, atol=1e-6)

    def test_pf_grad_matches(self, rng):
        pred, target = _pair(rng, (2, 10, 10))
        g_fused = np.asarray(
            jax.grad(
                lambda p: fused_loss_components(p, target, **PARAMS)[
                    "phase_field_loss"
                ]
            )(pred)
        )
        g_pure = np.asarray(
            jax.grad(lambda p: pde.phase_field_loss(p, 0.05))(pred)
        )
        np.testing.assert_allclose(g_fused, g_pure, atol=1e-6)

    def test_target_grad_matches(self, rng):
        pred, target_bin = _pair(rng, (1, 8, 8))
        target = jnp.clip(target_bin, 0.1, 0.9)  # differentiable point

        def total(fn):
            def f(t):
                c = fn(pred, t)
                return 0.5 * c["dice_loss"] + 0.5 * c["bce_loss"]
            return f

        g_fused = np.asarray(
            jax.grad(total(lambda p, t: fused_loss_components(p, t, **PARAMS)))(target)
        )
        g_pure = np.asarray(
            jax.grad(total(lambda p, t: _pure_components(p, t)))(target)
        )
        np.testing.assert_allclose(g_fused, g_pure, atol=1e-6)

    def test_masked_grad_zero_on_padding(self, rng):
        pred, target = _pair(rng, (3, 8, 8))
        mask = jnp.asarray([1.0, 0.0, 1.0]).reshape(3, 1, 1)

        def total(p):
            c = fused_loss_components(p, target, mask=mask, **PARAMS)
            return c["dice_loss"] + c["pde_loss"]

        g = np.asarray(jax.grad(total)(pred))
        np.testing.assert_array_equal(g[1], 0.0)
        assert np.abs(g[0]).max() > 0


class TestJit:
    def test_jit_and_grad_compose(self, rng):
        pred, target = _pair(rng)

        @jax.jit
        def step(p):
            c = fused_loss_components(p, target, **PARAMS)
            total = c["dice_loss"] + c["bce_loss"] + c["pde_loss"]
            return total

        v1 = float(step(pred))
        g = jax.jit(jax.grad(step))(pred)
        assert np.isfinite(v1)
        assert np.isfinite(np.asarray(g)).all()
