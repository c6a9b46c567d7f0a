"""Unit + golden tests for the pure-JAX PDE stencil ops."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

import torch_oracle as oracle
from physics_informed_image_segmentation_tpu.ops import pde


def _rand_u(rng, shape=(2, 16, 16)):
    return rng.uniform(0.05, 0.95, size=shape).astype(np.float32)


class TestAnalytic:
    def test_laplacian_of_quadratic_is_4_in_interior(self):
        # u = x^2 + y^2  =>  discrete 5-point Laplacian = 4 exactly (interior)
        h, w = 32, 32
        y, x = np.mgrid[0:h, 0:w].astype(np.float32)
        u = jnp.asarray((x**2 + y**2)[None])
        lap = pde.laplacian(u)
        np.testing.assert_allclose(np.asarray(lap)[0, 1:-1, 1:-1], 4.0, atol=1e-4)

    def test_laplacian_of_linear_is_zero_interior(self):
        y, x = np.mgrid[0:16, 0:16].astype(np.float32)
        u = jnp.asarray((3 * x - 2 * y + 1)[None])
        lap = pde.laplacian(u)
        np.testing.assert_allclose(np.asarray(lap)[0, 1:-1, 1:-1], 0.0, atol=1e-4)

    def test_gradients_of_linear_field(self):
        y, x = np.mgrid[0:16, 0:16].astype(np.float32)
        u = jnp.asarray((3 * x - 2 * y)[None])
        gx, gy = pde.grad_xy(u)
        np.testing.assert_allclose(np.asarray(gx)[0, :, 1:-1], 3.0, atol=1e-4)
        np.testing.assert_allclose(np.asarray(gy)[0, 1:-1, :], -2.0, atol=1e-4)
        # reflect BC zeroes the normal gradient on the boundary (Neumann)
        np.testing.assert_allclose(np.asarray(gx)[0, :, 0], 0.0, atol=1e-6)
        np.testing.assert_allclose(np.asarray(gx)[0, :, -1], 0.0, atol=1e-6)
        np.testing.assert_allclose(np.asarray(gy)[0, 0, :], 0.0, atol=1e-6)
        np.testing.assert_allclose(np.asarray(gy)[0, -1, :], 0.0, atol=1e-6)

    def test_constant_field_zero_residual_at_equilibrium(self):
        # u = a is an equilibrium of r = D lap(u) + u(1-u)(u-a)
        u = jnp.full((1, 8, 8), 0.5)
        r = pde.pde_residual(u, diffusion_coeff=2.0, reaction_threshold=0.5)
        np.testing.assert_allclose(np.asarray(r), 0.0, atol=1e-6)

    def test_reaction_term_roots(self):
        for a in (0.3, 0.5, 0.7):
            for root in (0.0, 1.0, a):
                val = pde.reaction_term(jnp.asarray(root), a)
                assert abs(float(val)) < 1e-7

    def test_validate_params(self):
        with pytest.raises(ValueError):
            pde.validate_pde_params(-1.0, 0.5)
        with pytest.raises(ValueError):
            pde.validate_pde_params(1.0, 1.5)
        pde.validate_pde_params(5.0, 0.5)


class TestGoldenVsTorch:
    """Bit-level agreement with the PyTorch reference semantics."""

    @pytest.mark.parametrize("shape", [(1, 8, 8), (3, 16, 16), (2, 17, 13)])
    def test_laplacian_matches(self, rng, shape):
        u = _rand_u(rng, shape)
        ours = np.asarray(pde.laplacian(jnp.asarray(u)))
        ref = oracle.laplacian(torch.from_numpy(u)[:, None]).numpy()[:, 0]
        np.testing.assert_allclose(ours, ref, atol=1e-6)

    def test_gradients_match(self, rng):
        u = _rand_u(rng)
        gx, gy = pde.grad_xy(jnp.asarray(u))
        rgx, rgy = oracle.grad_xy(torch.from_numpy(u)[:, None])
        np.testing.assert_allclose(np.asarray(gx), rgx.numpy()[:, 0], atol=1e-6)
        np.testing.assert_allclose(np.asarray(gy), rgy.numpy()[:, 0], atol=1e-6)

    @pytest.mark.parametrize("D,a", [(1.0, 0.5), (5.0, 0.3), (100.0, 0.7)])
    def test_rd_loss_matches(self, rng, D, a):
        u = _rand_u(rng)
        ours = float(pde.pde_residual_loss(jnp.asarray(u), D, a))
        ref = float(oracle.rd_loss(torch.from_numpy(u)[:, None], D, a))
        np.testing.assert_allclose(ours, ref, rtol=1e-5)

    @pytest.mark.parametrize("eps", [0.001, 0.05, 0.2])
    def test_phase_field_matches(self, rng, eps):
        u = _rand_u(rng)
        ours = float(pde.phase_field_loss(jnp.asarray(u), eps))
        ref = float(oracle.phase_field(torch.from_numpy(u)[:, None], eps))
        np.testing.assert_allclose(ours, ref, rtol=1e-5)

    def test_rd_loss_gradient_matches(self, rng):
        """Autodiff through the stencils agrees with torch autograd."""
        u = _rand_u(rng, (1, 12, 12))
        g_ours = np.asarray(
            jax.grad(lambda v: pde.pde_residual_loss(v, 5.0, 0.5))(jnp.asarray(u))
        )
        ut = torch.from_numpy(u)[:, None].requires_grad_(True)
        oracle.rd_loss(ut, 5.0, 0.5).backward()
        np.testing.assert_allclose(g_ours, ut.grad.numpy()[:, 0], atol=1e-6)

    def test_phase_field_gradient_matches(self, rng):
        u = _rand_u(rng, (1, 12, 12))
        g_ours = np.asarray(
            jax.grad(lambda v: pde.phase_field_loss(v, 0.05))(jnp.asarray(u))
        )
        ut = torch.from_numpy(u)[:, None].requires_grad_(True)
        oracle.phase_field(ut, 0.05).backward()
        np.testing.assert_allclose(g_ours, ut.grad.numpy()[:, 0], atol=1e-5)


class TestTransforms:
    def test_jit_and_vmap(self, rng):
        u = jnp.asarray(_rand_u(rng, (4, 16, 16)))
        f = jax.jit(lambda v: pde.pde_residual_loss(v, 5.0, 0.5))
        per_image = jax.vmap(lambda v: pde.pde_residual_loss(v, 5.0, 0.5))(u)
        assert per_image.shape == (4,)
        # mean of per-image losses == batch loss (same #pixels per image)
        np.testing.assert_allclose(float(per_image.mean()), float(f(u)), rtol=1e-6)

    def test_layout_agnostic(self, rng):
        u = _rand_u(rng, (2, 16, 16))
        a = np.asarray(pde.laplacian(jnp.asarray(u)))
        b = np.asarray(pde.laplacian(jnp.asarray(u[:, None])))[:, 0]
        np.testing.assert_allclose(a, b)
