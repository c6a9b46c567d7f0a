"""Multi-device tests on the 8-device virtual CPU mesh.

This is the framework's substitute for a multi-node cluster: XLA's
`--xla_force_host_platform_device_count=8` gives 8 real (virtual) CPU
devices, so sharding, psum gradient reduction and ppermute halo
exchange execute the actual SPMD paths.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from physics_informed_image_segmentation_tpu.data import (
    DeviceDataset,
    epoch_batch_indices,
    make_blobs,
)
from physics_informed_image_segmentation_tpu.models import UNet
from physics_informed_image_segmentation_tpu.ops import pde
from physics_informed_image_segmentation_tpu.parallel import (
    batch_sharding,
    halo_phase_field_loss,
    halo_residual_loss,
    make_mesh,
    make_sharded_epoch_fns,
    make_sharded_train_step,
    shard_train_state,
)
from physics_informed_image_segmentation_tpu.train import (
    LossConfig,
    create_train_state,
    make_train_epoch_fn,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


class TestMesh:
    def test_make_mesh_shapes(self):
        m = make_mesh()
        assert m.devices.shape == (8, 1)
        m2 = make_mesh(data=4, space=2)
        assert m2.devices.shape == (4, 2)
        with pytest.raises(ValueError):
            make_mesh(data=16, space=1)


class TestHalo:
    @pytest.mark.parametrize("space", [2, 4, 8])
    def test_halo_residual_matches_unsharded(self, rng, space):
        mesh = make_mesh(data=8 // space, space=space)
        u_np = rng.uniform(0.05, 0.95, size=(2, 64, 32)).astype(np.float32)
        u = jnp.asarray(u_np)
        sharded = float(halo_residual_loss(u, mesh, 5.0, 0.5))
        unsharded = float(pde.pde_residual_loss(u, 5.0, 0.5))
        np.testing.assert_allclose(sharded, unsharded, rtol=1e-6)

    def test_halo_phase_field_matches_unsharded(self, rng):
        mesh = make_mesh(data=2, space=4)
        u = jnp.asarray(rng.uniform(0.05, 0.95, size=(2, 64, 32)).astype(np.float32))
        sharded = float(halo_phase_field_loss(u, mesh, 0.05))
        unsharded = float(pde.phase_field_loss(u, 0.05))
        np.testing.assert_allclose(sharded, unsharded, rtol=1e-6)

    def test_halo_grad_flows(self, rng):
        """The halo loss is differentiable and matches unsharded grads."""
        mesh = make_mesh(data=1, space=8)
        u = jnp.asarray(rng.uniform(0.1, 0.9, size=(1, 32, 16)).astype(np.float32))
        g_sharded = jax.grad(lambda v: halo_residual_loss(v, mesh, 2.0, 0.5))(u)
        g_ref = jax.grad(lambda v: pde.pde_residual_loss(v, 2.0, 0.5))(u)
        np.testing.assert_allclose(
            np.asarray(g_sharded), np.asarray(g_ref), atol=1e-6
        )


class TestDataParallel:
    def test_sharded_epoch_matches_single_device(self):
        """DP over 8 devices computes the same result as 1 device."""
        images, masks = make_blobs(16, 32, 32, seed=0)
        data = DeviceDataset.from_numpy(images, masks)
        model = UNet(base_channels=4, dropout=0.0)
        cfg = LossConfig(pde_weight=1e-4, diffusion_coeff=5.0, backend="jax")
        idx, valid = epoch_batch_indices(data.n, 8, shuffle=False)

        # single device
        s0 = create_train_state(model, jax.random.key(0), 1e-3, input_shape=(1, 32, 32, 1))
        f0 = make_train_epoch_fn(model, cfg)
        s0, r0 = f0(s0, data.images, data.masks, idx, valid)

        # 8-way DP
        mesh = make_mesh(data=8, space=1)
        s1 = create_train_state(model, jax.random.key(0), 1e-3, input_shape=(1, 32, 32, 1))
        s1 = shard_train_state(s1, mesh)
        ftrain, feval = make_sharded_epoch_fns(model, cfg, mesh)
        sh_images = jax.device_put(data.images, batch_sharding(mesh))
        sh_masks = jax.device_put(data.masks, batch_sharding(mesh))
        s1, r1 = ftrain(s1, sh_images, sh_masks, idx, valid)

        np.testing.assert_allclose(float(r0["loss"]), float(r1["loss"]), rtol=1e-5)
        np.testing.assert_allclose(
            float(r0["dice_score"]), float(r1["dice_score"]), rtol=1e-4
        )
        # params agree after the epoch (same global program)
        p0 = jax.device_get(s0.params)
        p1 = jax.device_get(s1.params)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(a, b, atol=1e-5), p0, p1
        )

    def test_spatial_sharding_compiles_and_runs(self):
        """data×space mesh: conv halos handled by the XLA partitioner."""
        mesh = make_mesh(data=4, space=2)
        model = UNet(base_channels=4, dropout=0.0)
        cfg = LossConfig(
            pde_weight=1e-4, phase_field_weight=1e-4, diffusion_coeff=5.0,
            backend="jax",
        )
        state = create_train_state(model, jax.random.key(0), 1e-3, input_shape=(1, 32, 32, 1))
        state = shard_train_state(state, mesh)
        step = make_sharded_train_step(model, cfg, mesh, spatial=True)
        from physics_informed_image_segmentation_tpu.parallel import batch_space_sharding

        images, masks = make_blobs(8, 32, 32, seed=0)
        x = jax.device_put(jnp.asarray(images), batch_space_sharding(mesh))
        y = jax.device_put(jnp.asarray(masks), batch_space_sharding(mesh))
        state, loss = step(state, x, y)
        assert np.isfinite(float(loss))
        state, loss2 = step(state, x, y)
        assert float(loss2) < float(loss) * 1.5  # sane progression


class TestHaloPallas:
    """shard_map halo exchange + fused Pallas local compute."""

    def test_values_match_unsharded(self, rng):
        from physics_informed_image_segmentation_tpu.parallel import (
            halo_physics_loss_pallas,
        )

        mesh = make_mesh(data=2, space=4)
        u = jnp.asarray(rng.uniform(0.05, 0.95, size=(2, 64, 32)).astype(np.float32))
        rd, pf = halo_physics_loss_pallas(u, mesh, 5.0, 0.5, 0.05)
        np.testing.assert_allclose(
            float(rd), float(pde.pde_residual_loss(u, 5.0, 0.5)), rtol=1e-5
        )
        np.testing.assert_allclose(
            float(pf), float(pde.phase_field_loss(u, 0.05)), rtol=1e-5
        )

    def test_grad_matches_unsharded(self, rng):
        from physics_informed_image_segmentation_tpu.parallel import (
            halo_physics_loss_pallas,
        )

        mesh = make_mesh(data=1, space=8)
        u = jnp.asarray(rng.uniform(0.1, 0.9, size=(1, 32, 16)).astype(np.float32))

        def sharded(v):
            rd, pf = halo_physics_loss_pallas(v, mesh, 2.0, 0.5, 0.05)
            return rd + 0.5 * pf

        def unsharded(v):
            return pde.pde_residual_loss(v, 2.0, 0.5) + 0.5 * pde.phase_field_loss(
                v, 0.05
            )

        g_s = np.asarray(jax.grad(sharded)(u))
        g_u = np.asarray(jax.grad(unsharded)(u))
        np.testing.assert_allclose(g_s, g_u, atol=1e-6)


class TestHaloPhysicsTrainStep:
    def test_halo_physics_step_matches_partitioned_step(self):
        """data×space train step with explicit halo+Pallas physics gives
        the same loss as the partitioner-sliced physics."""
        from physics_informed_image_segmentation_tpu.parallel import (
            batch_space_sharding,
        )

        mesh = make_mesh(data=4, space=2)
        model = UNet(base_channels=4, dropout=0.0)
        cfg = LossConfig(
            pde_weight=1e-3, phase_field_weight=1e-4, diffusion_coeff=5.0,
            backend="jax",
        )
        images, masks = make_blobs(8, 32, 32, seed=0)
        x = jax.device_put(jnp.asarray(images), batch_space_sharding(mesh))
        y = jax.device_put(jnp.asarray(masks), batch_space_sharding(mesh))

        losses = {}
        for halo in (False, True):
            state = create_train_state(
                model, jax.random.key(0), 1e-3, input_shape=(1, 32, 32, 1)
            )
            state = shard_train_state(state, mesh)
            step = make_sharded_train_step(
                model, cfg, mesh, spatial=True, halo_physics=halo
            )
            state, loss = step(state, x, y)
            losses[halo] = float(loss)
        np.testing.assert_allclose(losses[True], losses[False], rtol=1e-5)

    def test_halo_physics_requires_spatial(self):
        mesh = make_mesh(data=8, space=1)
        model = UNet(base_channels=4)
        cfg = LossConfig(pde_weight=1e-3, diffusion_coeff=5.0, backend="jax")
        with pytest.raises(ValueError):
            make_sharded_train_step(model, cfg, mesh, spatial=False, halo_physics=True)
