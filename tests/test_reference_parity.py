"""Training-dynamics parity vs the reference PyTorch implementation.

The strongest check short of bit-identical training: transplant ONE set
of weights into both frameworks, feed both the SAME batch, and compare
loss values and one AdamW step.  Gradients flow through different conv
implementations (cuDNN-style aten CPU vs XLA) so agreement is to a few
ULPs accumulated — we require ~1e-4 relative on the post-step loss.

The reference model/optimizer are imported dynamically as a black-box
oracle (never copied).
"""

import importlib.util

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from physics_informed_image_segmentation_tpu.data import make_blobs
from physics_informed_image_segmentation_tpu.models import UNet
from physics_informed_image_segmentation_tpu.train import LossConfig, create_train_state
from physics_informed_image_segmentation_tpu.train.objective import (
    make_loss_and_components,
)
from physics_informed_image_segmentation_tpu.utils.torch_interop import (
    import_torch_state_dict,
)


def _ref_module(name):
    import sys

    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    return importlib.import_module(f"src.{name}")


@pytest.fixture(scope="module")
def shared_setup():
    torch.manual_seed(0)
    ref_unet = _ref_module("unet").UNet(
        in_channels=1, out_channels=1, base_channels=16, dropout=0.0
    )
    images, masks = make_blobs(8, 64, 64, seed=0)
    flax_model = UNet(base_channels=16, dropout=0.0, dtype=jnp.float32)
    params = import_torch_state_dict(ref_unet.state_dict(), dropout=0.0)
    return ref_unet, flax_model, params, images, masks


def _torch_loss(ref_unet, images, masks, lam_rd, lam_pf, D, a, eps):
    # build the reference criterion as an oracle
    loss_mod = _ref_module("loss")
    if lam_rd > 0 or lam_pf > 0:
        criterion = loss_mod.DiceBCEPDELoss(
            pde_weight=lam_rd, phase_field_weight=lam_pf,
            diffusion_coeff=D, reaction_threshold=a, epsilon=eps,
        )
    else:
        criterion = loss_mod.DiceBCELoss()
    x = torch.from_numpy(images.transpose(0, 3, 1, 2))
    y = torch.from_numpy(masks.transpose(0, 3, 1, 2))
    out = ref_unet(x)
    return criterion(out, y), x, y


class TestSameWeightsSameBatch:
    @pytest.mark.parametrize(
        "lam_rd,lam_pf", [(0.0, 0.0), (1e-4, 1e-4), (1e-3, 0.0)]
    )
    def test_loss_value_parity(self, shared_setup, lam_rd, lam_pf):
        ref_unet, flax_model, params, images, masks = shared_setup
        ref_unet.eval()
        with torch.no_grad():
            ref_loss, _, _ = _torch_loss(
                ref_unet, images, masks, lam_rd, lam_pf, 5.0, 0.5, 0.05
            )
        cfg = LossConfig(
            pde_weight=lam_rd, phase_field_weight=lam_pf,
            diffusion_coeff=5.0, epsilon=0.05, backend="jax",
        )
        loss_fn = make_loss_and_components(cfg)
        pred = flax_model.apply(params, jnp.asarray(images), deterministic=True)
        ours, _ = loss_fn(pred, jnp.asarray(masks))
        np.testing.assert_allclose(float(ours), float(ref_loss), rtol=2e-5)

    def test_one_adamw_step_parity(self, shared_setup):
        """Identical weights + batch + AdamW(lr, wd) => same post-step loss."""
        ref_unet, flax_model, params, images, masks = shared_setup
        lr, lam_rd, lam_pf = 1e-3, 1e-4, 1e-4

        # --- torch step
        import copy

        tm = copy.deepcopy(ref_unet)
        tm.train()
        opt = torch.optim.AdamW(tm.parameters(), lr=lr, weight_decay=1e-5)
        loss0_t, x, y = _torch_loss(tm, images, masks, lam_rd, lam_pf, 5.0, 0.5, 0.05)
        opt.zero_grad()
        loss0_t.backward()
        opt.step()
        loss_mod = _ref_module("loss")
        criterion = loss_mod.DiceBCEPDELoss(
            pde_weight=lam_rd, phase_field_weight=lam_pf,
            diffusion_coeff=5.0, reaction_threshold=0.5, epsilon=0.05,
        )
        with torch.no_grad():
            loss1_t = criterion(tm(x), y)

        # --- our step
        cfg = LossConfig(
            pde_weight=lam_rd, phase_field_weight=lam_pf, diffusion_coeff=5.0,
            epsilon=0.05, backend="jax",
        )
        loss_fn = make_loss_and_components(cfg)
        state = create_train_state(
            flax_model, jax.random.key(0), lr, input_shape=(1, 64, 64, 1),
            params=params,
        )

        def total(p):
            pred = flax_model.apply(p, jnp.asarray(images), deterministic=True)
            return loss_fn(pred, jnp.asarray(masks))[0]

        loss0, grads = jax.value_and_grad(total)(state.params)
        state = state.apply_gradients(grads)
        loss1 = total(state.params)

        np.testing.assert_allclose(float(loss0), float(loss0_t.item()), rtol=2e-5)
        np.testing.assert_allclose(float(loss1), float(loss1_t.item()), rtol=2e-4)


class TestMultiEpochTrajectory:
    @pytest.mark.slow
    def test_three_epoch_loss_trajectory_matches(self, shared_setup):
        """Same init + same batch order + AdamW: per-epoch mean losses of
        the two frameworks track each other for multiple epochs."""
        import copy

        ref_unet, flax_model, params, images, masks = shared_setup
        train_mod = _ref_module("train")
        loss_mod = _ref_module("loss")
        lr = 3e-4

        # --- torch side: 3 epochs over fixed sequential batches
        tm = copy.deepcopy(ref_unet)
        tm.train()
        criterion = loss_mod.DiceBCEPDELoss(
            pde_weight=1e-4, phase_field_weight=1e-4,
            diffusion_coeff=5.0, reaction_threshold=0.5, epsilon=0.05,
        )
        opt = torch.optim.AdamW(tm.parameters(), lr=lr, weight_decay=1e-5)
        xs = torch.from_numpy(images.transpose(0, 3, 1, 2))
        ys = torch.from_numpy(masks.transpose(0, 3, 1, 2))
        loader = [(xs[i : i + 4], ys[i : i + 4]) for i in range(0, 8, 4)]
        torch_losses = []
        for _ in range(3):
            res = train_mod.train_epoch(
                tm, loader, criterion, opt, torch.device("cpu"),
                return_components=False, compute_metrics=False,
            )
            torch_losses.append(res["loss"])

        # --- our side: same batches in the same order
        from physics_informed_image_segmentation_tpu.data import DeviceDataset
        from physics_informed_image_segmentation_tpu.data.pipeline import (
            epoch_batch_indices,
        )
        from physics_informed_image_segmentation_tpu.train import (
            make_train_epoch_fn,
        )

        cfg = LossConfig(
            pde_weight=1e-4, phase_field_weight=1e-4, diffusion_coeff=5.0,
            epsilon=0.05, backend="jax",
        )
        data = DeviceDataset.from_numpy(images, masks)
        idx, valid = epoch_batch_indices(8, 4, shuffle=False)
        state = create_train_state(
            flax_model, jax.random.key(0), lr, input_shape=(1, 64, 64, 1),
            params=params,
        )
        epoch_fn = make_train_epoch_fn(flax_model, cfg, compute_metrics=False)
        our_losses = []
        for _ in range(3):
            state, res = epoch_fn(state, data.images, data.masks, idx, valid)
            our_losses.append(float(res["loss"]))

        np.testing.assert_allclose(our_losses, torch_losses, rtol=1e-3)
