"""Checkpoint interop: forward-pass parity with the reference torch UNet.

Loads the reference's actual PyTorch model (as a black-box oracle),
transfers its weights into the Flax U-Net, and demands near-bitwise
forward agreement — the strongest form of the "bit-comparable Dice"
parity requirement.
"""

import importlib.util

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from physics_informed_image_segmentation_tpu.models import UNet
from physics_informed_image_segmentation_tpu.utils.torch_interop import (
    export_torch_state_dict,
    import_torch_state_dict,
)


def _reference_unet(**kw):
    spec = importlib.util.spec_from_file_location(
        "ref_unet", "/root/reference/src/unet.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.UNet(**kw)


@pytest.fixture(scope="module")
def torch_model():
    torch.manual_seed(0)
    model = _reference_unet(in_channels=1, out_channels=1, base_channels=16)
    model.eval()
    return model


def test_forward_parity_with_reference(torch_model):
    x = np.random.default_rng(0).uniform(size=(2, 1, 64, 64)).astype(np.float32)
    with torch.no_grad():
        ref_out = torch_model(torch.from_numpy(x)).numpy()

    flax_model = UNet(base_channels=16, dtype=jnp.float32)
    params = import_torch_state_dict(torch_model.state_dict())
    ours = np.asarray(
        flax_model.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
    ).transpose(0, 3, 1, 2)

    np.testing.assert_allclose(ours, ref_out, atol=2e-6)


def test_dice_bit_comparable(torch_model):
    """Same weights + same input -> identical thresholded Dice."""
    from physics_informed_image_segmentation_tpu.ops.metrics import dice_score

    rng = np.random.default_rng(1)
    x = rng.uniform(size=(4, 1, 64, 64)).astype(np.float32)
    target = (rng.uniform(size=(4, 1, 64, 64)) > 0.5).astype(np.float32)
    with torch.no_grad():
        ref_out = torch_model(torch.from_numpy(x)).numpy()
    flax_model = UNet(base_channels=16, dtype=jnp.float32)
    params = import_torch_state_dict(torch_model.state_dict())
    ours = np.asarray(
        flax_model.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
    ).transpose(0, 3, 1, 2)

    ref_bin = (ref_out > 0.5).astype(np.float32)
    our_bin = (ours > 0.5).astype(np.float32)
    # identical binarized predictions => bit-identical Dice
    assert (ref_bin == our_bin).mean() > 0.99999
    d_ref = 2 * (ref_bin * target).sum() / (ref_bin.sum() + target.sum())
    d_ours = float(dice_score(jnp.asarray(ours[:, 0]), jnp.asarray(target[:, 0])))
    np.testing.assert_allclose(d_ours, d_ref, rtol=1e-6)


def test_roundtrip_export(torch_model):
    params = import_torch_state_dict(torch_model.state_dict())
    sd = export_torch_state_dict(params)
    ref_sd = {k: v.numpy() for k, v in torch_model.state_dict().items()}
    assert set(sd) == set(ref_sd)
    for k in ref_sd:
        np.testing.assert_allclose(sd[k], ref_sd[k], atol=1e-7, err_msg=k)


def test_import_with_zero_dropout_indices():
    torch.manual_seed(1)
    tm = _reference_unet(in_channels=1, out_channels=1, base_channels=8, dropout=0.0)
    tm.eval()
    x = np.random.default_rng(2).uniform(size=(1, 1, 32, 32)).astype(np.float32)
    with torch.no_grad():
        ref_out = tm(torch.from_numpy(x)).numpy()
    flax_model = UNet(base_channels=8, dropout=0.0, dtype=jnp.float32)
    params = import_torch_state_dict(tm.state_dict(), dropout=0.0)
    ours = np.asarray(
        flax_model.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
    ).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(ours, ref_out, atol=2e-6)
