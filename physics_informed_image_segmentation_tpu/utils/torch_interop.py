"""PyTorch ↔ Flax checkpoint interop for the U-Net.

Lets users of the reference framework bring their trained ``.pth``
checkpoints (``torch.save(model.state_dict())`` of
/root/reference/src/unet.py's UNet) straight into the TPU framework:

    params = load_torch_checkpoint("models/unet_baseline.pth", model)
    probs  = model.apply(params, images_nhwc)

The mapping handles the layout differences:
  * Conv2d weight (out, in, kH, kW)      → Flax kernel (kH, kW, in, out)
  * ConvTranspose2d weight (in, out, kH, kW) → Flax ConvTranspose kernel
    (kH, kW, in, out); torch's ConvTranspose scatters the kernel
    unflipped while ``lax.conv_transpose`` correlates, so the spatial
    axes must be FLIPPED to make outputs agree (verified numerically in
    ``tests/test_torch_interop.py``).
  * DoubleConv Sequential indices depend on whether the block has
    dropout: [conv, act, conv, act] vs [conv, act, dropout, conv, act]
    (/root/reference/src/unet.py:28-40).

Forward-pass agreement with the reference model is ~1e-6 in float32
(bit-comparable Dice on identical inputs).
"""

from __future__ import annotations

from typing import Dict, Mapping

import jax.numpy as jnp
import numpy as np

__all__ = ["import_torch_state_dict", "export_torch_state_dict", "load_torch_checkpoint"]

# (flax module name, has_dropout) for every DoubleConv, given the default
# graded dropout schedule (/root/reference/src/unet.py:120-154)
_BLOCKS = [
    ("enc1", False),
    ("enc2", True),
    ("enc3", True),
    ("enc4", True),
    ("bottleneck", True),
    ("dec4", True),
    ("dec3", True),
    ("dec2", True),
    ("dec1", False),
]
_TRANSPOSED = ["up4", "up3", "up2", "up1"]


def _block_has_dropout(name: str, dropout: float) -> bool:
    fixed = dict(_BLOCKS)
    return fixed[name] and dropout > 0


def import_torch_state_dict(
    state_dict: Mapping[str, np.ndarray], dropout: float = 0.2
) -> Dict:
    """Reference UNet ``state_dict`` (tensors or ndarrays) → Flax params.

    ``dropout`` must match the torch model's construction (it changes
    the Sequential indices inside each DoubleConv).
    """
    sd = {k: np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)
          for k, v in state_dict.items()}
    params: Dict = {}

    for name, _ in _BLOCKS:
        conv2_idx = 3 if _block_has_dropout(name, dropout) else 2
        params[name] = {
            "conv1": {
                "kernel": jnp.asarray(sd[f"{name}.conv.0.weight"].transpose(2, 3, 1, 0)),
                "bias": jnp.asarray(sd[f"{name}.conv.0.bias"]),
            },
            "conv2": {
                "kernel": jnp.asarray(
                    sd[f"{name}.conv.{conv2_idx}.weight"].transpose(2, 3, 1, 0)
                ),
                "bias": jnp.asarray(sd[f"{name}.conv.{conv2_idx}.bias"]),
            },
        }

    for name in _TRANSPOSED:
        w = sd[f"{name}.weight"]  # (in, out, kH, kW)
        # flip spatial axes: torch scatters the kernel, lax correlates
        w = w[:, :, ::-1, ::-1].transpose(2, 3, 0, 1)  # -> (kH, kW, in, out)
        params[name] = {
            "kernel": jnp.asarray(np.ascontiguousarray(w)),
            "bias": jnp.asarray(sd[f"{name}.bias"]),
        }

    params["out_conv"] = {
        "kernel": jnp.asarray(sd["out_conv.weight"].transpose(2, 3, 1, 0)),
        "bias": jnp.asarray(sd["out_conv.bias"]),
    }
    return {"params": params}


def export_torch_state_dict(params: Dict, dropout: float = 0.2) -> Dict[str, np.ndarray]:
    """Flax params → reference UNet ``state_dict`` (numpy arrays).

    The inverse of :func:`import_torch_state_dict` — lets models trained
    on TPU be evaluated with the original PyTorch tooling.
    """
    p = params["params"] if "params" in params else params
    sd: Dict[str, np.ndarray] = {}
    for name, _ in _BLOCKS:
        conv2_idx = 3 if _block_has_dropout(name, dropout) else 2
        for flax_name, torch_idx in (("conv1", 0), ("conv2", conv2_idx)):
            k = np.asarray(p[name][flax_name]["kernel"])
            sd[f"{name}.conv.{torch_idx}.weight"] = k.transpose(3, 2, 0, 1)
            sd[f"{name}.conv.{torch_idx}.bias"] = np.asarray(p[name][flax_name]["bias"])
    for name in _TRANSPOSED:
        k = np.asarray(p[name]["kernel"])  # (kH, kW, in, out)
        sd[f"{name}.weight"] = np.ascontiguousarray(
            k.transpose(2, 3, 0, 1)[:, :, ::-1, ::-1]
        )
        sd[f"{name}.bias"] = np.asarray(p[name]["bias"])
    sd["out_conv.weight"] = np.asarray(p["out_conv"]["kernel"]).transpose(3, 2, 0, 1)
    sd["out_conv.bias"] = np.asarray(p["out_conv"]["bias"])
    return sd


def load_torch_checkpoint(path, dropout: float = 0.2) -> Dict:
    """Load a reference ``.pth`` checkpoint into Flax params (CPU torch)."""
    import torch

    state_dict = torch.load(path, map_location="cpu", weights_only=True)
    return import_torch_state_dict(state_dict, dropout=dropout)
