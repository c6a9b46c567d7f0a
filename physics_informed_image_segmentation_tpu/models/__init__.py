"""Model zoo."""

from .unet import ACTIVATIONS, DoubleConv, UNet, count_parameters, mish  # noqa: F401

__all__ = ["UNet", "DoubleConv", "mish", "count_parameters", "ACTIVATIONS"]
