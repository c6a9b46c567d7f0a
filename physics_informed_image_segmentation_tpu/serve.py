"""Inference / serving path.

The reference has no inference entry point (models can only be exercised
through the evaluation CLIs).  This module provides the production
serving piece: a :class:`Predictor` wrapping a compiled fixed-batch
forward pass with automatic padding, accepting both msgpack and
reference ``.pth`` checkpoints, plus batched helpers used by the
``predict.py`` CLI.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .models import UNet

__all__ = ["Predictor", "load_image_for_inference"]


def load_image_for_inference(path, image_size=(128, 128)) -> np.ndarray:
    """Decode one grayscale image exactly like the training pipeline
    (bilinear resize then per-image min-max normalisation,
    /root/reference/src/dataset.py:65-82)."""
    from PIL import Image

    th, tw = image_size
    img = Image.open(path).convert("L").resize((tw, th), resample=Image.BILINEAR)
    arr = np.array(img, dtype=np.float32)
    arr = (arr - arr.min()) / (arr.max() - arr.min() + 1e-8)
    return arr[..., None]


class Predictor:
    """Compiled batched inference on a trained checkpoint.

    >>> p = Predictor("models/unet_pde_regularized.msgpack")
    >>> probs = p.predict(images)            # (N, H, W, 1) in (0, 1)
    >>> masks = p.predict(images, threshold=0.5)

    Accepts msgpack artifacts (this framework) and reference ``.pth``
    checkpoints (converted through
    :mod:`.utils.torch_interop`).  Inputs are padded to the compiled
    batch size so any N works with one compilation.
    """

    def __init__(
        self,
        checkpoint_path,
        model: Optional[UNet] = None,
        batch_size: int = 8,
        image_size=(128, 128),
        precision: str = "bf16",
        base_channels: int = 64,
    ):
        dtype = jnp.bfloat16 if precision in ("bf16", "bfloat16") else jnp.float32
        self.model = model or UNet(
            in_channels=1, out_channels=1, base_channels=base_channels, dtype=dtype
        )
        self.batch_size = batch_size
        self.image_size = tuple(image_size)

        path = Path(checkpoint_path)
        h, w = self.image_size
        template = self.model.init(
            jax.random.key(0), jnp.zeros((1, h, w, 1), jnp.float32)
        )
        if path.suffix == ".pth":
            from .utils.torch_interop import load_torch_checkpoint

            self.params = load_torch_checkpoint(path)
        else:
            from .train.checkpoint import load_params

            self.params = load_params(path, template)

        self._forward = jax.jit(
            lambda p, x: self.model.apply(p, x, deterministic=True)
        )

    def predict(
        self, images: np.ndarray, threshold: Optional[float] = None
    ) -> np.ndarray:
        """(N, H, W[, 1]) images → probability maps (or binary masks when
        ``threshold`` is given), shape (N, H, W, 1) float32."""
        x = np.asarray(images, np.float32)
        if x.ndim == 3:
            x = x[..., None]
        n = x.shape[0]
        outs = []
        for start in range(0, n, self.batch_size):
            chunk = x[start : start + self.batch_size]
            pad = self.batch_size - chunk.shape[0]
            if pad:
                chunk = np.concatenate([chunk, np.zeros_like(chunk[:1].repeat(pad, 0))])
            pred = np.asarray(self._forward(self.params, jnp.asarray(chunk)))
            outs.append(pred[: self.batch_size - pad] if pad else pred)
        probs = np.concatenate(outs)
        if threshold is None:
            return probs
        return (probs > threshold).astype(np.float32)

    def predict_files(
        self, paths, threshold: Optional[float] = None
    ) -> np.ndarray:
        images = np.stack(
            [load_image_for_inference(p, self.image_size) for p in paths]
        )
        return self.predict(images, threshold=threshold)
