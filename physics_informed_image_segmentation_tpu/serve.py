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
        self,
        images: np.ndarray,
        threshold: Optional[float] = None,
        tta: bool = False,
    ) -> np.ndarray:
        """(N, H, W[, 1]) images → probability maps (or binary masks when
        ``threshold`` is given), shape (N, H, W, 1) float32.

        ``tta=True`` averages predictions over the 8 dihedral (flip/
        rot90) symmetries — exact for segmentation (no interpolation),
        typically a small Dice gain for one extra compile + 8× compute.
        Requires square inputs.
        """
        x = np.asarray(images, np.float32)
        if x.ndim == 3:
            x = x[..., None]

        if tta:
            if x.shape[1] != x.shape[2]:
                raise ValueError("tta requires square images")
            acc = np.zeros_like(x, dtype=np.float32)
            for code in range(8):
                k, flip = code % 4, code >= 4
                xt = np.rot90(x, k, axes=(1, 2))
                if flip:
                    xt = xt[:, :, ::-1, :]
                pt = self.predict(np.ascontiguousarray(xt))
                if flip:
                    pt = pt[:, :, ::-1, :]
                acc += np.rot90(pt, -k, axes=(1, 2))
            probs = acc / 8.0
            if threshold is None:
                return probs
            return (probs > threshold).astype(np.float32)

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

    def predict_tiled(
        self,
        image: np.ndarray,
        tile: Optional[int] = None,
        overlap: int = 32,
        threshold: Optional[float] = None,
    ) -> np.ndarray:
        """Sliding-window inference for images LARGER than the trained
        field size: overlapping tiles, cosine-blended seams.

        ``image``: (H, W) or (H, W, 1) float32 in [0, 1].  Returns a
        full-resolution probability map (or binary mask) of shape
        (H, W, 1).  Pairs with the spatial-parallel training path for a
        megapixel workflow the reference cannot express.
        """
        img = np.asarray(image, np.float32)
        if img.ndim == 3:
            img = img[..., 0]
        th = tile or self.image_size[0]
        if overlap >= th:
            raise ValueError("overlap must be smaller than the tile size")
        H, W = img.shape
        stride = th - overlap

        # 1D cosine ramp window -> separable 2D blending weights
        ramp = 0.5 - 0.5 * np.cos(np.linspace(0, np.pi, overlap, dtype=np.float32))
        win1d = np.ones(th, np.float32)
        win1d[:overlap] = ramp
        win1d[-overlap:] = ramp[::-1]
        # floor the window: image borders are covered by a single tile
        # whose ramp edge must still contribute full weight after the
        # acc/wsum normalisation (w/w = 1 for any w > 0)
        win = np.maximum(np.outer(win1d, win1d), 1e-3)

        ys = list(range(0, max(H - th, 0) + 1, stride))
        xs = list(range(0, max(W - th, 0) + 1, stride))
        if ys[-1] != H - th and H > th:
            ys.append(H - th)
        if xs[-1] != W - th and W > th:
            xs.append(W - th)
        if H <= th:
            ys = [0]
        if W <= th:
            xs = [0]

        tiles, coords = [], []
        for y0 in ys:
            for x0 in xs:
                patch = np.zeros((th, th), np.float32)
                patch_src = img[y0 : y0 + th, x0 : x0 + th]
                patch[: patch_src.shape[0], : patch_src.shape[1]] = patch_src
                tiles.append(patch[..., None])
                coords.append((y0, x0, patch_src.shape[0], patch_src.shape[1]))

        preds = self.predict(np.stack(tiles))
        acc = np.zeros((H, W), np.float32)
        wsum = np.zeros((H, W), np.float32)
        for pred, (y0, x0, hh, ww) in zip(preds, coords):
            acc[y0 : y0 + hh, x0 : x0 + ww] += pred[:hh, :ww, 0] * win[:hh, :ww]
            wsum[y0 : y0 + hh, x0 : x0 + ww] += win[:hh, :ww]
        probs = (acc / np.maximum(wsum, 1e-8))[..., None]
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
