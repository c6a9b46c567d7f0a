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
from .train.engine import cast_float_tree

__all__ = ["Predictor", "load_image_for_inference"]


def _d4_apply(x, code: int):
    """Apply dihedral symmetry ``code`` (0-3 rot90, 4-7 rot90+flip) to NHWC."""
    k, flip = code % 4, code >= 4
    xt = jnp.rot90(x, k, axes=(1, 2))
    if flip:
        xt = xt[:, :, ::-1, :]
    return xt


def _d4_invert(x, code: int):
    k, flip = code % 4, code >= 4
    if flip:
        x = x[:, :, ::-1, :]
    return jnp.rot90(x, -k, axes=(1, 2))


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

        # outputs are promised as float32 (docstrings below) even when
        # the model computes in bf16
        def _fwd(p, x):
            return self.model.apply(p, x, deterministic=True).astype(jnp.float32)

        self._forward = jax.jit(_fwd)

        def _tta_forward(p, x):
            # all 8 dihedral symmetries as ONE 8B-image batch: one
            # dispatch (vs 8 host round trips) and a fuller MXU
            b = x.shape[0]
            xs = jnp.concatenate([_d4_apply(x, c) for c in range(8)], axis=0)
            pred = self.model.apply(p, xs, deterministic=True)
            # accumulate in OUTPUT shape/f32 (out_channels may differ
            # from in_channels)
            acc = 0.0
            for c in range(8):
                acc = acc + _d4_invert(
                    pred[c * b : (c + 1) * b], c
                ).astype(jnp.float32)
            return acc / 8.0

        self._forward_tta = jax.jit(_tta_forward)

        def _forward_many(p, x, tta):
            # ONE program for the whole set: chunking, the scan over
            # chunks, and the un-chunking all live inside the jit, so a
            # predict_device call is a single dispatch (each extra
            # dispatch costs a full round trip on a remote-attached TPU)
            n = x.shape[0]
            fwd = _tta_forward if tta else _fwd
            chunked = x.reshape((n // self.batch_size, self.batch_size) + x.shape[1:])

            def body(_, chunk):
                return None, fwd(p, chunk)

            _, preds = jax.lax.scan(body, None, chunked)
            return preds.reshape((n,) + preds.shape[2:])

        self._forward_many = jax.jit(_forward_many, static_argnums=(2,))

    @property
    def params(self):
        return self._params

    @params.setter
    def params(self, value):
        # keep the run-time (compute-dtype) copy in sync so hot-swapping
        # weights via `predictor.params = new_params` takes effect.  The
        # cast happens ONCE here instead of on every dispatch (and, in
        # predict_device's scan, once per CHUNK — 82 MB of f32→bf16
        # traffic per iteration that XLA does not hoist); identical
        # values to the cast the forward would do itself.
        self._params = value
        self._run_params = cast_float_tree(value, self.model.dtype)

    def predict_device(self, images, tta: bool = False):
        """Device-to-device batched inference: ONE dispatch, no host
        round trips — for pipelines whose images already live on device
        (or hosts whose interconnect makes per-chunk transfers costly).

        ``images``: (N, H, W, 1) array (device or host) with N a
        multiple of ``batch_size``; returns an (N, H, W, 1) float
        probability DEVICE array (fetch with ``np.asarray`` when
        needed).

        ``tta=True`` runs all 8 dihedral symmetries as one
        ``8*batch_size``-image dispatch: ~8× the peak activation memory
        of the plain path.  With a large ``batch_size`` (e.g. 128) size
        the Predictor accordingly (a ``batch_size`` of 16 with tta uses
        the same activation memory as 128 without).
        """
        x = jnp.asarray(images)
        if x.ndim == 3:
            x = x[..., None]
        if x.ndim != 4:
            raise ValueError(f"expected (N, H, W[, 1]) images, got {x.shape}")
        if tta and x.shape[1] != x.shape[2]:
            raise ValueError("tta requires square images")
        n = x.shape[0]
        if n % self.batch_size:
            raise ValueError(
                f"N={n} must be a multiple of batch_size={self.batch_size} "
                "(pad, or use predict() which pads automatically)"
            )
        return self._forward_many(self._run_params, x, tta)

    def _run_chunks(self, x: np.ndarray, forward) -> np.ndarray:
        """Dispatch every padded chunk before fetching any result — the
        fetch at the end is the only sync, so per-chunk dispatch latency
        (~200 ms through a tunnelled TPU) overlaps instead of summing."""
        n = x.shape[0]
        outs, pads = [], []
        for start in range(0, n, self.batch_size):
            chunk = x[start : start + self.batch_size]
            pad = self.batch_size - chunk.shape[0]
            if pad:
                chunk = np.concatenate(
                    [chunk, np.zeros_like(chunk[:1].repeat(pad, 0))]
                )
            outs.append(forward(self._run_params, jnp.asarray(chunk)))
            pads.append(pad)
        res = [np.asarray(o) for o in outs]
        return np.concatenate(
            [r[: self.batch_size - p] if p else r for r, p in zip(res, pads)]
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
        Requires square inputs.  The 8 symmetries run as ONE
        ``8*batch_size``-image batch, so peak activation memory is ~8×
        the plain path — use a smaller ``batch_size`` if a large one
        OOMs with tta.
        """
        x = np.asarray(images, np.float32)
        if x.ndim == 3:
            x = x[..., None]

        if tta and x.shape[1] != x.shape[2]:
            raise ValueError("tta requires square images")
        probs = self._run_chunks(x, self._forward_tta if tta else self._forward)
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
