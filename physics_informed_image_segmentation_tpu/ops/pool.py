"""Fused 2x2 max-pool with a hand-written first-match backward.

``nn.max_pool`` lowers the forward to ``reduce_window`` and the
backward to ``select-and-scatter`` — on TPU the latter is slow and XLA
additionally materialises per-window argmax index tensors in the
forward to feed it (profiled at ~0.4 ms/step of the reference U-Net
workload, scripts/profile_step.py).

This implementation expresses the 2x2/stride-2 special case (the only
pooling the U-Net uses, /root/reference/src/unet.py:120-131) as a
reshape + max, and routes the cotangent with an explicit FIRST-MATCH
mask — bit-compatible with both XLA's select-and-scatter and torch's
``MaxPool2d`` backward, including ties (gradient goes to the first
maximal element in row-major window order, NOT split among ties like
``jnp.max``'s VJP would).  Everything is elementwise + static slices,
so XLA fuses forward and backward each into one VMEM pass.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["max_pool_2x2"]


def _pool_fwd_raw(x: jnp.ndarray) -> jnp.ndarray:
    b, h, w, c = x.shape
    xr = x.reshape(b, h // 2, 2, w // 2, 2, c)
    return jnp.max(jnp.max(xr, axis=4), axis=2)


@jax.custom_vjp
def max_pool_2x2(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H/2, W/2, C) max pool, k=2 s=2 (H, W even)."""
    return _pool_fwd_raw(x)


def _fwd(x):
    out = _pool_fwd_raw(x)
    return out, (x, out)


def _bwd(res, g):
    x, out = res
    b, h, w, c = x.shape
    xr = x.reshape(b, h // 2, 2, w // 2, 2, c)
    # window elements in row-major (i, j) order — the order both torch
    # and XLA's select-and-scatter use to break ties
    e00 = xr[:, :, 0, :, 0, :] == out
    e01 = xr[:, :, 0, :, 1, :] == out
    e10 = xr[:, :, 1, :, 0, :] == out
    e11 = xr[:, :, 1, :, 1, :] == out
    f00 = e00
    f01 = e01 & ~e00
    f10 = e10 & ~(e00 | e01)
    f11 = e11 & ~(e00 | e01 | e10)
    zero = jnp.zeros_like(g)
    d00 = jnp.where(f00, g, zero)
    d01 = jnp.where(f01, g, zero)
    d10 = jnp.where(f10, g, zero)
    d11 = jnp.where(f11, g, zero)
    # reassemble (B, H/2, 2, W/2, 2, C) from the four window positions
    row0 = jnp.stack([d00, d01], axis=3)  # (B, H/2, W/2, 2, C)
    row1 = jnp.stack([d10, d11], axis=3)
    dxr = jnp.stack([row0, row1], axis=2)  # (B, H/2, 2, W/2, 2, C)
    return (dxr.reshape(b, h, w, c),)


max_pool_2x2.defvjp(_fwd, _bwd)
