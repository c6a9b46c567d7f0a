"""On-device data augmentation (net-new; the reference's Dataset has an
unused ``transform`` hook, /root/reference/src/dataset.py:88-91, and no
augmentation anywhere).

Augmentations run INSIDE the jitted train step on device — zero host
work, fully deterministic under the training PRNG, and applied jointly
to image and mask.  The symmetry group of square images (flips +
90° rotations — the dihedral group D4) is exact for segmentation: no
interpolation, masks stay binary.

Usage:
    train_fn = make_train_epoch_fn(model, cfg, augment=d4_augment)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["d4_augment", "flip_augment"]


def _apply_d4(x: jnp.ndarray, code: jnp.ndarray) -> jnp.ndarray:
    """Apply one of the 8 square symmetries to (H, W, C) by code 0..7."""
    k = code % 4  # rotation quarter-turns

    def rot(v):
        return jax.lax.switch(
            k,
            [
                lambda a: a,
                lambda a: jnp.rot90(a, 1, axes=(0, 1)),
                lambda a: jnp.rot90(a, 2, axes=(0, 1)),
                lambda a: jnp.rot90(a, 3, axes=(0, 1)),
            ],
            v,
        )

    x = rot(x)
    return jnp.where(code >= 4, x[:, ::-1, :], x)


def d4_augment(key: jax.Array, image: jnp.ndarray, mask: jnp.ndarray):
    """Random dihedral-group (flip/rot90) augmentation per sample.

    image/mask: (B, H, W, C) with H == W.  Returns augmented (image,
    mask) with the SAME transform applied to each pair.
    """
    b = image.shape[0]
    codes = jax.random.randint(key, (b,), 0, 8)
    aug = jax.vmap(_apply_d4)
    return aug(image, codes), aug(mask, codes)


def flip_augment(key: jax.Array, image: jnp.ndarray, mask: jnp.ndarray):
    """Random horizontal/vertical flips per sample (works for H != W)."""
    b = image.shape[0]
    kh, kv = jax.random.split(key)
    h_flip = jax.random.bernoulli(kh, 0.5, (b, 1, 1, 1))
    v_flip = jax.random.bernoulli(kv, 0.5, (b, 1, 1, 1))

    def apply(x):
        x = jnp.where(h_flip, x[:, :, ::-1, :], x)
        return jnp.where(v_flip, x[:, ::-1, :, :], x)

    return apply(image), apply(mask)
