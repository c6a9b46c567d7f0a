"""Device-resident input pipeline.

The reference feeds a CUDA device from 2 DataLoader worker processes
that re-decode PIL images every epoch (/root/reference/src/train.py:620-633).
At 128×128/bs=8 a TPU step takes ~1 ms, so any per-batch host work
starves the chip.  The TPU-native pipeline instead:

1. decodes the whole split once on host (:mod:`.coco`),
2. transfers it to device (or a mesh sharding) once,
3. runs every epoch fully on-device: a `jax.random.permutation` epoch
   shuffle + gathers inside the jitted/scanned epoch program.

Ragged final batches are replaced by padded batches with a per-sample
validity mask so all shapes stay static under jit; losses/metrics mask
the padding out, which reproduces the reference's ragged-batch numerics
exactly (tested in ``tests/test_losses.py``).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "DeviceDataset",
    "num_batches",
    "epoch_batch_indices",
    "subset_fraction_indices",
]


@dataclass(frozen=True)
class DeviceDataset:
    """A split resident on device (or sharded over a mesh).

    images: (N, H, W, 1) float32 in [0, 1]
    masks:  (N, H, W, 1) float32 in {0, 1}
    """

    images: jax.Array
    masks: jax.Array

    @property
    def n(self) -> int:
        return int(self.images.shape[0])

    @classmethod
    def from_numpy(
        cls, images: np.ndarray, masks: np.ndarray, sharding=None
    ) -> "DeviceDataset":
        if sharding is not None:
            return cls(
                jax.device_put(jnp.asarray(images), sharding),
                jax.device_put(jnp.asarray(masks), sharding),
            )
        return cls(jnp.asarray(images), jnp.asarray(masks))

    def select(self, indices: np.ndarray) -> "DeviceDataset":
        idx = jnp.asarray(indices)
        return DeviceDataset(self.images[idx], self.masks[idx])


def num_batches(n: int, batch_size: int) -> int:
    """Ceil-div batch count — the reference DataLoader keeps the ragged
    final batch (drop_last=False)."""
    return -(-n // batch_size)


def epoch_batch_indices(
    n: int,
    batch_size: int,
    *,
    shuffle: bool,
    key: Optional[jax.Array] = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-epoch batching plan: ``(idx, valid)`` of shape (nb, B).

    ``idx`` indexes into the dataset (padding slots repeat index 0),
    ``valid`` is 1.0 for real samples, 0.0 for padding.  Pure function of
    the PRNG key — jit-friendly and reproducible.
    """
    nb = num_batches(n, batch_size)
    order = (
        jax.random.permutation(key, n) if shuffle else jnp.arange(n, dtype=jnp.int32)
    )
    pad = nb * batch_size - n
    valid = jnp.concatenate([jnp.ones(n, jnp.float32), jnp.zeros(pad, jnp.float32)])
    order = jnp.concatenate([order, jnp.zeros(pad, order.dtype)])
    return order.reshape(nb, batch_size), valid.reshape(nb, batch_size)


def subset_fraction_indices(
    n: int, fraction: float, rng: Optional[np.random.Generator] = None
) -> np.ndarray:
    """Low-label subset: ``int(n * fraction)`` indices without replacement.

    Semantics of /root/reference/src/train.py:511-528 — when ``rng`` is
    None the *global* NumPy RNG is used, matching the reference's
    ``np.random.choice`` after ``np.random.seed(seed)``.
    """
    subset_size = int(n * fraction)
    if rng is None:
        return np.random.choice(n, subset_size, replace=False)
    return rng.choice(n, subset_size, replace=False)
