"""Streaming input pipeline for datasets that do not fit in HBM.

The default pipeline (:mod:`.pipeline`) keeps the whole split on device
— optimal for the reference's cell datasets.  For production-scale
corpora this module streams host batches with background decode and
device prefetch:

* :class:`HostDataset` — images/masks as host numpy (optionally backed
  by a decode callback for lazy shards),
* :func:`batch_iterator` — seeded epoch shuffling + padded final batch
  with validity mask (same ragged semantics as the resident pipeline),
* :func:`prefetch_to_device` — a depth-k pipeline that stages
  ``jax.device_put`` (optionally to a mesh sharding) ahead of
  consumption on a background thread, so the host copy of batch *i+k*
  overlaps the device compute of batch *i*.

The engine consumes these through per-batch train steps
(:func:`..train.engine.make_train_step_fn`) instead of the epoch scan.
"""

from __future__ import annotations

import queue
import threading
from dataclasses import dataclass
from typing import Callable, Iterator, Optional

import jax
import numpy as np

from .pipeline import num_batches

__all__ = [
    "HostDataset",
    "batch_iterator",
    "chunk_batches",
    "prefetch_to_device",
]


@dataclass
class HostDataset:
    """A split on host memory, optionally lazily decoded.

    Either pass dense ``images``/``masks`` arrays, or a ``decode``
    callback mapping an index array -> (images, masks) chunk (e.g. reads
    from disk shards / the native rasterizer).
    """

    n: int
    images: Optional[np.ndarray] = None
    masks: Optional[np.ndarray] = None
    decode: Optional[Callable[[np.ndarray], tuple[np.ndarray, np.ndarray]]] = None

    def __post_init__(self):
        if self.images is None and self.decode is None:
            raise ValueError("need images/masks arrays or a decode callback")

    def take(self, indices: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        if self.decode is not None:
            return self.decode(indices)
        return self.images[indices], self.masks[indices]


def batch_iterator(
    data: HostDataset,
    batch_size: int,
    *,
    shuffle: bool,
    seed: int = 0,
    epoch: int = 0,
) -> Iterator[tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """Yield ``(images, masks, valid)`` host batches for one epoch.

    Final ragged batch is padded (repeating index 0) with ``valid``
    zeroed on the padding — identical numerics to the device-resident
    pipeline once losses/metrics apply the mask.
    """
    order = np.arange(data.n)
    if shuffle:
        rng = np.random.default_rng(np.random.SeedSequence([seed, epoch]))
        rng.shuffle(order)
    nb = num_batches(data.n, batch_size)
    pad = nb * batch_size - data.n
    valid = np.concatenate([np.ones(data.n, np.float32), np.zeros(pad, np.float32)])
    order = np.concatenate([order, np.zeros(pad, order.dtype)])
    for b in range(nb):
        sel = order[b * batch_size : (b + 1) * batch_size]
        images, masks = data.take(sel)
        yield images, masks, valid[b * batch_size : (b + 1) * batch_size]


def chunk_batches(
    iterator: Iterator[tuple[np.ndarray, ...]],
    k: int,
) -> Iterator[tuple[np.ndarray, ...]]:
    """Stack ``k`` consecutive ``(images, masks, valid)`` batches into
    one ``[k, B, ...]`` chunk for :func:`..train.engine.make_train_chunk_fn`.

    The final ragged chunk is padded by repeating its first batch with
    ``valid`` zeroed — every chunk has the same static shape (one XLA
    program, no recompiles) and the padding contributes nothing, the
    same masking contract as :func:`batch_iterator`'s final batch.
    """
    buf: list[tuple[np.ndarray, ...]] = []

    def emit():
        return tuple(np.stack(parts) for parts in zip(*buf))

    for item in iterator:
        buf.append(item)
        if len(buf) == k:
            yield emit()
            buf = []
    if buf:
        x0, y0, v0 = buf[0]
        buf.extend((x0, y0, np.zeros_like(v0)) for _ in range(k - len(buf)))
        yield emit()


def prefetch_to_device(
    iterator: Iterator,
    size: int = 2,
    sharding=None,
) -> Iterator:
    """Stage ``jax.device_put`` of upcoming items on a background thread.

    ``size`` is the prefetch depth; ``sharding`` optionally places each
    array onto a mesh (e.g. ``batch_sharding(mesh)``).  Exceptions in
    the producer re-raise at the consumer.
    """
    q: queue.Queue = queue.Queue(maxsize=size)
    _END = object()

    def put(item):
        if sharding is not None:
            return jax.tree_util.tree_map(
                lambda x: jax.device_put(x, sharding), item
            )
        return jax.tree_util.tree_map(jax.device_put, item)

    def producer():
        try:
            for item in iterator:
                q.put(put(item))
            q.put(_END)
        except Exception as e:  # noqa: BLE001 — forwarded to consumer
            q.put(e)

    thread = threading.Thread(target=producer, daemon=True)
    thread.start()
    while True:
        item = q.get()
        if item is _END:
            return
        if isinstance(item, Exception):
            raise item
        yield item
