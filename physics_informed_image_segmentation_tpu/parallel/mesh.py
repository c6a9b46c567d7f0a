"""Device mesh construction and multi-host initialisation.

The reference has no distributed support of any kind (SURVEY.md §2
P1–P3: no torch.distributed / NCCL / MPI anywhere; single device chosen
at /root/reference/src/train.py:593).  The TPU framework's
"communication backend" is this thin module: a `jax.sharding.Mesh` over
the chips plus XLA collectives chosen by the SPMD partitioner — grads
and metrics ride ICI via psum, halo exchange via collective-permute,
all compiler-scheduled.

Axes:
  * ``data``  — batch (data-parallel) axis,
  * ``space`` — image-height (spatial-parallel) axis, the CNN/stencil
    analogue of sequence/context parallelism: convolutions and the PDE
    stencils shard over H with 1-pixel halos.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_mesh",
    "initialize_distributed",
    "replicated",
    "batch_sharding",
    "batch_space_sharding",
    "DATA_AXIS",
    "SPACE_AXIS",
]

DATA_AXIS = "data"
SPACE_AXIS = "space"


def make_mesh(
    data: Optional[int] = None,
    space: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Mesh with ``(data, space)`` axes.

    ``data=None`` uses all remaining devices.  On multi-host TPU slices
    call :func:`initialize_distributed` first so ``jax.devices()`` spans
    the slice; axis order puts ``data`` outermost so gradient psum rides
    the densest ICI links.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        if n % space != 0:
            raise ValueError(f"{n} devices not divisible by space={space}")
        data = n // space
    if data * space > n:
        raise ValueError(f"mesh {data}x{space} needs {data * space} devices, have {n}")
    grid = np.asarray(devices[: data * space]).reshape(data, space)
    return Mesh(grid, (DATA_AXIS, SPACE_AXIS))


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host init (`jax.distributed.initialize`).  On TPU pods all
    arguments are auto-detected from the environment; no-op if already
    initialised.  Must run before anything touches the XLA backend
    (tested end-to-end by tests/test_distributed.py, which executes it
    across two coordinated processes)."""
    if jax.distributed.is_initialized():
        return
    jax.distributed.initialize(coordinator_address, num_processes, process_id)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """(B, H, W, C) batches sharded over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def batch_space_sharding(mesh: Mesh) -> NamedSharding:
    """(B, H, W, C) batches sharded over data (batch) AND space (height).

    XLA's SPMD partitioner auto-inserts halo exchange for every conv /
    pool / stencil touching the H dimension.
    """
    return NamedSharding(mesh, P(DATA_AXIS, SPACE_AXIS))
