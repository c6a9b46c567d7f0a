"""Sharded training programs: data-parallel (+ optional spatial) epochs.

Idiomatic JAX SPMD: ONE program with sharding annotations; XLA's
partitioner splits the batch over the ``data`` axis (and optionally
image height over ``space``), inserts the gradient all-reduce over ICI,
and keeps optimizer state replicated.  There is no hand-written
communication — this module only decides *placements*.

Design note: the dataset stays replicated (cell datasets are tiny
relative to HBM) and each device slices its share of every batch
locally via a sharding constraint — zero input communication.  The
gradient psum is the only per-step collective in the data-parallel
path.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..train.engine import (
    TrainState,
    make_eval_epoch_fn,
    make_train_epoch_fn,
)
from ..train.objective import LossConfig
from .mesh import DATA_AXIS, SPACE_AXIS

__all__ = [
    "make_sharded_epoch_fns",
    "shard_train_state",
    "make_sharded_train_step",
]


def _batch_constraint(mesh: Mesh, spatial: bool):
    spec = P(DATA_AXIS, SPACE_AXIS) if spatial else P(DATA_AXIS)

    def constrain(x):
        ndim_spec = spec + (None,) * (x.ndim - len(spec))
        return jax.lax.with_sharding_constraint(
            x, NamedSharding(mesh, P(*ndim_spec))
        )

    return constrain


def shard_train_state(state: TrainState, mesh: Mesh) -> TrainState:
    """Replicate params/optimizer over the mesh (pure data parallelism).

    Works on single-process meshes (plain ``device_put``) and on
    multi-process global meshes, where ``device_put`` to a
    non-addressable sharding is invalid: every process holds the full
    (identically-seeded) state, so each leaf is promoted to a global
    replicated array from its process-local copy
    (tests/test_distributed.py executes this path across 2 processes).
    """
    sharding = NamedSharding(mesh, P())
    if sharding.is_fully_addressable:
        return jax.device_put(state, sharding)

    import numpy as np

    def promote(leaf):
        if jax.dtypes.issubdtype(getattr(leaf, "dtype", None), jax.dtypes.prng_key):
            data = jax.make_array_from_process_local_data(
                sharding, np.asarray(jax.random.key_data(leaf))
            )
            return jax.random.wrap_key_data(data, impl=jax.random.key_impl(leaf))
        return jax.make_array_from_process_local_data(sharding, np.asarray(leaf))

    return jax.tree_util.tree_map(promote, state)


def make_sharded_epoch_fns(
    model,
    loss_cfg: LossConfig,
    mesh: Mesh,
    *,
    spatial: bool = False,
    compute_metrics: bool = True,
):
    """(train_epoch_fn, eval_epoch_fn) sharded over the mesh.

    Same signatures/semantics as the single-device versions in
    :mod:`..train.engine` — a drop-in for `train_stage`.  ``spatial=True``
    additionally shards image height over the ``space`` axis (XLA
    auto-halos the convolutions and stencils).
    """
    constrain = _batch_constraint(mesh, spatial)
    train_fn = make_train_epoch_fn(
        model, loss_cfg, compute_metrics=compute_metrics, constrain_batch=constrain
    )
    eval_fn = make_eval_epoch_fn(
        model, loss_cfg, compute_metrics=compute_metrics, constrain_batch=constrain
    )
    return train_fn, eval_fn


def make_sharded_train_step(
    model,
    loss_cfg: LossConfig,
    mesh: Mesh,
    *,
    spatial: bool = True,
    halo_physics: bool = False,
):
    """Single jitted train step with explicit input shardings — the unit
    the driver's multichip dry-run exercises, and the building block for
    streaming (non-resident) datasets.

    Returns ``step(state, x, y) -> (state, loss)`` with ``x``/``y``
    expected sharded as ``P('data'[, 'space'])``.

    ``halo_physics=True`` (requires ``spatial``): the physics terms are
    computed by the explicit shard_map pipeline — `ppermute` halo
    exchange + fused Pallas padded-block kernel + psum
    (:func:`..parallel.halo.halo_physics_loss_pallas`) — instead of
    letting the SPMD partitioner slice the stencils.  Numerically
    identical; this is the deterministic-communication path for
    megapixel fields.
    """
    from ..train.objective import make_loss_and_components

    if halo_physics and not spatial:
        raise ValueError("halo_physics requires spatial=True")
    if halo_physics and loss_cfg.uses_physics:
        from ..ops import losses as L
        from .halo import halo_physics_loss_pallas

        def loss_fn(pred, y, mask=None):
            total = L.dice_bce_loss(
                pred, y, loss_cfg.dice_weight, loss_cfg.bce_weight, loss_cfg.smooth
            )
            rd, pf = halo_physics_loss_pallas(
                pred[..., 0],
                mesh,
                loss_cfg.diffusion_coeff,
                loss_cfg.reaction_threshold,
                loss_cfg.epsilon,
                loss_cfg.use_reaction_term,
                batch_axis=DATA_AXIS,
            )
            total = (
                total
                + loss_cfg.pde_weight * rd
                + loss_cfg.phase_field_weight * pf
            )
            return total, {}
    else:
        loss_fn = make_loss_and_components(loss_cfg)

    constrain = _batch_constraint(mesh, spatial)
    repl = NamedSharding(mesh, P())
    batch_spec = P(DATA_AXIS, SPACE_AXIS) if spatial else P(DATA_AXIS)
    data_sh = NamedSharding(mesh, batch_spec)

    def step(state: TrainState, x, y):
        x, y = constrain(x), constrain(y)
        dropout_key = jax.random.fold_in(state.dropout_key, state.step)

        def loss_of(params):
            pred = model.apply(
                params, x, deterministic=False, rngs={"dropout": dropout_key}
            )
            total, _ = loss_fn(pred, y)
            return total

        loss, grads = jax.value_and_grad(loss_of)(state.params)
        return state.apply_gradients(grads), loss

    return jax.jit(
        step,
        in_shardings=(repl, data_sh, data_sh),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )
