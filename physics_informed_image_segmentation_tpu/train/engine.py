"""Training-loop engine: jitted steps, on-device epochs, early stopping.

TPU-native redesign of the reference loop (/root/reference/src/train.py:32-391):

* The whole epoch is ONE jitted program: `lax.scan` over pre-computed
  batch indices, gathering from the device-resident dataset.  The
  reference's per-batch host work — `.item()` syncs, cv2 Boundary-F1 on
  CPU (/root/reference/src/train.py:153-160) — is replaced by on-device
  metric accumulation inside the scan; the host sees one small metrics
  dict per epoch.
* Loss components come from the same forward pass as the loss (the
  reference recomputes them under `no_grad` every batch,
  /root/reference/src/train.py:121-150).
* Optimizer state, params and dropout PRNG live in a `TrainState`
  donated to the step, so updates are in-place in HBM.
* Early stopping (patience on val Dice, min_delta, mode) is host logic
  between epoch programs, exactly like the reference
  (/root/reference/src/train.py:32-81).

Metric semantics preserved from the reference (important quirks):
  * train/val `dice_score`: the *training* epoch reports the mean of
    per-sample Dice; the *validation* epoch reports the mean over
    batches of the global-batch Dice (/root/reference/src/train.py:221-222
    vs :154,181) — these differ and early stopping keys on the latter.
  * losses are averaged per batch with equal batch weight even for the
    ragged final batch (total_loss / num_batches).
  * best-model tracking records METRICS ONLY; weights are never restored
    (/root/reference/src/train.py:311-338) — checkpoints are last-epoch
    weights.  Replicated deliberately for parity.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..ops import metrics as M
from .objective import LossConfig, make_loss_and_components

__all__ = [
    "TrainState",
    "cast_float_tree",
    "create_train_state",
    "tree_params",
    "make_train_epoch_fn",
    "make_train_epochs_fn",
    "make_train_chunk_fn",
    "make_train_step_fn",
    "make_eval_epoch_fn",
    "EarlyStopping",
    "train_stage",
]


class TrainState(struct.PyTreeNode):
    """Params + optimizer state + step counter + dropout PRNG.

    ``params`` is either the usual pytree, or — when built with
    ``create_train_state(flat=True)`` — ONE flat f32 vector with
    ``unravel`` mapping it back to the tree (bit-identical numerics;
    measured slower on TPU than tree storage because the unravel forces
    conv-kernel relayout copies — see scripts/ab_bench.py).
    """

    step: jax.Array
    params: Any
    opt_state: Any
    dropout_key: jax.Array
    apply_fn: Callable = struct.field(pytree_node=False)
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    unravel: Optional[Callable] = struct.field(pytree_node=False, default=None)

    def apply_gradients(self, grads):
        fused = getattr(self.tx, "fused_apply_gradients", None)
        if fused is not None:
            new_params, new_opt_state = fused(grads, self.opt_state, self.params)
            return self.replace(
                step=self.step + 1, params=new_params, opt_state=new_opt_state
            )
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        return self.replace(
            step=self.step + 1,
            params=optax.apply_updates(self.params, updates),
            opt_state=new_opt_state,
        )


def tree_params(state: TrainState):
    """``state.params`` as a pytree, whatever the storage mode."""
    if state.unravel is not None:
        return state.unravel(state.params)
    return state.params


def create_train_state(
    model,
    rng: jax.Array,
    learning_rate: float,
    weight_decay: float = 1e-5,
    input_shape: tuple = (1, 128, 128, 1),
    params=None,
    flat: bool = False,
    optimizer: str = "adamw",
) -> TrainState:
    """Init params (unless given) and a fresh AdamW, mirroring the
    reference's per-stage `optim.AdamW(lr, weight_decay=1e-5)`
    (/root/reference/src/train.py:658-662,722-726).

    ``optimizer``: "adamw" (default, per-leaf ``optax.adamw``),
    "flat_adamw" (flat m/v storage, bit-identical trajectories; measured
    SLOWER on TPU — the grad ravel / update unravel pay tiled<->linear
    relayout copies that exceed the 45-fusion overhead they remove,
    scripts/ab_bench.py round 2: 1176 vs 1370 img/s), "grouped_adamw"
    (only sub-1.4M-element leaves flattened into one fused update;
    also measured slower, 1265 vs 1355 — see docs/DESIGN.md §7), or
    "pallas_adamw" (bucketed multi-ref kernel; 1323 vs 1370).
    "bf16m_adamw" / "bf16mv_adamw" store the first / both AdamW moments
    in bfloat16 (f32 compute) — NON-parity approximations that cut
    optimizer HBM traffic by 25% / 50%; see
    ``optim.low_precision_adamw`` for the precision analysis.

    ``flat=True`` additionally stores params as one flat f32 vector with
    ``apply_fn`` unravelling on the fly.  Measured SLOWER on TPU (the
    unravel forces conv-kernel relayout copies, ~1 ms/step,
    scripts/ab_bench.py) — kept for experimentation, not the default.
    Use :func:`tree_params` to get the pytree back for
    eval/checkpointing.
    """
    params_key, dropout_key = jax.random.split(rng)
    if params is None:
        params = model.init(params_key, jnp.zeros(input_shape, jnp.float32))
    if optimizer == "flat_adamw":
        from .optim import flat_adamw

        tx = flat_adamw(learning_rate=learning_rate, weight_decay=weight_decay)
    elif optimizer == "grouped_adamw":
        from .optim import grouped_adamw

        tx = grouped_adamw(learning_rate=learning_rate, weight_decay=weight_decay)
    elif optimizer == "pallas_adamw":
        from .pallas_optim import pallas_adamw

        tx = pallas_adamw(learning_rate=learning_rate, weight_decay=weight_decay)
    elif optimizer == "bf16m_adamw":
        from .optim import low_precision_adamw

        tx = low_precision_adamw(
            learning_rate=learning_rate, weight_decay=weight_decay
        )
    elif optimizer == "bf16mv_adamw":
        from .optim import low_precision_adamw

        tx = low_precision_adamw(
            learning_rate=learning_rate,
            weight_decay=weight_decay,
            v_dtype=jnp.bfloat16,
        )
    elif optimizer == "adamw":
        tx = optax.adamw(learning_rate=learning_rate, weight_decay=weight_decay)
    else:
        raise ValueError(
            f"unknown optimizer {optimizer!r}; expected 'adamw', "
            "'flat_adamw', 'grouped_adamw', 'pallas_adamw', "
            "'bf16m_adamw' or 'bf16mv_adamw'"
        )
    apply_fn, unravel = model.apply, None
    if flat:
        from jax.flatten_util import ravel_pytree

        params, unravel = ravel_pytree(params)

        def apply_fn(p, *args, _unravel=unravel, _apply=model.apply, **kwargs):
            return _apply(_unravel(p), *args, **kwargs)

    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        dropout_key=dropout_key,
        apply_fn=apply_fn,
        tx=tx,
        unravel=unravel,
    )


def _batch_metrics(pred, target, valid):
    """Per-sample Dice/IoU/Boundary-F1 sums over valid samples (on-device)."""
    p2 = pred[..., 0] if pred.ndim == 4 else pred
    t2 = target[..., 0] if target.ndim == 4 else target
    dice = M.dice_score_per_sample(p2, t2)
    iou = M.iou_score_per_sample(p2, t2)
    bf1 = M.boundary_f1_per_sample(p2, t2)
    return (
        jnp.sum(dice * valid),
        jnp.sum(iou * valid),
        jnp.sum(bf1 * valid),
    )


def _sample_mask(valid, pred_ndim):
    """(B,) validity -> broadcastable mask over (B, H, W[, C])."""
    shape = (valid.shape[0],) + (1,) * (pred_ndim - 1)
    return valid.reshape(shape)


def cast_float_tree(tree, dtype):
    """Cast every floating leaf to ``dtype`` (non-float leaves pass through)."""
    return jax.tree_util.tree_map(
        lambda x: x.astype(dtype)
        if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating)
        else x,
        tree,
    )


def _make_epoch_fns(
    model,
    loss_cfg: LossConfig,
    *,
    compute_metrics: bool = True,
    pmean_axis: Optional[str] = None,
    constrain_batch=None,
    augment=None,
    compiler_options: Optional[dict] = None,
    param_carry_dtype=None,
):
    """(jitted epoch_fn, unjitted core) — shared by the one-epoch and
    multi-epoch program builders below.

    ``param_carry_dtype``: when set (to the MODEL's compute dtype, e.g.
    ``jnp.bfloat16``), a low-precision copy of the params is carried
    across scan iterations and the forward/backward runs against it;
    the f32 master params see exactly the same AdamW update (the grads
    are ``convert(low_grad, f32)`` — identical to what the cast-in-
    forward VJP produces), so trajectories are BIT-identical while the
    per-step standalone f32→bf16 weight converts move into the
    optimizer fusion and the conv fusions read half the weight bytes.
    """
    loss_fn = make_loss_and_components(loss_cfg)

    def epoch_fn(state: TrainState, images, masks, idx, valid):
        def body(carry, batch):
            state, params_c = carry
            idx_b, valid_b = batch
            x = images[idx_b]
            y = masks[idx_b]
            if constrain_batch is not None:
                x, y = constrain_batch(x), constrain_batch(y)
            mask = _sample_mask(valid_b, x.ndim)
            dropout_key = jax.random.fold_in(state.dropout_key, state.step)
            if augment is not None:
                aug_key = jax.random.fold_in(dropout_key, 1)
                x, y = augment(aug_key, x, y)

            def loss_of(params):
                pred = state.apply_fn(
                    params, x, deterministic=False, rngs={"dropout": dropout_key}
                )
                total, comps = loss_fn(pred, y, mask)
                return total, (pred, comps)

            (total, (pred, comps)), grads = jax.value_and_grad(
                loss_of, has_aux=True
            )(state.params if params_c is None else params_c)
            if params_c is not None:
                grads = jax.tree_util.tree_map(
                    lambda g, p: g.astype(p.dtype), grads, state.params
                )
            if pmean_axis is not None:
                grads = jax.lax.pmean(grads, pmean_axis)
            new_state = state.apply_gradients(grads)
            new_params_c = (
                None
                if params_c is None
                else cast_float_tree(new_state.params, param_carry_dtype)
            )

            out = {
                "loss": total,
                "dice_loss": comps["dice_loss"],
                "bce_loss": comps["bce_loss"],
                "pde_loss": comps["pde_loss"],
                "phase_field_loss": comps["phase_field_loss"],
            }
            if compute_metrics:
                d, i, b = _batch_metrics(pred, y, valid_b)
                out.update(dice_sum=d, iou_sum=i, bf1_sum=b, n=jnp.sum(valid_b))
            return (new_state, new_params_c), out

        params_c0 = None
        if param_carry_dtype is not None:
            if state.unravel is not None:
                raise ValueError(
                    "param_carry_dtype is not supported with flat param "
                    "storage (create_train_state(flat=True))"
                )
            params_c0 = cast_float_tree(state.params, param_carry_dtype)
        (state, _), scanned = jax.lax.scan(body, (state, params_c0), (idx, valid))
        results = {
            k: jnp.mean(scanned[k])
            for k in ("loss", "dice_loss", "bce_loss", "pde_loss", "phase_field_loss")
        }
        if compute_metrics:
            n = jnp.sum(scanned["n"])
            results["dice_score"] = jnp.sum(scanned["dice_sum"]) / n
            results["iou_score"] = jnp.sum(scanned["iou_sum"]) / n
            results["boundary_f1_score"] = jnp.sum(scanned["bf1_sum"]) / n
        if pmean_axis is not None:
            results = jax.lax.pmean(results, pmean_axis)
        return state, results

    return (
        jax.jit(epoch_fn, donate_argnums=(0,), compiler_options=compiler_options),
        epoch_fn,
    )


def make_train_epoch_fn(
    model,
    loss_cfg: LossConfig,
    *,
    compute_metrics: bool = True,
    pmean_axis: Optional[str] = None,
    constrain_batch=None,
    augment=None,
    compiler_options: Optional[dict] = None,
    param_carry_dtype=None,
):
    """Build the jitted one-epoch training program.

    Signature of the result:
      ``epoch_fn(state, images, masks, idx, valid) -> (state, metrics)``
    where ``idx``/``valid`` come from
    :func:`..data.pipeline.epoch_batch_indices` (shape ``(nb, B)``).

    ``pmean_axis``: when run under shard_map over a data-parallel mesh
    axis, gradients and metric sums are psum-averaged across it.
    ``constrain_batch``: optional fn applied to each gathered batch
    array — used by :mod:`..parallel.sharding` to attach
    `with_sharding_constraint` so the SPMD partitioner shards the
    compute (grads then all-reduce automatically).
    ``augment``: optional ``f(key, images, masks) -> (images, masks)``
    applied on-device per batch (see :mod:`..data.augment`).
    ``compiler_options``: optional XLA backend options for this program
    (e.g. ``{"xla_tpu_scoped_vmem_limit_kib": "65536"}``) — forwarded to
    ``jax.jit``; unlike ``XLA_FLAGS`` these reach the TPU compiler even
    through a remote-execution client.
    ``param_carry_dtype``: carry a low-precision param copy across scan
    iterations (bit-identical when it equals the model compute dtype;
    see :func:`_make_epoch_fns`).
    """
    jitted, _ = _make_epoch_fns(
        model,
        loss_cfg,
        compute_metrics=compute_metrics,
        pmean_axis=pmean_axis,
        constrain_batch=constrain_batch,
        augment=augment,
        compiler_options=compiler_options,
        param_carry_dtype=param_carry_dtype,
    )
    return jitted


def make_train_epochs_fn(
    model,
    loss_cfg: LossConfig,
    *,
    compute_metrics: bool = True,
    pmean_axis: Optional[str] = None,
    constrain_batch=None,
    augment=None,
    compiler_options: Optional[dict] = None,
    param_carry_dtype=None,
):
    """Multi-epoch training program: E epochs in ONE dispatch.

    ``fn(state, images, masks, idx, valid) -> (state, metrics)`` with
    ``idx``/``valid`` of shape ``(E, nb, B)`` (stack one
    :func:`..data.pipeline.epoch_batch_indices` plan per epoch) and each
    metric returned per-epoch with leading axis E.

    Use for fixed-epoch-budget stages and benchmarks: on a remote/
    tunnelled TPU each dispatch costs a full host round trip, and even
    locally the per-epoch dispatch + scalar sync is pure overhead when
    no host decision (early stopping) is taken between epochs.
    """
    _, core = _make_epoch_fns(
        model,
        loss_cfg,
        compute_metrics=compute_metrics,
        pmean_axis=pmean_axis,
        constrain_batch=constrain_batch,
        augment=augment,
        param_carry_dtype=param_carry_dtype,
    )

    def epochs_fn(state: TrainState, images, masks, idx, valid):
        def body(st, plan):
            return core(st, images, masks, plan[0], plan[1])

        return jax.lax.scan(body, state, (idx, valid))

    return jax.jit(
        epochs_fn, donate_argnums=(0,), compiler_options=compiler_options
    )


def make_train_step_fn(
    model,
    loss_cfg: LossConfig,
    *,
    compute_metrics: bool = True,
    pmean_axis: Optional[str] = None,
):
    """Single-batch jitted train step for STREAMING pipelines.

    ``step(state, x, y, valid) -> (state, metrics)`` with ``x``/``y``
    device batches and ``valid`` the per-sample mask from
    :func:`..data.streaming.batch_iterator`.  The device-resident epoch
    scan (:func:`make_train_epoch_fn`) is faster when data fits in HBM;
    this is the building block when it doesn't.
    """
    return jax.jit(
        _make_step_core(
            model, loss_cfg, compute_metrics=compute_metrics,
            pmean_axis=pmean_axis,
        ),
        donate_argnums=(0,),
    )


def _make_step_core(
    model,
    loss_cfg: LossConfig,
    *,
    compute_metrics: bool,
    pmean_axis: Optional[str],
):
    loss_fn = make_loss_and_components(loss_cfg)

    def step(state: TrainState, x, y, valid):
        mask = _sample_mask(valid, x.ndim)
        dropout_key = jax.random.fold_in(state.dropout_key, state.step)

        def loss_of(params):
            pred = state.apply_fn(
                params, x, deterministic=False, rngs={"dropout": dropout_key}
            )
            total, comps = loss_fn(pred, y, mask)
            return total, (pred, comps)

        (total, (pred, comps)), grads = jax.value_and_grad(loss_of, has_aux=True)(
            state.params
        )
        if pmean_axis is not None:
            grads = jax.lax.pmean(grads, pmean_axis)
        new_state = state.apply_gradients(grads)
        out = {"loss": total, **comps}
        if compute_metrics:
            d, i, b = _batch_metrics(pred, y, valid)
            out.update(dice_sum=d, iou_sum=i, bf1_sum=b, n=jnp.sum(valid))
        return new_state, out

    return step


def make_train_chunk_fn(
    model,
    loss_cfg: LossConfig,
    *,
    compute_metrics: bool = True,
    pmean_axis: Optional[str] = None,
):
    """K streaming batches per dispatch, for tunnelled / high-RTT hosts.

    ``chunk(state, xs, ys, valids) -> (state, metrics)`` where the data
    arrays carry a leading chunk axis ``[K, B, ...]`` (stack K
    consecutive :func:`..data.streaming.batch_iterator` batches with
    :func:`..data.streaming.chunk_batches`).  Runs the exact
    :func:`make_train_step_fn` body as one ``lax.scan``, so the host
    round trip per optimizer step shrinks K× while the data still
    streams from host RAM; metrics come back per-step with leading
    axis K.  Numerically equivalent to stepping the batches
    individually (same step body; only the XLA program boundary
    differs), and chunk-padding steps are bit-exact no-ops
    (``tests/test_streaming.py``).
    """
    core = _make_step_core(
        model, loss_cfg, compute_metrics=compute_metrics,
        pmean_axis=pmean_axis,
    )

    def chunk(state: TrainState, xs, ys, valids):
        def body(st, b):
            x, y, v = b
            new_st, out = core(st, x, y, v)
            # A chunk-padding step (valid all zero) must be a true no-op:
            # even zero grads would advance step count, optimizer moments
            # and weight decay, breaking per-batch equivalence.
            new_st = jax.lax.cond(
                jnp.sum(v) > 0, lambda: new_st, lambda: st
            )
            return new_st, out

        return jax.lax.scan(body, state, (xs, ys, valids))

    return jax.jit(chunk, donate_argnums=(0,))


def make_eval_epoch_fn(
    model,
    loss_cfg: LossConfig,
    *,
    compute_metrics: bool = True,
    pmean_axis: Optional[str] = None,
    constrain_batch=None,
):
    """Validation epoch program (no grads, deterministic forward).

    Reproduces `validate` (/root/reference/src/train.py:188-286): the
    reported `dice_score` is the batch-mean of the *global* thresholded
    Dice (this is what early stopping watches), while `iou_score` /
    `boundary_f1_score` are per-sample means.
    """
    loss_fn = make_loss_and_components(loss_cfg)

    def epoch_fn(params, images, masks, idx, valid):
        def body(_, batch):
            idx_b, valid_b = batch
            x = images[idx_b]
            y = masks[idx_b]
            if constrain_batch is not None:
                x, y = constrain_batch(x), constrain_batch(y)
            mask = _sample_mask(valid_b, x.ndim)
            pred = model.apply(params, x, deterministic=True)
            total, comps = loss_fn(pred, y, mask)
            p2 = pred[..., 0] if pred.ndim == 4 else pred
            y2 = y[..., 0] if y.ndim == 4 else y
            m2 = _sample_mask(valid_b, p2.ndim)
            out = {
                "loss": total,
                "dice_loss": comps["dice_loss"],
                "bce_loss": comps["bce_loss"],
                "pde_loss": comps["pde_loss"],
                "phase_field_loss": comps["phase_field_loss"],
                "global_dice": M.dice_score(p2, y2, mask=m2),
            }
            if compute_metrics:
                d, i, b = _batch_metrics(pred, y, valid_b)
                out.update(dice_sum=d, iou_sum=i, bf1_sum=b, n=jnp.sum(valid_b))
            return None, out

        _, scanned = jax.lax.scan(body, None, (idx, valid))
        results = {
            k: jnp.mean(scanned[k])
            for k in ("loss", "dice_loss", "bce_loss", "pde_loss", "phase_field_loss")
        }
        results["dice_score"] = jnp.mean(scanned["global_dice"])
        if compute_metrics:
            n = jnp.sum(scanned["n"])
            results["per_sample_dice"] = jnp.sum(scanned["dice_sum"]) / n
            results["iou_score"] = jnp.sum(scanned["iou_sum"]) / n
            results["boundary_f1_score"] = jnp.sum(scanned["bf1_sum"]) / n
        if pmean_axis is not None:
            results = jax.lax.pmean(results, pmean_axis)
        return results

    return jax.jit(epoch_fn)


class EarlyStopping:
    """Patience counter on a monitored score (/root/reference/src/train.py:32-81)."""

    def __init__(self, patience: int = 10, min_delta: float = 1e-4, mode: str = "max"):
        self.patience = patience
        self.min_delta = min_delta
        self.mode = mode
        self.counter = 0
        self.best_score: Optional[float] = None
        self.best_epoch = 0
        self.early_stop = False

    def __call__(self, score: float, epoch: int) -> bool:
        if self.best_score is None:
            self.best_score = score
            self.best_epoch = epoch
            return False
        if self.mode == "max":
            improved = score > self.best_score + self.min_delta
        else:
            improved = score < self.best_score - self.min_delta
        if improved:
            self.best_score = score
            self.best_epoch = epoch
            self.counter = 0
        else:
            self.counter += 1
            if self.counter >= self.patience:
                self.early_stop = True
        return self.early_stop


def _nested_metrics_from_row(row: dict) -> dict:
    """Invert the flat epoch-CSV row back into the ``{"train": {...},
    "val": {...}}`` shape ``train_stage`` tracks for best-epoch metrics
    (used when replaying completed epochs on resume)."""
    train: dict = {}
    val: dict = {}
    for k, v in row.items():
        if k.startswith("train_"):
            train[k[len("train_"):]] = float(v)
        elif k.startswith("val_"):
            val[k[len("val_"):]] = float(v)
    return {"train": train, "val": val}


def train_stage(
    state: TrainState,
    train_epoch_fn,
    eval_epoch_fn,
    train_data,
    val_data,
    *,
    batch_size: int,
    num_epochs: int,
    stage_name: str,
    shuffle_key: jax.Array,
    early_stopping: Optional[EarlyStopping] = None,
    verbose: bool = True,
    csv_path=None,
    epoch_callback=None,
    checkpoint_dir=None,
    checkpoint_every: int = 0,
    checkpoint_keep: Optional[int] = 2,
    timing_out: Optional[dict] = None,
    save_best_path=None,
    initial_metrics: Optional[list[dict]] = None,
) -> tuple[TrainState, dict, int, list[dict]]:
    """Host-side stage loop (/root/reference/src/train.py:289-391).

    Returns ``(state, best_metrics, best_epoch, all_epoch_metrics)``.
    ``best_metrics`` tracks the best val-Dice epoch's metrics only — the
    returned ``state`` is the LAST epoch's (reference parity).

    ``checkpoint_dir``/``checkpoint_every``: save a full Orbax
    train-state (params+optimizer+step+PRNG) every N epochs — the
    resume capability the reference lacks (SURVEY.md §5); restore with
    :func:`.checkpoint.restore_train_state`.  ``checkpoint_keep``
    bounds retention to the newest N step checkpoints (default 2;
    ``None`` keeps all — a full state is ~250 MB at base_channels=64).

    ``initial_metrics``: resume support — epoch rows already completed
    by an interrupted run (``state`` must be the matching restored
    train-state).  They are replayed through the identical best-val-Dice
    tracking and early-stopping logic, then training continues at epoch
    ``len(initial_metrics)``.  Because shuffle keys fold in the epoch
    index and dropout keys fold in ``state.step``, a resumed stage is
    bit-identical to an uninterrupted one.

    ``timing_out``: optional dict filled with ``epoch_seconds`` and
    ``steady_state_images_per_sec`` (first epoch excluded — it includes
    XLA compilation).

    ``save_best_path``: opt-in fix for the reference's
    best-weights-never-restored quirk — when set, the params of every
    new best-val-Dice epoch are saved there (msgpack).  The returned
    state remains the LAST epoch's (default reference semantics).

    Fault injection (test hook for the resume path): setting the env
    var ``PIIS_FAULT_AFTER="<stage_name>:<epoch>"`` raises
    ``RuntimeError`` immediately after the named stage finishes that
    epoch (after its CSV row and any checkpoint are written) —
    simulating a mid-training crash so ``train(resume=True)`` recovery
    can be exercised end-to-end (tests/test_cli.py).
    """
    import os as _os
    import time as _time

    from ..data.pipeline import epoch_batch_indices
    from .checkpoint import save_train_state
    from .csvlog import save_metrics_to_csv

    best_val_dice = 0.0
    best_epoch = 0
    best_metrics: dict = {}
    all_metrics: list[dict] = []
    epoch_seconds: list[float] = []

    n_train, n_val = train_data.n, val_data.n
    val_idx, val_valid = epoch_batch_indices(n_val, batch_size, shuffle=False)

    if initial_metrics:
        all_metrics = [dict(r) for r in initial_metrics]
        for row in all_metrics:
            vd, ep = float(row["val_dice_score"]), int(row["epoch"])
            if vd > best_val_dice:
                best_val_dice = vd
                best_epoch = ep
                best_metrics = _nested_metrics_from_row(row)
            if early_stopping is not None and early_stopping(vd, ep):
                # the interrupted run had already stopped; nothing to do
                if verbose:
                    print(
                        f"\n[resume] {stage_name}: early stopping already "
                        f"triggered at epoch {ep} in the previous run"
                    )
                if csv_path is not None:
                    save_metrics_to_csv(all_metrics, csv_path)
                if timing_out is not None:
                    timing_out["epoch_seconds"] = []
                    timing_out["steady_state_images_per_sec"] = 0.0
                return state, best_metrics, best_epoch, all_metrics
        if verbose and all_metrics:
            print(
                f"[resume] {stage_name}: {len(all_metrics)} completed "
                f"epoch(s) replayed, continuing at epoch "
                f"{len(all_metrics) + 1}/{num_epochs}"
            )

    for epoch in range(len(all_metrics), num_epochs):
        t_epoch = _time.perf_counter()
        key = jax.random.fold_in(shuffle_key, epoch)
        idx, valid = epoch_batch_indices(n_train, batch_size, shuffle=True, key=key)
        state, train_dev = train_epoch_fn(
            state, train_data.images, train_data.masks, idx, valid
        )
        val_dev = eval_epoch_fn(
            state.params, val_data.images, val_data.masks, val_idx, val_valid
        )
        # single host sync per epoch
        train_results = {k: float(v) for k, v in train_dev.items()}
        val_results = {k: float(v) for k, v in val_dev.items()}
        epoch_seconds.append(_time.perf_counter() - t_epoch)

        if val_results["dice_score"] > best_val_dice:
            best_val_dice = val_results["dice_score"]
            best_epoch = epoch + 1
            best_metrics = {"train": train_results, "val": val_results}
            if save_best_path is not None:
                from .checkpoint import save_params

                save_params(state.params, save_best_path)

        epoch_metrics = {
            "epoch": epoch + 1,
            "train_loss": train_results["loss"],
            "train_dice_loss": train_results.get("dice_loss", 0.0),
            "train_bce_loss": train_results.get("bce_loss", 0.0),
            "train_pde_loss": train_results.get("pde_loss", 0.0),
            "train_phase_field_loss": train_results.get("phase_field_loss", 0.0),
            "train_dice_score": train_results.get("dice_score", 0.0),
            "train_iou_score": train_results.get("iou_score", 0.0),
            "train_boundary_f1_score": train_results.get("boundary_f1_score", 0.0),
            "val_loss": val_results["loss"],
            "val_dice_score": val_results["dice_score"],
            "val_dice_loss": val_results.get("dice_loss", 0.0),
            "val_bce_loss": val_results.get("bce_loss", 0.0),
            "val_pde_loss": val_results.get("pde_loss", 0.0),
            "val_phase_field_loss": val_results.get("phase_field_loss", 0.0),
            "val_iou_score": val_results.get("iou_score", 0.0),
            "val_boundary_f1_score": val_results.get("boundary_f1_score", 0.0),
        }
        all_metrics.append(epoch_metrics)
        if csv_path is not None:
            save_metrics_to_csv(all_metrics, csv_path)
        if checkpoint_dir is not None and checkpoint_every > 0:
            if (epoch + 1) % checkpoint_every == 0 or epoch + 1 == num_epochs:
                save_train_state(state, checkpoint_dir, keep=checkpoint_keep)
        if epoch_callback is not None:
            epoch_callback(epoch + 1, epoch_metrics)

        fault = _os.environ.get("PIIS_FAULT_AFTER")
        if fault is not None:
            f_stage, _, f_epoch = fault.rpartition(":")
            if f_stage == stage_name and int(f_epoch) == epoch + 1:
                raise RuntimeError(
                    f"PIIS_FAULT_AFTER: injected crash after "
                    f"{stage_name} epoch {epoch + 1}"
                )

        if verbose:
            print(f"\n{stage_name} - Epoch {epoch + 1}/{num_epochs}")
            print(f"  Train Loss: {train_results['loss']:.6f}")
            print(f"    - Dice Loss: {train_results['dice_loss']:.6f}")
            print(f"    - BCE Loss: {train_results['bce_loss']:.6f}")
            if train_results.get("pde_loss", 0.0) != 0.0:
                print(f"    - PDE Loss: {train_results['pde_loss']:.6f}")
            print(f"  Val Loss: {val_results['loss']:.6f}")
            print(f"  Val Dice Score: {val_results['dice_score']:.6f}")

        if early_stopping is not None:
            if early_stopping(val_results["dice_score"], epoch + 1):
                if verbose:
                    print(f"\nEarly stopping triggered at epoch {epoch + 1}")
                    print(
                        f"Best validation Dice score: {best_val_dice:.6f} "
                        f"at epoch {best_epoch}"
                    )
                break

    if timing_out is not None:
        steady = epoch_seconds[1:] if len(epoch_seconds) > 1 else epoch_seconds
        timing_out["epoch_seconds"] = epoch_seconds
        timing_out["steady_state_images_per_sec"] = (
            n_train / (sum(steady) / len(steady)) if steady else 0.0
        )
    return state, best_metrics, best_epoch, all_metrics
