"""Batched sensitivity sweeps: one compiled launch for a whole S1/S2/S3 grid.

The reference runs sensitivity studies as a serial loop of full training
runs — 16 trainings for S1+S2+S3 (/root/reference/run_ablation.py:120-224,
SURVEY.md §3.4).  On TPU the grid members differ only in *scalar* loss
hyper-parameters (a, D, ε, λ_RD, λ_PF), so the whole grid vmaps:

* Stage I (Dice+BCE) is IDENTICAL for every member — same seed, same
  data subset, same loss — so it trains ONCE and its weights seed all
  members.
* Stage II trains all members simultaneously: `lax.scan` over epochs of
  a vmapped member-epoch, with the member axis running through params,
  optimizer state and the loss scalars.  One train step for M members
  costs ~1 step of batch M·B — near-perfect MXU utilisation versus the
  reference's serial sweep.
* Early stopping is exact per member: the reference stops *updating*
  and keeps the stopping epoch's weights
  (/root/reference/src/train.py:32-81,384-389); here a per-member
  ``stopped`` flag masks parameter/optimizer updates from the next
  epoch on, which reproduces those semantics bit-for-bit while keeping
  the program shape static.  Per-member CSVs are truncated at each
  member's stop epoch.

Faithfulness caveat (documented, inherent to batching): all members
share Stage-I weights and the per-epoch shuffle order.  In the
reference each variant *also* shares these in expectation (same seed
42 → same torch shuffle sequence, same Stage-I trajectory), so the
batched sweep matches the serial semantics member-for-member.
"""

from __future__ import annotations

import json
from datetime import datetime
from pathlib import Path
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pandas as pd

from ..data import (
    CocoSegmentationSource,
    DeviceDataset,
    epoch_batch_indices,
    subset_fraction_indices,
)
from ..models import UNet
from ..ops import losses, metrics as M, pde
from ..train.checkpoint import load_params, save_params
from ..train.csvlog import save_metrics_to_csv
from ..train.engine import (
    EarlyStopping,
    cast_float_tree,
    create_train_state,
    make_eval_epoch_fn,
    make_train_epoch_fn,
    train_stage,
)
from ..train.evaluation import evaluate_model
from ..train.objective import LossConfig
from .ablation import AblationConfig

__all__ = ["run_batched_sweep", "run_batched_study", "sweep_scalars_from_variants"]


def sweep_scalars_from_variants(variants: List[AblationConfig]) -> Dict[str, np.ndarray]:
    """Stack each variant's scalar loss hyper-parameters into (M,) arrays."""
    return {
        "pde_weight": np.asarray([v.pde_weight for v in variants], np.float32),
        "phase_field_weight": np.asarray(
            [v.phase_field_weight for v in variants], np.float32
        ),
        "diffusion_coeff": np.asarray([v.diffusion_coeff for v in variants], np.float32),
        "reaction_threshold": np.asarray(
            [v.reaction_threshold for v in variants], np.float32
        ),
        "epsilon": np.asarray([v.epsilon for v in variants], np.float32),
    }


def _member_loss(pred, y, mask, sc):
    """Dice+BCE+physics with *runtime* scalar hyper-parameters.

    Unlike LossConfig (static, jit-specialised), the scalars here are
    traced arrays so one compiled program serves every grid member.
    λ terms multiply unconditionally (weight 0 disables a term exactly).
    """
    total = losses.dice_bce_loss(pred, y, mask=mask)
    u = pred * mask
    n_valid = jnp.sum(mask) * (pred.size / mask.size)
    scale = pred.size / n_valid
    r = sc["diffusion_coeff"] * pde.laplacian(u) + pde.reaction_term(
        u, sc["reaction_threshold"]
    )
    r = r * mask
    rd = jnp.mean(r * r) * scale
    gms = pde.gradient_magnitude_sq(u) * mask
    dw = (u * u) * ((1.0 - pred) ** 2) * mask
    pf = jnp.mean(
        (sc["epsilon"] / 2.0) * gms + (1.0 / sc["epsilon"]) * dw
    ) * scale
    total = total + sc["pde_weight"] * rd + sc["phase_field_weight"] * pf
    comps = {
        "dice_loss": losses.soft_dice_loss(pred, y, mask=mask),
        "bce_loss": losses.bce_loss(pred, y, mask=mask),
        "pde_loss": rd,
        "phase_field_loss": pf,
    }
    return total, comps


def run_batched_sweep(
    model: UNet,
    init_params,
    scalars: Dict[str, np.ndarray],
    train_data: DeviceDataset,
    val_data: DeviceDataset,
    *,
    num_epochs: int,
    batch_size: int,
    learning_rate: float,
    early_stopping_patience: int = 10,
    min_delta: float = 1e-4,
    shuffle_key: Optional[jax.Array] = None,
    seed: int = 42,
    member_seeds: Optional[np.ndarray] = None,
    param_carry_dtype=None,
) -> Dict:
    """Train M grid members simultaneously from ``init_params``.

    ``init_params`` may be a single pytree (broadcast to all members —
    the sensitivity-sweep case, where every serial run would share the
    same seed-42 init and dropout stream) or a stacked pytree with a
    leading member axis (multi-seed replication).  ``member_seeds``
    gives each member its own dropout stream; by default all members
    share one stream, matching the serial reference where every variant
    reseeds to the same value (/root/reference/src/ablation.py:216-220).

    Returns dict with stacked ``params`` (leading axis M), ``stop_epoch``
    (M,), and ``history`` — per-epoch per-member metric arrays of shape
    (E, M) covering the 17-column CSV schema.
    """
    m_count = len(next(iter(scalars.values())))
    scalars_dev = {k: jnp.asarray(v) for k, v in scalars.items()}
    tx = optax.adamw(learning_rate=learning_rate, weight_decay=1e-5)

    leaves = jax.tree_util.tree_leaves(init_params)
    already_stacked = all(
        leaf.ndim > 0 and leaf.shape[0] == m_count for leaf in leaves
    ) and m_count > 1
    if already_stacked:
        stacked_params = init_params
    else:
        stacked_params = jax.tree_util.tree_map(
            lambda p: jnp.broadcast_to(p[None], (m_count,) + p.shape), init_params
        )
    stacked_opt = jax.vmap(tx.init)(stacked_params)
    if member_seeds is not None:
        dropout_keys = jax.vmap(jax.random.key)(jnp.asarray(member_seeds))
    else:
        # one shared dropout stream — serial-reference parity
        dropout_keys = jnp.broadcast_to(
            jax.random.key(seed), (m_count,)
        )

    if shuffle_key is None:
        shuffle_key = jax.random.key(seed + 1)
    epoch_plans = [
        epoch_batch_indices(
            train_data.n, batch_size, shuffle=True,
            key=jax.random.fold_in(shuffle_key, e),
        )
        for e in range(num_epochs)
    ]
    idx_all = jnp.stack([p[0] for p in epoch_plans])  # (E, nb, B)
    valid_all = jnp.stack([p[1] for p in epoch_plans])
    val_idx, val_valid = epoch_batch_indices(val_data.n, batch_size, shuffle=False)

    images, masks = train_data.images, train_data.masks
    vimages, vmasks = val_data.images, val_data.masks

    def member_train_epoch(params, opt_state, dkey, step, sc, idx, valid):
        # bf16 param carry across the batch scan (see engine.py
        # _make_epoch_fns): recomputed each epoch AFTER the masked-ES
        # freeze, so stopping semantics are untouched.
        params_c0 = (
            None
            if param_carry_dtype is None
            else cast_float_tree(params, param_carry_dtype)
        )

        def body(carry, batch):
            params, params_c, opt_state, step = carry
            idx_b, valid_b = batch
            x = images[idx_b]
            y = masks[idx_b]
            mask = valid_b.reshape((-1,) + (1,) * (x.ndim - 1))
            key = jax.random.fold_in(dkey, step)

            def loss_of(p):
                pred = model.apply(p, x, deterministic=False, rngs={"dropout": key})
                total, comps = _member_loss(pred, y, mask, sc)
                return total, (pred, comps)

            (total, (pred, comps)), grads = jax.value_and_grad(loss_of, has_aux=True)(
                params if params_c is None else params_c
            )
            if params_c is not None:
                grads = jax.tree_util.tree_map(
                    lambda g, p: g.astype(p.dtype), grads, params
                )
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            params_c = (
                None
                if params_c is None
                else cast_float_tree(params, param_carry_dtype)
            )
            p2, y2 = pred[..., 0], y[..., 0]
            v = valid_b
            out = {
                "loss": total,
                **comps,
                "dice_sum": jnp.sum(M.dice_score_per_sample(p2, y2) * v),
                "iou_sum": jnp.sum(M.iou_score_per_sample(p2, y2) * v),
                "bf1_sum": jnp.sum(M.boundary_f1_per_sample(p2, y2) * v),
                "n": jnp.sum(v),
            }
            return (params, params_c, opt_state, step + 1), out

        (params, _, opt_state, step), scanned = jax.lax.scan(
            body, (params, params_c0, opt_state, step), (idx, valid)
        )
        n = jnp.sum(scanned["n"])
        results = {
            k: jnp.mean(scanned[k])
            for k in ("loss", "dice_loss", "bce_loss", "pde_loss", "phase_field_loss")
        }
        results["dice_score"] = jnp.sum(scanned["dice_sum"]) / n
        results["iou_score"] = jnp.sum(scanned["iou_sum"]) / n
        results["boundary_f1_score"] = jnp.sum(scanned["bf1_sum"]) / n
        return params, opt_state, step, results

    def member_val_epoch(params, sc):
        def body(_, batch):
            idx_b, valid_b = batch
            x = vimages[idx_b]
            y = vmasks[idx_b]
            mask = valid_b.reshape((-1,) + (1,) * (x.ndim - 1))
            pred = model.apply(params, x, deterministic=True)
            total, comps = _member_loss(pred, y, mask, sc)
            p2, y2 = pred[..., 0], y[..., 0]
            m2 = valid_b.reshape((-1, 1, 1))
            v = valid_b
            out = {
                "loss": total,
                **comps,
                "global_dice": M.dice_score(p2, y2, mask=m2),
                "dice_sum": jnp.sum(M.dice_score_per_sample(p2, y2) * v),
                "iou_sum": jnp.sum(M.iou_score_per_sample(p2, y2) * v),
                "bf1_sum": jnp.sum(M.boundary_f1_per_sample(p2, y2) * v),
                "n": jnp.sum(v),
            }
            return None, out

        _, scanned = jax.lax.scan(body, None, (val_idx, val_valid))
        n = jnp.sum(scanned["n"])
        results = {
            k: jnp.mean(scanned[k])
            for k in ("loss", "dice_loss", "bce_loss", "pde_loss", "phase_field_loss")
        }
        results["dice_score"] = jnp.mean(scanned["global_dice"])
        results["iou_score"] = jnp.sum(scanned["iou_sum"]) / n
        results["boundary_f1_score"] = jnp.sum(scanned["bf1_sum"]) / n
        return results

    def epoch_step(carry, epoch_plan):
        params, opt_state, step, es = carry
        idx, valid = epoch_plan

        new_params, new_opt, new_step, train_res = jax.vmap(
            member_train_epoch, in_axes=(0, 0, 0, 0, 0, None, None)
        )(params, opt_state, dropout_keys, step, scalars_dev, idx, valid)

        # freeze members that already stopped (exact reference ES semantics)
        keep = lambda new, old: jax.vmap(
            lambda n, o, s: jax.tree_util.tree_map(
                lambda a, b: jnp.where(s, b, a), n, o
            ),
            in_axes=(0, 0, 0),
        )(new, old, es["stopped"])
        params = keep(new_params, params)
        opt_state = keep(new_opt, opt_state)
        step = jnp.where(es["stopped"], step, new_step)

        val_res = jax.vmap(member_val_epoch, in_axes=(0, 0))(params, scalars_dev)
        score = val_res["dice_score"]

        first = es["epoch"] == 0
        improved = score > es["best"] + min_delta
        active = jnp.logical_not(es["stopped"])
        new_best = jnp.where(active & (first | improved), score, es["best"])
        new_counter = jnp.where(
            active & jnp.logical_not(first),
            jnp.where(improved, 0, es["counter"] + 1),
            es["counter"],
        )
        newly_stopped = active & (new_counter >= early_stopping_patience)
        es_next = {
            "best": new_best,
            "counter": new_counter,
            "stopped": es["stopped"] | newly_stopped,
            "epoch": es["epoch"] + 1,
            # stop_epoch = last epoch that actually trained (1-indexed)
            "stop_epoch": jnp.where(
                newly_stopped, es["epoch"] + 1, es["stop_epoch"]
            ),
        }
        history = {
            "active": active,
            **{f"train_{k}": v for k, v in train_res.items()},
            **{f"val_{k}": v for k, v in val_res.items()},
        }
        return (params, opt_state, step, es_next), history

    es0 = {
        "best": jnp.full((m_count,), -jnp.inf),
        "counter": jnp.zeros((m_count,), jnp.int32),
        "stopped": jnp.zeros((m_count,), bool),
        "epoch": jnp.zeros((), jnp.int32),
        "stop_epoch": jnp.full((m_count,), num_epochs, jnp.int32),
    }
    steps0 = jnp.zeros((m_count,), jnp.int32)

    @jax.jit
    def run(stacked_params, stacked_opt):
        (params, opt_state, _, es), history = jax.lax.scan(
            epoch_step, (stacked_params, stacked_opt, steps0, es0), (idx_all, valid_all)
        )
        return params, es, history

    params, es, history = run(stacked_params, stacked_opt)
    return {
        "params": params,
        "stop_epoch": np.asarray(es["stop_epoch"]),
        "best_val_dice": np.asarray(es["best"]),
        "history": {k: np.asarray(v) for k, v in history.items()},  # (E, M)
    }


def _member_epoch_rows(history: Dict[str, np.ndarray], member: int, stop_epoch: int):
    """17-column CSV rows for one member, truncated at its stop epoch."""
    rows = []
    for e in range(stop_epoch):
        row = {"epoch": e + 1}
        for prefix in ("train", "val"):
            for k in (
                "loss", "dice_loss", "bce_loss", "pde_loss", "phase_field_loss",
                "dice_score", "iou_score", "boundary_f1_score",
            ):
                key = f"{prefix}_{k}"
                if key in history:
                    row[key] = float(history[key][e, member])
        rows.append(row)
    return rows


def run_batched_study(
    ablation_name: str,
    variants: List[AblationConfig],
    *,
    train_dir=None,
    train_json=None,
    val_dir=None,
    val_json=None,
    in_dist_test_dir=None,
    in_dist_test_json=None,
    out_dist_test_dir=None,
    out_dist_test_json=None,
    datasets: Optional[Dict[str, DeviceDataset]] = None,
    batch_size: int = 8,
    learning_rate: float = 1e-4,
    stage1_epochs: int = 50,
    stage2_epochs: int = 50,
    early_stopping_patience: int = 10,
    output_dir=None,
    precision: str = "bf16",
    base_channels: int = 64,
    resume_from=None,
) -> Dict:
    """Run a sensitivity study (S1/S2/S3-shaped) as one batched launch.

    Produces the same artifact layout as
    :func:`..experiments.ablation.run_ablation_study` (results JSON,
    summary CSVs, per-member stage CSVs and model files) with
    ``"batched": true`` recorded in the results JSON.

    ``resume_from``: path to an interrupted batched run's
    ``{name}_{timestamp}`` folder.  If it holds
    ``shared_baseline_after_stage1.msgpack``, the shared Stage I is
    loaded from it instead of retrained; Stage II (one compiled
    launch) restarts from that state.  Stage-I resume is the useful
    granularity here — on a CPU-fallback host Stage I is hours while a
    warm Stage II relaunch is the engine's normal unit of work.
    """
    # sweepability: members may differ only in scalar loss params
    base = variants[0]
    for v in variants:
        if (
            v.seed != base.seed
            or v.train_fraction != base.train_fraction
            or not v.use_two_stage
            or not v.use_pde
            or v.use_three_stage
            or not v.use_reaction_term
            or v.output_activation != base.output_activation
            or v.intermediate_activation != base.intermediate_activation
        ):
            raise ValueError(
                f"variant {v.name} is not batchable with {base.name}; "
                "use run_ablation_study for heterogeneous grids"
            )

    results_root = (
        Path(output_dir) if output_dir is not None else Path.cwd() / "output" / "ablation"
    )
    timestamp = datetime.now().strftime("%Y%m%d_%H%M%S")
    stage1_ckpt = None
    if resume_from is not None:
        ablation_folder = Path(resume_from)
        if not ablation_folder.is_dir():
            raise FileNotFoundError(f"resume_from folder not found: {ablation_folder}")
        prefix = f"{ablation_name}_"
        if ablation_folder.name.startswith(prefix):
            # keep the interrupted run's timestamp in artifact names
            timestamp = ablation_folder.name[len(prefix):]
        candidate = ablation_folder / "shared_baseline_after_stage1.msgpack"
        if candidate.exists():
            stage1_ckpt = candidate
    else:
        ablation_folder = results_root / f"{ablation_name}_{timestamp}"
    ablation_folder.mkdir(parents=True, exist_ok=True)

    print("=" * 70)
    print(f"BATCHED ABLATION STUDY: {ablation_name} ({len(variants)} members, one launch)")
    print("=" * 70)

    if datasets is None:

        def load(d, j):
            src = CocoSegmentationSource(Path(d), Path(j))
            return DeviceDataset.from_numpy(src.images, src.masks)

        datasets = {
            "train": load(train_dir, train_json),
            "val": load(val_dir, val_json),
            "in_dist": load(in_dist_test_dir, in_dist_test_json),
            "out_dist": load(out_dist_test_dir, out_dist_test_json),
        }

    np.random.seed(base.seed)
    train_data = datasets["train"]
    if base.train_fraction is not None:
        train_data = train_data.select(
            subset_fraction_indices(train_data.n, base.train_fraction)
        )
    val_data = datasets["val"]

    dtype = jnp.bfloat16 if precision in ("bf16", "bfloat16") else jnp.float32
    model = UNet(
        in_channels=1,
        out_channels=1,
        base_channels=base_channels,
        output_activation=base.output_activation,
        intermediate_activation=base.intermediate_activation,
        param_init=base.param_init,
        dtype=dtype,
    )
    h, w = int(train_data.images.shape[1]), int(train_data.images.shape[2])
    root_key = jax.random.key(base.seed)
    init_key, shuffle_key = jax.random.split(root_key)

    # ------------------------------------------------ Stage I (shared)
    dicebce = LossConfig(backend="auto")
    state = create_train_state(
        model, init_key, learning_rate, input_shape=(1, h, w, 1)
    )
    if stage1_ckpt is not None:
        print(f"\nStage I: loading shared baseline from {stage1_ckpt.name} (resume)")
        shared_params = load_params(stage1_ckpt, state.params)
    else:
        print("\nStage I: Baseline Training (shared across all members)")
        state, _, _, _ = train_stage(
            state,
            make_train_epoch_fn(
                model,
                dicebce,
                # bf16 param carry (engine.py), ~4% faster; None in f32 mode
                param_carry_dtype=dtype if dtype != jnp.float32 else None,
            ),
            make_eval_epoch_fn(model, dicebce),
            train_data,
            val_data,
            batch_size=batch_size,
            num_epochs=stage1_epochs,
            stage_name="Stage I",
            shuffle_key=jax.random.fold_in(shuffle_key, 1),
            early_stopping=EarlyStopping(early_stopping_patience, 1e-4, "max"),
            verbose=False,
            csv_path=ablation_folder / "shared_stage1_metrics.csv",
        )
        shared_params = state.params
        save_params(shared_params, ablation_folder / "shared_baseline_after_stage1.msgpack")
    baseline_metrics = {
        "in_dist": evaluate_model(model.apply, shared_params, datasets["in_dist"], batch_size),
        "out_dist": evaluate_model(model.apply, shared_params, datasets["out_dist"], batch_size),
    }

    # --------------------------------------------- Stage II (batched)
    print(f"\nStage II: batched PDE fine-tuning of {len(variants)} members")
    scalars = sweep_scalars_from_variants(variants)
    sweep = run_batched_sweep(
        model,
        shared_params,
        scalars,
        train_data,
        val_data,
        num_epochs=stage2_epochs,
        batch_size=batch_size,
        learning_rate=learning_rate,
        early_stopping_patience=early_stopping_patience,
        param_carry_dtype=dtype if dtype != jnp.float32 else None,
        shuffle_key=jax.random.fold_in(shuffle_key, 2),
        seed=base.seed,
    )

    # ------------------------------------- per-member artifacts + eval
    from ..ops.stats import compare_models_statistically

    all_results = []
    aggregated_in, aggregated_out = {}, {}
    for i, variant in enumerate(variants):
        stem = variant.name.replace(" ", "_").lower()
        member_params = jax.tree_util.tree_map(lambda p: p[i], sweep["params"])
        model_path = save_params(
            member_params, ablation_folder / f"{stem}_after_pde_stage2.msgpack"
        )
        save_metrics_to_csv(
            _member_epoch_rows(sweep["history"], i, int(sweep["stop_epoch"][i])),
            ablation_folder / f"{stem}_stage2_metrics.csv",
        )
        member_metrics = {
            "in_dist": evaluate_model(model.apply, member_params, datasets["in_dist"], batch_size),
            "out_dist": evaluate_model(model.apply, member_params, datasets["out_dist"], batch_size),
        }
        comparison = {
            d: compare_models_statistically(
                baseline_metrics[d], member_metrics[d], alpha=0.05
            )
            for d in ("in_dist", "out_dist")
        }
        result = {
            "config": variant.to_dict(),
            "model_path": str(model_path),
            "stop_epoch": int(sweep["stop_epoch"][i]),
            "best_val_dice": float(sweep["best_val_dice"][i]),
            "in_dist_metrics": {
                k: np.asarray(v).tolist() for k, v in member_metrics["in_dist"].items()
            },
            "out_dist_metrics": {
                k: np.asarray(v).tolist() for k, v in member_metrics["out_dist"].items()
            },
            "metrics": {
                k: np.asarray(v).tolist() for k, v in member_metrics["in_dist"].items()
            },
            "stage_comparison": {
                d: {
                    k: {
                        kk: (bool(vv) if kk == "significant" else float(vv))
                        for kk, vv in r.items()
                    }
                    for k, r in comparison[d].items()
                }
                for d in ("in_dist", "out_dist")
            },
        }
        all_results.append(result)
        for agg, key in ((aggregated_in, "in_dist"), (aggregated_out, "out_dist")):
            agg[variant.name] = {
                m: {
                    "mean": float(np.nanmean(np.asarray(vals, np.float64))),
                    "std": 0.0,
                    "count": len(vals),
                    "values": np.asarray(vals).tolist(),
                }
                for m, vals in member_metrics[key].items()
            }
        print(
            f"  {variant.name}: stop_epoch={int(sweep['stop_epoch'][i])}, "
            f"best val dice={float(sweep['best_val_dice'][i]):.4f}, "
            f"test dice={aggregated_in[variant.name]['dice_scores']['mean']:.4f}"
        )

    results_json = ablation_folder / f"ablation_{ablation_name}_{timestamp}.json"
    with open(results_json, "w") as f:
        json.dump(
            {
                "ablation_name": ablation_name,
                "batched": True,
                "variants": [v.to_dict() for v in variants],
                "num_runs": 1,
                "results": all_results,
                "aggregated_results": aggregated_in,
                "aggregated_results_in_dist": aggregated_in,
                "aggregated_results_out_dist": aggregated_out,
            },
            f,
            indent=2,
        )

    def summary_csv(agg, suffix):
        rows = [
            {"variant": vn, "metric": m, "mean": s["mean"], "std": s["std"], "count": s["count"]}
            for vn, metrics in agg.items()
            for m, s in metrics.items()
        ]
        path = ablation_folder / f"ablation_{ablation_name}_{timestamp}_summary{suffix}.csv"
        pd.DataFrame(rows).to_csv(path, index=False)
        return path

    summary_csv(aggregated_in, "_in_dist")
    summary_csv(aggregated_out, "_out_dist")
    legacy = summary_csv(aggregated_in, "")

    print(f"\nBatched study complete. All files in: {ablation_folder}")
    return {
        "ablation_name": ablation_name,
        "results_json": str(results_json),
        "summary_csv": str(legacy),
        "aggregated_results": aggregated_in,
        "ablation_folder": str(ablation_folder),
        "stop_epochs": sweep["stop_epoch"].tolist(),
    }
