"""Two-stage training orchestration (the `train()` entry point).

TPU-native equivalent of /root/reference/src/train.py:531-915:

* Stage I:  Dice+BCE baseline, AdamW(lr, wd=1e-5), early stopping on
  val Dice (patience, min_delta=1e-4, mode=max).
* Stage II: Dice+BCE+λ_RD·PDE+λ_PF·phase-field fine-tuning with a
  **fresh AdamW at 0.1×lr** (/root/reference/src/train.py:719-726).
* Or single-stage PDE-from-the-start.
* Saves the two named final artifacts (`unet_baseline.msgpack`,
  `unet_pde_regularized.msgpack` — the `.pth` analogues), per-epoch
  17-column CSVs, test-set evaluation CSV+JSON, training plots.

Differences from the reference (all additive):
  * datasets are decoded once and live on device; epochs are single
    jitted programs (see :mod:`.engine`),
  * optional full-state Orbax checkpointing with resume,
  * throughput (images/sec) is measured and reported,
  * data locations are parameters instead of hard-coded repo-relative
    paths (defaults preserve the reference layout incl. its use of the
    legacy `images/testing` split, /root/reference/src/train.py:574-591).
"""

from __future__ import annotations

import time
from datetime import datetime
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data import CocoSegmentationSource, DeviceDataset, subset_fraction_indices
from ..data.pipeline import num_batches
from ..models import UNet, count_parameters
from .checkpoint import save_params
from .csvlog import save_test_metrics
from .engine import (
    EarlyStopping,
    create_train_state,
    make_eval_epoch_fn,
    make_train_epoch_fn,
    train_stage,
)
from .evaluation import evaluate_on_dataset
from .objective import LossConfig

__all__ = ["train", "load_device_dataset"]


def load_device_dataset(image_dir, annotation_file, image_size=(128, 128)) -> DeviceDataset:
    src = CocoSegmentationSource(Path(image_dir), Path(annotation_file), image_size)
    return DeviceDataset.from_numpy(src.images, src.masks)


def _read_metric_rows(csv_path: Path) -> list[dict]:
    """Load per-epoch rows from a 17-column stage CSV (resume replay).

    The stage CSV is fully rewritten every epoch, so a crash mid-write
    can leave a truncated final line; such a row (missing fields or
    unparseable numbers) and anything after it are dropped rather than
    crashing the resume.
    """
    import csv

    rows: list[dict] = []
    with open(csv_path, newline="") as f:
        for r in csv.DictReader(f):
            try:
                row = {k: (int(v) if k == "epoch" else float(v))
                       for k, v in r.items()}
            except (TypeError, ValueError):
                break  # truncated trailing row from an interrupted rewrite
            rows.append(row)
    return rows


def _rows_cover_stage(rows: list[dict], num_epochs: int, patience: int) -> bool:
    """Whether a stage CSV proves its stage ran to completion: either all
    ``num_epochs`` rows are present or early stopping (same parameters as
    the live loop) triggers within the logged epochs.  Guards against a
    stale final artifact from an older run sitting next to a newer,
    partial CSV — without this, resume would declare the stage done and
    silently continue from the wrong params."""
    if len(rows) >= num_epochs:
        return True
    from .engine import EarlyStopping

    probe = EarlyStopping(patience, 1e-4, "max")
    return any(
        probe(float(r["val_dice_score"]), int(r["epoch"])) for r in rows
    )


def _stage_resume(
    state,
    *,
    output_dir: Path,
    csv_glob: str,
    checkpoint_dir: Optional[Path],
    final_artifact: Optional[Path],
    steps_per_epoch: int,
    num_epochs: int,
    patience: int,
    verbose: bool,
    min_mtime: Optional[float] = None,
):
    """Resume plan for one stage: ``(state, initial_metrics, csv_path)``.

    Priority: (1) the stage's final artifact exists AND the CSV shows
    the stage ran to completion (all epochs logged, or early stopping
    triggered) -> load its params and replay every CSV row (the stage
    loop then runs zero new epochs).  (2) an Orbax checkpoint exists ->
    restore the full train-state and replay the CSV rows up to the
    checkpointed epoch (epochs after the last checkpoint re-run and,
    being keyed on epoch index / state.step, reproduce identically).
    (3) nothing to resume -> ``(state, None, None)``.

    A final artifact whose CSV is only partial is a STALE artifact from
    an earlier completed run in the same directories; it is ignored
    (falling through to checkpoint restore or a fresh stage) instead of
    being mistaken for this run's completion.

    The latest ``metrics_<stage>_*.csv`` under ``output_dir`` is the
    interrupted run's log; resume continues appending to that same file.
    """
    csvs = sorted(output_dir.glob(csv_glob), key=lambda p: p.stat().st_mtime)
    if not csvs:
        return state, None, None
    prev_csv = csvs[-1]
    if min_mtime is not None and prev_csv.stat().st_mtime < min_mtime:
        # Stage II always starts after Stage I finishes, so a stage-II
        # log older than the stage-I log being continued belongs to an
        # EARLIER run sharing these directories — nothing to resume.
        if verbose:
            print(f"[resume] ignoring {prev_csv.name}: older than this "
                  "run's previous stage — stale leftover from an earlier run")
        return state, None, None
    rows = _read_metric_rows(prev_csv)

    if final_artifact is not None and final_artifact.exists() and rows:
        if _rows_cover_stage(rows, num_epochs, patience):
            from .checkpoint import load_params

            params = load_params(final_artifact, template=state.params)
            if verbose:
                print(f"[resume] stage already complete: {final_artifact.name} "
                      f"+ {prev_csv.name} ({len(rows)} epochs)")
            return state.replace(params=params), rows, prev_csv
        if verbose:
            print(f"[resume] ignoring stale {final_artifact.name}: "
                  f"{prev_csv.name} covers only {len(rows)}/{num_epochs} "
                  "epochs with no early stop")

    if checkpoint_dir is not None:
        from .checkpoint import latest_checkpoint_step, restore_train_state

        step = latest_checkpoint_step(checkpoint_dir)
        if step is not None:
            state = restore_train_state(state, checkpoint_dir)
            done = int(state.step) // steps_per_epoch
            if verbose:
                print(f"[resume] restored {checkpoint_dir.name} checkpoint "
                      f"at step {int(state.step)} (= {done} epochs), "
                      f"log {prev_csv.name}")
            return state, rows[:done], prev_csv
    return state, None, None


def _precision_dtype(precision: str):
    if precision in ("bf16", "bfloat16"):
        return jnp.bfloat16
    if precision in ("f32", "float32"):
        return jnp.float32
    raise ValueError(f"unknown precision: {precision}")


def train(
    use_two_stage: bool = True,
    pde_weight: float = 1e-4,
    diffusion_coeff: float = 5.0,
    reaction_threshold: float = 0.5,
    phase_field_weight: float = 1e-4,
    epsilon: float = 0.05,
    batch_size: int = 8,
    learning_rate: float = 1e-4,
    stage1_epochs: int = 50,
    stage2_epochs: int = 50,
    early_stopping_patience: int = 10,
    train_fraction: Optional[float] = None,
    seed: int = 42,
    *,
    data_root: Optional[Path] = None,
    train_data: Optional[DeviceDataset] = None,
    val_data: Optional[DeviceDataset] = None,
    test_data: Optional[DeviceDataset] = None,
    output_dir: Optional[Path] = None,
    models_dir: Optional[Path] = None,
    precision: str = "bf16",
    physics_backend: str = "auto",
    make_plots: bool = True,
    verbose: bool = True,
    checkpoint_every: int = 0,
    checkpoint_keep: Optional[int] = 2,
    resume: bool = False,
    base_channels: int = 64,
    param_init: str = "lecun",
) -> dict:
    """Run the full two-stage (or single-stage) pipeline; returns artifacts.

    Signature and defaults mirror the reference `train()`
    (/root/reference/src/train.py:531-544); keyword-only extras are
    TPU-build additions.  Pass `train_data`/`val_data`/`test_data` to
    skip disk loading (e.g. synthetic fixtures); otherwise the reference
    directory layout under ``data_root`` is used.  ``checkpoint_every``
    > 0 writes full Orbax train-state checkpoints every N epochs under
    ``{models_dir}/checkpoints/{stage}`` (restore with
    :func:`.checkpoint.restore_train_state`); ``checkpoint_keep``
    bounds retention to the newest N per stage (default 2, ``None``
    keeps all — a full state is ~250 MB at base_channels=64).

    ``resume=True`` continues an interrupted run in the same
    ``output_dir``/``models_dir`` (same hyperparameters assumed):
    completed stages are skipped via their final ``.msgpack`` artifacts,
    a partially-trained stage restarts from its latest Orbax checkpoint
    (written when ``checkpoint_every`` > 0), completed epochs are
    replayed through the same best-tracking/early-stopping logic, and
    the interrupted run's per-epoch CSV is continued in place.  Epochs
    after the last checkpoint re-run and reproduce identically (shuffle
    keys are epoch-indexed, dropout keys step-indexed), so a resumed
    run is bit-identical to an uninterrupted one at equal precision.
    """
    # Global numpy seed: reference parity for train_fraction subsetting
    # (/root/reference/src/train.py:568-572).
    np.random.seed(seed)
    root_key = jax.random.key(seed)

    base = Path(data_root) if data_root is not None else Path.cwd()
    output_dir = Path(output_dir) if output_dir is not None else base / "output"
    models_dir = Path(models_dir) if models_dir is not None else base / "models"
    output_dir.mkdir(parents=True, exist_ok=True)
    timestamp = datetime.now().strftime("%Y%m%d_%H%M%S")

    if verbose:
        print("=" * 70)
        print("PDE-CONSTRAINED CELL SEGMENTATION TRAINING (TPU)")
        print("=" * 70)
        print(f"Devices: {jax.devices()}")
        print(
            "Training strategy: "
            + ("Two-stage" if use_two_stage else "Single-stage (PDE from start)")
        )

    # ------------------------------------------------------------------ data
    if train_data is None:
        img_dir = base / "images"
        ann_dir = img_dir / "annotation"
        if verbose:
            print("\nLoading datasets...")
        train_data = load_device_dataset(
            img_dir / "training", ann_dir / "training_annotation.json"
        )
        val_data = load_device_dataset(
            img_dir / "validation", ann_dir / "validation_annotation.json"
        )
        # NOTE: the reference's train() evaluates on the legacy
        # `images/testing` split, not the in/out-dist splits
        # (/root/reference/src/train.py:579,585).
        test_json = ann_dir / "testing_annotation.json"
        test_dir = img_dir / "testing"
        if test_dir.exists() and test_json.exists():
            test_data = load_device_dataset(test_dir, test_json)

    if train_fraction is not None:
        if verbose:
            print(
                f"Using {train_fraction * 100:.1f}% of training data "
                f"({int(train_data.n * train_fraction)} samples)"
            )
        train_data = train_data.select(
            subset_fraction_indices(train_data.n, train_fraction)
        )

    fraction_str = f"_frac{train_fraction:.2f}" if train_fraction is not None else ""
    csv_path_stage1 = output_dir / f"metrics_stage1_{timestamp}{fraction_str}.csv"
    csv_path_stage2 = output_dir / f"metrics_stage2_{timestamp}{fraction_str}.csv"

    if verbose:
        print(f"Training samples: {train_data.n}")
        print(f"Validation samples: {val_data.n}")
        print(f"Batch size: {batch_size}")

    # ----------------------------------------------------------------- model
    model = UNet(
        in_channels=1,
        out_channels=1,
        base_channels=base_channels,
        param_init=param_init,
        dtype=_precision_dtype(precision),
    )
    h, w = int(train_data.images.shape[1]), int(train_data.images.shape[2])
    input_shape = (1, h, w, 1)
    init_key, shuffle_key = jax.random.split(root_key)
    state = create_train_state(
        model, init_key, learning_rate, input_shape=input_shape
    )
    if verbose:
        print(f"\nCreating UNet model... ({count_parameters(state.params):,} params)")

    # bf16 training carries a bf16 param copy across scan iterations
    # (engine.py param_carry_dtype): same forward values, ~4% faster on
    # TPU; f32 (exact-parity) mode doesn't cast and gains nothing.
    carry_dtype = _precision_dtype(precision)
    if carry_dtype == jnp.float32:
        carry_dtype = None

    results: dict = {"timestamp": timestamp}
    stage2_loss_cfg = LossConfig(
        pde_weight=pde_weight,
        phase_field_weight=phase_field_weight,
        diffusion_coeff=diffusion_coeff,
        reaction_threshold=reaction_threshold,
        epsilon=epsilon,
        backend=physics_backend,
    )
    eval_cfg_stage1 = LossConfig(backend=physics_backend)

    n_images_trained = 0
    stage_timings: list[dict] = []
    t_start = time.perf_counter()

    if use_two_stage:
        # ================================================== STAGE I
        if verbose:
            print("\n" + "=" * 70)
            print("STAGE I: BASELINE TRAINING (Unconstrained)")
            print("=" * 70)
            print("Objective: L = L_Dice + L_BCE")
        train_fn = make_train_epoch_fn(
            model, eval_cfg_stage1, param_carry_dtype=carry_dtype
        )
        eval_fn = make_eval_epoch_fn(model, eval_cfg_stage1)
        ckpt_dir_s1 = (models_dir / "checkpoints" / "stage1"
                       if checkpoint_every > 0 else None)
        init1 = None
        if resume:
            state, init1, prev_csv = _stage_resume(
                state,
                output_dir=output_dir,
                csv_glob="metrics_stage1_*.csv",
                checkpoint_dir=ckpt_dir_s1,
                final_artifact=models_dir / "unet_baseline.msgpack",
                steps_per_epoch=num_batches(train_data.n, batch_size),
                num_epochs=stage1_epochs,
                patience=early_stopping_patience,
                verbose=verbose,
            )
            if prev_csv is not None:
                csv_path_stage1 = prev_csv
        _t_s1: dict = {}
        state, best1, best1_epoch, s1_metrics = train_stage(
            state,
            train_fn,
            eval_fn,
            train_data,
            val_data,
            batch_size=batch_size,
            num_epochs=stage1_epochs,
            stage_name="Stage I",
            shuffle_key=jax.random.fold_in(shuffle_key, 1),
            early_stopping=EarlyStopping(early_stopping_patience, 1e-4, "max"),
            verbose=verbose,
            csv_path=csv_path_stage1,
            timing_out=_t_s1,
            checkpoint_dir=ckpt_dir_s1,
            checkpoint_every=checkpoint_every,
            checkpoint_keep=checkpoint_keep,
            initial_metrics=init1,
        )
        n_images_trained += (len(s1_metrics) - len(init1 or [])) * train_data.n
        stage_timings.append(_t_s1)
        if verbose and best1:
            print(
                f"\nStage I complete. Best validation Dice: "
                f"{best1['val']['dice_score']:.6f} at epoch {best1_epoch}"
            )
        model_path_stage1 = save_params(
            state.params, models_dir / "unet_baseline.msgpack"
        )
        if verbose:
            print(f"Stage I model saved to: {model_path_stage1}")
        results.update(
            stage1={"best": best1, "best_epoch": best1_epoch, "epochs": s1_metrics},
            baseline_model=model_path_stage1,
            stage1_csv=csv_path_stage1,
        )

        # ================================================== STAGE II
        if verbose:
            print("\n" + "=" * 70)
            print("STAGE II: PDE-CONSTRAINED FINE-TUNING")
            print("=" * 70)
            print("Objective: L = L_Dice + L_BCE + λ_RD * L_RD + λ_PF * L_PF")
            print(f"  λ_RD (reaction-diffusion): {pde_weight}")
            print(f"  λ_PF (phase-field): {phase_field_weight}")
            print(f"  Diffusion coefficient (D): {diffusion_coeff}")
            print(f"  Reaction threshold (a): {reaction_threshold}")
            if phase_field_weight > 0:
                print(f"  Phase-field epsilon (ε): {epsilon}")
        stage2_lr = learning_rate * 0.1
        if verbose:
            print(
                f"  Learning rate for Stage II: {stage2_lr:.2e} "
                f"(reduced from {learning_rate:.2e})"
            )
        # fresh AdamW over the Stage-I params (/root/reference/src/train.py:722-726)
        state = create_train_state(
            model,
            jax.random.fold_in(init_key, 2),
            stage2_lr,
            input_shape=input_shape,
            params=state.params,
        )
        train_fn2 = make_train_epoch_fn(
            model, stage2_loss_cfg, param_carry_dtype=carry_dtype
        )
        eval_fn2 = make_eval_epoch_fn(model, stage2_loss_cfg)
        ckpt_dir_s2 = (models_dir / "checkpoints" / "stage2"
                       if checkpoint_every > 0 else None)
        init2 = None
        if resume:
            state, init2, prev_csv = _stage_resume(
                state,
                output_dir=output_dir,
                csv_glob="metrics_stage2_*.csv",
                checkpoint_dir=ckpt_dir_s2,
                final_artifact=models_dir / "unet_pde_regularized.msgpack",
                steps_per_epoch=num_batches(train_data.n, batch_size),
                num_epochs=stage2_epochs,
                patience=early_stopping_patience,
                verbose=verbose,
                min_mtime=(Path(csv_path_stage1).stat().st_mtime
                           if Path(csv_path_stage1).exists() else None),
            )
            if prev_csv is not None:
                csv_path_stage2 = prev_csv
        _t_s2: dict = {}
        state, best2, best2_epoch, s2_metrics = train_stage(
            state,
            train_fn2,
            eval_fn2,
            train_data,
            val_data,
            batch_size=batch_size,
            num_epochs=stage2_epochs,
            stage_name="Stage II",
            shuffle_key=jax.random.fold_in(shuffle_key, 2),
            early_stopping=EarlyStopping(early_stopping_patience, 1e-4, "max"),
            verbose=verbose,
            csv_path=csv_path_stage2,
            timing_out=_t_s2,
            checkpoint_dir=ckpt_dir_s2,
            checkpoint_every=checkpoint_every,
            checkpoint_keep=checkpoint_keep,
            initial_metrics=init2,
        )
        n_images_trained += (len(s2_metrics) - len(init2 or [])) * train_data.n
        stage_timings.append(_t_s2)
        if verbose and best2:
            print(
                f"\nStage II complete. Best validation Dice: "
                f"{best2['val']['dice_score']:.6f} at epoch {best2_epoch}"
            )
            print("\nStability checks:")
            print(f"  Final PDE loss: {best2['val']['pde_loss']:.6f}")
            print(f"  Final Dice loss: {best2['val']['dice_loss']:.6f}")
            print(f"  Final BCE loss: {best2['val']['bce_loss']:.6f}")
            if best1:
                delta = best2["val"]["dice_score"] - best1["val"]["dice_score"]
                print("\nPDE regularization effect:")
                print(f"  Dice score improvement: {delta:+.6f}")
        model_path_stage2 = save_params(
            state.params, models_dir / "unet_pde_regularized.msgpack"
        )
        if verbose:
            print(f"Stage II model saved to: {model_path_stage2}")
        results.update(
            stage2={"best": best2, "best_epoch": best2_epoch, "epochs": s2_metrics},
            pde_model=model_path_stage2,
            stage2_csv=csv_path_stage2,
        )
        plot_csvs = (csv_path_stage1, csv_path_stage2)
    else:
        # ============================================ SINGLE-STAGE
        if verbose:
            print("\n" + "=" * 70)
            print("SINGLE-STAGE TRAINING (PDE from start)")
            print("=" * 70)
        csv_path_single = output_dir / f"metrics_single_stage_{timestamp}{fraction_str}.csv"
        train_fn = make_train_epoch_fn(
            model, stage2_loss_cfg, param_carry_dtype=carry_dtype
        )
        eval_fn = make_eval_epoch_fn(model, stage2_loss_cfg)
        ckpt_dir_single = (models_dir / "checkpoints" / "single"
                           if checkpoint_every > 0 else None)
        init_s = None
        if resume:
            state, init_s, prev_csv = _stage_resume(
                state,
                output_dir=output_dir,
                csv_glob="metrics_single_stage_*.csv",
                checkpoint_dir=ckpt_dir_single,
                final_artifact=models_dir / "unet_pde_regularized.msgpack",
                steps_per_epoch=num_batches(train_data.n, batch_size),
                num_epochs=stage1_epochs,
                patience=early_stopping_patience,
                verbose=verbose,
            )
            if prev_csv is not None:
                csv_path_single = prev_csv
        _t_single: dict = {}
        state, best, best_epoch, s_metrics = train_stage(
            state,
            train_fn,
            eval_fn,
            train_data,
            val_data,
            batch_size=batch_size,
            num_epochs=stage1_epochs,
            stage_name="Training",
            shuffle_key=jax.random.fold_in(shuffle_key, 1),
            early_stopping=EarlyStopping(early_stopping_patience, 1e-4, "max"),
            verbose=verbose,
            csv_path=csv_path_single,
            timing_out=_t_single,
            checkpoint_dir=ckpt_dir_single,
            checkpoint_every=checkpoint_every,
            checkpoint_keep=checkpoint_keep,
            initial_metrics=init_s,
        )
        n_images_trained += (len(s_metrics) - len(init_s or [])) * train_data.n
        stage_timings.append(_t_single)
        model_path_stage2 = save_params(
            state.params, models_dir / "unet_pde_regularized.msgpack"
        )
        if verbose:
            print(f"Model saved to: {model_path_stage2}")
        results.update(
            single_stage={"best": best, "best_epoch": best_epoch, "epochs": s_metrics},
            pde_model=model_path_stage2,
            single_csv=csv_path_single,
        )
        plot_csvs = (csv_path_single, None)

    elapsed = time.perf_counter() - t_start
    results["images_per_sec"] = n_images_trained / elapsed if elapsed > 0 else 0.0
    steady = [
        t["steady_state_images_per_sec"] for t in stage_timings
        if t.get("steady_state_images_per_sec")
    ]
    results["steady_state_images_per_sec"] = (
        sum(steady) / len(steady) if steady else results["images_per_sec"]
    )
    results["stage_timings"] = stage_timings
    if verbose:
        print(
            f"\nThroughput: {results['steady_state_images_per_sec']:.1f} train "
            "images/sec steady-state (compile epochs excluded; "
            f"{n_images_trained} images in {elapsed:.1f}s wall incl. "
            "validation and compilation)"
        )

    if make_plots:
        try:
            from ..utils.plot import plot_training_results

            print("\n" + "=" * 70)
            print("GENERATING TRAINING PLOTS")
            print("=" * 70)
            plot_training_results(
                csv_path_stage1=plot_csvs[0],
                csv_path_stage2=plot_csvs[1],
                output_dir=output_dir,
                show_plots=False,
            )
        except Exception as e:  # plotting must never kill a finished run
            print(f"Warning: plotting failed: {e}")

    # ============================================ TEST EVALUATION
    if test_data is not None:
        if verbose:
            print("\n" + "=" * 70)
            print("TEST SET EVALUATION")
            print("=" * 70)
        if use_two_stage:
            name2 = "PDE-Constrained (Stage II)"
            test_metrics = evaluate_on_dataset(
                model.apply, state.params, test_data, batch_size, name2, verbose
            )
            save_test_metrics(
                test_metrics,
                output_dir / f"test_metrics_stage2_{timestamp}{fraction_str}",
                model_name=name2,
            )
            from .checkpoint import load_params

            stage1_params = load_params(results["baseline_model"], state.params)
            stage1_metrics = evaluate_on_dataset(
                model.apply, stage1_params, test_data, batch_size,
                "Baseline (Stage I)", verbose,
            )
            save_test_metrics(
                stage1_metrics,
                output_dir / f"test_metrics_stage1_{timestamp}{fraction_str}",
                model_name="Baseline (Stage I)",
            )
            results.update(
                test_metrics_stage2=test_metrics, test_metrics_stage1=stage1_metrics
            )
        else:
            name = "Single-Stage PDE-Constrained"
            test_metrics = evaluate_on_dataset(
                model.apply, state.params, test_data, batch_size, name, verbose
            )
            save_test_metrics(
                test_metrics,
                output_dir / f"test_metrics_single_stage_{timestamp}{fraction_str}",
                model_name=name,
            )
            results["test_metrics"] = test_metrics
    elif verbose:
        print("Warning: Test set not found — skipping test set evaluation.")

    if verbose:
        print("\n" + "=" * 70)
        print("TRAINING COMPLETE")
        print("=" * 70)
    results["final_state"] = state
    results["model"] = model
    return results
