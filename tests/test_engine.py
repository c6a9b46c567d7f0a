"""Training engine tests: steps, epochs, early stopping, checkpoints."""

import csv

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from physics_informed_image_segmentation_tpu.data import (
    DeviceDataset,
    epoch_batch_indices,
    make_blobs,
)
from physics_informed_image_segmentation_tpu.models import UNet
from physics_informed_image_segmentation_tpu.train import (
    EarlyStopping,
    EPOCH_CSV_FIELDS,
    LossConfig,
    create_train_state,
    make_eval_epoch_fn,
    make_train_epoch_fn,
    restore_train_state,
    save_train_state,
    train_stage,
)


@pytest.fixture(scope="module")
def model_and_data():
    images, masks = make_blobs(12, 32, 32, seed=0)
    data = DeviceDataset.from_numpy(images, masks)
    model = UNet(base_channels=4, dropout=0.1)
    return model, data


@pytest.fixture
def tiny_setup(model_and_data):
    # fresh state per test: the jitted train epoch donates (consumes) it
    model, data = model_and_data
    state = create_train_state(
        model, jax.random.key(0), 1e-3, input_shape=(1, 32, 32, 1)
    )
    return model, state, data


class TestEarlyStopping:
    def test_stops_after_patience(self):
        es = EarlyStopping(patience=3, min_delta=1e-4, mode="max")
        scores = [0.5, 0.6, 0.6, 0.6, 0.6]
        stops = [es(s, i + 1) for i, s in enumerate(scores)]
        assert stops == [False, False, False, False, True]
        assert es.best_epoch == 2
        assert es.best_score == 0.6

    def test_improvement_resets_counter(self):
        es = EarlyStopping(patience=2, mode="max")
        assert not es(0.5, 1)
        assert not es(0.5, 2)  # counter 1
        assert not es(0.7, 3)  # improved, reset
        assert not es(0.7, 4)  # counter 1
        assert es(0.7, 5)  # counter 2 -> stop

    def test_min_mode(self):
        es = EarlyStopping(patience=1, mode="min")
        assert not es(1.0, 1)
        assert not es(0.5, 2)
        assert es(0.6, 3)


class TestEpochFns:
    def test_train_epoch_improves_loss(self, tiny_setup):
        model, state, data = tiny_setup
        cfg = LossConfig(backend="jax")
        train_fn = make_train_epoch_fn(model, cfg)
        idx, valid = epoch_batch_indices(data.n, 4, shuffle=True, key=jax.random.key(1))
        losses = []
        for _ in range(5):
            state, res = train_fn(state, data.images, data.masks, idx, valid)
            losses.append(float(res["loss"]))
        assert losses[-1] < losses[0]
        assert all(np.isfinite(losses))

    def test_metrics_keys_and_ranges(self, tiny_setup):
        model, state, data = tiny_setup
        cfg = LossConfig(
            pde_weight=1e-4, phase_field_weight=1e-4, diffusion_coeff=5.0, backend="jax"
        )
        train_fn = make_train_epoch_fn(model, cfg)
        eval_fn = make_eval_epoch_fn(model, cfg)
        idx, valid = epoch_batch_indices(data.n, 4, shuffle=False)
        state2, res = train_fn(state, data.images, data.masks, idx, valid)
        for k in (
            "loss", "dice_loss", "bce_loss", "pde_loss", "phase_field_loss",
            "dice_score", "iou_score", "boundary_f1_score",
        ):
            assert k in res and np.isfinite(float(res[k])), k
        assert float(res["pde_loss"]) > 0
        assert 0 <= float(res["dice_score"]) <= 1
        vres = eval_fn(state2.params, data.images, data.masks, idx, valid)
        assert 0 <= float(vres["dice_score"]) <= 1
        assert "iou_score" in vres and "boundary_f1_score" in vres

    def test_val_dice_is_batch_mean_of_global_dice(self, tiny_setup):
        """Reference quirk: validate() reports batch-mean GLOBAL dice
        (/root/reference/src/train.py:221-222), not per-sample mean."""
        from physics_informed_image_segmentation_tpu.ops import metrics as M

        model, state, data = tiny_setup
        eval_fn = make_eval_epoch_fn(model, LossConfig(backend="jax"))
        idx, valid = epoch_batch_indices(data.n, 5, shuffle=False)  # ragged: 12 = 5+5+2
        res = eval_fn(state.params, data.images, data.masks, idx, valid)
        # manual recomputation
        preds = model.apply(state.params, data.images, deterministic=True)
        vals = []
        for b in range(idx.shape[0]):
            sel = np.asarray(idx[b])[np.asarray(valid[b]) > 0]
            vals.append(
                float(
                    M.dice_score(preds[sel][..., 0], data.masks[sel][..., 0])
                )
            )
        np.testing.assert_allclose(float(res["dice_score"]), np.mean(vals), rtol=1e-5)

    def test_deterministic_given_same_seed(self, tiny_setup):
        model, _, data = tiny_setup
        cfg = LossConfig(backend="jax")
        train_fn = make_train_epoch_fn(model, cfg)
        idx, valid = epoch_batch_indices(data.n, 4, shuffle=True, key=jax.random.key(7))

        outs = []
        for _ in range(2):
            st = create_train_state(
                model, jax.random.key(3), 1e-3, input_shape=(1, 32, 32, 1)
            )
            st, res = train_fn(st, data.images, data.masks, idx, valid)
            outs.append((float(res["loss"]), jax.device_get(st.params)))
        assert outs[0][0] == outs[1][0]
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(a, b), outs[0][1], outs[1][1]
        )


class TestTrainStage:
    def test_stage_runs_and_writes_csv(self, tiny_setup, tmp_path):
        model, state, data = tiny_setup
        cfg = LossConfig(backend="jax")
        csv_path = tmp_path / "metrics.csv"
        state, best, best_epoch, all_metrics = train_stage(
            state,
            make_train_epoch_fn(model, cfg),
            make_eval_epoch_fn(model, cfg),
            data,
            data,
            batch_size=4,
            num_epochs=2,
            stage_name="T",
            shuffle_key=jax.random.key(0),
            verbose=False,
            csv_path=csv_path,
        )
        assert len(all_metrics) == 2
        assert best_epoch in (1, 2)
        with open(csv_path) as f:
            rows = list(csv.DictReader(f))
        assert len(rows) == 2
        assert list(rows[0].keys()) == EPOCH_CSV_FIELDS

    def test_early_stop_breaks_loop(self, tiny_setup):
        model, state, data = tiny_setup
        cfg = LossConfig(backend="jax")
        es = EarlyStopping(patience=1, min_delta=10.0)  # impossible improvement
        state, best, best_epoch, all_metrics = train_stage(
            state,
            make_train_epoch_fn(model, cfg),
            make_eval_epoch_fn(model, cfg),
            data,
            data,
            batch_size=4,
            num_epochs=10,
            stage_name="T",
            shuffle_key=jax.random.key(0),
            early_stopping=es,
            verbose=False,
        )
        assert len(all_metrics) == 2  # epoch1 sets best, epoch2 triggers stop


class TestCheckpoint:
    def test_roundtrip(self, tiny_setup, tmp_path):
        model, state, data = tiny_setup
        cfg = LossConfig(backend="jax")
        train_fn = make_train_epoch_fn(model, cfg)
        idx, valid = epoch_batch_indices(data.n, 4, shuffle=False)
        state, _ = train_fn(state, data.images, data.masks, idx, valid)
        save_train_state(state, tmp_path / "ckpt")

        fresh = create_train_state(
            model, jax.random.key(99), 1e-3, input_shape=(1, 32, 32, 1)
        )
        restored = restore_train_state(fresh, tmp_path / "ckpt")
        assert int(restored.step) == int(state.step)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
            jax.device_get(state.params),
            jax.device_get(restored.params),
        )
        # resumed training continues identically
        s1, r1 = train_fn(state, data.images, data.masks, idx, valid)
        s2, r2 = train_fn(restored, data.images, data.masks, idx, valid)
        assert float(r1["loss"]) == float(r2["loss"])

    def test_retention_keeps_newest(self, tiny_setup, tmp_path):
        """keep=N deletes all but the newest N step_* checkpoints."""
        from physics_informed_image_segmentation_tpu.train.checkpoint import (
            latest_checkpoint_step,
        )

        _, state, _ = tiny_setup
        ckpt_dir = tmp_path / "ckpt"
        for step in (1, 2, 3, 4):
            save_train_state(state, ckpt_dir, step=step, keep=2)
        kept = sorted(p.name for p in ckpt_dir.iterdir() if p.is_dir())
        assert kept == ["step_3", "step_4"]
        assert latest_checkpoint_step(ckpt_dir) == 4
        # interrupted-save leftovers are ignored by retention and resume
        tmp_leftover = ckpt_dir / "step_9.orbax-checkpoint-tmp-123"
        tmp_leftover.mkdir()
        assert latest_checkpoint_step(ckpt_dir) == 4
        save_train_state(state, ckpt_dir, step=5, keep=2)
        assert latest_checkpoint_step(ckpt_dir) == 5
        assert tmp_leftover.exists()  # retention never touches tmp dirs
        tmp_leftover.rmdir()
        # keep=None retains everything
        save_train_state(state, ckpt_dir, step=6)
        assert latest_checkpoint_step(ckpt_dir) == 6
        assert len(list(ckpt_dir.iterdir())) == 3  # steps 4, 5, 6


class TestStageCheckpointing:
    def test_periodic_checkpoints_written_and_restorable(self, tiny_setup, tmp_path):
        model, state, data = tiny_setup
        from physics_informed_image_segmentation_tpu.train import LossConfig
        from physics_informed_image_segmentation_tpu.train.checkpoint import (
            latest_checkpoint_step,
            restore_train_state,
        )

        cfg = LossConfig(backend="jax")
        ckpt_dir = tmp_path / "ckpts"
        state, _, _, _ = train_stage(
            state,
            make_train_epoch_fn(model, cfg),
            make_eval_epoch_fn(model, cfg),
            data,
            data,
            batch_size=4,
            num_epochs=3,
            stage_name="T",
            shuffle_key=jax.random.key(0),
            verbose=False,
            checkpoint_dir=ckpt_dir,
            checkpoint_every=1,
        )
        step = latest_checkpoint_step(ckpt_dir)
        assert step == int(state.step)
        fresh = create_train_state(
            model, jax.random.key(123), 1e-3, input_shape=(1, 32, 32, 1)
        )
        restored = restore_train_state(fresh, ckpt_dir)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
            jax.device_get(state.params),
            jax.device_get(restored.params),
        )


class TestStageResume:
    """`initial_metrics` resume: a continued stage must be bit-identical
    to an uninterrupted one (shuffle keys fold in the epoch index,
    dropout keys fold in state.step)."""

    def _stage(self, model, data, state, n_epochs, csv_path, **kw):
        cfg = LossConfig(backend="jax")
        return train_stage(
            state,
            make_train_epoch_fn(model, cfg),
            make_eval_epoch_fn(model, cfg),
            data,
            data,
            batch_size=4,
            num_epochs=n_epochs,
            stage_name="T",
            shuffle_key=jax.random.key(7),
            verbose=False,
            csv_path=csv_path,
            **kw,
        )

    def test_resumed_stage_bit_identical(self, model_and_data, tmp_path):
        model, data = model_and_data

        def fresh():
            return create_train_state(
                model, jax.random.key(0), 1e-3, input_shape=(1, 32, 32, 1)
            )

        # oracle: 5 uninterrupted epochs
        sA, bestA, beA, mA = self._stage(model, data, fresh(), 5, tmp_path / "a.csv")
        # "interrupted": 3 epochs with per-epoch checkpoints
        ck = tmp_path / "ck"
        _, _, _, mB = self._stage(
            model, data, fresh(), 3, tmp_path / "b.csv",
            checkpoint_dir=ck, checkpoint_every=1,
        )
        # resume from the checkpoint, replaying the 3 completed rows
        restored = restore_train_state(fresh(), ck)
        sC, bestC, beC, mC = self._stage(
            model, data, restored, 5, tmp_path / "b.csv", initial_metrics=mB,
        )

        assert [r["epoch"] for r in mC] == [1, 2, 3, 4, 5]
        for ra, rc in zip(mA, mC):
            for k in ra:
                assert float(ra[k]) == float(rc[k]), k
        assert beA == beC
        assert bestA["val"]["dice_score"] == bestC["val"]["dice_score"]
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
            jax.device_get(sA.params),
            jax.device_get(sC.params),
        )
        # the continued CSV matches the oracle's rows exactly
        with open(tmp_path / "a.csv") as f:
            rows_a = list(csv.DictReader(f))
        with open(tmp_path / "b.csv") as f:
            rows_b = list(csv.DictReader(f))
        assert rows_a == rows_b

    def test_replay_detects_already_stopped(self, tiny_setup):
        model, state, data = tiny_setup
        rows = [
            {"epoch": e, "val_dice_score": 0.5, "train_loss": 1.0,
             "val_loss": 1.0} for e in (1, 2, 3)
        ]
        es = EarlyStopping(patience=2, min_delta=1e-4, mode="max")
        cfg = LossConfig(backend="jax")
        state, best, best_epoch, all_metrics = train_stage(
            state,
            make_train_epoch_fn(model, cfg),
            make_eval_epoch_fn(model, cfg),
            data,
            data,
            batch_size=4,
            num_epochs=10,
            stage_name="T",
            shuffle_key=jax.random.key(0),
            early_stopping=es,
            verbose=False,
            initial_metrics=rows,
        )
        # epoch 1 set best, epochs 2-3 exhausted patience: no new epochs
        assert len(all_metrics) == 3
        assert es.early_stop
        assert best_epoch == 1


def test_save_best_checkpoint(tiny_setup, tmp_path):
    """Opt-in best-weights capture (the reference never restores best)."""
    from physics_informed_image_segmentation_tpu.train import LossConfig, load_params

    model, state, data = tiny_setup
    cfg = LossConfig(backend="jax")
    best_path = tmp_path / "best.msgpack"
    state, best, best_epoch, _ = train_stage(
        state,
        make_train_epoch_fn(model, cfg),
        make_eval_epoch_fn(model, cfg),
        data,
        data,
        batch_size=4,
        num_epochs=3,
        stage_name="T",
        shuffle_key=jax.random.key(0),
        verbose=False,
        save_best_path=best_path,
    )
    assert best_path.exists()
    restored = load_params(best_path, state.params)
    # the artifact parses into the same tree structure
    jax.tree_util.tree_map(lambda a, b: None, restored, state.params)


class TestResumeRobustness:
    """Hardening of the resume plan against the crashes it exists for:
    truncated CSV rewrites and stale final artifacts from older runs
    sharing the same output/models directories."""

    @staticmethod
    def _write_csv(path, rows, truncate_last=False):
        lines = ["epoch,val_dice_score,train_loss"]
        lines += [f"{e},{d},1.0" for e, d in rows]
        if truncate_last:
            lines.append("9,0.9")  # crash mid-rewrite: short final row
        path.write_text("\n".join(lines) + "\n")

    def test_truncated_trailing_row_dropped(self, tmp_path):
        from physics_informed_image_segmentation_tpu.train.loop import (
            _read_metric_rows,
        )

        p = tmp_path / "metrics_stage1_x.csv"
        self._write_csv(p, [(1, 0.5), (2, 0.6)], truncate_last=True)
        rows = _read_metric_rows(p)
        assert [r["epoch"] for r in rows] == [1, 2]

    def test_stale_final_artifact_ignored(self, tiny_setup, tmp_path):
        """A final artifact next to a PARTIAL csv (no early stop, fewer
        rows than num_epochs) is a leftover from an older completed run;
        resume must NOT declare the stage complete from it."""
        from physics_informed_image_segmentation_tpu.train.loop import (
            _stage_resume,
        )

        model, state, data = tiny_setup
        csv_p = tmp_path / "metrics_stage1_new.csv"
        self._write_csv(csv_p, [(1, 0.50), (2, 0.55), (3, 0.60)])
        artifact = tmp_path / "unet_baseline.msgpack"
        artifact.write_bytes(b"stale")  # never read on this path
        out_state, rows, csv_path = _stage_resume(
            state,
            output_dir=tmp_path,
            csv_glob="metrics_stage1_*.csv",
            checkpoint_dir=None,
            final_artifact=artifact,
            steps_per_epoch=3,
            num_epochs=12,
            patience=5,
            verbose=True,
        )
        assert rows is None and csv_path is None
        assert out_state is state

    def test_early_stopped_stage_counts_complete(self, tiny_setup, tmp_path):
        """A csv whose rows trip early stopping IS a finished stage even
        with fewer rows than num_epochs: the artifact params load."""
        from physics_informed_image_segmentation_tpu.train import save_params
        from physics_informed_image_segmentation_tpu.train.loop import (
            _stage_resume,
        )

        model, state, data = tiny_setup
        csv_p = tmp_path / "metrics_stage1_es.csv"
        # best at epoch 1, no improvement for patience=2 epochs -> stopped
        self._write_csv(csv_p, [(1, 0.70), (2, 0.69), (3, 0.68)])
        artifact = tmp_path / "unet_baseline.msgpack"
        save_params(state.params, artifact)
        out_state, rows, csv_path = _stage_resume(
            state,
            output_dir=tmp_path,
            csv_glob="metrics_stage1_*.csv",
            checkpoint_dir=None,
            final_artifact=artifact,
            steps_per_epoch=3,
            num_epochs=12,
            patience=2,
            verbose=False,
        )
        assert rows is not None and len(rows) == 3
        assert csv_path == csv_p

    def test_persist_result_atomic_and_corrupt_tolerated(self, tmp_path):
        """_persist_result leaves no tmp file; a corrupt (truncated)
        per-variant results json makes study-resume retrain the variant
        instead of crashing (exercised directly on the load guard)."""
        import json as _json

        from physics_informed_image_segmentation_tpu.experiments.ablation import (
            _persist_result,
        )

        p = tmp_path / "v_results.json"
        _persist_result({"a": 1}, p)
        assert _json.loads(p.read_text()) == {"a": 1}
        assert not list(tmp_path.glob("*.tmp"))

    def test_older_stage2_log_not_resumed(self, tiny_setup, tmp_path):
        """min_mtime gate: a stage-II csv older than the stage-I csv it
        should follow belongs to an earlier run in the same dirs."""
        import os as _os
        import time as _time

        from physics_informed_image_segmentation_tpu.train.loop import (
            _stage_resume,
        )

        model, state, data = tiny_setup
        old_s2 = tmp_path / "metrics_stage2_old.csv"
        self._write_csv(old_s2, [(1, 0.7), (2, 0.7)])
        stale_time = _time.time() - 100
        _os.utime(old_s2, (stale_time, stale_time))
        out_state, rows, csv_path = _stage_resume(
            state,
            output_dir=tmp_path,
            csv_glob="metrics_stage2_*.csv",
            checkpoint_dir=None,
            final_artifact=None,
            steps_per_epoch=3,
            num_epochs=2,
            patience=5,
            verbose=False,
            min_mtime=_time.time() - 10,
        )
        assert rows is None and csv_path is None
