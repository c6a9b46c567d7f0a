"""Batched vmapped sweep: correctness vs serial training, ES masking."""

import json
import shutil
from pathlib import Path

import chex
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from physics_informed_image_segmentation_tpu.data import DeviceDataset, make_blobs
from physics_informed_image_segmentation_tpu.experiments import AblationConfig
from physics_informed_image_segmentation_tpu.experiments.sweep import (
    run_batched_study,
    run_batched_sweep,
    sweep_scalars_from_variants,
)
from physics_informed_image_segmentation_tpu.models import UNet


@pytest.fixture(scope="module")
def setup():
    tr = DeviceDataset.from_numpy(*make_blobs(8, 32, 32, seed=0))
    va = DeviceDataset.from_numpy(*make_blobs(4, 32, 32, seed=1))
    model = UNet(base_channels=4, dropout=0.0)
    params = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 1)))
    return model, params, tr, va


def _scalars(n):
    return {
        "pde_weight": np.full(n, 1e-4, np.float32),
        "phase_field_weight": np.full(n, 1e-4, np.float32),
        "diffusion_coeff": np.linspace(1.0, 5.0, n).astype(np.float32),
        "reaction_threshold": np.full(n, 0.5, np.float32),
        "epsilon": np.full(n, 0.05, np.float32),
    }


class TestBatchedSweep:
    def test_runs_and_shapes(self, setup):
        model, params, tr, va = setup
        out = run_batched_sweep(
            model, params, _scalars(3), tr, va,
            num_epochs=2, batch_size=4, learning_rate=1e-3,
        )
        leaf = jax.tree_util.tree_leaves(out["params"])[0]
        assert leaf.shape[0] == 3
        assert out["history"]["val_dice_score"].shape == (2, 3)
        assert out["stop_epoch"].shape == (3,)
        assert np.isfinite(out["history"]["train_loss"]).all()

    def test_param_carry_bit_identical(self):
        """bf16 param carry in the batched sweep == default path, bitwise
        (same argument as engine.py: the carried copy equals the values
        the cast-in-forward produced)."""
        tr = DeviceDataset.from_numpy(*make_blobs(8, 32, 32, seed=0))
        va = DeviceDataset.from_numpy(*make_blobs(4, 32, 32, seed=1))
        model = UNet(base_channels=4, dropout=0.2, dtype=jnp.bfloat16)
        params = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 1)))
        outs = {}
        for carry in (None, jnp.bfloat16):
            outs[carry is None] = run_batched_sweep(
                model, params, _scalars(3), tr, va,
                num_epochs=3, batch_size=4, learning_rate=1e-3,
                param_carry_dtype=carry,
            )
        for a, b in zip(
            jax.tree_util.tree_leaves(outs[True]["params"]),
            jax.tree_util.tree_leaves(outs[False]["params"]),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        np.testing.assert_array_equal(
            outs[True]["history"]["train_loss"], outs[False]["history"]["train_loss"]
        )

    def test_members_diverge_with_different_scalars(self, setup):
        model, params, tr, va = setup
        sc = _scalars(2)
        sc["pde_weight"] = np.asarray([0.0, 1.0], np.float32)  # extreme difference
        out = run_batched_sweep(
            model, params, sc, tr, va,
            num_epochs=2, batch_size=4, learning_rate=1e-3,
        )
        p0 = jax.tree_util.tree_leaves(
            jax.tree_util.tree_map(lambda p: p[0], out["params"])
        )
        p1 = jax.tree_util.tree_leaves(
            jax.tree_util.tree_map(lambda p: p[1], out["params"])
        )
        assert any(
            not np.allclose(np.asarray(a), np.asarray(b)) for a, b in zip(p0, p1)
        )

    def test_identical_members_stay_identical(self, setup):
        model, params, tr, va = setup
        out = run_batched_sweep(
            model, params, _scalars(1) | {"diffusion_coeff": np.asarray([5.0], np.float32)},
            tr, va, num_epochs=1, batch_size=4, learning_rate=1e-3,
        )
        sc2 = {k: np.repeat(v, 2) for k, v in _scalars(1).items()}
        sc2["diffusion_coeff"] = np.asarray([5.0, 5.0], np.float32)
        out2 = run_batched_sweep(
            model, params, sc2, tr, va,
            num_epochs=1, batch_size=4, learning_rate=1e-3, seed=42,
        )
        # two identical members produce identical weights
        a = jax.tree_util.tree_leaves(jax.tree_util.tree_map(lambda p: p[0], out2["params"]))
        b = jax.tree_util.tree_leaves(jax.tree_util.tree_map(lambda p: p[1], out2["params"]))
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    def test_early_stopping_freezes_member(self, setup):
        """With patience=1 and an impossible min_delta the member stops
        after epoch 2 and its params freeze."""
        model, params, tr, va = setup
        out = run_batched_sweep(
            model, params, _scalars(1), tr, va,
            num_epochs=5, batch_size=4, learning_rate=1e-3,
            early_stopping_patience=1, min_delta=1e9,
        )
        assert int(out["stop_epoch"][0]) == 2
        # rerun with num_epochs=2: frozen weights must match the 5-epoch run
        out2 = run_batched_sweep(
            model, params, _scalars(1), tr, va,
            num_epochs=2, batch_size=4, learning_rate=1e-3,
            early_stopping_patience=1, min_delta=1e9,
        )
        a = jax.tree_util.tree_leaves(out["params"])
        b = jax.tree_util.tree_leaves(out2["params"])
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


class TestBatchedStudy:
    def test_rejects_heterogeneous_variants(self, setup):
        variants = [
            AblationConfig(name="A", description="d", use_pde=True, seed=1),
            AblationConfig(name="B", description="d", use_pde=True, seed=2),
        ]
        with pytest.raises(ValueError):
            run_batched_study("X", variants, datasets={}, output_dir="/tmp/x")

    def test_mini_batched_study(self, setup, tmp_path):
        datasets = {
            "train": DeviceDataset.from_numpy(*make_blobs(8, 32, 32, seed=0)),
            "val": DeviceDataset.from_numpy(*make_blobs(4, 32, 32, seed=1)),
            "in_dist": DeviceDataset.from_numpy(*make_blobs(4, 32, 32, seed=2)),
            "out_dist": DeviceDataset.from_numpy(*make_blobs(4, 32, 32, seed=3)),
        }
        variants = [
            AblationConfig(
                name=f"SB.{i} D={d}", description="d", use_pde=True,
                pde_weight=1e-4, phase_field_weight=1e-4, diffusion_coeff=d,
            )
            for i, d in enumerate([1.0, 5.0])
        ]
        res = run_batched_study(
            "SB", variants, datasets=datasets,
            batch_size=4, learning_rate=1e-4, stage1_epochs=2, stage2_epochs=2,
            output_dir=tmp_path, precision="f32", base_channels=8,
        )
        folder = Path(res["ablation_folder"])
        data = json.loads(Path(res["results_json"]).read_text())
        assert data["batched"] is True
        assert len(data["results"]) == 2
        for i, d in enumerate([1.0, 5.0]):
            stem = f"sb.{i}_d={d}".replace(" ", "_")
            assert (folder / f"{stem}_after_pde_stage2.msgpack").exists()
            assert (folder / f"{stem}_stage2_metrics.csv").exists()
        assert (folder / "shared_stage1_metrics.csv").exists()
        assert Path(res["summary_csv"]).exists()

    def test_resume_reuses_shared_stage1(self, setup, tmp_path):
        """resume_from skips Stage I and lands on the SAME final params.

        The batched engine's resume granularity is the shared Stage-I
        checkpoint (Stage II is one compiled launch) — a resumed run
        must produce bit-identical member params to the original.
        """
        datasets = {
            "train": DeviceDataset.from_numpy(*make_blobs(8, 32, 32, seed=0)),
            "val": DeviceDataset.from_numpy(*make_blobs(4, 32, 32, seed=1)),
            "in_dist": DeviceDataset.from_numpy(*make_blobs(4, 32, 32, seed=2)),
            "out_dist": DeviceDataset.from_numpy(*make_blobs(4, 32, 32, seed=3)),
        }
        variants = [
            AblationConfig(
                name=f"SR.{i} D={d}", description="d", use_pde=True,
                pde_weight=1e-4, diffusion_coeff=d,
            )
            for i, d in enumerate([1.0, 5.0])
        ]
        kwargs = dict(
            datasets=datasets, batch_size=4, learning_rate=1e-4,
            stage1_epochs=2, stage2_epochs=2,
            precision="f32", base_channels=8,
        )
        res = run_batched_study("SR", variants, output_dir=tmp_path / "a", **kwargs)
        folder = Path(res["ablation_folder"])

        # simulate a crash after Stage I: keep only the stage-1 artifacts
        resumed = tmp_path / "b" / folder.name
        resumed.parent.mkdir()
        resumed.mkdir()
        for name in ("shared_baseline_after_stage1.msgpack", "shared_stage1_metrics.csv"):
            shutil.copy2(folder / name, resumed / name)

        res2 = run_batched_study(
            "SR", variants, output_dir=tmp_path / "b", resume_from=resumed, **kwargs
        )
        assert Path(res2["ablation_folder"]) == resumed  # in place, same timestamp
        from physics_informed_image_segmentation_tpu.train.checkpoint import load_params

        for i, d in enumerate([1.0, 5.0]):
            stem = f"sr.{i}_d={d}".replace(" ", "_")
            a = load_params(folder / f"{stem}_after_pde_stage2.msgpack")
            b = load_params(resumed / f"{stem}_after_pde_stage2.msgpack")
            chex.assert_trees_all_equal(a, b)


class TestMultiSeed:
    def test_member_seeds_and_stacked_inits(self, setup):
        """Multi-seed replication: per-member inits + dropout streams."""
        model, _, tr, va = setup
        model_do = UNet(base_channels=4, dropout=0.2)
        inits = [
            model_do.init(jax.random.key(s), jnp.zeros((1, 32, 32, 1)))
            for s in (0, 1)
        ]
        stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *inits)
        sc = {k: np.repeat(v, 2) for k, v in _scalars(1).items()}
        out = run_batched_sweep(
            model_do, stacked, sc, tr, va,
            num_epochs=1, batch_size=4, learning_rate=1e-3,
            member_seeds=np.asarray([10, 20]),
        )
        a = jax.tree_util.tree_leaves(jax.tree_util.tree_map(lambda p: p[0], out["params"]))
        b = jax.tree_util.tree_leaves(jax.tree_util.tree_map(lambda p: p[1], out["params"]))
        assert any(not np.allclose(np.asarray(x), np.asarray(y)) for x, y in zip(a, b))

    def test_shared_dropout_stream_keeps_identical_members_identical(self, setup):
        """With dropout ON and identical scalars, members stay identical
        because the dropout stream is shared (serial-reference parity)."""
        _, _, tr, va = setup
        model_do = UNet(base_channels=4, dropout=0.2)
        params = model_do.init(jax.random.key(0), jnp.zeros((1, 32, 32, 1)))
        sc = {k: np.repeat(v, 2) for k, v in _scalars(1).items()}
        out = run_batched_sweep(
            model_do, params, sc, tr, va,
            num_epochs=1, batch_size=4, learning_rate=1e-3,
        )
        a = jax.tree_util.tree_leaves(jax.tree_util.tree_map(lambda p: p[0], out["params"]))
        b = jax.tree_util.tree_leaves(jax.tree_util.tree_map(lambda p: p[1], out["params"]))
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


class TestSerialBatchedFaithfulness:
    """VERDICT r1 item 5: a genuine serial per-member loop with host-side
    EarlyStopping (break-out, like the reference's run_ablation loop,
    /root/reference/run_ablation.py:120-224) must produce the SAME final
    weights, stop epochs and metric histories as the single vmapped
    launch with masked updates — including when members stop at
    different epochs."""

    @staticmethod
    def _serial_member(model, init_params, sc, tr, va, *, num_epochs,
                       batch_size, learning_rate, patience, min_delta, seed):
        """Reference-style serial training of ONE member: Python epoch
        loop, real EarlyStopping object, loop break on stop."""
        import optax

        from physics_informed_image_segmentation_tpu.data import (
            epoch_batch_indices,
        )
        from physics_informed_image_segmentation_tpu.experiments.sweep import (
            _member_loss,
        )
        from physics_informed_image_segmentation_tpu.ops import metrics as M
        from physics_informed_image_segmentation_tpu.train.engine import (
            EarlyStopping,
        )

        tx = optax.adamw(learning_rate=learning_rate, weight_decay=1e-5)
        params = init_params
        opt_state = tx.init(params)
        dkey = jax.random.key(seed)
        shuffle_key = jax.random.key(seed + 1)
        sc = {k: jnp.asarray(v) for k, v in sc.items()}
        val_idx, val_valid = epoch_batch_indices(va.n, batch_size, shuffle=False)

        @jax.jit
        def train_epoch(params, opt_state, step, idx, valid):
            def body(carry, batch):
                params, opt_state, step = carry
                idx_b, valid_b = batch
                x, y = tr.images[idx_b], tr.masks[idx_b]
                mask = valid_b.reshape((-1,) + (1,) * (x.ndim - 1))
                key = jax.random.fold_in(dkey, step)

                def loss_of(p):
                    pred = model.apply(
                        p, x, deterministic=False, rngs={"dropout": key}
                    )
                    total, _ = _member_loss(pred, y, mask, sc)
                    return total

                grads = jax.grad(loss_of)(params)
                updates, opt_state = tx.update(grads, opt_state, params)
                return (optax.apply_updates(params, updates), opt_state, step + 1), None

            (params, opt_state, step), _ = jax.lax.scan(
                body, (params, opt_state, step), (idx, valid)
            )
            return params, opt_state, step

        @jax.jit
        def val_dice(params):
            def body(_, batch):
                idx_b, valid_b = batch
                x, y = va.images[idx_b], va.masks[idx_b]
                pred = model.apply(params, x, deterministic=True)
                m2 = valid_b.reshape((-1, 1, 1))
                return None, M.dice_score(pred[..., 0], y[..., 0], mask=m2)

            _, dices = jax.lax.scan(body, None, (val_idx, val_valid))
            return jnp.mean(dices)

        es = EarlyStopping(patience, min_delta, "max")
        step = jnp.zeros((), jnp.int32)
        history, stop_epoch = [], num_epochs
        for e in range(num_epochs):
            idx, valid = epoch_batch_indices(
                tr.n, batch_size, shuffle=True,
                key=jax.random.fold_in(shuffle_key, e),
            )
            params, opt_state, step = train_epoch(params, opt_state, step, idx, valid)
            score = float(val_dice(params))
            history.append(score)
            if es(score, e + 1):
                stop_epoch = e + 1
                break
        return params, stop_epoch, history

    def test_divergent_early_stopping_matches_serial(self):
        # Large blobs so the tiny net learns within a few epochs and the
        # members' val-dice trajectories can actually diverge.
        tr = DeviceDataset.from_numpy(
            *make_blobs(16, 32, 32, seed=0, r_range=(0.25, 0.42))
        )
        va = DeviceDataset.from_numpy(
            *make_blobs(8, 32, 32, seed=1, r_range=(0.25, 0.42))
        )
        model = UNet(base_channels=4, dropout=0.1)  # exercise the PRNG stream too
        params = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 1)))
        num_epochs, bs, lr, patience, min_delta, seed = 10, 4, 2e-3, 1, 1e-4, 42

        # member 0: normal physics weights; member 1: absurd pde_weight
        # that wrecks val dice -> early divergent stopping.
        sc_grid = {
            "pde_weight": np.array([1e-4, 100.0], np.float32),
            "phase_field_weight": np.array([1e-4, 1e-4], np.float32),
            "diffusion_coeff": np.array([5.0, 5.0], np.float32),
            "reaction_threshold": np.array([0.5, 0.5], np.float32),
            "epsilon": np.array([0.05, 0.05], np.float32),
        }
        batched = run_batched_sweep(
            model, params, sc_grid, tr, va,
            num_epochs=num_epochs, batch_size=bs, learning_rate=lr,
            early_stopping_patience=patience, min_delta=min_delta, seed=seed,
        )

        serial = [
            self._serial_member(
                model, params,
                {k: v[m] for k, v in sc_grid.items()}, tr, va,
                num_epochs=num_epochs, batch_size=bs, learning_rate=lr,
                patience=patience, min_delta=min_delta, seed=seed,
            )
            for m in range(2)
        ]

        stop_epochs = [s[1] for s in serial]
        assert list(batched["stop_epoch"]) == stop_epochs
        # the two members must genuinely stop at different epochs for
        # this test to mean anything
        assert stop_epochs[0] != stop_epochs[1], stop_epochs

        for m in range(2):
            s_params, s_stop, s_hist = serial[m]
            b_hist = batched["history"]["val_dice_score"][: s_stop, m]
            np.testing.assert_allclose(
                np.asarray(b_hist), np.asarray(s_hist), rtol=0, atol=1e-5
            )
            b_leaves = jax.tree_util.tree_leaves(
                jax.tree_util.tree_map(lambda p: p[m], batched["params"])
            )
            s_leaves = jax.tree_util.tree_leaves(s_params)
            for b_leaf, s_leaf in zip(b_leaves, s_leaves):
                np.testing.assert_allclose(
                    np.asarray(b_leaf), np.asarray(s_leaf), rtol=0, atol=2e-5
                )
