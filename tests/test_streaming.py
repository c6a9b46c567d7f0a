"""Streaming pipeline: iterator semantics, prefetch, step-fn equivalence."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from physics_informed_image_segmentation_tpu.data import DeviceDataset, make_blobs
from physics_informed_image_segmentation_tpu.data.streaming import (
    HostDataset,
    batch_iterator,
    chunk_batches,
    prefetch_to_device,
)
from physics_informed_image_segmentation_tpu.models import UNet
from physics_informed_image_segmentation_tpu.train import (
    LossConfig,
    create_train_state,
    make_train_epoch_fn,
)
from physics_informed_image_segmentation_tpu.train.engine import make_train_step_fn


@pytest.fixture(scope="module")
def host_data():
    images, masks = make_blobs(10, 32, 32, seed=0)
    return HostDataset(n=10, images=images, masks=masks)


class TestIterator:
    def test_covers_all_once_with_padding(self, host_data):
        batches = list(batch_iterator(host_data, 4, shuffle=False))
        assert len(batches) == 3
        total_valid = sum(b[2].sum() for b in batches)
        assert total_valid == 10.0
        assert batches[-1][2].tolist() == [1.0, 1.0, 0.0, 0.0]
        for x, y, v in batches:
            assert x.shape == (4, 32, 32, 1)

    def test_shuffle_deterministic_per_seed_epoch(self, host_data):
        a = [b[0] for b in batch_iterator(host_data, 4, shuffle=True, seed=1, epoch=0)]
        b = [b[0] for b in batch_iterator(host_data, 4, shuffle=True, seed=1, epoch=0)]
        c = [b[0] for b in batch_iterator(host_data, 4, shuffle=True, seed=1, epoch=1)]
        np.testing.assert_array_equal(np.concatenate(a), np.concatenate(b))
        assert not np.array_equal(np.concatenate(a), np.concatenate(c))

    def test_lazy_decode_callback(self):
        images, masks = make_blobs(6, 16, 16, seed=1)
        calls = []

        def decode(idx):
            calls.append(idx.copy())
            return images[idx], masks[idx]

        ds = HostDataset(n=6, decode=decode)
        batches = list(batch_iterator(ds, 4, shuffle=False))
        assert len(batches) == 2 and len(calls) == 2


class TestPrefetch:
    def test_prefetch_preserves_order_and_values(self, host_data):
        raw = list(batch_iterator(host_data, 4, shuffle=False))
        fetched = list(prefetch_to_device(batch_iterator(host_data, 4, shuffle=False)))
        assert len(fetched) == len(raw)
        for (x0, y0, v0), (x1, y1, v1) in zip(raw, fetched):
            assert isinstance(x1, jax.Array)
            np.testing.assert_array_equal(x0, np.asarray(x1))
            np.testing.assert_array_equal(v0, np.asarray(v1))

    def test_producer_exception_propagates(self):
        def bad():
            yield np.zeros(2)
            raise RuntimeError("decode failed")

        it = prefetch_to_device(bad())
        next(it)
        with pytest.raises(RuntimeError, match="decode failed"):
            list(it)


class TestStreamingStep:
    def test_streaming_epoch_matches_resident_epoch(self, host_data):
        """Streaming per-batch steps == resident epoch scan, given the
        same batch order."""
        model = UNet(base_channels=4, dropout=0.0)
        cfg = LossConfig(pde_weight=1e-4, diffusion_coeff=5.0, backend="jax")

        # resident epoch with sequential order
        from physics_informed_image_segmentation_tpu.data import epoch_batch_indices

        data = DeviceDataset.from_numpy(host_data.images, host_data.masks)
        idx, valid = epoch_batch_indices(data.n, 4, shuffle=False)
        s_res = create_train_state(model, jax.random.key(0), 1e-3, input_shape=(1, 32, 32, 1))
        epoch_fn = make_train_epoch_fn(model, cfg)
        s_res, res = epoch_fn(s_res, data.images, data.masks, idx, valid)

        # streaming steps, same order
        s_str = create_train_state(model, jax.random.key(0), 1e-3, input_shape=(1, 32, 32, 1))
        step = make_train_step_fn(model, cfg)
        losses = []
        for x, y, v in prefetch_to_device(batch_iterator(host_data, 4, shuffle=False)):
            s_str, out = step(s_str, jnp.asarray(x), jnp.asarray(y), jnp.asarray(v))
            losses.append(float(out["loss"]))
        np.testing.assert_allclose(np.mean(losses), float(res["loss"]), rtol=1e-6)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-6
            ),
            jax.device_get(s_res.params),
            jax.device_get(s_str.params),
        )

    def test_chunked_steps_match_per_batch_steps(self, host_data):
        """make_train_chunk_fn over chunk_batches == stepping each batch
        through make_train_step_fn (same step body; only the XLA program
        boundary differs, so rounding-level f32 tolerance), with the
        ragged final chunk's zero-valid padding contributing nothing."""
        from physics_informed_image_segmentation_tpu.train.engine import (
            make_train_chunk_fn,
        )

        model = UNet(base_channels=4, dropout=0.0)
        cfg = LossConfig(pde_weight=1e-4, diffusion_coeff=5.0, backend="jax")
        kw = dict(input_shape=(1, 32, 32, 1))

        s_a = create_train_state(model, jax.random.key(0), 1e-3, **kw)
        step = make_train_step_fn(model, cfg)
        step_metrics = []
        for x, y, v in batch_iterator(host_data, 4, shuffle=True, seed=3):
            s_a, out = step(s_a, jnp.asarray(x), jnp.asarray(y), jnp.asarray(v))
            step_metrics.append(out)

        # 3 batches -> chunk of 2 + ragged chunk padded to 2
        s_b = create_train_state(model, jax.random.key(0), 1e-3, **kw)
        chunk_fn = make_train_chunk_fn(model, cfg)
        chunk_metrics = []
        n_chunks = 0
        for xs, ys, vs in chunk_batches(
            batch_iterator(host_data, 4, shuffle=True, seed=3), 2
        ):
            assert xs.shape == (2, 4, 32, 32, 1)
            s_b, outs = chunk_fn(
                s_b, jnp.asarray(xs), jnp.asarray(ys), jnp.asarray(vs)
            )
            chunk_metrics.append(outs)
            n_chunks += 1
        assert n_chunks == 2

        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=2e-6
            ),
            jax.device_get(s_a.params),
            jax.device_get(s_b.params),
        )
        # per-step metrics line up too (padding step excluded: its n=0)
        flat = {
            k: np.concatenate([np.asarray(m[k]) for m in chunk_metrics])
            for k in chunk_metrics[0]
        }
        assert flat["n"][3] == 0.0  # the padded step trained on nothing
        for i, m in enumerate(step_metrics):
            np.testing.assert_allclose(
                np.asarray(m["dice_sum"]), flat["dice_sum"][i], rtol=1e-5
            )

    def test_all_padding_chunk_is_bitwise_noop(self, host_data):
        """A step whose valid mask is all zero must leave the state
        untouched BIT-EXACTLY — zero grads would still advance step
        count, Adam moments and weight decay without the cond skip."""
        from physics_informed_image_segmentation_tpu.train.engine import (
            make_train_chunk_fn,
        )

        model = UNet(base_channels=4, dropout=0.0)
        cfg = LossConfig(pde_weight=1e-4, diffusion_coeff=5.0, backend="jax")
        state = create_train_state(
            model, jax.random.key(0), 1e-3, input_shape=(1, 32, 32, 1)
        )
        chunk_fn = make_train_chunk_fn(model, cfg)
        # one real step first so optimizer moments are non-zero
        x, y, v = next(batch_iterator(host_data, 4, shuffle=False))
        state, _ = chunk_fn(
            state, jnp.asarray(x[None]), jnp.asarray(y[None]),
            jnp.asarray(v[None]),
        )
        before = jax.device_get((state.params, state.opt_state, state.step))
        state, outs = chunk_fn(
            state, jnp.asarray(x[None]), jnp.asarray(y[None]),
            jnp.zeros((1, 4), jnp.float32),
        )
        after = jax.device_get((state.params, state.opt_state, state.step))
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b)
            ),
            before,
            after,
        )
        assert float(np.asarray(outs["n"])[0]) == 0.0
