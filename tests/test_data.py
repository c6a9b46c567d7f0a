"""Data pipeline tests: COCO decode parity, batching, subsets, fixtures."""

import json

import jax
import numpy as np
import pytest

from physics_informed_image_segmentation_tpu.data import (
    CocoSegmentationSource,
    DeviceDataset,
    epoch_batch_indices,
    make_blobs,
    num_batches,
    rasterize_polygons,
    subset_fraction_indices,
    write_synthetic_coco,
)


@pytest.fixture(scope="module")
def coco_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("coco")
    image_dir, ann = write_synthetic_coco(root, n=6, missing_files=2, seed=3)
    return image_dir, ann


class TestCocoSource:
    def test_loads_and_skips_missing(self, coco_dir, capsys):
        image_dir, ann = coco_dir
        src = CocoSegmentationSource(image_dir, ann, image_size=(128, 128))
        assert len(src) == 6  # 2 missing skipped
        out = capsys.readouterr().out
        assert "Warning: 2 image(s)" in out

    def test_shapes_dtypes_ranges(self, coco_dir):
        image_dir, ann = coco_dir
        src = CocoSegmentationSource(image_dir, ann, image_size=(64, 64))
        assert src.images.shape == (6, 64, 64, 1)
        assert src.masks.shape == (6, 64, 64, 1)
        assert src.images.dtype == np.float32
        # per-image min-max normalisation
        for i in range(6):
            assert src.images[i].min() == pytest.approx(0.0, abs=1e-6)
            assert src.images[i].max() == pytest.approx(1.0, abs=1e-6)
        assert set(np.unique(src.masks)) <= {0.0, 1.0}
        assert src.masks.sum() > 0  # cells rasterised

    def test_matches_torch_reference_dataset(self, coco_dir):
        """Bit-parity with the reference's PIL decode+rasterise pipeline."""
        torch = pytest.importorskip("torch")
        import importlib.util, sys

        image_dir, ann = coco_dir
        spec = importlib.util.spec_from_file_location(
            "ref_dataset", "/root/reference/src/dataset.py"
        )
        ref_mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(ref_mod)
        ref_ds = ref_mod.CellSegmentationDataset(image_dir, ann, image_size=(128, 128))
        ours = CocoSegmentationSource(image_dir, ann, image_size=(128, 128))
        assert len(ref_ds) == len(ours)
        for i in range(len(ours)):
            img_t, mask_t = ref_ds[i]
            np.testing.assert_allclose(
                ours.images[i, ..., 0], img_t.numpy()[0], atol=1e-6
            )
            np.testing.assert_array_equal(ours.masks[i, ..., 0], mask_t.numpy()[0])

    def test_polygon_min_coords(self):
        # polygons with < 6 coords are ignored
        anns = [{"segmentation": [[0, 0, 10, 0]]}]  # 4 coords -> skip
        mask = rasterize_polygons(anns, (32, 32), (32, 32))
        assert mask.sum() == 0


class TestBatching:
    def test_num_batches_keeps_ragged(self):
        assert num_batches(10, 8) == 2
        assert num_batches(8, 8) == 1
        assert num_batches(1, 8) == 1

    def test_epoch_indices_cover_all_once(self):
        idx, valid = epoch_batch_indices(10, 4, shuffle=True, key=jax.random.key(0))
        assert idx.shape == (3, 4) and valid.shape == (3, 4)
        real = np.asarray(idx).flatten()[np.asarray(valid).flatten() > 0]
        assert sorted(real.tolist()) == list(range(10))
        assert float(np.asarray(valid).sum()) == 10.0

    def test_no_shuffle_is_sequential(self):
        idx, _ = epoch_batch_indices(6, 4, shuffle=False)
        assert np.asarray(idx).flatten()[:6].tolist() == list(range(6))

    def test_shuffle_varies_with_key(self):
        i1, _ = epoch_batch_indices(32, 8, shuffle=True, key=jax.random.key(1))
        i2, _ = epoch_batch_indices(32, 8, shuffle=True, key=jax.random.key(2))
        assert not np.array_equal(np.asarray(i1), np.asarray(i2))

    def test_device_dataset_select(self):
        images, masks = make_blobs(5, 16, 16, seed=1)
        ds = DeviceDataset.from_numpy(images, masks)
        sub = ds.select(np.array([0, 2]))
        assert sub.n == 2
        np.testing.assert_allclose(np.asarray(sub.images[1]), images[2])


class TestSubset:
    def test_fraction_size_and_uniqueness(self):
        np.random.seed(42)
        idx = subset_fraction_indices(100, 0.25)
        assert len(idx) == 25 and len(set(idx.tolist())) == 25

    def test_matches_reference_global_rng_semantics(self):
        np.random.seed(7)
        ours = subset_fraction_indices(50, 0.2)
        np.random.seed(7)
        ref = np.random.choice(50, int(50 * 0.2), replace=False)
        np.testing.assert_array_equal(ours, ref)


class TestSynthetic:
    def test_blob_properties(self):
        images, masks = make_blobs(4, 64, 64, seed=0)
        assert images.shape == masks.shape == (4, 64, 64, 1)
        assert images.min() >= 0 and images.max() <= 1
        assert set(np.unique(masks)) <= {0.0, 1.0}
        assert all(masks[i].sum() > 0 for i in range(4))

    def test_blobs_deterministic(self):
        a = make_blobs(2, 32, 32, seed=5)[0]
        b = make_blobs(2, 32, 32, seed=5)[0]
        np.testing.assert_array_equal(a, b)


class TestAugment:
    def test_d4_preserves_pairing_and_binary_masks(self):
        import jax
        import jax.numpy as jnp

        from physics_informed_image_segmentation_tpu.data import d4_augment

        images, masks = make_blobs(8, 32, 32, seed=0)
        ai, am = d4_augment(jax.random.key(0), jnp.asarray(images), jnp.asarray(masks))
        assert ai.shape == images.shape and am.shape == masks.shape
        # exact symmetry: pixel multisets preserved per sample
        np.testing.assert_allclose(
            np.sort(np.asarray(ai).reshape(8, -1), axis=1),
            np.sort(images.reshape(8, -1), axis=1),
        )
        assert set(np.unique(np.asarray(am))) <= {0.0, 1.0}
        # same transform for image and mask: mask overlap statistics preserved
        for i in range(8):
            np.testing.assert_allclose(
                float((np.asarray(ai[i]) * np.asarray(am[i])).sum()),
                float((images[i] * masks[i]).sum()),
                rtol=1e-5,
            )

    def test_flip_augment_nonsquare(self):
        import jax
        import jax.numpy as jnp

        from physics_informed_image_segmentation_tpu.data import flip_augment

        images, masks = make_blobs(4, 16, 32, seed=1)
        ai, am = flip_augment(jax.random.key(3), jnp.asarray(images), jnp.asarray(masks))
        assert ai.shape == images.shape
        # some sample flipped (probability of none ≈ (1/4)^4)
        assert not np.allclose(np.asarray(ai), images)

    def test_augmented_training_epoch_runs(self):
        import jax

        from physics_informed_image_segmentation_tpu.data import d4_augment
        from physics_informed_image_segmentation_tpu.models import UNet
        from physics_informed_image_segmentation_tpu.train import (
            LossConfig,
            create_train_state,
        )
        from physics_informed_image_segmentation_tpu.train.engine import (
            make_train_epoch_fn,
        )

        images, masks = make_blobs(8, 32, 32, seed=0)
        data = DeviceDataset.from_numpy(images, masks)
        model = UNet(base_channels=4, dropout=0.0)
        fn = make_train_epoch_fn(model, LossConfig(backend="jax"), augment=d4_augment)
        st = create_train_state(model, jax.random.key(0), 1e-3, input_shape=(1, 32, 32, 1))
        idx, valid = epoch_batch_indices(data.n, 4, shuffle=False)
        st, res = fn(st, data.images, data.masks, idx, valid)
        assert np.isfinite(float(res["loss"]))
