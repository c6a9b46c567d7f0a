"""Serving path: Predictor padding, checkpoint formats, CLI."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from physics_informed_image_segmentation_tpu.data import make_blobs
from physics_informed_image_segmentation_tpu.models import UNet
from physics_informed_image_segmentation_tpu.serve import Predictor
from physics_informed_image_segmentation_tpu.train import save_params


@pytest.fixture(scope="module")
def checkpoint(tmp_path_factory):
    path = tmp_path_factory.mktemp("ckpt") / "model.msgpack"
    model = UNet(base_channels=64, dtype=jnp.float32)
    params = model.init(jax.random.key(0), jnp.zeros((1, 64, 64, 1)))
    save_params(params, path)
    return path


class TestPredictor:
    def test_predict_arbitrary_n(self, checkpoint):
        p = Predictor(checkpoint, batch_size=4, image_size=(64, 64), precision="f32")
        images, _ = make_blobs(7, 64, 64, seed=0)  # 7 = one ragged chunk
        probs = p.predict(images)
        assert probs.shape == (7, 64, 64, 1)
        assert (probs > 0).all() and (probs < 1).all()

    def test_threshold_binarizes(self, checkpoint):
        p = Predictor(checkpoint, batch_size=4, image_size=(64, 64), precision="f32")
        images, _ = make_blobs(3, 64, 64, seed=1)
        masks = p.predict(images, threshold=0.5)
        assert set(np.unique(masks)) <= {0.0, 1.0}

    def test_padding_does_not_change_results(self, checkpoint):
        p = Predictor(checkpoint, batch_size=8, image_size=(64, 64), precision="f32")
        images, _ = make_blobs(3, 64, 64, seed=2)
        a = p.predict(images)
        b = p.predict(images[:2])
        np.testing.assert_allclose(a[:2], b, atol=1e-6)

    def test_torch_checkpoint_loads(self, tmp_path):
        import sys

        import torch

        if "/root/reference" not in sys.path:
            sys.path.insert(0, "/root/reference")
        from src.unet import UNet as TorchUNet

        torch.manual_seed(0)
        tm = TorchUNet(in_channels=1, out_channels=1, base_channels=64)
        pth = tmp_path / "ref.pth"
        torch.save(tm.state_dict(), pth)

        p = Predictor(pth, batch_size=2, image_size=(64, 64), precision="f32")
        images, _ = make_blobs(2, 64, 64, seed=3)
        probs = p.predict(images)
        tm.eval()
        with torch.no_grad():
            ref = tm(torch.from_numpy(images.transpose(0, 3, 1, 2))).numpy()
        np.testing.assert_allclose(
            probs.transpose(0, 3, 1, 2), ref, atol=2e-5
        )


def test_predict_cli(tmp_path, checkpoint):
    import os
    import subprocess
    import sys
    from pathlib import Path

    from PIL import Image

    input_dir = tmp_path / "in"
    input_dir.mkdir()
    images, _ = make_blobs(3, 64, 64, seed=4)
    for i, img in enumerate(images):
        Image.fromarray((img[..., 0] * 255).astype(np.uint8)).save(
            input_dir / f"img_{i}.png"
        )
    repo = Path(__file__).resolve().parent.parent
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=str(repo))
    code = (
        "import jax; jax.config.update('jax_platforms','cpu'); "
        "import runpy, sys; sys.argv = sys.argv[1:]; "
        "runpy.run_path(sys.argv[0], run_name='__main__')"
    )
    r = subprocess.run(
        [
            sys.executable, "-c", code, str(repo / "predict.py"),
            "--model", str(checkpoint), "--input-dir", str(input_dir),
            "--output-dir", str(tmp_path / "out"), "--image-size", "64", "64",
            "--precision", "f32",
        ],
        capture_output=True, text=True, timeout=600, env=env,
    )
    assert r.returncode == 0, r.stdout + r.stderr
    outs = list((tmp_path / "out").glob("*_mask.png"))
    assert len(outs) == 3


class TestPredictDevice:
    def test_matches_predict(self, checkpoint):
        import jax.numpy as jnp

        p = Predictor(checkpoint, batch_size=4, image_size=(64, 64), precision="f32")
        images, _ = make_blobs(8, 64, 64, seed=9)
        host = p.predict(images)
        dev = np.asarray(p.predict_device(jnp.asarray(images)))
        np.testing.assert_allclose(dev, host, atol=1e-6)
        # tta route agrees with the host tta route too
        host_tta = p.predict(images, tta=True)
        dev_tta = np.asarray(p.predict_device(jnp.asarray(images), tta=True))
        np.testing.assert_allclose(dev_tta, host_tta, atol=1e-5)

    def test_rejects_ragged_n(self, checkpoint):
        import jax.numpy as jnp

        p = Predictor(checkpoint, batch_size=4, image_size=(64, 64), precision="f32")
        images, _ = make_blobs(6, 64, 64, seed=9)
        with pytest.raises(ValueError, match="multiple of batch_size"):
            p.predict_device(jnp.asarray(images))

    def test_tta_rejects_non_square(self, checkpoint):
        import jax.numpy as jnp

        p = Predictor(checkpoint, batch_size=4, image_size=(64, 64), precision="f32")
        with pytest.raises(ValueError, match="square"):
            p.predict_device(jnp.zeros((4, 32, 64, 1), jnp.float32), tta=True)

    def test_params_hot_swap_takes_effect(self, checkpoint):
        # assigning predictor.params must change what predict() serves
        p = Predictor(checkpoint, batch_size=4, image_size=(64, 64), precision="f32")
        images, _ = make_blobs(4, 64, 64, seed=11)
        before = p.predict(images)
        p.params = jax.tree_util.tree_map(lambda a: a * 0.0, p.params)
        after = p.predict(images)
        assert not np.allclose(before, after)
        np.testing.assert_allclose(after, 0.5, atol=1e-6)  # zero weights -> sigmoid(0)


class TestTTA:
    def test_tta_prediction_shape_and_symmetry(self, checkpoint):
        p = Predictor(checkpoint, batch_size=4, image_size=(64, 64), precision="f32")
        images, _ = make_blobs(2, 64, 64, seed=5)
        probs = p.predict(images, tta=True)
        assert probs.shape == (2, 64, 64, 1)
        assert (probs > 0).all() and (probs < 1).all()
        # TTA of a rotated input equals rotated TTA output (equivariance)
        rot = np.ascontiguousarray(np.rot90(images, 1, axes=(1, 2)))
        probs_rot = p.predict(rot, tta=True)
        np.testing.assert_allclose(
            probs_rot, np.rot90(probs, 1, axes=(1, 2)), atol=1e-5
        )

    def test_tta_requires_square(self, checkpoint):
        p = Predictor(checkpoint, batch_size=2, image_size=(64, 64), precision="f32")
        with pytest.raises(ValueError):
            p.predict(np.zeros((1, 32, 64, 1), np.float32), tta=True)


class TestTiledInference:
    def test_large_image_blended(self, checkpoint):
        p = Predictor(checkpoint, batch_size=4, image_size=(64, 64), precision="f32")
        big, _ = make_blobs(1, 160, 224, seed=6)
        probs = p.predict_tiled(big[0], tile=64, overlap=16)
        assert probs.shape == (160, 224, 1)
        assert np.isfinite(probs).all()
        assert (probs > 0).all() and (probs < 1).all()

    def test_small_image_passthrough_equivalent(self, checkpoint):
        p = Predictor(checkpoint, batch_size=4, image_size=(64, 64), precision="f32")
        img, _ = make_blobs(1, 64, 64, seed=7)
        tiled = p.predict_tiled(img[0], tile=64, overlap=16)
        direct = p.predict(img)[0]
        np.testing.assert_allclose(tiled, direct, atol=1e-6)

    def test_threshold_and_overlap_validation(self, checkpoint):
        p = Predictor(checkpoint, batch_size=4, image_size=(64, 64), precision="f32")
        img, _ = make_blobs(1, 96, 96, seed=8)
        mask = p.predict_tiled(img[0], tile=64, overlap=16, threshold=0.5)
        assert set(np.unique(mask)) <= {0.0, 1.0}
        with pytest.raises(ValueError):
            p.predict_tiled(img[0], tile=64, overlap=64)
