"""Drop-in API parity: all 31 reference exports under their exact names.

The reference package's ``__all__`` (/root/reference/src/__init__.py:35-67)
must be importable from this package name-for-name, and the class shims
(`compat.py`) must reproduce the reference numerics call-for-call.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

import physics_informed_image_segmentation_tpu as pkg
from physics_informed_image_segmentation_tpu.ops.metrics import boundary_f1_per_sample

import torch_oracle

# Verbatim list of /root/reference/src/__init__.py:35-67 (31 names).
REFERENCE_ALL = [
    "CellSegmentationDataset",
    "UNet",
    "DiceBCELoss",
    "DiceBCEPDELoss",
    "PDERegularization",
    "create_pde_regularization",
    "compute_dice_score",
    "compute_dice_score_batch",
    "EarlyStopping",
    "train_stage",
    "validate",
    "train",
    "plot_training_curves",
    "plot_two_stage_comparison",
    "plot_all_metrics",
    "plot_training_results",
    "compute_iou",
    "compute_iou_batch",
    "compute_boundary_f1",
    "compute_boundary_f1_batch",
    "compute_hausdorff_distance",
    "evaluate_model",
    "evaluate_on_test_set",
    "compare_models_statistically",
    "format_metric_report",
    "compute_statistics",
    "evaluate_and_compare",
    "run_repeated_evaluations",
    "AblationConfig",
    "run_ablation_variant",
    "run_ablation_study",
]


def test_reference_all_is_31_names():
    assert len(REFERENCE_ALL) == 31
    assert len(set(REFERENCE_ALL)) == 31


@pytest.mark.parametrize("name", REFERENCE_ALL)
def test_reference_name_importable(name):
    obj = getattr(pkg, name)
    assert obj is not None
    assert callable(obj) or isinstance(obj, type)


def test_reference_names_in_package_all():
    for name in REFERENCE_ALL:
        assert name in pkg.__all__, name


def _rand_pair(rng, shape=(2, 1, 16, 20)):
    pred = rng.uniform(0.02, 0.98, size=shape).astype(np.float32)
    target = (rng.uniform(size=shape) > 0.5).astype(np.float32)
    return pred, target


class TestLossClasses:
    def test_dice_bce_loss_matches_torch(self, rng):
        pred, target = _rand_pair(rng)
        ours = pkg.DiceBCELoss()(jnp.asarray(pred), jnp.asarray(target))
        ref = torch_oracle.dice_bce(torch.tensor(pred), torch.tensor(target))
        np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)

    def test_dice_bce_loss_custom_weights(self, rng):
        pred, target = _rand_pair(rng)
        ours = pkg.DiceBCELoss(dice_weight=0.7, bce_weight=0.3)(
            jnp.asarray(pred), jnp.asarray(target)
        )
        p, t = torch.tensor(pred).reshape(-1), torch.tensor(target).reshape(-1)
        inter = (p * t).sum()
        dice = 1 - (2 * inter + 1e-6) / (p.sum() + t.sum() + 1e-6)
        bce = torch.nn.functional.binary_cross_entropy(
            torch.tensor(pred), torch.tensor(target)
        )
        np.testing.assert_allclose(
            float(ours), float(0.7 * dice + 0.3 * bce), rtol=1e-5
        )

    def test_dice_bce_pde_loss_matches_torch(self, rng):
        pred, target = _rand_pair(rng)
        loss = pkg.DiceBCEPDELoss(
            pde_weight=1e-2,
            phase_field_weight=1e-3,
            diffusion_coeff=1.5,
            reaction_threshold=0.4,
            epsilon=0.07,
        )
        ours = loss(jnp.asarray(pred), jnp.asarray(target))
        ref = torch_oracle.dice_bce_pde(
            torch.tensor(pred), torch.tensor(target),
            lam_rd=1e-2, lam_pf=1e-3, D=1.5, a=0.4, eps=0.07,
        )
        np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)

    def test_loss_classes_are_jit_and_grad_compatible(self, rng):
        pred, target = _rand_pair(rng, shape=(1, 1, 12, 12))
        loss = pkg.DiceBCEPDELoss(pde_weight=1e-3)
        g = jax.jit(jax.grad(lambda p: loss(p, jnp.asarray(target))))(
            jnp.asarray(pred)
        )
        assert g.shape == pred.shape
        assert np.all(np.isfinite(np.asarray(g)))

    def test_forward_alias(self, rng):
        pred, target = _rand_pair(rng, shape=(1, 1, 8, 8))
        loss = pkg.DiceBCELoss()
        assert float(loss.forward(jnp.asarray(pred), jnp.asarray(target))) == float(
            loss(jnp.asarray(pred), jnp.asarray(target))
        )


class TestPDERegularization:
    def test_methods_match_torch(self, rng):
        u_np = rng.uniform(0.05, 0.95, size=(2, 1, 14, 18)).astype(np.float32)
        u, ut = jnp.asarray(u_np), torch.tensor(u_np)
        reg = pkg.PDERegularization(diffusion_coeff=2.0, reaction_threshold=0.3)

        np.testing.assert_allclose(
            np.asarray(reg.compute_laplacian(u)),
            torch_oracle.laplacian(ut).numpy(), atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(reg.reaction_term(u)),
            (ut * (1 - ut) * (ut - 0.3)).numpy(), atol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(reg.compute_residual(u)),
            torch_oracle.rd_residual(ut, 2.0, 0.3).numpy(), atol=1e-5,
        )
        np.testing.assert_allclose(
            float(reg.compute_loss(u)),
            float(torch_oracle.rd_loss(ut, 2.0, 0.3)), rtol=1e-5,
        )
        gx, gy = torch_oracle.grad_xy(ut)
        np.testing.assert_allclose(
            np.asarray(reg.compute_gradient_magnitude(u)),
            (gx**2 + gy**2).numpy(), atol=1e-6,
        )
        np.testing.assert_allclose(
            float(reg.compute_phase_field_loss(u, epsilon=0.08)),
            float(torch_oracle.phase_field(ut, 0.08)), rtol=1e-5,
        )

    def test_validation_errors(self):
        with pytest.raises(ValueError):
            pkg.PDERegularization(diffusion_coeff=0.0)
        with pytest.raises(ValueError):
            pkg.PDERegularization(reaction_threshold=1.0)
        with pytest.raises(ValueError):
            pkg.PDERegularization().compute_phase_field_loss(
                jnp.zeros((1, 1, 4, 4)), epsilon=0.0
            )

    def test_factory(self):
        reg = pkg.create_pde_regularization(
            diffusion_coeff=3.0, reaction_threshold=0.6
        )
        assert isinstance(reg, pkg.PDERegularization)
        assert reg.diffusion_coeff == 3.0
        assert reg.reaction_threshold == 0.6

    def test_dice_bce_pde_exposes_pde_regularization_attr(self):
        loss = pkg.DiceBCEPDELoss(diffusion_coeff=2.5)
        assert isinstance(loss.pde_regularization, pkg.PDERegularization)
        assert loss.pde_regularization.diffusion_coeff == 2.5


class TestSingleSampleBoundaryF1:
    def test_uses_first_sample_only(self, rng):
        # Two samples with different masks — the single-sample form must
        # score sample 0 only, like /root/reference/src/evaluate.py:125-193.
        pred = np.zeros((2, 1, 24, 24), np.float32)
        target = np.zeros((2, 1, 24, 24), np.float32)
        pred[0, 0, 6:18, 6:18] = 1.0
        target[0, 0, 7:19, 7:19] = 1.0
        pred[1, 0, 2:6, 2:6] = 1.0  # wildly different sample 1
        target[1, 0, 16:22, 16:22] = 1.0

        single = pkg.compute_boundary_f1(jnp.asarray(pred), jnp.asarray(target))
        assert single.ndim == 0
        per_sample = boundary_f1_per_sample(
            jnp.asarray(pred[:, 0]), jnp.asarray(target[:, 0])
        )
        np.testing.assert_allclose(float(single), float(per_sample[0]), rtol=1e-6)
        assert abs(float(per_sample[1]) - float(single)) > 0.1

    def test_accepts_unbatched(self):
        m = np.zeros((16, 16), np.float32)
        m[4:12, 4:12] = 1.0
        score = pkg.compute_boundary_f1(jnp.asarray(m), jnp.asarray(m))
        assert float(score) > 0.99

    def test_channels_last_layout_matches_nchw(self, rng):
        # This package's native layout is (B, H, W, 1); the shim must
        # score the same image as the torch-layout (B, 1, H, W) call,
        # not silently strip batch+H and score a (W, 1) strip.
        pred = np.zeros((2, 24, 24, 1), np.float32)
        target = np.zeros((2, 24, 24, 1), np.float32)
        pred[0, 6:18, 6:18, 0] = 1.0
        target[0, 7:19, 7:19, 0] = 1.0
        nhwc = pkg.compute_boundary_f1(jnp.asarray(pred), jnp.asarray(target))
        nchw = pkg.compute_boundary_f1(
            jnp.asarray(pred.transpose(0, 3, 1, 2)),
            jnp.asarray(target.transpose(0, 3, 1, 2)),
        )
        np.testing.assert_allclose(float(nhwc), float(nchw), rtol=1e-6)
        assert 0.0 < float(nhwc) <= 1.0


class TestEvaluateOnTestSet:
    @pytest.fixture(scope="class")
    def coco_dir(self, tmp_path_factory):
        from physics_informed_image_segmentation_tpu.data import write_synthetic_coco

        return write_synthetic_coco(tmp_path_factory.mktemp("compat_coco"), n=5)

    @pytest.fixture(scope="class")
    def small_model(self):
        model = pkg.UNet(in_channels=1, out_channels=1, base_channels=4)
        params = model.init(
            jax.random.key(0), jnp.zeros((1, 96, 112, 1), jnp.float32)
        )
        return model, params

    def test_module_params_pair(self, coco_dir, small_model, capsys):
        image_dir, ann = coco_dir
        metrics = pkg.evaluate_on_test_set(
            small_model, image_dir, ann, None, batch_size=4, model_name="Shim"
        )
        for key in (
            "dice_scores",
            "iou_scores",
            "boundary_f1_scores",
            "hausdorff_distances",
        ):
            assert key in metrics
            assert len(metrics[key]) == 5
        out = capsys.readouterr().out
        assert "Shim" in out

    def test_rejects_bad_model_arg(self, coco_dir):
        image_dir, ann = coco_dir
        with pytest.raises(TypeError):
            pkg.evaluate_on_test_set(42, image_dir, ann)

    def test_accepts_predictor(self, coco_dir, small_model, tmp_path):
        # the documented serve.Predictor form must actually work
        from physics_informed_image_segmentation_tpu.serve import Predictor
        from physics_informed_image_segmentation_tpu.train.checkpoint import (
            save_params,
        )

        image_dir, ann = coco_dir
        model, params = small_model
        ckpt = save_params(params, tmp_path / "compat_pred.msgpack")
        p = Predictor(
            ckpt, model=model, batch_size=4, image_size=(96, 112),
            precision="f32", base_channels=4,
        )
        metrics = pkg.evaluate_on_test_set(p, image_dir, ann, batch_size=4)
        direct = pkg.evaluate_on_test_set(
            small_model, image_dir, ann, batch_size=4
        )
        np.testing.assert_allclose(
            metrics["dice_scores"], direct["dice_scores"], rtol=1e-6
        )

    def test_bf16_predictor_under_f32_default_warns(self, coco_dir, tmp_path):
        # a bf16 Predictor evaluates in bf16 regardless of dtype='f32';
        # that silent precision downgrade must warn (advisor r2 finding)
        import warnings

        from physics_informed_image_segmentation_tpu.serve import Predictor
        from physics_informed_image_segmentation_tpu.train.checkpoint import (
            save_params,
        )

        image_dir, ann = coco_dir
        model = pkg.UNet(
            in_channels=1, out_channels=1, base_channels=4, dtype=jnp.bfloat16
        )
        params = model.init(
            jax.random.key(0), jnp.zeros((1, 96, 112, 1), jnp.float32)
        )
        ckpt = save_params(params, tmp_path / "compat_bf16.msgpack")
        p = Predictor(
            ckpt, model=model, batch_size=4, image_size=(96, 112),
            precision="bf16", base_channels=4,
        )
        with warnings.catch_warnings(record=True) as caught:
            warnings.simplefilter("always")
            pkg.evaluate_on_test_set(p, image_dir, ann, batch_size=4)
        assert any("bfloat16" in str(w.message) for w in caught)
