"""Experiments layer: ablation variants/studies, comparisons, CLIs."""

import json
from pathlib import Path

import numpy as np
import pytest

from physics_informed_image_segmentation_tpu.data import DeviceDataset, make_blobs
from physics_informed_image_segmentation_tpu.experiments import (
    ALL_STUDIES,
    AblationConfig,
    create_ablation_loss_config,
    evaluate_and_compare,
    run_ablation_study,
    run_ablation_variant,
    run_repeated_evaluations,
)


@pytest.fixture(scope="module")
def datasets():
    def blobs(n, seed):
        return DeviceDataset.from_numpy(
            *make_blobs(n, 32, 32, max_cells=3, noise=0.08, seed=seed)
        )

    return {
        "train": blobs(10, 0),
        "val": blobs(5, 1),
        "in_dist": blobs(5, 2),
        "out_dist": blobs(5, 3),
    }


_FAST = dict(
    batch_size=4,
    learning_rate=1e-4,
    stage1_epochs=2,
    stage2_epochs=2,
    early_stopping_patience=10,
    precision="f32",
    physics_backend="jax",
    base_channels=8,
)


class TestStudyDefinitions:
    def test_grids_match_reference(self):
        r1 = ALL_STUDIES["R1"]()
        assert len(r1) == 4
        assert r1[0].use_pde is False and r1[0].use_two_stage is False
        assert r1[1].pde_weight == 1e-4 and r1[1].phase_field_weight == 0.0
        assert r1[2].pde_weight == 0.0 and r1[2].phase_field_weight == 1e-4
        assert r1[3].pde_weight == 1e-4 and r1[3].phase_field_weight == 1e-4

        r2 = ALL_STUDIES["R2"]()
        assert [v.train_fraction for v in r2] == [0.1, 0.25, 0.5, 0.75, 1.0]

        r3 = ALL_STUDIES["R3"]()
        assert all(v.train_fraction == 0.1 for v in r3 if v.name != "R3.0 Baseline")

        s1 = ALL_STUDIES["S1"]()
        assert [v.reaction_threshold for v in s1] == [0.3, 0.4, 0.5, 0.6, 0.7]

        s2 = ALL_STUDIES["S2"]()
        assert [v.diffusion_coeff for v in s2] == [0.5, 1.0, 2.0, 5.0, 10.0, 100.0]
        assert all(v.pde_weight == 1e-3 and v.phase_field_weight == 0.0 for v in s2)

        s3 = ALL_STUDIES["S3"]()
        assert [v.epsilon for v in s3] == [0.001, 0.01, 0.05, 0.1, 0.2]

    def test_loss_dispatch(self):
        cfg = create_ablation_loss_config(
            AblationConfig("x", "d", use_pde=False), "jax"
        )
        assert cfg.pde_weight == 0.0 and cfg.phase_field_weight == 0.0
        cfg = create_ablation_loss_config(
            AblationConfig("x", "d", use_pde=True, use_reaction_term=False,
                           pde_weight=1e-3), "jax"
        )
        assert cfg.use_reaction_term is False and cfg.phase_field_weight == 0.0


class TestVariants:
    def test_two_stage_pde_variant(self, datasets, tmp_path):
        config = AblationConfig(
            name="T1.1 RD Only", description="test", use_pde=True,
            pde_weight=1e-4, phase_field_weight=0.0, use_two_stage=True,
        )
        result = run_ablation_variant(
            config, datasets=datasets, ablation_folder=tmp_path, **_FAST
        )
        assert result["baseline_model_path"] and Path(result["baseline_model_path"]).exists()
        assert result["pde_model_path"] and Path(result["pde_model_path"]).exists()
        assert "stage_comparison" in result
        assert set(result["stage_comparison"]) == {"in_dist", "out_dist"}
        assert len(result["in_dist_metrics"]["dice_scores"]) == 5
        # per-variant CSVs with reference naming
        assert (tmp_path / "t1.1_rd_only_stage1_metrics.csv").exists()
        assert (tmp_path / "t1.1_rd_only_stage2_metrics.csv").exists()
        assert (tmp_path / "t1.1_rd_only_stage1_vs_stage2_comparison_in_dist.csv").exists()

    def test_baseline_variant_single_stage(self, datasets, tmp_path):
        config = AblationConfig(
            name="T1.0 Baseline", description="test",
            use_pde=False, pde_weight=0.0, phase_field_weight=0.0,
            use_two_stage=False,
        )
        result = run_ablation_variant(
            config, datasets=datasets, ablation_folder=tmp_path, **_FAST
        )
        assert Path(result["model_path"]).name == "t1.0_baseline_42.msgpack"
        assert "stage_comparison" not in result
        assert "out_dist_metrics" in result

    def test_three_stage_variant(self, datasets, tmp_path):
        config = AblationConfig(
            name="T3 ThreeStage", description="test", use_pde=True,
            pde_weight=1e-4, phase_field_weight=1e-4,
            use_two_stage=True, use_three_stage=True, stage1_epochs=2,
        )
        result = run_ablation_variant(
            config, datasets=datasets, ablation_folder=tmp_path, **_FAST
        )
        sc = result["stage_comparison"]
        assert set(sc) == {"stage1_vs_stage2", "stage1_vs_stage3", "stage2_vs_stage3"}
        assert (tmp_path / "t3_threestage_stage3_metrics.csv").exists()
        assert (tmp_path / "t3_threestage_after_stage3.msgpack").exists()
        assert (tmp_path / "t3_threestage_stage2_vs_stage3_comparison_out_dist.csv").exists()

    def test_train_fraction_subsets(self, datasets, tmp_path):
        config = AblationConfig(
            name="TF", description="test", use_pde=False,
            use_two_stage=False, train_fraction=0.5,
        )
        result = run_ablation_variant(
            config, datasets=datasets, ablation_folder=tmp_path, **_FAST
        )
        assert Path(result["model_path"]).exists()


class TestStudy:
    def test_mini_study_outputs(self, datasets, tmp_path):
        variants = [
            AblationConfig(name="M.0 Baseline", description="d", use_pde=False,
                           use_two_stage=False),
            AblationConfig(name="M.1 Full", description="d", use_pde=True,
                           pde_weight=1e-4, phase_field_weight=1e-4),
        ]
        res = run_ablation_study(
            "MINI", variants, datasets=datasets, output_dir=tmp_path, **_FAST
        )
        folder = Path(res["ablation_folder"])
        assert folder.exists()
        data = json.loads(Path(res["results_json"]).read_text())
        assert data["ablation_name"] == "MINI"
        assert len(data["results"]) == 2
        assert "aggregated_results_in_dist" in data
        assert "M.1 Full" in data["aggregated_results_out_dist"]
        assert Path(res["summary_csv"]).exists()
        assert Path(res["summary_csv_in_dist"]).exists()
        assert Path(res["summary_csv_out_dist"]).exists()

    def test_study_resume_skips_completed_variants(
        self, datasets, tmp_path, monkeypatch
    ):
        """resume_from reloads completed variants' {stem}_results.json
        and retrains only the missing ones, into the same folder."""
        import physics_informed_image_segmentation_tpu.experiments.ablation as abl

        variants = [
            AblationConfig(name="M2.0 Baseline", description="d", use_pde=False,
                           use_two_stage=False),
            AblationConfig(name="M2.1 Full", description="d", use_pde=True,
                           pde_weight=1e-4, phase_field_weight=1e-4),
        ]
        res = run_ablation_study(
            "MINI2", variants, datasets=datasets, output_dir=tmp_path, **_FAST
        )
        folder = Path(res["ablation_folder"])
        assert (folder / "m2.0_baseline_results.json").exists()
        # simulate a crash that lost the second variant's results
        (folder / "m2.1_full_results.json").unlink()

        retrained = []
        real = abl.run_ablation_variant
        monkeypatch.setattr(
            abl, "run_ablation_variant",
            lambda cfg, **kw: retrained.append(cfg.name) or real(cfg, **kw),
        )
        res2 = run_ablation_study(
            "MINI2", variants, datasets=datasets, output_dir=tmp_path,
            resume_from=folder, **_FAST,
        )
        assert retrained == ["M2.1 Full"]          # baseline variant skipped
        assert res2["ablation_folder"] == str(folder)
        data = json.loads(Path(res2["results_json"]).read_text())
        assert [r["config"]["name"] for r in data["results"]] == [
            "M2.0 Baseline", "M2.1 Full",
        ]
        assert "M2.1 Full" in data["aggregated_results_out_dist"]


class TestComparison:
    def test_evaluate_and_compare(self, datasets, tmp_path):
        # train two tiny models quickly by saving random-init params
        import jax
        import jax.numpy as jnp

        from physics_informed_image_segmentation_tpu.models import UNet
        from physics_informed_image_segmentation_tpu.train import save_params

        model = UNet(base_channels=8, dtype=jnp.float32)
        p1 = model.init(jax.random.key(1), jnp.zeros((1, 32, 32, 1)))
        p2 = model.init(jax.random.key(2), jnp.zeros((1, 32, 32, 1)))
        b_path = save_params(p1, tmp_path / "baseline.msgpack")
        p_path = save_params(p2, tmp_path / "pde.msgpack")

        res = evaluate_and_compare(
            b_path, p_path, None, None,
            batch_size=4, output_dir=tmp_path / "out",
            test_data=datasets["in_dist"], base_channels=8,
        )
        assert Path(res["results_csv"]).exists()
        assert Path(res["summary_csv"]).exists()
        comparison = json.loads(Path(res["comparison_json"]).read_text())
        assert "dice_scores" in comparison
        assert "t_pvalue" in comparison["dice_scores"]

    def test_repeated_evaluations(self, datasets, tmp_path):
        import jax
        import jax.numpy as jnp

        from physics_informed_image_segmentation_tpu.models import UNet
        from physics_informed_image_segmentation_tpu.train import save_params

        model = UNet(base_channels=8, dtype=jnp.float32)
        paths = []
        for i in range(2):
            p = model.init(jax.random.key(i), jnp.zeros((1, 32, 32, 1)))
            paths.append(save_params(p, tmp_path / f"m{i}.msgpack"))
        res = run_repeated_evaluations(
            paths, paths, None, None, batch_size=4,
            output_dir=tmp_path / "out", test_data=datasets["in_dist"],
            base_channels=8,
        )
        # pooled across 2 runs × 5 images
        assert len(res["baseline_metrics"]["dice_scores"]) == 10
        assert Path(res["aggregated_csv"]).exists()


def test_public_api_imports():
    """The flat package surface mirrors the reference's 33-name API."""
    import physics_informed_image_segmentation_tpu as pkg

    for name in pkg.__all__:
        assert hasattr(pkg, name), name
    # key reference names present
    for name in [
        "CellSegmentationDataset", "UNet", "EarlyStopping", "train",
        "train_stage", "compare_models_statistically", "AblationConfig",
        "run_ablation_study", "evaluate_and_compare", "plot_training_results",
    ]:
        assert hasattr(pkg, name), name


def test_threshold_changes_metrics(datasets, tmp_path):
    """--threshold must actually flow into evaluation (reference parity)."""
    import jax
    import jax.numpy as jnp

    from physics_informed_image_segmentation_tpu.models import UNet
    from physics_informed_image_segmentation_tpu.train import evaluate_model

    model = UNet(base_channels=8, dtype=jnp.float32)
    params = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 1)))
    lo = evaluate_model(model.apply, params, datasets["in_dist"], 4, threshold=0.05)
    hi = evaluate_model(model.apply, params, datasets["in_dist"], 4, threshold=0.95)
    # extreme thresholds give different binarizations -> different dice
    assert not np.allclose(lo["dice_scores"], hi["dice_scores"])
