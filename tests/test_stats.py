"""Statistics vs scipy oracle + plot rendering unit tests."""

import numpy as np
import pytest
from scipy import stats as sps

from physics_informed_image_segmentation_tpu.ops.stats import (
    compare_models_statistically,
    compute_statistics,
    format_metric_report,
)


class TestComputeStatistics:
    def test_nan_filtered_sample_std(self):
        arr = np.asarray([1.0, 2.0, 3.0, np.nan])
        s = compute_statistics(arr)
        assert s["count"] == 3
        np.testing.assert_allclose(s["mean"], 2.0)
        np.testing.assert_allclose(s["std"], np.std([1, 2, 3], ddof=1))

    def test_empty(self):
        s = compute_statistics(np.asarray([np.nan, np.nan]))
        assert s["count"] == 0 and np.isnan(s["mean"])

    def test_single_value(self):
        s = compute_statistics(np.asarray([5.0]))
        assert s["count"] == 1 and s["std"] == 0.0


class TestCompare:
    def test_matches_scipy(self, rng):
        a = rng.normal(0.8, 0.05, 30)
        b = a + rng.normal(0.02, 0.01, 30)
        res = compare_models_statistically({"dice_scores": a}, {"dice_scores": b})
        r = res["dice_scores"]
        t_ref, p_ref = sps.ttest_rel(a, b)
        w_ref, wp_ref = sps.wilcoxon(a, b, alternative="two-sided")
        np.testing.assert_allclose(r["t_statistic"], t_ref)
        np.testing.assert_allclose(r["t_pvalue"], p_ref)
        np.testing.assert_allclose(r["wilcoxon_pvalue"], wp_ref)
        assert r["significant"] == bool(p_ref < 0.05 or wp_ref < 0.05)
        np.testing.assert_allclose(r["improvement"], np.mean(b) - np.mean(a))

    def test_either_p_significance_rule(self, rng):
        # construct a clear improvement -> both tests significant
        a = np.full(20, 0.5) + rng.normal(0, 1e-3, 20)
        b = a + 0.1
        res = compare_models_statistically({"m": a}, {"m": b})
        assert res["m"]["significant"] is True

    def test_nan_pairs_dropped(self, rng):
        a = rng.normal(size=10)
        b = a + 0.01
        a[0] = np.nan
        res = compare_models_statistically({"m": a}, {"m": b})
        # scipy on the 9 clean pairs
        t_ref, p_ref = sps.ttest_rel(a[1:], b[1:])
        np.testing.assert_allclose(res["m"]["t_pvalue"], p_ref)

    def test_degenerate_row_is_total(self):
        res = compare_models_statistically(
            {"m": np.asarray([np.nan, np.nan])}, {"m": np.asarray([1.0, 2.0])}
        )
        r = res["m"]
        assert r["significant"] is False
        for k in ("baseline_mean", "pde_mean", "improvement"):
            assert np.isnan(r[k])

    def test_identical_arrays_no_crash(self):
        a = np.asarray([0.5, 0.6, 0.7])
        res = compare_models_statistically({"m": a}, {"m": a.copy()})
        assert res["m"]["significant"] is False  # wilcoxon zero-diff handled


def test_format_metric_report():
    report = format_metric_report(
        {"dice_scores": np.asarray([0.8, 0.9]), "empty": np.asarray([np.nan])},
        model_name="M",
    )
    assert "M Performance" in report
    assert "Dice Scores: 0.8500" in report
    assert "Empty: N/A" in report


class TestPlots:
    @pytest.fixture
    def csvs(self, tmp_path):
        import pandas as pd

        from physics_informed_image_segmentation_tpu.train.csvlog import (
            EPOCH_CSV_FIELDS,
        )

        rows = []
        for e in range(3):
            row = {k: 0.5 - 0.1 * e for k in EPOCH_CSV_FIELDS}
            row["epoch"] = e + 1
            rows.append(row)
        p1 = tmp_path / "stage1.csv"
        p2 = tmp_path / "stage2.csv"
        pd.DataFrame(rows).to_csv(p1, index=False)
        pd.DataFrame(rows).to_csv(p2, index=False)
        return p1, p2

    def test_all_plot_functions_render(self, csvs, tmp_path):
        from physics_informed_image_segmentation_tpu.utils.plot import (
            plot_all_metrics,
            plot_combined_stage_loss,
            plot_training_curves,
            plot_training_results,
            plot_two_stage_comparison,
        )

        p1, p2 = csvs
        out = tmp_path / "out"
        plot_training_curves(p1, out / "curves.png")
        plot_all_metrics(p1, out / "metrics.png")
        plot_combined_stage_loss(p1, p2, out / "combined.png")
        plot_two_stage_comparison(p1, p2, out / "cmp.png")
        for f in ("curves.png", "metrics.png", "combined.png", "cmp.png"):
            assert (out / f).stat().st_size > 10_000
        plot_training_results(p1, p2, output_dir=out)
        assert (out / "two_stage_comparison.png").exists()
        assert (out / "combined_loss_stage1_stage2.png").exists()
        assert (out / f"{p1.stem}_curves.png").exists()
        assert (out / f"{p2.stem}_all_metrics.png").exists()


class TestProfiling:
    def test_trace_context_produces_xplane(self, tmp_path):
        import jax
        import jax.numpy as jnp

        from physics_informed_image_segmentation_tpu.utils.profiling import trace

        with trace(str(tmp_path / "tr")):
            x = jnp.ones((64, 64)) @ jnp.ones((64, 64))
            float(x.sum())
        files = list((tmp_path / "tr").rglob("*.xplane.pb"))
        assert files, "no xplane produced"

    def test_step_timer_and_meter(self):
        import jax.numpy as jnp

        from physics_informed_image_segmentation_tpu.utils.profiling import (
            StepTimer,
            ThroughputMeter,
        )

        t = StepTimer(warmup=1)
        for _ in range(4):
            with t.step():
                v = jnp.ones((8, 8)) * 3
                t.sync(v)
        assert len(t.times) == 3
        assert t.mean_ms >= 0 and t.p99_ms >= t.p50_ms >= 0
        m = ThroughputMeter(n_devices=1)
        m.start()
        m.add(50)
        rep = m.report()
        assert rep["images"] == 50 and rep["images_per_sec"] > 0
