"""Model-pair comparison harness (checkpoint → metrics → statistics → CSVs).

Equivalent of /root/reference/src/evaluate_comparison.py: evaluate a
baseline checkpoint vs a PDE checkpoint on a test set, run paired
t-test + Wilcoxon, persist per-image CSV, summary CSV and comparison
JSON; plus the multi-seed pooled variant.
"""

from __future__ import annotations

import json
from datetime import datetime
from pathlib import Path
from typing import Any, Dict, List, Optional

import jax
import numpy as np
import pandas as pd

from ..data import CocoSegmentationSource, DeviceDataset
from ..models import UNet
from ..ops.stats import (
    compare_models_statistically,
    compute_statistics,
    format_metric_report,
)
from ..train.checkpoint import load_params
from ..train.evaluation import evaluate_model

__all__ = [
    "make_json_serializable",
    "load_unet_params",
    "evaluate_and_compare",
    "run_repeated_evaluations",
]

_METRIC_KEYS = ["dice_scores", "iou_scores", "boundary_f1_scores", "hausdorff_distances"]


def make_json_serializable(obj: Any) -> Any:
    """numpy / jax scalars → native types
    (/root/reference/src/evaluate_comparison.py:32-58)."""
    if isinstance(obj, (np.integer,)):
        return int(obj)
    if isinstance(obj, (np.floating,)):
        return float(obj)
    if isinstance(obj, np.bool_):
        return bool(obj)
    if isinstance(obj, (np.ndarray, jax.Array)):
        return np.asarray(obj).tolist()
    if isinstance(obj, dict):
        return {k: make_json_serializable(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [make_json_serializable(v) for v in obj]
    if isinstance(obj, (bool, int, float, str)) or obj is None:
        return obj
    return str(obj)


def load_unet_params(
    model_path,
    model: Optional[UNet] = None,
    base_channels: int = 64,
    dtype: str = "bf16",
):
    """(model, params) from a msgpack artifact
    (/root/reference/src/evaluate_comparison.py:61-76)."""
    import jax.numpy as jnp

    if model is None:
        model = UNet(
            in_channels=1, out_channels=1, base_channels=base_channels,
            dtype=jnp.float32 if dtype in ("f32", "float32") else jnp.bfloat16,
        )
    template = model.init(jax.random.key(0), jnp.zeros((1, 128, 128, 1), jnp.float32))
    return model, load_params(model_path, template)


def _load_test_data(test_dir, test_json) -> DeviceDataset:
    src = CocoSegmentationSource(Path(test_dir), Path(test_json))
    return DeviceDataset.from_numpy(src.images, src.masks)


def _print_comparison(comparison_results: dict) -> None:
    print("\nStatistical Test Results (α = 0.05):")
    print("-" * 70)
    for metric_name, r in comparison_results.items():
        print(f"\n{metric_name.replace('_', ' ').title()}:")
        print(f"  Baseline Mean: {r['baseline_mean']:.4f}")
        print(f"  PDE Mean:      {r['pde_mean']:.4f}")
        print(f"  Improvement:   {r['improvement']:+.4f}")
        print("  Paired t-test:")
        print(f"    t-statistic: {r['t_statistic']:.4f}")
        print(f"    p-value:     {r['t_pvalue']:.4f}")
        print("  Wilcoxon signed-rank test:")
        print(f"    statistic:   {r['wilcoxon_statistic']:.4f}")
        print(f"    p-value:     {r['wilcoxon_pvalue']:.4f}")
        print(f"  Significant:  {'Yes' if r['significant'] else 'No'}")


def evaluate_and_compare(
    baseline_model_path,
    pde_model_path,
    test_dir,
    test_json,
    batch_size: int = 8,
    threshold: float = 0.5,
    output_dir=None,
    test_data: Optional[DeviceDataset] = None,
    base_channels: int = 64,
    dtype: str = "bf16",
) -> Dict:
    """Evaluate both checkpoints + statistical comparison + artifacts
    (/root/reference/src/evaluate_comparison.py:79-227).

    ``dtype``: compute dtype for evaluation ("bf16" default; pass "f32"
    for exact-precision comparisons against the f32 reference)."""
    output_dir = Path(output_dir) if output_dir is not None else Path.cwd() / "output"
    output_dir.mkdir(parents=True, exist_ok=True)

    print("=" * 70)
    print("MODEL EVALUATION AND STATISTICAL COMPARISON")
    print("=" * 70)
    print("\nLoading models...")
    model, baseline_params = load_unet_params(
        baseline_model_path, base_channels=base_channels, dtype=dtype
    )
    _, pde_params = load_unet_params(pde_model_path, model)

    if test_data is None:
        test_data = _load_test_data(test_dir, test_json)

    print("\nEvaluating Baseline (Unconstrained) on test set...")
    baseline_metrics = evaluate_model(
        model.apply, baseline_params, test_data, batch_size, threshold=threshold
    )
    print(format_metric_report(baseline_metrics, "Baseline (Unconstrained)"))
    print("\nEvaluating PDE-Constrained on test set...")
    pde_metrics = evaluate_model(
        model.apply, pde_params, test_data, batch_size, threshold=threshold
    )
    print(format_metric_report(pde_metrics, "PDE-Constrained"))

    print("\n" + "=" * 70)
    print("STATISTICAL COMPARISON")
    print("=" * 70)
    comparison_results = compare_models_statistically(
        baseline_metrics, pde_metrics, alpha=0.05
    )
    _print_comparison(comparison_results)

    timestamp = datetime.now().strftime("%Y%m%d_%H%M%S")
    results_df = pd.DataFrame(
        {
            "image_id": range(len(baseline_metrics["dice_scores"])),
            "baseline_dice": baseline_metrics["dice_scores"],
            "pde_dice": pde_metrics["dice_scores"],
            "baseline_iou": baseline_metrics["iou_scores"],
            "pde_iou": pde_metrics["iou_scores"],
            "baseline_boundary_f1": baseline_metrics["boundary_f1_scores"],
            "pde_boundary_f1": pde_metrics["boundary_f1_scores"],
            "baseline_hausdorff": baseline_metrics["hausdorff_distances"],
            "pde_hausdorff": pde_metrics["hausdorff_distances"],
        }
    )
    results_csv = output_dir / f"evaluation_results_{timestamp}.csv"
    results_df.to_csv(results_csv, index=False)
    print(f"\nPer-image metrics saved to: {results_csv}")

    summary_data = {}
    for metric_name in baseline_metrics:
        b = compute_statistics(baseline_metrics[metric_name])
        p = compute_statistics(pde_metrics[metric_name])
        c = comparison_results[metric_name]
        summary_data[metric_name] = {
            "baseline_mean": b["mean"],
            "baseline_std": b["std"],
            "pde_mean": p["mean"],
            "pde_std": p["std"],
            "improvement": c["improvement"],
            "t_pvalue": c["t_pvalue"],
            "wilcoxon_pvalue": c["wilcoxon_pvalue"],
            "significant": c["significant"],
        }
    summary_csv = output_dir / f"evaluation_summary_{timestamp}.csv"
    pd.DataFrame(summary_data).T.to_csv(summary_csv)
    print(f"Summary statistics saved to: {summary_csv}")

    comparison_json = output_dir / f"statistical_comparison_{timestamp}.json"
    with open(comparison_json, "w") as f:
        json.dump(make_json_serializable(comparison_results), f, indent=2)
    print(f"Statistical comparison saved to: {comparison_json}")

    return {
        "baseline_metrics": baseline_metrics,
        "pde_metrics": pde_metrics,
        "comparison_results": comparison_results,
        "results_csv": results_csv,
        "summary_csv": summary_csv,
        "comparison_json": comparison_json,
    }


def run_repeated_evaluations(
    baseline_model_paths: List,
    pde_model_paths: List,
    test_dir,
    test_json,
    batch_size: int = 8,
    threshold: float = 0.5,
    output_dir=None,
    test_data: Optional[DeviceDataset] = None,
    base_channels: int = 64,
    dtype: str = "bf16",
) -> Dict:
    """Pool per-image metrics across N seed-paired checkpoint pairs, then
    compare (/root/reference/src/evaluate_comparison.py:230-396).

    ``dtype`` sets the eval compute precision ("bf16" default; pass
    "f32" for reference-matching paired-test sensitivity — bf16 eval
    noise can flip significance on small effects, see PARITY_RUN.md).
    """
    output_dir = Path(output_dir) if output_dir is not None else Path.cwd() / "output"
    output_dir.mkdir(parents=True, exist_ok=True)

    print("=" * 70)
    print("REPEATED EXPERIMENTS EVALUATION")
    print("=" * 70)
    print(f"Number of runs: {len(baseline_model_paths)}")

    if test_data is None:
        test_data = _load_test_data(test_dir, test_json)

    all_baseline = {k: [] for k in _METRIC_KEYS}
    all_pde = {k: [] for k in _METRIC_KEYS}
    model = None
    for run_idx, (b_path, p_path) in enumerate(
        zip(baseline_model_paths, pde_model_paths)
    ):
        print(f"\n{'=' * 70}\nRun {run_idx + 1}/{len(baseline_model_paths)}\n{'=' * 70}")
        model, b_params = load_unet_params(b_path, model, base_channels, dtype)
        _, p_params = load_unet_params(p_path, model)
        bm = evaluate_model(model.apply, b_params, test_data, batch_size, threshold=threshold)
        pm = evaluate_model(model.apply, p_params, test_data, batch_size, threshold=threshold)
        for k in _METRIC_KEYS:
            all_baseline[k].extend(bm[k])
            all_pde[k].extend(pm[k])

    all_baseline = {k: np.asarray(v) for k, v in all_baseline.items()}
    all_pde = {k: np.asarray(v) for k, v in all_pde.items()}

    print("\n" + "=" * 70)
    print("AGGREGATED RESULTS (All Runs Combined)")
    print("=" * 70)
    print(format_metric_report(all_baseline, "Baseline (All Runs)"))
    print(format_metric_report(all_pde, "PDE-Constrained (All Runs)"))

    comparison_results = compare_models_statistically(all_baseline, all_pde, alpha=0.05)
    print("\n" + "=" * 70)
    print("STATISTICAL COMPARISON (Aggregated)")
    print("=" * 70)
    for metric_name, r in comparison_results.items():
        print(f"\n{metric_name.replace('_', ' ').title()}:")
        print(f"  Baseline: {r['baseline_mean']:.4f} ± {r.get('baseline_std', 0):.4f}")
        print(f"  PDE:      {r['pde_mean']:.4f} ± {r.get('pde_std', 0):.4f}")
        print(f"  Improvement: {r['improvement']:+.4f}")
        print(
            f"  Significant: {'Yes' if r['significant'] else 'No'} "
            f"(p={r['t_pvalue']:.4f})"
        )

    timestamp = datetime.now().strftime("%Y%m%d_%H%M%S")
    rows = []
    for metric_name in _METRIC_KEYS:
        for label, metrics in (("baseline", all_baseline), ("pde", all_pde)):
            s = compute_statistics(metrics[metric_name])
            rows.append(
                {
                    "metric": metric_name,
                    "model": label,
                    "mean": s["mean"],
                    "std": s["std"],
                    "count": s["count"],
                }
            )
    aggregated_csv = output_dir / f"aggregated_results_{timestamp}.csv"
    pd.DataFrame(rows).to_csv(aggregated_csv, index=False)
    print(f"\nAggregated results saved to: {aggregated_csv}")

    return {
        "baseline_metrics": all_baseline,
        "pde_metrics": all_pde,
        "comparison_results": comparison_results,
        "aggregated_csv": aggregated_csv,
    }
