"""Eval CLI — flag-compatible with /root/reference/evaluate.py.

Usage:
    python evaluate.py --baseline models/unet_baseline.msgpack \
                       --pde models/unet_pde_regularized.msgpack
    python evaluate.py --baseline 'out/*baseline*.msgpack' \
                       --pde 'out/*pde*.msgpack' --repeated
    python evaluate.py --model-path models/unet_pde_regularized.msgpack

Provenance: flag names, defaults and help strings mirror the reference
CLI (/root/reference/evaluate.py:17-69) verbatim as the interface
contract; the body dispatches to this framework's own comparison code.
``--model-path`` (single-model evaluation, no comparison) is the usage
the reference README documents (/root/reference/README.md:162-165) but
its CLI never implemented — supported here so reference users following
that README find it working.
"""

import argparse
from glob import glob
from pathlib import Path

from physics_informed_image_segmentation_tpu.experiments import (
    evaluate_and_compare,
    run_repeated_evaluations,
)


def main():
    parser = argparse.ArgumentParser(
        description="Evaluate and compare segmentation models (TPU)"
    )
    parser.add_argument(
        "--baseline", type=str, default=None,
        help="Path to baseline model checkpoint (or pattern for repeated experiments)",
    )
    parser.add_argument(
        "--pde", type=str, default=None,
        help="Path to PDE-constrained model checkpoint (or pattern for repeated experiments)",
    )
    parser.add_argument(
        "--model-path", type=str, default=None,
        help="Evaluate a SINGLE checkpoint on the test set (no comparison); "
        "the usage documented in the reference README",
    )
    parser.add_argument(
        "--test-dir", type=str, default="images/testing",
        help="Directory containing test images (default: images/testing)",
    )
    parser.add_argument(
        "--test-json", type=str,
        default="images/annotation/testing_annotation.json",
        help="Path to test annotations JSON",
    )
    parser.add_argument("--batch-size", type=int, default=8)
    parser.add_argument(
        "--threshold", type=float, default=0.5,
        help="Threshold for binarizing predictions (default: 0.5)",
    )
    parser.add_argument(
        "--output-dir", type=str, default="output",
        help="Directory to save evaluation results (default: output)",
    )
    parser.add_argument(
        "--base-channels", type=int, default=64,
        help="U-Net base channel count of the checkpoints (default: 64)",
    )
    parser.add_argument(
        "--repeated", action="store_true",
        help="Run repeated experiments evaluation (baseline and pde are glob patterns)",
    )
    args = parser.parse_args()

    if args.model_path is None and (args.baseline is None or args.pde is None):
        parser.error("either --model-path or both --baseline and --pde are required")
    if args.model_path is not None and (args.baseline or args.pde):
        parser.error("--model-path is mutually exclusive with --baseline/--pde")

    test_dir = Path(args.test_dir)
    test_json = Path(args.test_json)
    output_dir = Path(args.output_dir)

    if args.model_path:
        import json

        from physics_informed_image_segmentation_tpu.compat import (
            evaluate_on_test_set,
        )
        from physics_informed_image_segmentation_tpu.experiments.compare import (
            load_unet_params,
            make_json_serializable,
        )
        from physics_informed_image_segmentation_tpu.ops.stats import (
            compute_statistics,
        )

        model_path = Path(args.model_path)
        if not model_path.exists():
            print(f"Error: Model not found: {model_path}")
            return
        module_params = load_unet_params(
            model_path, base_channels=args.base_channels, dtype="f32"
        )
        metrics = evaluate_on_test_set(
            module_params,
            test_dir,
            test_json,
            batch_size=args.batch_size,
            threshold=args.threshold,
            model_name=model_path.stem,
        )
        output_dir.mkdir(parents=True, exist_ok=True)
        payload = {
            name: {"statistics": compute_statistics(values),
                   "per_image": list(values)}
            for name, values in metrics.items()
        }
        out_json = output_dir / f"single_model_metrics_{model_path.stem}.json"
        with open(out_json, "w") as f:
            json.dump(make_json_serializable(payload), f, indent=2)
        print(f"\nPer-image metrics saved to: {out_json}")
    elif args.repeated:
        baseline_paths = sorted(glob(args.baseline))
        pde_paths = sorted(glob(args.pde))
        if len(baseline_paths) == 0:
            print(f"Error: No baseline models found matching pattern: {args.baseline}")
            return
        if len(pde_paths) == 0:
            print(f"Error: No PDE models found matching pattern: {args.pde}")
            return
        if len(baseline_paths) != len(pde_paths):
            print(
                f"Warning: Number of baseline models ({len(baseline_paths)}) != "
                f"number of PDE models ({len(pde_paths)})"
            )
        print(f"\nFound {len(baseline_paths)} baseline models")
        print(f"Found {len(pde_paths)} PDE-constrained models")
        run_repeated_evaluations(
            baseline_model_paths=[Path(p) for p in baseline_paths],
            pde_model_paths=[Path(p) for p in pde_paths],
            test_dir=test_dir,
            test_json=test_json,
            batch_size=args.batch_size,
            threshold=args.threshold,
            output_dir=output_dir,
            base_channels=args.base_channels,
        )
    else:
        baseline_path = Path(args.baseline)
        pde_path = Path(args.pde)
        if not baseline_path.exists():
            print(f"Error: Baseline model not found: {baseline_path}")
            return
        if not pde_path.exists():
            print(f"Error: PDE model not found: {pde_path}")
            return
        evaluate_and_compare(
            baseline_model_path=baseline_path,
            pde_model_path=pde_path,
            test_dir=test_dir,
            test_json=test_json,
            batch_size=args.batch_size,
            threshold=args.threshold,
            output_dir=output_dir,
            base_channels=args.base_channels,
        )

    print("\n" + "=" * 70)
    print("EVALUATION COMPLETE")
    print("=" * 70)


if __name__ == "__main__":
    main()
