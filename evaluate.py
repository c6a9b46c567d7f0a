"""Eval CLI — flag-compatible with /root/reference/evaluate.py.

Usage:
    python evaluate.py --baseline models/unet_baseline.msgpack \
                       --pde models/unet_pde_regularized.msgpack
    python evaluate.py --baseline 'out/*baseline*.msgpack' \
                       --pde 'out/*pde*.msgpack' --repeated

Provenance: flag names, defaults and help strings mirror the reference
CLI (/root/reference/evaluate.py:17-69) verbatim as the interface
contract; the body dispatches to this framework's own comparison code.
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
        "--baseline", type=str, required=True,
        help="Path to baseline model checkpoint (or pattern for repeated experiments)",
    )
    parser.add_argument(
        "--pde", type=str, required=True,
        help="Path to PDE-constrained model checkpoint (or pattern for repeated experiments)",
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

    test_dir = Path(args.test_dir)
    test_json = Path(args.test_json)
    output_dir = Path(args.output_dir)

    if args.repeated:
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
