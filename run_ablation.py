"""Ablation CLI — flag-compatible with /root/reference/run_ablation.py.

Runs R1–R3 / S1–S3 studies (or `all`), with the reference's deprecated
--test-dir/--test-json legacy aliasing onto the in-distribution split
(/root/reference/run_ablation.py:424-427).

TPU-build extras: ``--batched`` runs the sensitivity studies (S1–S3) as
a single vmapped launch over the hyper-parameter grid (see
physics_informed_image_segmentation_tpu.experiments.sweep);
``--resume [STUDY_DIR]`` continues an interrupted study, loading
completed variants' results and retraining only the missing ones.
"""

import argparse
from pathlib import Path

from physics_informed_image_segmentation_tpu.experiments import (
    ALL_STUDIES,
    run_ablation_study,
)


def main():
    parser = argparse.ArgumentParser(
        description="Run ablation studies for PDE-constrained cell segmentation (TPU)"
    )
    parser.add_argument(
        "--ablation", type=str, required=True,
        choices=["R1", "R2", "R3", "S1", "S2", "S3", "all"],
        help='Which ablation study to run. "all" runs all ablation studies.',
    )
    parser.add_argument("--train-dir", type=str, default="images/training")
    parser.add_argument(
        "--train-json", type=str, default="images/annotation/training_annotation.json"
    )
    parser.add_argument("--val-dir", type=str, default="images/validation")
    parser.add_argument(
        "--val-json", type=str, default="images/annotation/validation_annotation.json"
    )
    parser.add_argument(
        "--test-dir", type=str, default="images/testing",
        help="[DEPRECATED] Use --in-dist-test-dir and --out-dist-test-dir instead",
    )
    parser.add_argument(
        "--test-json", type=str,
        default="images/annotation/testing_annotation.json",
        help="[DEPRECATED] Use --in-dist-test-json and --out-dist-test-json instead",
    )
    parser.add_argument("--in-dist-test-dir", type=str, default="images/in_dist_testing")
    parser.add_argument(
        "--in-dist-test-json", type=str,
        default="images/annotation/in_dist_testing_annotation.json",
    )
    parser.add_argument("--out-dist-test-dir", type=str, default="images/out_dist_testing")
    parser.add_argument(
        "--out-dist-test-json", type=str,
        default="images/annotation/out_dist_testing_annotation.json",
    )
    parser.add_argument("--batch-size", type=int, default=8)
    parser.add_argument("--learning-rate", type=float, default=1e-4)
    parser.add_argument("--stage1-epochs", type=int, default=50)
    parser.add_argument("--stage2-epochs", type=int, default=50)
    parser.add_argument("--early-stopping-patience", type=int, default=10)
    parser.add_argument(
        "--output-dir", type=str, default=None,
        help="Root for output/ablation/{name}_{timestamp}/ folders",
    )
    # --- TPU-build extras ---
    parser.add_argument(
        "--precision", type=str, default="bf16", choices=["bf16", "f32"]
    )
    parser.add_argument(
        "--physics-backend", type=str, default="auto",
        choices=["auto", "pallas", "jax"],
    )
    parser.add_argument(
        "--base-channels", type=int, default=64,
        help="U-Net base channel count (default: 64, the reference architecture)",
    )
    parser.add_argument(
        "--batched", action="store_true",
        help="Run S1-S3 sensitivity grids as one vmapped TPU launch",
    )
    parser.add_argument(
        "--resume", type=str, nargs="?", const="latest", default=None,
        metavar="STUDY_DIR",
        help="Resume an interrupted study: completed variants (their "
             "{stem}_results.json exists) are loaded, only missing "
             "variants retrain.  Pass the study folder, or no value to "
             "pick the latest {name}_* folder under the output root.",
    )
    args = parser.parse_args()

    if args.resume is not None and args.batched:
        parser.error("--resume applies to the serial study runner, not --batched")

    in_dist_test_dir = Path(args.in_dist_test_dir).resolve()
    in_dist_test_json = Path(args.in_dist_test_json).resolve()
    # Legacy aliasing (/root/reference/run_ablation.py:424-427)
    if (
        args.test_dir != "images/testing"
        or args.test_json != "images/annotation/testing_annotation.json"
    ):
        print(
            "Warning: --test-dir and --test-json are deprecated. "
            "Using them as in-distribution test set."
        )
        in_dist_test_dir = Path(args.test_dir).resolve()
        in_dist_test_json = Path(args.test_json).resolve()

    studies_to_run = (
        ["R1", "R2", "R3", "S1", "S2", "S3"] if args.ablation == "all" else [args.ablation]
    )

    for ablation_name in studies_to_run:
        variants = ALL_STUDIES[ablation_name]()
        print(f"\n{'=' * 70}")
        print(f"Starting Ablation Study: {ablation_name}")
        print(f"{'=' * 70}")

        if args.batched and ablation_name in ("S1", "S2", "S3"):
            from physics_informed_image_segmentation_tpu.experiments.sweep import (
                run_batched_study,
            )

            results = run_batched_study(
                ablation_name=ablation_name,
                variants=variants,
                train_dir=Path(args.train_dir).resolve(),
                train_json=Path(args.train_json).resolve(),
                val_dir=Path(args.val_dir).resolve(),
                val_json=Path(args.val_json).resolve(),
                in_dist_test_dir=in_dist_test_dir,
                in_dist_test_json=in_dist_test_json,
                out_dist_test_dir=Path(args.out_dist_test_dir).resolve(),
                out_dist_test_json=Path(args.out_dist_test_json).resolve(),
                batch_size=args.batch_size,
                learning_rate=args.learning_rate,
                stage1_epochs=args.stage1_epochs,
                stage2_epochs=args.stage2_epochs,
                early_stopping_patience=args.early_stopping_patience,
                output_dir=Path(args.output_dir).resolve() if args.output_dir else None,
                precision=args.precision,
                base_channels=args.base_channels,
            )
        else:
            resume_from = None
            if args.resume is not None:
                root = (
                    Path(args.output_dir).resolve()
                    if args.output_dir
                    else Path.cwd() / "output" / "ablation"
                )
                if args.resume == "latest":
                    candidates = sorted(
                        root.glob(f"{ablation_name}_*"),
                        key=lambda p: p.stat().st_mtime,
                    )
                    if not candidates:
                        if args.ablation == "all":
                            # an `all` run killed mid-sequence has no
                            # folder yet for the studies it never
                            # reached — start those fresh
                            print(
                                f"[resume] no {ablation_name}_* folder "
                                f"under {root} — starting fresh"
                            )
                            resume_from = None
                        else:
                            parser.error(
                                f"--resume: no {ablation_name}_* study "
                                f"folder under {root}"
                            )
                    else:
                        resume_from = candidates[-1]
                else:
                    resume_from = Path(args.resume).resolve()
                if resume_from is not None:
                    print(f"Resuming study from: {resume_from}")
            results = run_ablation_study(
                ablation_name=ablation_name,
                variants=variants,
                train_dir=Path(args.train_dir).resolve(),
                train_json=Path(args.train_json).resolve(),
                val_dir=Path(args.val_dir).resolve(),
                val_json=Path(args.val_json).resolve(),
                in_dist_test_dir=in_dist_test_dir,
                in_dist_test_json=in_dist_test_json,
                out_dist_test_dir=Path(args.out_dist_test_dir).resolve(),
                out_dist_test_json=Path(args.out_dist_test_json).resolve(),
                batch_size=args.batch_size,
                learning_rate=args.learning_rate,
                stage1_epochs=args.stage1_epochs,
                stage2_epochs=args.stage2_epochs,
                early_stopping_patience=args.early_stopping_patience,
                output_dir=Path(args.output_dir).resolve() if args.output_dir else None,
                precision=args.precision,
                physics_backend=args.physics_backend,
                base_channels=args.base_channels,
                resume_from=resume_from,
            )

        print(f"\nAblation {ablation_name} complete!")
        print(f"Results: {results['results_json']}")
        print(f"Summary: {results['summary_csv']}")

    print("\n" + "=" * 70)
    print("ALL ABLATION STUDIES COMPLETE")
    print("=" * 70)


if __name__ == "__main__":
    main()
