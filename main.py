"""Train CLI — flag-compatible with the reference /root/reference/main.py.

Usage: python main.py [--single-stage] [--pde-weight 1e-4] ...
TPU-build extras: --data-root, --precision, --physics-backend, --no-plots.

Provenance: flag names, defaults and help strings mirror the reference
CLI (/root/reference/main.py:6-86) verbatim — they ARE the interface
contract this entry point promises; the body dispatches to this
framework's own `train()`.

NOTE on --early-stopping-patience: the reference CLI defaults to 5 while
its help text and train() signature say 10 (/root/reference/main.py:71-72
vs src/train.py:542).  We keep the CLI default of 5 for behavioural
parity with `python main.py`.
"""

import argparse

from physics_informed_image_segmentation_tpu.train import train


def main():
    parser = argparse.ArgumentParser(
        description="Train PDE-constrained cell segmentation model (TPU)"
    )
    parser.add_argument(
        "--single-stage",
        action="store_true",
        help="Use single-stage training (PDE from start) instead of two-stage",
    )
    parser.add_argument(
        "--pde-weight", type=float, default=1e-4,
        help="Weight for PDE regularization λ_RD (default: 1e-4, optimal)",
    )
    parser.add_argument(
        "--diffusion-coeff", type=float, default=5.0,
        help="Diffusion coefficient D for PDE (default: 5.0, optimal)",
    )
    parser.add_argument(
        "--reaction-threshold", type=float, default=0.5,
        help="Reaction term threshold a for PDE (default: 0.5, optimal)",
    )
    parser.add_argument(
        "--phase-field-weight", type=float, default=1e-4,
        help="Weight for phase-field energy λ_PF (default: 1e-4, optimal)",
    )
    parser.add_argument(
        "--epsilon", type=float, default=0.05,
        help="Interface width parameter ε for phase-field energy (default: 0.05, optimal)",
    )
    parser.add_argument(
        "--batch-size", type=int, default=8,
        help="Batch size for training (default: 8, recommended: 8-16)",
    )
    parser.add_argument(
        "--learning-rate", type=float, default=1e-4,
        help="Learning rate for AdamW optimizer (default: 1e-4)",
    )
    parser.add_argument(
        "--stage1-epochs", type=int, default=50,
        help="Maximum epochs for Stage I (baseline training) (default: 50)",
    )
    parser.add_argument(
        "--stage2-epochs", type=int, default=50,
        help="Maximum epochs for Stage II (PDE fine-tuning) (default: 50)",
    )
    parser.add_argument(
        "--early-stopping-patience", type=int, default=5,
        help="Patience for early stopping (default: 10)",
    )
    parser.add_argument(
        "--train-fraction", type=float, default=None,
        help="Fraction of training data to use (e.g., 0.1 for 10%%, 0.25 for 25%%)",
    )
    parser.add_argument(
        "--seed", type=int, default=42,
        help="Random seed for reproducibility (default: 42)",
    )
    # --- TPU-build extras ---
    parser.add_argument(
        "--data-root", type=str, default=None,
        help="Root directory containing images/ (default: cwd)",
    )
    parser.add_argument(
        "--precision", type=str, default="bf16", choices=["bf16", "f32"],
        help="Compute precision for the model (default: bf16)",
    )
    parser.add_argument(
        "--physics-backend", type=str, default="auto",
        choices=["auto", "pallas", "jax"],
        help="Physics loss implementation (default: auto = pallas on TPU)",
    )
    parser.add_argument("--no-plots", action="store_true", help="Skip plot generation")
    parser.add_argument(
        "--base-channels", type=int, default=64,
        help="U-Net base channel count (default: 64, the reference architecture)",
    )
    parser.add_argument(
        "--checkpoint-every", type=int, default=0,
        help="Write a full Orbax train-state checkpoint every N epochs "
             "under {models}/checkpoints/ (default: 0 = off)",
    )
    parser.add_argument(
        "--checkpoint-keep", type=int, default=2,
        help="Retain only the newest N train-state checkpoints per stage "
             "(default: 2; 0 = keep all — each is ~250 MB at base-channels 64)",
    )
    parser.add_argument(
        "--resume", action="store_true",
        help="Continue an interrupted run in the same output/models dirs: "
             "completed stages are skipped, a partial stage restarts from "
             "its latest checkpoint and continues its CSV in place "
             "(bit-identical to an uninterrupted run at equal precision)",
    )
    args = parser.parse_args()

    train(
        use_two_stage=not args.single_stage,
        pde_weight=args.pde_weight,
        diffusion_coeff=args.diffusion_coeff,
        reaction_threshold=args.reaction_threshold,
        phase_field_weight=args.phase_field_weight,
        epsilon=args.epsilon,
        batch_size=args.batch_size,
        learning_rate=args.learning_rate,
        stage1_epochs=args.stage1_epochs,
        stage2_epochs=args.stage2_epochs,
        early_stopping_patience=args.early_stopping_patience,
        train_fraction=args.train_fraction,
        seed=args.seed,
        data_root=args.data_root,
        precision=args.precision,
        physics_backend=args.physics_backend,
        make_plots=not args.no_plots,
        base_channels=args.base_channels,
        checkpoint_every=args.checkpoint_every,
        checkpoint_keep=args.checkpoint_keep or None,
        resume=args.resume,
    )


if __name__ == "__main__":
    main()
