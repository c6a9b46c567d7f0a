"""Quickstart: end-to-end run on generated synthetic data.

Creates a synthetic COCO dataset in the reference's directory layout,
trains the two-stage pipeline for a few epochs, evaluates, and writes
predicted masks — exercising every major subsystem in ~2 minutes on a
TPU chip (longer on CPU).

    python examples/quickstart_synthetic.py [workdir]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    workdir = Path(sys.argv[1] if len(sys.argv) > 1 else "quickstart_run").resolve()
    print(f"Working directory: {workdir}")

    from physics_informed_image_segmentation_tpu.data import write_synthetic_coco

    img_root = workdir / "images"
    ann_dir = img_root / "annotation"
    ann_dir.mkdir(parents=True, exist_ok=True)
    for split, n in (("training", 24), ("validation", 8), ("testing", 8)):
        image_dir, ann_path = write_synthetic_coco(
            workdir / f"_gen_{split}", n=n, height=128, width=128,
            seed=abs(hash(split)) % 1000, r_range=(0.15, 0.3),
        )
        dest = img_root / split
        dest.mkdir(parents=True, exist_ok=True)
        for f in image_dir.iterdir():
            (dest / f.name).write_bytes(f.read_bytes())
        (ann_dir / f"{split}_annotation.json").write_text(ann_path.read_text())
    print("Synthetic COCO dataset written.")

    from physics_informed_image_segmentation_tpu.train import train

    res = train(
        stage1_epochs=15,
        stage2_epochs=5,
        batch_size=8,
        learning_rate=3e-4,
        data_root=workdir,
        seed=0,
    )
    print(
        f"\nBest val Dice — Stage I: {res['stage1']['best']['val']['dice_score']:.4f}, "
        f"Stage II: {res['stage2']['best']['val']['dice_score']:.4f}"
    )
    print(
        "Test Dice (Stage II): "
        f"{np.nanmean(res['test_metrics_stage2']['dice_scores']):.4f}"
    )

    from physics_informed_image_segmentation_tpu.serve import Predictor

    predictor = Predictor(res["pde_model"])
    test_images = sorted((img_root / "testing").iterdir())[:4]
    masks = predictor.predict_files(test_images, threshold=0.5)
    out_dir = workdir / "predictions"
    out_dir.mkdir(exist_ok=True)
    from PIL import Image

    for path, mask in zip(test_images, masks):
        Image.fromarray((mask[..., 0] * 255).astype(np.uint8)).save(
            out_dir / f"{path.stem}_mask.png"
        )
    print(f"Wrote {len(test_images)} predicted masks to {out_dir}")


if __name__ == "__main__":
    main()
