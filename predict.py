"""Inference CLI: predict segmentation masks for a directory of images.

A serving entry point the reference lacks.  Usage:

    python predict.py --model models/unet_pde_regularized.msgpack \
                      --input-dir images/testing --output-dir predictions
    python predict.py --model models/unet_baseline.pth ...   # torch ckpts work
"""

import argparse
from pathlib import Path

import numpy as np


def main():
    parser = argparse.ArgumentParser(description="Predict segmentation masks (TPU)")
    parser.add_argument(
        "--model", type=str, required=True,
        help="Checkpoint path (.msgpack from this framework or reference .pth)",
    )
    parser.add_argument("--input-dir", type=str, required=True)
    parser.add_argument("--output-dir", type=str, default="predictions")
    parser.add_argument("--batch-size", type=int, default=8)
    parser.add_argument(
        "--threshold", type=float, default=0.5,
        help="Binarization threshold; pass -1 to save probability maps",
    )
    parser.add_argument("--image-size", type=int, nargs=2, default=[128, 128])
    parser.add_argument(
        "--precision", type=str, default="bf16", choices=["bf16", "f32"]
    )
    args = parser.parse_args()

    from PIL import Image

    from physics_informed_image_segmentation_tpu.serve import Predictor

    input_dir = Path(args.input_dir)
    output_dir = Path(args.output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    exts = {".png", ".jpg", ".jpeg", ".tif", ".tiff", ".bmp"}
    paths = sorted(p for p in input_dir.iterdir() if p.suffix.lower() in exts)
    if not paths:
        print(f"No images found in {input_dir}")
        return
    print(f"Predicting {len(paths)} images with {args.model} ...")

    predictor = Predictor(
        args.model,
        batch_size=args.batch_size,
        image_size=tuple(args.image_size),
        precision=args.precision,
    )
    threshold = None if args.threshold < 0 else args.threshold
    out = predictor.predict_files(paths, threshold=threshold)

    for path, pred in zip(paths, out):
        arr = (pred[..., 0] * 255).astype(np.uint8)
        Image.fromarray(arr).save(output_dir / f"{path.stem}_mask.png")
    print(f"Wrote {len(paths)} masks to {output_dir}")


if __name__ == "__main__":
    main()
