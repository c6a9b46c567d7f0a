"""Measure the reference's GPU-independent per-batch HOST cost.

VERDICT r2 item 1b: the bench's idealized A100 denominator (500 img/s)
charitably excludes the reference's per-batch host work, but the
reference *as written* pays it every training batch
(/root/reference/src/train.py:151-160):

  * ``compute_boundary_f1_batch`` — a Python loop that pulls every
    prediction/mask to the host (``.cpu().numpy()``) and runs cv2
    findContours + drawContours + two distanceTransforms per image
    (/root/reference/src/evaluate.py:102-229);
  * per-sample Python-loop Dice/IoU (8 tiny kernels each,
    /root/reference/src/metrics.py:38-73, src/evaluate.py:62-97);
  * 4-6 ``.item()`` syncs per batch.

The cv2 Boundary-F1 block is pure host CPU work, identical no matter
what GPU is attached — measurable on this machine.  This script times
it black-box (dynamic import of the reference module, nothing copied)
on realistic trained-model-like inputs and prints the derivation of the
``vs_a100_reference_as_written`` key in ``bench.py``:

  as-written A100 rate = batch / (idealized_step + t_bf1_host)

Everything else (.item() stalls, metric-loop launch overhead, loss-
component recomputation) is still EXCLUDED — the figure remains
charitable to the reference.

Run on a quiet host:  python scripts/ref_host_cost.py
"""

from __future__ import annotations

import importlib.util
import json
import sys
import time

import numpy as np
import torch

BATCH = 8
SIZE = 128
REPS = 30
A100_IDEALIZED_STEP_S = 0.016  # bench.py: 570 GFLOP @ 35% TF32 ~= 16 ms


def _load_reference_evaluate():
    spec = importlib.util.spec_from_file_location(
        "ref_evaluate", "/root/reference/src/evaluate.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def make_batch(seed: int = 0):
    """Trained-model-like inputs: multi-cell masks, predictions = soft
    blurred masks with noise (so extracted boundaries are realistic —
    empty or trivial masks would make cv2 artificially fast)."""
    rng = np.random.default_rng(seed)
    masks = np.zeros((BATCH, 1, SIZE, SIZE), np.float32)
    yy, xx = np.mgrid[0:SIZE, 0:SIZE]
    for b in range(BATCH):
        for _ in range(int(rng.integers(2, 6))):
            cy, cx = rng.uniform(10, SIZE - 10, 2)
            r = rng.uniform(6, 20)
            masks[b, 0][(yy - cy) ** 2 + (xx - cx) ** 2 < r * r] = 1.0
    # soft predictions: blur the mask and add noise, clip to (0,1)
    from scipy.ndimage import gaussian_filter

    preds = np.stack(
        [gaussian_filter(m[0], 1.5) for m in masks]
    )[:, None]
    preds = np.clip(preds + rng.normal(0, 0.05, preds.shape), 1e-4, 1 - 1e-4)
    return (
        torch.from_numpy(preds.astype(np.float32)),
        torch.from_numpy(masks),
    )


def main() -> None:
    torch.set_num_threads(1)  # matches the BASELINE.md reference runs
    ref = _load_reference_evaluate()
    preds, masks = make_batch()

    # warm-up (cv2 lazy init)
    ref.compute_boundary_f1_batch(preds, masks, threshold=0.5, tolerance=2)

    times = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        ref.compute_boundary_f1_batch(preds, masks, threshold=0.5, tolerance=2)
        times.append(time.perf_counter() - t0)
    t_bf1 = float(np.median(times))

    as_written = BATCH / (A100_IDEALIZED_STEP_S + t_bf1)
    idealized = BATCH / A100_IDEALIZED_STEP_S
    print(
        json.dumps(
            {
                "t_bf1_host_ms_per_batch": round(t_bf1 * 1e3, 2),
                "t_bf1_host_ms_per_image": round(t_bf1 * 1e3 / BATCH, 3),
                "reps": REPS,
                "batch": BATCH,
                "a100_idealized_img_per_s": round(idealized, 1),
                "a100_as_written_img_per_s": round(as_written, 1),
                "derivation": (
                    f"as_written = {BATCH} / ({A100_IDEALIZED_STEP_S} s idealized "
                    f"step + {t_bf1:.4f} s measured cv2 Boundary-F1 host block, "
                    "/root/reference/src/train.py:153-160); .item() stalls and "
                    "metric-loop overhead still excluded (charitable)"
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
