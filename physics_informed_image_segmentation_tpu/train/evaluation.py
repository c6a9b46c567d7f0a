"""Model evaluation: per-image metric sweeps over a dataset.

Equivalent of /root/reference/src/evaluate.py:279-345,476-523.  Dice /
IoU / Boundary-F1 run batched on-device in one jitted program; only the
Hausdorff distance (a point-set post-processing step) drops to
host-side SciPy, and only here at eval time — never in the train loop.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..data.pipeline import DeviceDataset, epoch_batch_indices
from ..ops import metrics as M
from ..ops.stats import format_metric_report

__all__ = ["evaluate_model", "evaluate_on_dataset", "validate"]


def _eval_metrics_fn(apply_fn, threshold: float = 0.5):
    @jax.jit
    def run(params, images, masks, idx):
        def body(_, idx_b):
            pred = apply_fn(params, images[idx_b], deterministic=True)
            y = masks[idx_b]
            p2, y2 = pred[..., 0], y[..., 0]
            pred_bin = (p2 > threshold).astype(jnp.float32)
            return None, {
                "dice": M.dice_score_per_sample(p2, y2, threshold=threshold),
                "iou": M.iou_score_per_sample(p2, y2, threshold=threshold),
                "bf1": M.boundary_f1_per_sample(p2, y2, threshold=threshold),
                "pred_bin": pred_bin,
            }

        _, out = jax.lax.scan(body, None, idx)
        return out

    return run


def evaluate_model(
    apply_fn,
    params,
    data: DeviceDataset,
    batch_size: int = 8,
    threshold: float = 0.5,
    with_hausdorff: bool = True,
) -> Dict[str, np.ndarray]:
    """Per-image metric arrays for a whole dataset.

    Returns the reference's dict shape (/root/reference/src/evaluate.py:340-345):
    ``dice_scores``, ``iou_scores``, ``boundary_f1_scores``,
    ``hausdorff_distances`` (NaN where a boundary is empty).
    """
    n = data.n
    idx, valid = epoch_batch_indices(n, batch_size, shuffle=False)
    out = _eval_metrics_fn(apply_fn, threshold)(params, data.images, data.masks, idx)
    keep = np.asarray(valid).reshape(-1) > 0

    flat = lambda a: np.asarray(a).reshape(-1)[keep]
    results = {
        "dice_scores": flat(out["dice"]),
        "iou_scores": flat(out["iou"]),
        "boundary_f1_scores": flat(out["bf1"]),
    }

    if with_hausdorff:
        nb, B = idx.shape
        pred_bin = np.asarray(out["pred_bin"]).reshape(nb * B, *out["pred_bin"].shape[2:])[
            keep
        ]
        masks = np.asarray(data.masks)[..., 0]
        order = np.asarray(idx).reshape(-1)[keep]
        hausdorff = []
        for img_i, pb in zip(order, pred_bin):
            h = M.hausdorff_distance_np(pb, masks[img_i])
            hausdorff.append(h if np.isfinite(h) else np.nan)
        results["hausdorff_distances"] = np.asarray(hausdorff)
    return results


def evaluate_on_dataset(
    apply_fn,
    params,
    data: DeviceDataset,
    batch_size: int = 8,
    model_name: str = "Model",
    verbose: bool = True,
    threshold: float = 0.5,
) -> Dict[str, np.ndarray]:
    """Evaluate + print report (/root/reference/src/evaluate.py:476-523)."""
    if verbose:
        print(f"\nEvaluating {model_name} on test set...")
        print("=" * 70)
        print(f"Test samples: {data.n}")
    metrics = evaluate_model(
        apply_fn, params, data, batch_size=batch_size, threshold=threshold
    )
    if verbose:
        print(format_metric_report(metrics, model_name=model_name))
    return metrics


def validate(
    model,
    params,
    data: DeviceDataset,
    loss_cfg=None,
    batch_size: int = 8,
) -> Dict[str, float]:
    """One validation pass, returning the reference `validate()` dict
    (/root/reference/src/train.py:188-286): loss, dice_score (batch-mean
    of global Dice), loss components, iou/boundary-F1 per-sample means.

    Convenience wrapper over the jitted eval-epoch program for users
    migrating from the reference API.
    """
    from ..data.pipeline import epoch_batch_indices
    from .engine import make_eval_epoch_fn
    from .objective import LossConfig

    loss_cfg = loss_cfg or LossConfig()
    eval_fn = make_eval_epoch_fn(model, loss_cfg)
    idx, valid = epoch_batch_indices(data.n, batch_size, shuffle=False)
    res = eval_fn(params, data.images, data.masks, idx, valid)
    return {k: float(v) for k, v in res.items()}
