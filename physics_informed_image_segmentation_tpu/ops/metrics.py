"""Segmentation quality metrics.

TPU-native re-implementation of /root/reference/src/metrics.py and the
metric half of /root/reference/src/evaluate.py:26-275.

Key departures from the reference (deliberate, TPU-first):

* Per-sample Dice / IoU are fully vectorised (the reference loops over
  the batch in Python, /root/reference/src/metrics.py:63-72).
* Boundary extraction and the tolerance test of Boundary-F1 run
  **on-device** with morphological ops (erosion / exact-disk dilation)
  instead of OpenCV contours + chamfer distance transforms
  (/root/reference/src/evaluate.py:102-193).  This removes the
  per-batch device→host sync that dominates the reference's step time.
  Numerical notes:
    - boundary = mask ∧ ¬erode(mask, 3×3) with zero (background)
      padding: the full inner+outer boundary.  cv2 ``RETR_EXTERNAL``
      contours omit hole boundaries; for blob-like cell masks the two
      agree except on masks with holes.
    - the tolerance test uses an *exact* Euclidean disk (offsets with
      dx²+dy² ≤ tol²) where cv2's ``distanceTransform(DIST_L2, 5)`` is a
      chamfer approximation; rank agreement is validated in
      ``tests/test_metrics.py``.
* Hausdorff distance stays a host-side NumPy/SciPy post-processing step
  (eval only), like the reference (/root/reference/src/evaluate.py:232-275).

All on-device functions accept ``(..., H, W)`` probability/mask arrays
and are jit / vmap / pjit friendly.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "dice_score",
    "dice_score_per_sample",
    "iou_score",
    "iou_score_per_sample",
    "extract_boundaries",
    "boundary_f1_per_sample",
    "hausdorff_distance_np",
    "extract_boundaries_np",
]

_SMOOTH = 1e-6


# ---------------------------------------------------------------------------
# Overlap metrics
# ---------------------------------------------------------------------------


def dice_score(
    predictions: jnp.ndarray,
    targets: jnp.ndarray,
    threshold: float = 0.5,
    smooth: float = _SMOOTH,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Global thresholded Dice over the flattened batch
    (/root/reference/src/metrics.py:4-35)."""
    p = (predictions > threshold).astype(predictions.dtype)
    if mask is not None:
        p = p * mask
        targets = targets * mask
    intersection = jnp.sum(p * targets)
    return (2.0 * intersection + smooth) / (jnp.sum(p) + jnp.sum(targets) + smooth)


def _flatten_per_sample(x: jnp.ndarray) -> jnp.ndarray:
    return x.reshape(x.shape[0], -1)


def dice_score_per_sample(
    predictions: jnp.ndarray,
    targets: jnp.ndarray,
    threshold: float = 0.5,
    smooth: float = _SMOOTH,
) -> jnp.ndarray:
    """Per-sample thresholded Dice, shape ``(B,)``
    (/root/reference/src/metrics.py:38-73, vectorised)."""
    p = _flatten_per_sample((predictions > threshold).astype(predictions.dtype))
    t = _flatten_per_sample(targets)
    intersection = jnp.sum(p * t, axis=1)
    return (2.0 * intersection + smooth) / (
        jnp.sum(p, axis=1) + jnp.sum(t, axis=1) + smooth
    )


def iou_score(
    predictions: jnp.ndarray,
    targets: jnp.ndarray,
    threshold: float = 0.5,
    smooth: float = _SMOOTH,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Global thresholded IoU (/root/reference/src/evaluate.py:26-59)."""
    p = (predictions > threshold).astype(predictions.dtype)
    if mask is not None:
        p = p * mask
        targets = targets * mask
    intersection = jnp.sum(p * targets)
    union = jnp.sum(p) + jnp.sum(targets) - intersection
    return (intersection + smooth) / (union + smooth)


def iou_score_per_sample(
    predictions: jnp.ndarray,
    targets: jnp.ndarray,
    threshold: float = 0.5,
    smooth: float = _SMOOTH,
) -> jnp.ndarray:
    """Per-sample IoU, shape ``(B,)`` (/root/reference/src/evaluate.py:62-97)."""
    p = _flatten_per_sample((predictions > threshold).astype(predictions.dtype))
    t = _flatten_per_sample(targets)
    intersection = jnp.sum(p * t, axis=1)
    union = jnp.sum(p, axis=1) + jnp.sum(t, axis=1) - intersection
    return (intersection + smooth) / (union + smooth)


# ---------------------------------------------------------------------------
# Boundary metrics (on-device)
# ---------------------------------------------------------------------------


def _erode(mask: jnp.ndarray) -> jnp.ndarray:
    """3×3 binary erosion on the last two axes, outside = background (0)."""
    pad = [(0, 0)] * (mask.ndim - 2) + [(1, 1), (1, 1)]
    p = jnp.pad(mask, pad, constant_values=0.0)
    out = jnp.ones_like(mask)
    for dy in (0, 1, 2):
        for dx in (0, 1, 2):
            h, w = mask.shape[-2], mask.shape[-1]
            out = jnp.minimum(out, p[..., dy : dy + h, dx : dx + w])
    return out


def extract_boundaries(mask: jnp.ndarray) -> jnp.ndarray:
    """Boundary pixels of a binary mask: ``mask & ~erode(mask)``.

    On-device equivalent of /root/reference/src/evaluate.py:102-122
    (cv2 external contours drawn 1px thick).  Objects touching the image
    border contribute boundary pixels there (outside is background), as
    with cv2.
    """
    return mask * (1.0 - _erode(mask))


def _disk_offsets(tolerance: int) -> list[tuple[int, int]]:
    return [
        (dy, dx)
        for dy in range(-tolerance, tolerance + 1)
        for dx in range(-tolerance, tolerance + 1)
        if dy * dy + dx * dx <= tolerance * tolerance
    ]


def _dilate_disk(mask: jnp.ndarray, tolerance: int) -> jnp.ndarray:
    """Binary dilation with an exact Euclidean disk of radius ``tolerance``."""
    if tolerance <= 0:
        return mask
    pad = [(0, 0)] * (mask.ndim - 2) + [(tolerance, tolerance)] * 2
    p = jnp.pad(mask, pad, constant_values=0.0)
    h, w = mask.shape[-2], mask.shape[-1]
    out = jnp.zeros_like(mask)
    for dy, dx in _disk_offsets(tolerance):
        out = jnp.maximum(
            out, p[..., tolerance + dy : tolerance + dy + h, tolerance + dx : tolerance + dx + w]
        )
    return out


def boundary_f1_per_sample(
    predictions: jnp.ndarray,
    targets: jnp.ndarray,
    threshold: float = 0.5,
    tolerance: int = 2,
    smooth: float = _SMOOTH,
) -> jnp.ndarray:
    """Per-sample Boundary-F1 with pixel tolerance, shape ``(B,)``.

    Semantics of /root/reference/src/evaluate.py:125-229: precision is
    the fraction of predicted boundary pixels within ``tolerance`` of a
    target boundary pixel, recall vice-versa, combined as
    ``(2PR + s)/(P + R + s)``.  Runs entirely on-device.
    """
    pred_bin = (predictions > threshold).astype(predictions.dtype)
    pred_b = extract_boundaries(pred_bin)
    target_b = extract_boundaries(targets)

    axes = tuple(range(1, predictions.ndim))
    if tolerance > 0:
        near_target = _dilate_disk(target_b, tolerance)
        near_pred = _dilate_disk(pred_b, tolerance)
        precision = (jnp.sum(pred_b * near_target, axis=axes) + smooth) / (
            jnp.sum(pred_b, axis=axes) + smooth
        )
        recall = (jnp.sum(target_b * near_pred, axis=axes) + smooth) / (
            jnp.sum(target_b, axis=axes) + smooth
        )
        return (2.0 * precision * recall + smooth) / (precision + recall + smooth)
    intersection = jnp.sum(pred_b * target_b, axis=axes)
    return (2.0 * intersection + smooth) / (
        jnp.sum(pred_b, axis=axes) + jnp.sum(target_b, axis=axes) + smooth
    )


# ---------------------------------------------------------------------------
# Hausdorff distance (host-side, eval only)
# ---------------------------------------------------------------------------


def extract_boundaries_np(mask: np.ndarray) -> np.ndarray:
    """NumPy twin of :func:`extract_boundaries` for host-side post-processing."""
    m = np.asarray(mask, dtype=np.float32)
    p = np.pad(m, 1, constant_values=0.0)
    eroded = np.ones_like(m)
    h, w = m.shape
    for dy in (0, 1, 2):
        for dx in (0, 1, 2):
            eroded = np.minimum(eroded, p[dy : dy + h, dx : dx + w])
    return m * (1.0 - eroded)


def hausdorff_distance_np(
    pred_mask: np.ndarray, target_mask: np.ndarray
) -> float:
    """Symmetric Hausdorff distance between boundary point sets.

    Host-side (eval-only), like /root/reference/src/evaluate.py:232-275;
    returns ``inf`` when either boundary is empty.
    """
    from scipy.spatial.distance import directed_hausdorff

    pred_b = extract_boundaries_np(pred_mask)
    target_b = extract_boundaries_np(target_mask)
    pred_coords = np.column_stack(np.where(pred_b > 0))
    target_coords = np.column_stack(np.where(target_b > 0))
    if len(pred_coords) == 0 or len(target_coords) == 0:
        return float("inf")
    return max(
        directed_hausdorff(pred_coords, target_coords)[0],
        directed_hausdorff(target_coords, pred_coords)[0],
    )
