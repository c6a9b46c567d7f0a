"""Metric tests: golden vs torch oracle, boundary-F1 vs cv2 rank agreement."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

import torch_oracle as oracle
from physics_informed_image_segmentation_tpu.ops import metrics


def _pair(rng, shape=(4, 32, 32)):
    pred = rng.uniform(size=shape).astype(np.float32)
    target = (rng.uniform(size=shape) > 0.6).astype(np.float32)
    return pred, target


def _blob_mask(h, w, cy, cx, r):
    y, x = np.mgrid[0:h, 0:w]
    return (((y - cy) ** 2 + (x - cx) ** 2) <= r * r).astype(np.float32)


def test_dice_iou_match_torch(rng):
    pred, target = _pair(rng)
    np.testing.assert_allclose(
        float(metrics.dice_score(jnp.asarray(pred), jnp.asarray(target))),
        float(oracle.dice_score(torch.from_numpy(pred), torch.from_numpy(target))),
        rtol=1e-6,
    )
    np.testing.assert_allclose(
        float(metrics.iou_score(jnp.asarray(pred), jnp.asarray(target))),
        float(oracle.iou_score(torch.from_numpy(pred), torch.from_numpy(target))),
        rtol=1e-6,
    )


def test_per_sample_metrics_shapes_and_consistency(rng):
    pred, target = _pair(rng)
    d = metrics.dice_score_per_sample(jnp.asarray(pred), jnp.asarray(target))
    i = metrics.iou_score_per_sample(jnp.asarray(pred), jnp.asarray(target))
    assert d.shape == (4,) and i.shape == (4,)
    # per-sample value b equals global value on that single sample
    d0 = float(metrics.dice_score(jnp.asarray(pred[:1]), jnp.asarray(target[:1])))
    np.testing.assert_allclose(float(d[0]), d0, rtol=1e-6)
    # dice >= iou always
    assert (np.asarray(d) >= np.asarray(i) - 1e-6).all()


def test_perfect_prediction():
    t = _blob_mask(32, 32, 16, 16, 8)[None]
    d = float(metrics.dice_score(jnp.asarray(t), jnp.asarray(t)))
    i = float(metrics.iou_score(jnp.asarray(t), jnp.asarray(t)))
    assert abs(d - 1.0) < 1e-5 and abs(i - 1.0) < 1e-5
    f1 = metrics.boundary_f1_per_sample(jnp.asarray(t), jnp.asarray(t))
    np.testing.assert_allclose(np.asarray(f1), 1.0, atol=1e-5)


def test_boundary_extraction_ring():
    m = _blob_mask(16, 16, 8, 8, 5)
    b = np.asarray(metrics.extract_boundaries(jnp.asarray(m[None])))[0]
    # boundary is a subset of the mask, nonempty, and thin
    assert ((b == 1) <= (m == 1)).all()
    assert 0 < b.sum() < m.sum()
    # interior pixel not boundary, center of mask
    assert b[8, 8] == 0


def test_boundary_touching_border():
    m = np.zeros((8, 8), np.float32)
    m[0:3, 0:3] = 1.0
    b = np.asarray(metrics.extract_boundaries(jnp.asarray(m[None])))[0]
    # 3x3 block in the image corner: outside counts as background, so the
    # block's outer ring (8 px) is boundary; only the center (1,1) is interior.
    assert b.sum() == 8.0
    assert b[1, 1] == 0.0


def test_boundary_f1_tolerance_shifted_blob():
    t = _blob_mask(32, 32, 16, 16, 8)
    p1 = _blob_mask(32, 32, 16, 17, 8)  # 1px shift: within tolerance 2
    p6 = _blob_mask(32, 32, 16, 22, 8)  # 6px shift: mostly outside tolerance
    f1_close = float(
        metrics.boundary_f1_per_sample(jnp.asarray(p1[None]), jnp.asarray(t[None]))[0]
    )
    f1_far = float(
        metrics.boundary_f1_per_sample(jnp.asarray(p6[None]), jnp.asarray(t[None]))[0]
    )
    assert f1_close > 0.95
    assert f1_far < f1_close


def test_boundary_f1_rank_agreement_with_cv2(rng):
    """Our on-device Boundary-F1 must rank predictions like the cv2 version."""
    cv2 = pytest.importorskip("cv2")

    def cv2_boundary_f1(pred, target, tol=2, smooth=1e-6):
        # cv2-based implementation with the reference's algorithm shape
        def boundaries(m):
            mu = (m * 255).astype(np.uint8)
            contours, _ = cv2.findContours(mu, cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_NONE)
            bm = np.zeros_like(mu)
            cv2.drawContours(bm, contours, -1, 255, 1)
            return (bm > 0).astype(np.float32)

        pb, tb = boundaries(pred), boundaries(target)
        td = cv2.distanceTransform((1 - tb).astype(np.uint8), cv2.DIST_L2, 5)
        pdist = cv2.distanceTransform((1 - pb).astype(np.uint8), cv2.DIST_L2, 5)
        precision = ((td <= tol).astype(np.float32) * pb).sum() + smooth
        precision /= pb.sum() + smooth
        recall = ((pdist <= tol).astype(np.float32) * tb).sum() + smooth
        recall /= tb.sum() + smooth
        return (2 * precision * recall + smooth) / (precision + recall + smooth)

    t = _blob_mask(64, 64, 32, 32, 14)
    shifts = [0, 1, 2, 4, 8, 16]
    ours, ref = [], []
    for s in shifts:
        p = _blob_mask(64, 64, 32, 32 + s, 14)
        ours.append(
            float(metrics.boundary_f1_per_sample(jnp.asarray(p[None]), jnp.asarray(t[None]))[0])
        )
        ref.append(cv2_boundary_f1(p, t))
    # identical ranking across increasing shift
    assert np.argsort(ours).tolist() == np.argsort(ref).tolist()
    # and close in absolute value
    np.testing.assert_allclose(ours, ref, atol=0.1)


def test_hausdorff_known_distance():
    t = _blob_mask(64, 64, 32, 32, 10)
    p = _blob_mask(64, 64, 32, 32, 10)
    assert metrics.hausdorff_distance_np(p, t) == 0.0
    p2 = _blob_mask(64, 64, 32, 37, 10)  # 5px shift
    d = metrics.hausdorff_distance_np(p2, t)
    assert 4.0 <= d <= 6.5
    empty = np.zeros((64, 64), np.float32)
    assert metrics.hausdorff_distance_np(empty, t) == float("inf")


def test_metrics_jittable(rng):
    pred, target = _pair(rng)
    f = jax.jit(
        lambda p, t: (
            metrics.dice_score_per_sample(p, t),
            metrics.iou_score_per_sample(p, t),
            metrics.boundary_f1_per_sample(p, t),
        )
    )
    d, i, b = f(jnp.asarray(pred), jnp.asarray(target))
    assert d.shape == i.shape == b.shape == (4,)
