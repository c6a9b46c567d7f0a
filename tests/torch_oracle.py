"""Independent PyTorch oracle used by golden-value tests.

Compact functional re-statements of the reference semantics
(/root/reference/src/pde.py, src/loss.py, src/metrics.py) used ONLY as a
test oracle to check that the JAX framework reproduces the PyTorch
numerics.  Runs on CPU.
"""

import torch
import torch.nn.functional as F

_LAP = torch.tensor(
    [[0.0, 1.0, 0.0], [1.0, -4.0, 1.0], [0.0, 1.0, 0.0]]
).reshape(1, 1, 3, 3)
_GX = torch.tensor(
    [[0.0, 0.0, 0.0], [-0.5, 0.0, 0.5], [0.0, 0.0, 0.0]]
).reshape(1, 1, 3, 3)
_GY = torch.tensor(
    [[0.0, -0.5, 0.0], [0.0, 0.0, 0.0], [0.0, 0.5, 0.0]]
).reshape(1, 1, 3, 3)


def _stencil(u, k):
    return F.conv2d(F.pad(u, (1, 1, 1, 1), mode="reflect"), k)


def laplacian(u):
    return _stencil(u, _LAP)


def grad_xy(u):
    return _stencil(u, _GX), _stencil(u, _GY)


def rd_residual(u, D, a):
    return D * laplacian(u) + u * (1 - u) * (u - a)


def rd_loss(u, D, a):
    r = rd_residual(u, D, a)
    return (r**2).mean()


def phase_field(u, eps):
    gx, gy = grad_xy(u)
    return ((eps / 2) * (gx**2 + gy**2) + (1 / eps) * u**2 * (1 - u) ** 2).mean()


def dice_bce(pred, target, smooth=1e-6):
    p, t = pred.reshape(-1), target.reshape(-1)
    inter = (p * t).sum()
    dice = 1 - (2 * inter + smooth) / (p.sum() + t.sum() + smooth)
    bce = F.binary_cross_entropy(pred, target)
    return 0.5 * dice + 0.5 * bce


def dice_bce_pde(pred, target, lam_rd, lam_pf, D, a, eps):
    total = dice_bce(pred, target)
    if lam_rd > 0:
        total = total + lam_rd * rd_loss(pred, D, a)
    if lam_pf > 0:
        total = total + lam_pf * phase_field(pred, eps)
    return total


def dice_score(pred, target, thr=0.5, smooth=1e-6):
    p = (pred > thr).float().reshape(-1)
    t = target.reshape(-1)
    inter = (p * t).sum()
    return (2 * inter + smooth) / (p.sum() + t.sum() + smooth)


def iou_score(pred, target, thr=0.5, smooth=1e-6):
    p = (pred > thr).float().reshape(-1)
    t = target.reshape(-1)
    inter = (p * t).sum()
    return (inter + smooth) / (p.sum() + t.sum() - inter + smooth)
