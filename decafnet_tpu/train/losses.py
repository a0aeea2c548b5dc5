"""Training losses (reference: libs/modeling/loss.py, libs/worker_v2.py:85-91).

All functions are pure, fp32, and mask-aware: instead of boolean indexing
(dynamic shapes), losses are computed densely and reduced over a mask --
bit-identical sums with static shapes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _bce_with_logits(inputs, targets):
    """Numerically-stable binary cross entropy with logits
    (= torch F.binary_cross_entropy_with_logits, reduction='none')."""
    return (jnp.maximum(inputs, 0.0) - inputs * targets
            + jnp.log1p(jnp.exp(-jnp.abs(inputs))))


def sigmoid_focal_loss(inputs, targets, alpha=-1.0, gamma=2.0,
                       smoothing=True):
    """Elementwise focal loss (reference: libs/modeling/loss.py:5-57).

    With ``smoothing`` the modulating factor p_t uses the (possibly
    smoothed) float targets; alpha balancing uses the hard >= 0.5 mask.
    """
    inputs = inputs.astype(jnp.float32)
    targets = targets.astype(jnp.float32)
    mask = (targets >= 0.5).astype(jnp.float32)

    p = jax.nn.sigmoid(inputs)
    if smoothing:
        p_t = p * targets + (1.0 - p) * (1.0 - targets)
    else:
        p_t = p * mask + (1.0 - p) * (1.0 - mask)
    ce = _bce_with_logits(inputs, targets)
    loss = ce * (1.0 - p_t) ** gamma
    if alpha >= 0:
        alpha_t = alpha * mask + (1.0 - alpha) * (1.0 - mask)
        loss = alpha_t * loss
    return loss


def calc_focal_loss(logits, labels, valid, smoothing=0.2, alpha=0.5):
    """Label-smoothed focal loss summed over valid positions
    (reference: libs/worker_v2.py:85-87: labels*(1-s)+s/2, reduction sum)."""
    labels = labels.astype(jnp.float32) * (1.0 - smoothing) + smoothing / 2
    loss = sigmoid_focal_loss(logits, labels, alpha=alpha, gamma=2.0,
                              smoothing=True)
    return jnp.sum(jnp.where(valid, loss, 0.0))


def ctr_iou_terms(input_offsets, target_offsets, eps=1e-8):
    """Shared IoU computation for center-offset 1D boxes
    (reference: libs/modeling/loss.py:60-167).

    Offsets are CHANNEL-FIRST (..., 2, N): a trailing dim of 2 is a
    pathological TPU layout (the minor dim pads to 128 lanes)."""
    lp, rp = input_offsets[..., 0, :], input_offsets[..., 1, :]
    lg, rg = target_offsets[..., 0, :], target_offsets[..., 1, :]
    lkis = jnp.minimum(lp, lg)
    rkis = jnp.minimum(rp, rg)
    intsctk = rkis + lkis
    unionk = (lp + rp) + (lg + rg) - intsctk
    iouk = intsctk / jnp.maximum(unionk, eps)
    return iouk, (lp, rp, lg, rg)


def ctr_giou_loss(input_offsets, target_offsets, eps=1e-8):
    """Elementwise GIoU loss -- reduces to 1 - IoU for 1D center offsets
    (reference: libs/modeling/loss.py:60-109)."""
    iouk, _ = ctr_iou_terms(input_offsets.astype(jnp.float32),
                            target_offsets.astype(jnp.float32), eps)
    return 1.0 - iouk


def ctr_diou_loss(input_offsets, target_offsets, eps=1e-8):
    """Elementwise Distance-IoU loss (reference: libs/modeling/loss.py:111-167)."""
    iouk, (lp, rp, lg, rg) = ctr_iou_terms(
        input_offsets.astype(jnp.float32),
        target_offsets.astype(jnp.float32), eps)
    lc = jnp.maximum(lp, lg)
    rc = jnp.maximum(rp, rg)
    len_c = lc + rc
    rho = 0.5 * (rp - lp - rg + lg)
    return 1.0 - iouk + jnp.square(rho / jnp.maximum(len_c, eps))


def calc_iou_loss(pred_offsets, gt_offsets, valid, reg_loss="diou"):
    """Masked-sum IoU regression loss over channel-first (..., 2, N)
    offsets; ``valid`` is (..., N). Invalid positions are replaced by a safe
    dummy so padding cannot produce NaNs (reference: libs/worker_v2.py:89-91,
    reduction='sum' over positive points).
    """
    valid_cf = valid[..., None, :]
    safe_pred = jnp.where(valid_cf, pred_offsets, 1.0)
    safe_gt = jnp.where(valid_cf, gt_offsets, 1.0)
    if reg_loss == "diou":
        loss = ctr_diou_loss(safe_pred, safe_gt)
    elif reg_loss in ("giou", "iou"):
        loss = ctr_giou_loss(safe_pred, safe_gt)
    else:
        raise ValueError(f"unknown reg loss: {reg_loss}")
    return jnp.sum(jnp.where(valid, loss, 0.0))


def segment_iou(pred_segs, gt_segs):
    """Vectorized interval IoU (reference: libs/train_utils.py:81-96)."""
    ps, pe = pred_segs[..., 0], pred_segs[..., 1]
    gs, ge = gt_segs[..., 0], gt_segs[..., 1]
    overlap = jnp.clip(jnp.minimum(pe, ge) - jnp.maximum(ps, gs), 0.0)
    union = (pe - ps) + (ge - gs) - overlap
    return overlap / union
