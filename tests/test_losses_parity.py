"""Loss and point-annotation parity vs the reference torch implementations
(imported read-only as oracles)."""

import sys

import numpy as np
import torch

import jax.numpy as jnp

sys.path.insert(0, "/root/reference")

from decafnet_tpu.train.losses import (
    sigmoid_focal_loss,
    calc_focal_loss,
    ctr_giou_loss,
    ctr_diou_loss,
)
from decafnet_tpu.train.annotate import annotate_points
from decafnet_tpu.models import generate_points

RNG = np.random.RandomState(7)


def test_sigmoid_focal_loss_parity():
    from libs.modeling.loss import sigmoid_focal_loss as ref_focal

    logits = (RNG.randn(64) * 3).astype(np.float32)
    targets = RNG.rand(64).astype(np.float32)
    for alpha, smoothing in [(-1.0, True), (0.5, True), (0.25, False)]:
        got = np.asarray(sigmoid_focal_loss(
            jnp.asarray(logits), jnp.asarray(targets), alpha=alpha,
            smoothing=smoothing))
        want = ref_focal(torch.from_numpy(logits), torch.from_numpy(targets),
                         alpha=alpha, smoothing=smoothing).numpy()
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_calc_focal_loss_matches_reference_helper():
    # oracle = label smoothing labels*(1-s)+s/2 then the reference focal
    # with reduction='sum' over the boolean-indexed valid entries
    # (reference: libs/worker_v2.py:85-87; worker_v2 itself is not
    # importable here -- it pulls torchvision)
    from libs.modeling.loss import sigmoid_focal_loss as ref_focal

    logits = (RNG.randn(4, 50) * 2).astype(np.float32)
    labels = RNG.rand(4, 50) > 0.8
    valid = RNG.rand(4, 50) > 0.2
    got = float(calc_focal_loss(
        jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(valid),
        smoothing=0.2, alpha=0.5))
    tl = torch.from_numpy(logits)[torch.from_numpy(valid)]
    tt = torch.from_numpy(labels)[torch.from_numpy(valid)].float()
    tt = tt * (1.0 - 0.2) + 0.2 / 2
    want = float(ref_focal(tl, tt, alpha=0.5, reduction="sum"))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_iou_losses_parity():
    from libs.modeling.loss import ctr_giou_loss as ref_giou
    from libs.modeling.loss import ctr_diou_loss as ref_diou

    pred = np.abs(RNG.randn(40, 2)).astype(np.float32)
    gt = np.abs(RNG.randn(40, 2)).astype(np.float32)
    got_g = np.asarray(ctr_giou_loss(jnp.asarray(pred.T), jnp.asarray(gt.T)))
    want_g = ref_giou(torch.from_numpy(pred), torch.from_numpy(gt)).numpy()
    np.testing.assert_allclose(got_g, want_g, rtol=1e-5, atol=1e-6)
    got_d = np.asarray(ctr_diou_loss(jnp.asarray(pred.T), jnp.asarray(gt.T)))
    want_d = ref_diou(torch.from_numpy(pred), torch.from_numpy(gt)).numpy()
    np.testing.assert_allclose(got_d, want_d, rtol=1e-5, atol=1e-6)


def _ref_annotate(points, target, center_sampling="radius",
                  center_sampling_radius=1.5):
    """torch oracle of the reference per-video point annotation
    (libs/worker_v2.py:93-133; worker_v2 is not importable -- torchvision)."""
    pt2start = points[:, 0] - target[0]
    pt2end = target[1] - points[:, 0]
    offsets = torch.stack((pt2start, pt2end), dim=-1) / points[:, 3:]
    if center_sampling == "radius":
        ctr = 0.5 * (target[0] + target[1])
        radius = points[:, 3] * center_sampling_radius
        t_min = (ctr - radius).clamp(min=target[0])
        t_max = (ctr + radius).clamp(max=target[1])
        inside_window = ((points[:, 0] - t_min) > 0) & ((t_max - points[:, 0]) > 0)
    else:
        inside_window = (pt2start > 0) & (pt2end > 0)
    max_reg_dist = torch.maximum(pt2start, pt2end)
    inside_range = (max_reg_dist >= points[:, 1]) & (max_reg_dist < points[:, 2])
    return inside_window & inside_range, offsets, None


def test_annotate_points_parity():
    ref_annotate = _ref_annotate

    points = np.concatenate(generate_points(128, 4, 4, 0.5))
    targets = np.asarray([[3.0, 50.0], [0.5, 2.0], [100.0, 127.0]],
                         np.float32)
    labels, offsets = annotate_points(jnp.asarray(points.T.copy()),
                                      jnp.asarray(targets),
                                      center_sampling="radius",
                                      center_sampling_radius=1.5)
    for i, tgt in enumerate(targets):
        ref_l, ref_o, _ = ref_annotate(
            torch.from_numpy(points), torch.from_numpy(tgt),
            center_sampling="radius", center_sampling_radius=1.5)
        np.testing.assert_array_equal(np.asarray(labels[i]), ref_l.numpy())
        np.testing.assert_allclose(np.asarray(offsets[i]).T, ref_o.numpy(),
                                   rtol=1e-6, atol=1e-6)

    # center_sampling == 'none' branch
    labels2, _ = annotate_points(jnp.asarray(points.T.copy()),
                                 jnp.asarray(targets),
                                 center_sampling="none")
    ref_l2, _, _ = ref_annotate(torch.from_numpy(points),
                                torch.from_numpy(targets[0]),
                                center_sampling="none")
    np.testing.assert_array_equal(np.asarray(labels2[0]), ref_l2.numpy())
