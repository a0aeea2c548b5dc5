"""Regression: padded (invalid) query rows -- text masks all False -- must
produce finite model outputs and finite loss/grads. (Static-shape batches
routinely contain such rows; an unguarded all-masked softmax poisons
training with NaNs through NaN * 0.)"""

import numpy as np

import jax
import jax.numpy as jnp

from decafnet_tpu.core import get_cfg_defaults, update_opt
from decafnet_tpu.models import (fpn_lengths, generate_points, make_model,
                                 select_points)
from decafnet_tpu.train.annotate import annotate_points
from decafnet_tpu.train.losses import calc_focal_loss, calc_iou_loss


def _cfg():
    cfg = get_cfg_defaults("grounder")
    cfg.model.name = "iter"  # the live released model
    cfg.model.vid_net.in_dim = 32
    cfg.model.vid_net.embd_dim = 16
    cfg.model.vid_net.max_seq_len = 64
    cfg.model.vid_net.arch = (1, 0, 3)
    cfg.model.text_net.in_dim = 24
    cfg.model.text_net.embd_dim = 16
    cfg.model.text_net.n_layers = 1
    cfg.model.fusion.n_layers = 1
    cfg.model.sratio = 0.5
    cfg.model.sn = 8
    update_opt(cfg)
    return cfg


def test_padded_query_rows_finite_forward_and_grads():
    cfg = _cfg()
    model = make_model(cfg)
    rng = np.random.RandomState(0)
    B, C, T, Ct, L = 2, 32, 64, 24, 8
    vid = rng.randn(B, C, T).astype(np.float32)
    shallow = rng.randn(B, C, T).astype(np.float32)
    vm = np.ones((B, T), bool)
    text = rng.randn(B, Ct, L).astype(np.float32)
    tcls = rng.randn(B, C).astype(np.float32)
    tm = np.zeros((B, L), bool)
    tm[0] = True            # row 1 is a fully-padded query row
    tcls[1] = 0.0
    text[1] = 0.0
    row_valid = np.array([True, False])

    inputs = tuple(map(jnp.asarray, (vid, shallow, vm, text, tcls, tm)))
    params = model.init(jax.random.PRNGKey(0), *inputs, deterministic=True)

    outs = model.apply(params, *inputs, deterministic=True)
    for tup in outs[:3]:
        for lvl in tup:
            assert np.all(np.isfinite(np.asarray(lvl))), "NaN in forward"

    # loss + grads through the padded row must stay finite
    lens = fpn_lengths(T, cfg.model.num_fpn_levels)
    points = jnp.asarray(np.ascontiguousarray(np.concatenate(select_points(
        generate_points(cfg.pt_gen.max_seq_len, cfg.pt_gen.num_fpn_levels,
                        cfg.pt_gen.regression_range, cfg.pt_gen.sigma),
        lens)).T))
    targets = jnp.asarray(np.array([[5.0, 30.0], [0.0, 1.0]], np.float32))

    def loss_fn(p):
        l1, l2, offs, masks = model.apply(p, *inputs, deterministic=True)
        l1 = jnp.concatenate(l1, 1)
        l2 = jnp.concatenate(l2, 1)
        offs = jnp.concatenate(offs, 2)
        masks = jnp.concatenate(masks, 1) & jnp.asarray(row_valid)[:, None]
        labels, gt_offs = annotate_points(points, targets)
        pos = labels & masks
        cls = (calc_focal_loss(l1, labels, masks)
               + calc_focal_loss(l2, labels, masks)) / 2
        reg = calc_iou_loss(offs, gt_offs, pos)
        return (cls + reg) / 100.0

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in leaves), \
        "NaN in gradients"
