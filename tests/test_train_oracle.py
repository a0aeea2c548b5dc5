"""Train-step oracle: one reference microbatch forward/backward
(libs/worker_v2.py:386-477) vs the repo's ``build_microbatch_loss`` on an
identical batch + imported weights -- loss values (cls/reg/total), the
positive-point normalizer, and per-parameter GRADIENTS must agree.

The batch deliberately has a video with fewer queries than ``max_num_text``:
the repo pads to static (B x max_num_text) rows with validity masks while
the reference packs exactly sum(text_size) rows -- sums and gradients must
be unaffected by the padded rows.
"""

import sys

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from conftest import setup_reference_imports

setup_reference_imports(need_nms=True)  # worker_v2 imports .nms at module level

from decafnet_tpu.core import get_cfg_defaults, update_opt
from decafnet_tpu.models import (fpn_lengths, generate_points, make_model,
                                 select_points)
from decafnet_tpu.models.import_torch import (params_to_state_dict,
                                              state_dict_to_params)
from decafnet_tpu.train import build_microbatch_loss

torch.manual_seed(0)

LOSS_NORM = 160.0


def small_cfg():
    cfg = get_cfg_defaults("grounder")
    cfg.model.name = "iter"
    cfg.model.vid_net.in_dim = 32
    cfg.model.vid_net.embd_dim = 32
    cfg.model.vid_net.max_seq_len = 64
    cfg.model.vid_net.arch = (2, 0, 3)
    cfg.model.vid_net.proj_pdrop = 0.0
    cfg.model.vid_net.path_pdrop = 0.0
    cfg.model.text_net.in_dim = 24
    cfg.model.text_net.embd_dim = 32
    cfg.model.text_net.n_layers = 2
    cfg.model.fusion.n_layers = 2
    cfg.model.fusion.proj_pdrop = 0.0
    cfg.model.fusion.path_pdrop = 0.0
    cfg.model.sratio = 0.5
    cfg.model.sn = 8
    cfg.model.msf = True
    # zero the TCN refine-stage dropout (reference default 0.5,
    # libs/modeling/tcn.py:41): both sides would otherwise apply dropout
    # with DIFFERENT random masks under train semantics. The torch model's
    # Dropout modules are zeroed in reference_loss_and_grads to match.
    cfg.model.tcn_dropout = 0.0
    cfg.data.max_num_text = 2
    update_opt(cfg)
    return cfg


def make_batch(rng, cfg):
    """One microbatch: 2 videos (lens 64, 40), queries per video (2, 1)."""
    C, Ct = cfg.model.vid_net.in_dim, cfg.model.text_net.in_dim
    T, L = cfg.data.max_vid_len, cfg.data.max_text_len
    lens = [64, 40]
    text_lens = [[8, 5], [7]]
    targets_sec = [[(3.0, 30.0), (10.0, 55.0)], [(2.0, 20.0)]]

    vids = [rng.randn(C, n).astype(np.float32) for n in lens]
    shallows = [rng.randn(C, n).astype(np.float32) for n in lens]
    texts = [[rng.randn(Ct, l).astype(np.float32) for l in tl]
             for tl in text_lens]
    text_cls = [rng.randn(len(tl), C).astype(np.float32)
                for tl in text_lens]
    return vids, shallows, texts, text_cls, targets_sec, (T, L)


def reference_loss_and_grads(cfg, batch):
    """Verbatim re-statement of _microbatch_forward_backward
    (libs/worker_v2.py:386-477) on the torch reference model."""
    import libs.worker_v2 as w
    from libs.modeling.model import PtGenerator, PtTransformerEarlyFusionIterative

    vids, shallows, texts, text_cls, targets_sec, (T, L) = batch
    B = len(vids)
    model = PtTransformerEarlyFusionIterative(cfg.clone(),
                                              second_fusion=False)
    model.train()
    for m in model.modules():  # zero all dropout (see small_cfg note)
        if isinstance(m, (torch.nn.Dropout, torch.nn.Dropout1d)):
            m.p = 0.0
    sd = model.state_dict()

    # _batchify_videos (worker_v2.py:487-506)
    def pad_to(x, t):
        out = torch.zeros((x.shape[0], t))
        out[:, :x.shape[1]] = torch.from_numpy(x)
        return out

    vid = torch.stack([pad_to(v, T) for v in vids])
    shallow = torch.stack([pad_to(s, T) for s in shallows])
    vid_masks = torch.arange(T)[None] < torch.as_tensor(
        [v.shape[1] for v in vids])[:, None]

    # _batchify text branch (worker_v2.py:537-567): (bs, n_max, c, L)
    n = [len(t) for t in texts]
    n_max = max(n)
    text = torch.zeros((B, n_max, texts[0][0].shape[0], L))
    text_masks = torch.zeros((B, n_max, L), dtype=torch.bool)
    for b, tl in enumerate(texts):
        for qi, tok in enumerate(tl):
            text[b, qi, :, :tok.shape[1]] = torch.from_numpy(tok)
            text_masks[b, qi, :tok.shape[1]] = True
    text_size = torch.as_tensor(n)
    tcls = torch.from_numpy(np.concatenate(text_cls))
    targets = torch.as_tensor(
        [t for tl in targets_sec for t in tl], dtype=torch.float)
    targets = targets / cfg.model.vid_stride

    logits1, logits2, offsets, masks = model(
        vid, shallow, vid_masks, text, tcls, text_masks, text_size, None)
    pt_gen = PtGenerator(max_seq_len=cfg.pt_gen.max_seq_len,
                         num_fpn_levels=cfg.pt_gen.num_fpn_levels,
                         regression_range=cfg.pt_gen.regression_range,
                         sigma=cfg.pt_gen.sigma)
    fpn_points = pt_gen([m.size(-1) for m in masks])

    logits1 = torch.cat(logits1, dim=1)
    logits2 = torch.cat(logits2, dim=1)
    offsets = torch.cat(offsets, dim=1)
    masks = torch.cat(masks, dim=1)
    points = torch.cat(fpn_points)

    gt_labels, gt_offsets = [], []
    for target in targets:
        l, o, _ = w.annotate_points_per_video(
            points, target, center_sampling=cfg.train.center_sampling,
            center_sampling_radius=cfg.train.center_sampling_radius)
        gt_labels.append(l)
        gt_offsets.append(o)
    gt_labels = torch.stack(gt_labels)
    gt_offsets = torch.stack(gt_offsets)

    pos_masks = torch.logical_and(gt_labels, masks)
    norm = pos_masks.sum()
    cls1 = w.calc_focal_loss(logits1[masks], gt_labels[masks],
                             alpha=cfg.loss.fc_a,
                             smoothing=cfg.loss.fc_s) / LOSS_NORM
    cls2 = w.calc_focal_loss(logits2[masks], gt_labels[masks],
                             alpha=cfg.loss.fc_a,
                             smoothing=cfg.loss.fc_s) / LOSS_NORM
    cls_loss = (cls1 + cls2) / 2
    reg_loss = w.calc_iou_loss(offsets[pos_masks], gt_offsets[pos_masks],
                               reg_loss=cfg.train.reg_loss) / LOSS_NORM
    total = cls_loss + cfg.train.loss_weight * reg_loss
    total.backward()

    grads = {k: p.grad.detach().numpy().copy()
             for k, p in model.named_parameters() if p.grad is not None}
    return sd, {"cls": float(cls_loss), "reg": float(reg_loss),
                "total": float(total), "norm": int(norm)}, grads


@pytest.fixture(scope="module")
def oracle():
    cfg = small_cfg()
    rng = np.random.RandomState(17)
    batch = make_batch(rng, cfg)
    sd, ref_losses, ref_grads = reference_loss_and_grads(cfg, batch)
    return cfg, batch, sd, ref_losses, ref_grads


def _repo_batch(batch, max_num_text):
    """Repo static layout: R = B * max_num_text rows with validity."""
    vids, shallows, texts, text_cls, targets_sec, (T, L) = batch
    B = len(vids)
    R = B * max_num_text
    cv, ct = vids[0].shape[0], texts[0][0].shape[0]
    mb = {
        "vid": np.zeros((B, cv, T), np.float32),
        "shallow_vid": np.zeros((B, cv, T), np.float32),
        "vid_masks": np.zeros((B, T), bool),
        "text": np.zeros((R, ct, L), np.float32),
        "text_masks": np.zeros((R, L), bool),
        "text_cls": np.zeros((R, cv), np.float32),
        "targets": np.tile(np.array([[0.0, 1.0]], np.float32), (R, 1)),
        "row_valid": np.zeros((R,), bool),
    }
    for b in range(B):
        t = vids[b].shape[1]
        mb["vid"][b, :, :t] = vids[b]
        mb["shallow_vid"][b, :, :t] = shallows[b]
        mb["vid_masks"][b, :t] = True
        for qi, tok in enumerate(texts[b]):
            r = b * max_num_text + qi
            mb["text"][r, :, :tok.shape[1]] = tok
            mb["text_masks"][r, :tok.shape[1]] = True
            mb["text_cls"][r] = text_cls[b][qi]
            mb["targets"][r] = targets_sec[b][qi]
            mb["row_valid"][r] = True
    return mb


def _repo_loss_and_grads(cfg, batch, sd):
    model = make_model(cfg)
    mb = _repo_batch(batch, cfg.data.max_num_text)
    template = model.init(
        jax.random.PRNGKey(0),
        np.repeat(mb["vid"], cfg.data.max_num_text, 0),
        np.repeat(mb["shallow_vid"], cfg.data.max_num_text, 0),
        np.repeat(mb["vid_masks"], cfg.data.max_num_text, 0),
        mb["text"], mb["text_cls"], mb["text_masks"],
        deterministic=True,
    )["params"]
    params = state_dict_to_params(
        {k: v.numpy() for k, v in sd.items()}, template=template)

    t0 = cfg.data.max_vid_len // cfg.model.vid_stride
    lens = fpn_lengths(t0, cfg.model.num_fpn_levels)
    all_points = generate_points(
        cfg.pt_gen.max_seq_len, cfg.pt_gen.num_fpn_levels,
        cfg.pt_gen.regression_range, cfg.pt_gen.sigma)
    points_t = np.ascontiguousarray(
        np.concatenate(select_points(all_points, lens)).T)

    loss_fn = build_microbatch_loss(model, cfg)
    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
    (_, metrics), grads = grad_fn(
        params, {k: jnp.asarray(v) for k, v in mb.items()},
        jax.random.PRNGKey(2), jnp.float32(LOSS_NORM),
        jnp.asarray(points_t))
    return metrics, params_to_state_dict(jax.device_get(grads))


def test_losses_match_reference(oracle):
    cfg, batch, sd, ref_losses, _ = oracle
    metrics, _ = _repo_loss_and_grads(cfg, batch, sd)
    assert int(metrics["norm"]) == ref_losses["norm"]
    for k in ("cls", "reg", "total"):
        np.testing.assert_allclose(float(metrics[k]), ref_losses[k],
                                   rtol=2e-4, atol=1e-6, err_msg=k)


def test_gradients_match_reference(oracle):
    cfg, batch, sd, _, ref_grads = oracle
    _, grads = _repo_loss_and_grads(cfg, batch, sd)
    assert set(grads) >= set(ref_grads), \
        set(ref_grads) - set(grads)
    checked = 0
    for name, want in ref_grads.items():
        got = np.asarray(grads[name])
        scale = np.abs(want).max()
        # 1e-8 floor: params whose true gradient is zero accumulate only
        # f32 summation noise (~1e-11), ordered differently per framework
        np.testing.assert_allclose(
            got, want, rtol=5e-3, atol=max(2e-4 * scale, 1e-8),
            err_msg=f"{name} (|g|max={scale:.2e})")
        checked += 1
    assert checked > 50  # every module contributes
