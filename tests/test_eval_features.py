"""Evaluator feature coverage: external score modulation, to_fixed_len
resizing (MAD-style), pool_only backbone, TextIdentity encoder."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from decafnet_tpu.core import get_cfg_defaults, update_opt, update_eval_data
from decafnet_tpu.data import (apply_synthetic_cfg, batchify_train,
                               make_dataset, make_synthetic_dataset)
from decafnet_tpu.models import make_model
from decafnet_tpu.eval import Evaluator


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    root = tmp_path_factory.mktemp("eval_synth")
    return make_synthetic_dataset(str(root), num_videos=2, num_queries=2,
                                  clip_range=(40, 70), seed=9)


def _base_cfg(synth, **model_over):
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
    cfg.train.num_workers = 0
    cfg.seed = 3
    for k, v in model_over.items():
        cfg.model[k] = v
    apply_synthetic_cfg(cfg, synth)
    update_opt(cfg)
    update_eval_data(cfg)
    return cfg


def _init_params(cfg, ev):
    model = make_model(cfg)
    sample = ev.dataset[0]
    b = batchify_train([sample], cfg.data.max_vid_len,
                       cfg.data.max_text_len, 1)
    return model.init(jax.random.PRNGKey(0), b["vid"], b["shallow_vid"],
                      b["vid_masks"], b["text"], b["text_cls"],
                      b["text_masks"], deterministic=True)["params"]


def test_ext_scores_modulation(synth, tmp_path):
    """External per-query scores multiply level scores and are max-pooled
    per level (reference: libs/worker_v2.py:1150-1155)."""
    cfg = _base_cfg(synth)
    ev0 = Evaluator(cfg, train_time=True)
    params = _init_params(cfg, ev0)

    # fabricate ext score files: one per sentence_id of the eval split
    ext_dir = tmp_path / "ext"
    os.makedirs(ext_dir)
    rng = np.random.RandomState(0)
    for vid_id, info in ev0.dataset.vid_dict.items():
        n_clips = info["num_clips"]
        for tid in info["text_ids"]:
            np.save(ext_dir / f"{tid}.npy",
                    rng.randn(n_clips).astype(np.float32))

    cfg_ext = _base_cfg(synth)
    cfg_ext.eval.data.ext_score_dir = str(ext_dir)
    ev1 = Evaluator(cfg_ext, train_time=True)
    sample = ev1.dataset[0]
    assert sample["ext_scores"] is not None
    assert sample["ext_scores"].shape[0] == len(sample["text"])

    m0 = ev0.run(ema_params=params)
    m1 = ev1.run(ema_params=params)
    assert m1.shape == m0.shape  # runs end to end with modulation applied


def test_modulated_level_scores_vs_torch_oracle():
    """Numeric oracle for the modulate-then-maxpool ladder: sigmoid scores x
    external scores, ext max-pooled (k=3, s=2, p=1) between levels, masked
    (torch re-statement of libs/worker_v2.py:1147-1156)."""
    import torch
    import torch.nn.functional as F
    from decafnet_tpu.eval.evaluator import modulated_level_scores

    rng = np.random.RandomState(4)
    Q, T, levels = 3, 64, 4
    lens = [T >> i for i in range(levels)]
    logits = [rng.randn(Q, n).astype(np.float32) * 2 for n in lens]
    masks = [np.zeros((Q, n), bool) for n in lens]
    for lvl, n in enumerate(lens):
        for q, valid in enumerate((T, 40, 17)):
            masks[lvl][q, :max(-(-valid >> lvl), 1)] = True
    ext = np.abs(rng.randn(Q, T).astype(np.float32))

    got = modulated_level_scores(
        [jnp.asarray(x) for x in logits],
        [jnp.asarray(m) for m in masks], jnp.asarray(ext))

    e = torch.from_numpy(ext)
    for lvl in range(levels):
        s = torch.sigmoid(torch.from_numpy(logits[lvl]))
        s = s * e
        e = F.max_pool1d(e[:, None], kernel_size=3, stride=2, padding=1)[:, 0]
        s = s * torch.from_numpy(masks[lvl]).float()
        np.testing.assert_allclose(np.asarray(got[lvl]), s.numpy(),
                                   rtol=1e-6, atol=1e-7,
                                   err_msg=f"level {lvl}")

    # without ext scores: plain masked sigmoid
    got_plain = modulated_level_scores(
        [jnp.asarray(x) for x in logits],
        [jnp.asarray(m) for m in masks], None)
    for lvl in range(levels):
        want = 1.0 / (1.0 + np.exp(-logits[lvl])) * masks[lvl]
        np.testing.assert_allclose(np.asarray(got_plain[lvl]), want,
                                   rtol=1e-6, atol=1e-7)


def test_to_fixed_len_pipeline(synth):
    """MAD-style to_fixed_len: every video resized to max_vid_len
    (reference: libs/data/dataset.py:508-519,697-701)."""
    cfg = _base_cfg(synth)
    cfg.data.to_fixed_len = True
    cfg.eval.data.to_fixed_len = True
    ds = make_dataset(cfg, num_epochs=1, is_training=True,
                      rng=np.random.RandomState(0))
    s = ds[0]
    assert s["vid"].shape[1] == cfg.data.max_vid_len
    assert s["shallow_vid"].shape[1] == cfg.data.max_vid_len
    assert isinstance(s["clip_stride"], float)
    # grid targets stay within the resized grid
    assert np.all(s["target"] <= cfg.data.max_vid_len + 1)


def test_pool_only_backbone(synth):
    cfg = _base_cfg(synth)
    cfg.model.vid_net.pool_only = True
    ev = Evaluator(cfg, train_time=True)
    params = _init_params(cfg, ev)
    metrics = ev.run(ema_params=params)
    assert metrics.shape == (2, 2)


def test_hard_nms_mode(synth):
    """nms.mode 'nms' (greedy hard NMS) through the full evaluator."""
    cfg = _base_cfg(synth)
    cfg.nms.mode = "nms"
    cfg.nms.iou_thresh = 0.3
    ev = Evaluator(cfg, train_time=True)
    params = _init_params(cfg, ev)
    metrics = ev.run(ema_params=params)
    assert metrics.shape == (2, 2)

    # reference-exact host path must agree
    cfg2 = _base_cfg(synth)
    cfg2.nms.mode = "nms"
    cfg2.nms.iou_thresh = 0.3
    cfg2.eval.reference_exact = True
    ev2 = Evaluator(cfg2, train_time=True)
    metrics2 = ev2.run(ema_params=params)
    np.testing.assert_allclose(metrics, metrics2, atol=1e-8)


def test_text_identity_encoder(synth):
    cfg = _base_cfg(synth)
    cfg.model.text_net.name = "identity"
    cfg.model.text_net.embd_dim = 16
    update_opt(cfg)
    ev = Evaluator(cfg, train_time=True)
    params = _init_params(cfg, ev)
    metrics = ev.run(ema_params=params)
    assert metrics.shape == (2, 2)
