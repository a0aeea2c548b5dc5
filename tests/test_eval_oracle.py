"""End-to-end eval parity oracle: the torch reference Evaluator
(libs/worker_v2.py:726-1227) runs on the synthetic dataset with shared
imported weights, and the repo Evaluator in ``reference_exact`` mode must
reproduce its detections (seconds), per-video eval losses, and the final
R@k/IoU counts -- including a video LONGER than ``data.max_vid_len``, which
forces the reference's ``_drop_forward_eval`` per-query loop and its
PE-interpolation/padding branch (libs/worker_v2.py:969-976,
libs/modeling/video_net.py:144-151).

The reference is imported read-only with: (a) its C++ NMS extension built
via torch cpp_extension into a cache dir, (b) stubs for the dead-code-only
imports (torchvision/decord/torchtext), and (c) .cuda() neutralized (torch
here is CPU-only; the reference hardcodes CUDA placement).
"""

import os
import sys
import types

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from decafnet_tpu.core import get_cfg_defaults, update_opt, update_eval_data
from decafnet_tpu.data import apply_synthetic_cfg, make_synthetic_dataset
from decafnet_tpu.eval import Evaluator
from decafnet_tpu.models import make_model
from decafnet_tpu.models.import_torch import params_to_state_dict

REF = "/root/reference"


@pytest.fixture(scope="module")
def ref_worker():
    """Import libs.worker_v2 from the reference with stubs + CPU patches."""
    from conftest import setup_reference_imports
    setup_reference_imports(need_nms=True)
    import libs.worker_v2 as worker_v2
    return worker_v2


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    root = tmp_path_factory.mktemp("oracle_synth")
    # clip_range spans both sides of max_vid_len=64 so at least one video
    # exercises the long-video eval path
    # seed 3 -> val video lengths [62, 104, 50, 44]: mixes short videos with
    # one longer than max_vid_len=64 (the PE-interpolation branch)
    return make_synthetic_dataset(str(root), num_videos=4, num_queries=3,
                                  clip_range=(40, 130), seed=3)


def _cfg(synth, logdir, variant="msf"):
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
    if variant == "msf":
        # the released DeCafNet shape: shallow concat (msf)
        cfg.model.sratio = 0.5
        cfg.model.sn = 8
        cfg.model.msf = True
    else:
        # the other delegation branches: mask-AND gating (msf=False) with
        # the correlation row appended (scat), released 30% ratio
        cfg.model.sratio = 0.3
        cfg.model.sn = 8
        cfg.model.msf = False
        cfg.model.scat = True
    cfg.train.num_workers = 0
    cfg.train.version = 2
    cfg.seed = 5
    cfg.aux.logdir = logdir
    cfg.aux.ckpt = "1-100"
    cfg.eval.reference_exact = True
    apply_synthetic_cfg(cfg, synth)
    # the reference BaseDataset asserts text_feat_dir is set when tokenizer
    # is None (libs/data/dataset.py:215-218) even though the CLIP datasets
    # override _load_text_feats and never read it
    cfg.data.text_feat_dir = "unused-clip-tokens"
    # the reference iterates shallow_vid_feat_dir without coercing a lone
    # string to a list (libs/data/dataset.py:849-853)
    cfg.data.shallow_vid_feat_dir = [cfg.data.shallow_vid_feat_dir]
    cfg.eval.data.shallow_vid_feat_dir = list(cfg.data.shallow_vid_feat_dir)
    update_opt(cfg)
    update_eval_data(cfg)
    return cfg


@pytest.fixture(scope="module", params=["msf", "gate_scat"])
def shared(request, ref_worker, synth, tmp_path_factory):
    """One repo Evaluator + one reference Evaluator over the same weights;
    parametrized over the delegation branches (shallow-concat msf vs
    mask-AND gating + scat at the released 30% ratio)."""
    logdir = str(tmp_path_factory.mktemp("oracle_log"))
    cfg = _cfg(synth, logdir, variant=request.param)

    # init repo params (zeros of the right shapes) and export them as a
    # reference-layout .pth
    model = make_model(cfg)
    T, L = cfg.data.max_vid_len, cfg.data.max_text_len
    cv = cfg.model.vid_net.in_dim
    ct = cfg.model.text_net.in_dim
    params = model.init(
        jax.random.PRNGKey(1),
        np.zeros((1, cv, T), np.float32), np.zeros((1, cv, T), np.float32),
        np.ones((1, T), bool), np.zeros((1, ct, L), np.float32),
        np.zeros((1, cv), np.float32), np.ones((1, L), bool),
        deterministic=True)["params"]
    sd = {k: torch.from_numpy(np.array(v))
          for k, v in params_to_state_dict(jax.device_get(params)).items()}
    os.makedirs(os.path.join(logdir, "models"), exist_ok=True)
    torch.save({"model": sd, "model_ema": sd},
               os.path.join(logdir, "models", "1-100.pth"))

    # reference Evaluator over the SAME config tree + checkpoint
    ref_cfg = cfg.clone()
    ref_cfg._root = logdir
    ref_cfg._ckpt = "1-100"
    ref_ev = ref_worker.Evaluator(ref_cfg)

    repo_ev = Evaluator(cfg)  # loads models/1-100.pth -> model_ema
    return repo_ev, ref_ev, cfg


def test_covers_long_video(shared):
    repo_ev, ref_ev, cfg = shared
    lens = [info["num_clips"] for info in repo_ev.dataset.vid_dict.values()]
    assert max(lens) > cfg.data.max_vid_len, lens
    assert min(lens) <= cfg.data.max_vid_len, lens


def test_detections_and_losses_match_reference(shared):
    repo_ev, ref_ev, cfg = shared

    ref_by_vid = {}
    for data_list in ref_ev.dataloader:
        data = data_list[0]
        with torch.no_grad():
            _, results, loss = ref_ev.simple_predict(data)
        ref_by_vid[data["clip_id"]] = (results, loss)

    n_long = 0
    for samples in repo_ev.loader:
        sample = samples[0]
        meta, results, losses = repo_ev.predict_video(sample, repo_ev.params)
        want_results, want_loss = ref_by_vid[meta["clip_id"]]
        assert len(results) == len(want_results)
        if meta["vid_len"] > cfg.data.max_vid_len:
            n_long += 1
        for qi, (got, want) in enumerate(zip(results, want_results)):
            w_segs = want["segments"].numpy().reshape(-1, 2)
            w_scores = want["scores"].numpy().reshape(-1)
            err = f"vid {meta['clip_id']} (t={meta['vid_len']}) query {qi}"
            assert got["segments"].shape == w_segs.shape, err
            np.testing.assert_allclose(got["segments"], w_segs,
                                       rtol=1e-4, atol=1e-3, err_msg=err)
            np.testing.assert_allclose(got["scores"], w_scores,
                                       rtol=1e-3, atol=1e-4, err_msg=err)
        # reference reports the per-video MEAN of per-query diagnostics
        got_mean = {k: np.mean([l[k] for l in losses])
                    for k in ("cls_loss", "reg_loss")}
        for k in ("cls_loss", "reg_loss"):
            np.testing.assert_allclose(got_mean[k], want_loss[k],
                                       rtol=1e-3, atol=1e-4,
                                       err_msg=f"{meta['clip_id']} {k}")
    assert n_long >= 1


def test_recall_table_matches_reference(shared):
    """Full runs: identical R@k x IoU@t count matrices."""
    repo_ev, ref_ev, cfg = shared
    repo_ev.reset()
    ref_ev.reset()

    with torch.no_grad():
        ref_ev.run()
    ref_counts, ref_cnt = ref_ev.counts.copy(), ref_ev.text_cnt

    repo_ev.run()
    np.testing.assert_array_equal(repo_ev.meter.counts, ref_counts)
    assert repo_ev.meter.text_cnt == ref_cnt
