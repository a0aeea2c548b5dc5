"""Invariance properties that guard the TPU-specific batching/padding design:
results must not depend on query batching, padding buckets, or bin-count
selection edge cases."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from decafnet_tpu.core import get_cfg_defaults, update_opt, update_eval_data
from decafnet_tpu.data import (apply_synthetic_cfg, batchify_train,
                               make_synthetic_dataset)
from decafnet_tpu.eval import Evaluator
from decafnet_tpu.models import make_model
from decafnet_tpu.ops.delegation import delegation_weights


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    root = tmp_path_factory.mktemp("inv_synth")
    return make_synthetic_dataset(str(root), num_videos=2, num_queries=4,
                                  clip_range=(40, 70), seed=21)


def _cfg(synth, query_cap):
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
    cfg.eval.max_num_queries = query_cap
    cfg.seed = 3
    apply_synthetic_cfg(cfg, synth)
    update_opt(cfg)
    update_eval_data(cfg)
    return cfg


def test_query_batching_invariance(synth):
    """Queries processed one-per-program (cap=1, the reference's structure)
    and four-per-program (cap=4) must give identical detections -- the core
    claim behind batching queries as rows."""
    cfg1 = _cfg(synth, query_cap=1)
    cfg4 = _cfg(synth, query_cap=4)
    ev1 = Evaluator(cfg1, train_time=True)
    ev4 = Evaluator(cfg4, train_time=True)

    model = make_model(cfg4)
    sample = ev4.dataset[0]
    b = batchify_train([sample], cfg4.data.max_vid_len,
                       cfg4.data.max_text_len, 1)
    params = model.init(jax.random.PRNGKey(0), b["vid"], b["shallow_vid"],
                        b["vid_masks"], b["text"], b["text_cls"],
                        b["text_masks"], deterministic=True)["params"]

    _, res1, loss1 = ev1.predict_video(sample, params)
    _, res4, loss4 = ev4.predict_video(sample, params)
    assert len(res1) == len(res4) == 4
    for r1, r4 in zip(res1, res4):
        np.testing.assert_allclose(r1["segments"], r4["segments"],
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(r1["scores"], r4["scores"],
                                   rtol=1e-4, atol=1e-5)
    for l1, l4 in zip(loss1, loss4):
        np.testing.assert_allclose(l1["cls_loss"], l4["cls_loss"],
                                   rtol=1e-3, atol=1e-4)


def test_delegation_count_property():
    """Selected-clip count == bins kept * bin coverage: exactly
    max(int(ratio * nbins), ... or ALL bins when int() truncates to 0."""
    rng = np.random.RandomState(0)
    T, sn = 600, 60
    for n_valid in (600, 359, 60, 45):
        for ratio in (0.3, 0.5, 0.7, 1.0):
            correl = rng.randn(1, T).astype(np.float32)
            mask = np.zeros((1, T), bool)
            mask[0, :n_valid] = True
            w = np.asarray(delegation_weights(
                jnp.asarray(correl), jnp.asarray(mask), sn, ratio))[0]
            nbins = -(-n_valid // sn)
            k = int(ratio * nbins) or nbins
            n_sel_bins = len({i * nbins // n_valid
                              for i in range(n_valid)
                              if w[i] > 0})
            assert w[n_valid:].sum() == 0
            assert n_sel_bins == k, (n_valid, ratio, n_sel_bins, k)
