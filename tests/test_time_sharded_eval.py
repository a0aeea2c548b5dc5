"""Sequence-parallel eval (``eval.shard_time``): each video's time axis is
sharded over the mesh and ONE forward spans all devices — XLA's SPMD
partitioner inserts the conv/band-attention halo exchanges and the
collectives for the global reductions (delegation top-k, decode, SoftNMS).
The R@k/IoU table and per-query losses must match the single-device run.

This is true sequence parallelism for MAD-scale videos, a capability the
reference (strictly bs=1, single-GPU eval, libs/worker_v2.py:739) has no
analogue for.
"""

import numpy as np
import pytest

import jax

from decafnet_tpu.core import get_cfg_defaults, update_opt, update_eval_data
from decafnet_tpu.data import (apply_synthetic_cfg, batchify_train,
                               make_synthetic_dataset)
from decafnet_tpu.eval import Evaluator
from decafnet_tpu.models import make_model
from decafnet_tpu.parallel import make_mesh


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    root = tmp_path_factory.mktemp("timeshard_synth")
    # mixes videos shorter and longer than max_vid_len so the PE-interp
    # branch also runs under the time sharding
    return make_synthetic_dataset(str(root), num_videos=4, num_queries=3,
                                  clip_range=(40, 130), seed=6)


def _cfg(synth, shard_time=0):
    cfg = get_cfg_defaults("grounder")
    cfg.model.name = "iter"
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
    cfg.eval.shard_time = shard_time
    apply_synthetic_cfg(cfg, synth)
    update_opt(cfg)
    update_eval_data(cfg)
    return cfg


def _params(cfg, ev):
    model = make_model(cfg)
    sample = [s for s in (ev.dataset[i] for i in range(len(ev.dataset)))
              if s["vid"].shape[1] <= cfg.data.max_vid_len][0]
    b = batchify_train([sample], cfg.data.max_vid_len,
                       cfg.data.max_text_len, 1)
    return model.init(jax.random.PRNGKey(0), b["vid"], b["shallow_vid"],
                      b["vid_masks"], b["text"], b["text_cls"],
                      b["text_masks"], deterministic=True)["params"]


def test_time_sharded_eval_matches_single_device(synth):
    cfg0 = _cfg(synth, shard_time=0)
    ev0 = Evaluator(cfg0, train_time=True)
    params = _params(cfg0, ev0)
    m0 = ev0.run(ema_params=params)
    counts0, cnt0 = ev0.meter.counts.copy(), ev0.meter.text_cnt
    loss0 = ev0.last_loss_means if hasattr(ev0, "last_loss_means") else None

    mesh = make_mesh()
    assert mesh.devices.size == 8  # conftest forces the 8-device CPU mesh

    cfg1 = _cfg(synth, shard_time=mesh.devices.size)
    ev1 = Evaluator(cfg1, mesh=mesh, train_time=True)
    m1 = ev1.run(ema_params=params)

    np.testing.assert_array_equal(ev1.meter.counts, counts0)
    assert ev1.meter.text_cnt == cnt0
    np.testing.assert_allclose(m1, m0)
    del loss0


def test_time_sharded_eval_with_ext_scores(synth, tmp_path):
    """Time sharding composes with per-query external scores (replicated
    while the video shards): counts must equal the single-device run."""
    import os

    cfg0 = _cfg(synth, shard_time=0)
    ev_probe = Evaluator(cfg0, train_time=True)
    ext_dir = tmp_path / "ext"
    os.makedirs(ext_dir)
    rng = np.random.RandomState(1)
    for vid_id, info in ev_probe.dataset.vid_dict.items():
        for tid in info["text_ids"]:
            np.save(ext_dir / f"{tid}.npy",
                    rng.randn(info["num_clips"]).astype(np.float32))

    cfg0.eval.data.ext_score_dir = str(ext_dir)
    ev0 = Evaluator(cfg0, train_time=True)
    params = _params(cfg0, ev0)
    ev0.run(ema_params=params)

    mesh = make_mesh()
    cfg1 = _cfg(synth, shard_time=mesh.devices.size)
    cfg1.eval.data.ext_score_dir = str(ext_dir)
    ev1 = Evaluator(cfg1, mesh=mesh, train_time=True)
    ev1.run(ema_params=params)

    np.testing.assert_array_equal(ev1.meter.counts, ev0.meter.counts)
    assert ev1.meter.text_cnt == ev0.meter.text_cnt


def test_time_sharded_reference_exact(synth):
    """Time sharding composes with the reference_exact host-NMS mode: the
    dense candidate tensors fetched to the host must be numerically
    equivalent, so counts match exactly."""
    cfg0 = _cfg(synth, shard_time=0)
    cfg0.eval.reference_exact = True
    ev0 = Evaluator(cfg0, train_time=True)
    params = _params(cfg0, ev0)
    ev0.run(ema_params=params)

    mesh = make_mesh()
    cfg1 = _cfg(synth, shard_time=mesh.devices.size)
    cfg1.eval.reference_exact = True
    ev1 = Evaluator(cfg1, mesh=mesh, train_time=True)
    ev1.run(ema_params=params)

    np.testing.assert_array_equal(ev1.meter.counts, ev0.meter.counts)
    assert ev1.meter.text_cnt == ev0.meter.text_cnt
