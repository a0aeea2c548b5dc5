"""Eval sharded over videos on the mesh (``eval.shard_videos``): same-bucket
videos are stacked and each device decodes its own -- the R@k/IoU table and
per-query losses must be IDENTICAL to the single-device run. Upgrade over
the reference's strictly bs=1 single-process Evaluator
(/root/reference/libs/worker_v2.py:739).

The dataset mixes short videos with videos longer than max_vid_len, so
sharded groups also carry per-video PE interpolation plans.
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
    root = tmp_path_factory.mktemp("shard_synth")
    # seed 6 -> val lengths [46, 112, 62, 99] with max_vid_len=64: two
    # short-bucket videos and two long ones (PE-interp branch) per group
    return make_synthetic_dataset(str(root), num_videos=4, num_queries=3,
                                  clip_range=(40, 130), seed=6)


def _cfg(synth, shard_videos=0):
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
    cfg.eval.shard_videos = shard_videos
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


def test_sharded_eval_matches_single_device(synth):
    cfg0 = _cfg(synth, shard_videos=0)
    ev0 = Evaluator(cfg0, train_time=True)
    params = _params(cfg0, ev0)
    m0 = ev0.run(ema_params=params)
    counts0, cnt0 = ev0.meter.counts.copy(), ev0.meter.text_cnt

    mesh = make_mesh()
    n_dev = mesh.devices.size
    assert n_dev == 8  # conftest forces the virtual 8-device CPU mesh

    cfg1 = _cfg(synth, shard_videos=n_dev)
    ev1 = Evaluator(cfg1, mesh=mesh, train_time=True)
    m1 = ev1.run(ema_params=params)

    np.testing.assert_array_equal(ev1.meter.counts, counts0)
    assert ev1.meter.text_cnt == cnt0
    np.testing.assert_allclose(m1, m0)


def test_sharded_eval_with_ext_scores(synth, tmp_path):
    """Sharded grouping also carries per-query external scores; counts must
    equal the single-device run with the same ext files."""
    import os

    cfg0 = _cfg(synth, shard_videos=0)
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
    cfg1 = _cfg(synth, shard_videos=mesh.devices.size)
    cfg1.eval.data.ext_score_dir = str(ext_dir)
    ev1 = Evaluator(cfg1, mesh=mesh, train_time=True)
    ev1.run(ema_params=params)

    np.testing.assert_array_equal(ev1.meter.counts, ev0.meter.counts)
    assert ev1.meter.text_cnt == ev0.meter.text_cnt


def test_sharded_groups_exercise_padding(synth):
    """The last partial group is padded with inert items; every video must
    still finalize exactly once (the assembly assertion inside
    _run_sharded covers the bookkeeping)."""
    mesh = make_mesh()
    cfg = _cfg(synth, shard_videos=mesh.devices.size)
    ev = Evaluator(cfg, mesh=mesh, train_time=True)
    params = _params(cfg, ev)
    metrics = ev.run(ema_params=params)
    assert ev.meter.text_cnt == sum(
        len(info["text_ids"]) for info in ev.dataset.vid_dict.values())
    assert np.isfinite(metrics).all()


def test_sharded_reference_exact_mode(synth):
    """Sharding composes with reference_exact (host C++ SoftNMS per row):
    counts equal the unsharded reference_exact run."""
    cfg0 = _cfg(synth, shard_videos=0)
    cfg0.eval.reference_exact = True
    ev0 = Evaluator(cfg0, train_time=True)
    params = _params(cfg0, ev0)
    ev0.run(ema_params=params)

    mesh = make_mesh()
    cfg1 = _cfg(synth, shard_videos=mesh.devices.size)
    cfg1.eval.reference_exact = True
    ev1 = Evaluator(cfg1, mesh=mesh, train_time=True)
    ev1.run(ema_params=params)

    np.testing.assert_array_equal(ev1.meter.counts, ev0.meter.counts)
    assert ev1.meter.text_cnt == ev0.meter.text_cnt
