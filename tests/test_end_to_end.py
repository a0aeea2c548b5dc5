"""End-to-end: synthetic dataset -> Trainer (one step) -> checkpoint ->
Evaluator (device NMS and reference-exact host NMS must agree)."""

import os

import numpy as np
import pytest

from decafnet_tpu.core import get_cfg_defaults, update_opt, update_eval_data
from decafnet_tpu.data import make_synthetic_dataset, apply_synthetic_cfg


@pytest.fixture(scope="module")
def synth_paths(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth")
    return make_synthetic_dataset(str(root), num_videos=3, num_queries=3,
                                  clip_range=(40, 90), vid_dim=32,
                                  shallow_dim=32, text_dim=24, seed=11)


def tiny_cfg(synth_paths, logdir):
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
    cfg.train.batch_size = 2
    cfg.train.microbatch_size = 1
    cfg.train.epochs = 1
    cfg.train.warmup_epochs = 0
    cfg.train.num_workers = 0
    cfg.eval.max_num_queries = 4
    cfg.seed = 13
    cfg.aux.dryrun = True
    cfg.aux.logdir = logdir
    apply_synthetic_cfg(cfg, synth_paths)
    update_opt(cfg)
    update_eval_data(cfg)
    return cfg


def test_train_step_and_checkpoint(synth_paths, tmp_path):
    from decafnet_tpu.train import Trainer

    cfg = tiny_cfg(synth_paths, str(tmp_path / "exp"))
    trainer = Trainer(cfg)
    assert trainer.itrs_per_epoch >= 1
    trainer.run()
    assert trainer.itr >= 1
    # losses were finite
    assert all(np.isfinite(m.sum) for m in trainer.loss_meters.values())
    trainer.checkpoint()
    assert os.path.exists(os.path.join(cfg.aux.logdir, "models",
                                       "last.msgpack"))
    assert os.path.exists(os.path.join(cfg.aux.logdir, "models", "last.pth"))


def test_eval_device_vs_reference_exact(synth_paths, tmp_path):
    import jax
    from decafnet_tpu.models import make_model
    from decafnet_tpu.eval import Evaluator

    cfg = tiny_cfg(synth_paths, str(tmp_path / "exp2"))
    cfg.aux.dryrun = False

    # random params shared by both eval modes
    model = make_model(cfg)
    ev = Evaluator(cfg, train_time=True)
    sample = ev.dataset[0]
    from decafnet_tpu.data import batchify_train
    init_batch = batchify_train([sample], cfg.data.max_vid_len,
                                cfg.data.max_text_len, 1)
    params = model.init(
        jax.random.PRNGKey(1),
        init_batch["vid"], init_batch["shallow_vid"], init_batch["vid_masks"],
        init_batch["text"], init_batch["text_cls"], init_batch["text_masks"],
        deterministic=True)["params"]

    metrics_dev = ev.run(ema_params=params)

    cfg2 = tiny_cfg(synth_paths, str(tmp_path / "exp3"))
    cfg2.eval.reference_exact = True
    cfg2.aux.dryrun = False
    ev2 = Evaluator(cfg2, train_time=True)
    metrics_host = ev2.run(ema_params=params)

    np.testing.assert_allclose(metrics_dev, metrics_host, atol=1e-8)
    assert metrics_dev.shape == (2, 2)
    assert np.all(metrics_dev >= 0) and np.all(metrics_dev <= 1)


def test_train_time_eval_cadence(synth_paths, tmp_path):
    """aux.eval_run > 0 runs the train-time Evaluator at the epoch cadence
    (reference: libs/worker_v2.py:359-364)."""
    from decafnet_tpu.train import Trainer

    cfg = tiny_cfg(synth_paths, str(tmp_path / "exp_cadence"))
    cfg.aux.eval_run = 1
    cfg.aux.eval_by = "epoch"
    cfg.aux.dryrun = False
    trainer = Trainer(cfg)
    assert trainer.evaluator is not None
    trainer.run()
    # checkpoint written by the per-epoch evaluate() call
    assert os.path.exists(os.path.join(cfg.aux.logdir, "models",
                                       "last.msgpack"))
    assert trainer.evaluator.meter.text_cnt == 0  # reset() after each run


def test_model_resume_from_pth(synth_paths, tmp_path):
    """aux.model_resume warm-starts from a reference-layout .pth."""
    from decafnet_tpu.train import Trainer
    import numpy as _np

    cfg = tiny_cfg(synth_paths, str(tmp_path / "exp_src"))
    t1 = Trainer(cfg)
    t1.checkpoint()
    pth = os.path.join(cfg.aux.logdir, "models", "last.pth")

    cfg2 = tiny_cfg(synth_paths, str(tmp_path / "exp_warm"))
    cfg2.aux.model_resume = pth
    t2 = Trainer(cfg2)
    a = _np.asarray(t1.state.params["vid_map"]["conv"]["weight"])
    b = _np.asarray(t2.state.params["vid_map"]["conv"]["weight"])
    _np.testing.assert_array_equal(a, b)
    assert t2.itr == 0  # weights only, no training state


def test_resume_from_checkpoint(synth_paths, tmp_path):
    """Auto-resume restores epoch/itr/loss_norm/opt_state
    (reference: train.py:66-69, libs/worker_v2.py:658-670)."""
    from decafnet_tpu.train import Trainer

    logdir = str(tmp_path / "exp_resume")
    cfg = tiny_cfg(synth_paths, logdir)
    trainer = Trainer(cfg)
    trainer.run()
    trainer.epoch = 1  # pretend the epoch completed (dryrun breaks early)
    trainer.checkpoint()
    itr0 = trainer.itr
    loss_norm0 = float(trainer.state.loss_norm)

    trainer2 = Trainer(tiny_cfg(synth_paths, logdir))
    assert trainer2.epoch == 1
    assert trainer2.itr == itr0
    assert float(trainer2.state.loss_norm) == loss_norm0
    # optimizer state round-tripped (second moments are non-zero)
    import jax
    l2 = sum(float((np.asarray(x) ** 2).sum())
             for x in jax.tree_util.tree_leaves(trainer2.state.opt_state))
    assert l2 > 0


def test_train_checkpoint_then_eval_cli_layout(synth_paths, tmp_path):
    """The torch-layout .pth written by the Trainer round-trips through the
    Evaluator's checkpoint loader (release-checkpoint code path)."""
    from decafnet_tpu.train import Trainer
    from decafnet_tpu.eval import Evaluator

    logdir = str(tmp_path / "exp4")
    cfg = tiny_cfg(synth_paths, logdir)
    trainer = Trainer(cfg)
    trainer.run()
    trainer.checkpoint()

    cfg2 = tiny_cfg(synth_paths, logdir)
    cfg2.aux.ckpt = "last"
    cfg2.aux.dryrun = True
    ev = Evaluator(cfg2)   # loads models/last.msgpack (EMA branch)
    metrics = ev.run()
    assert metrics.shape == (2, 2)
