"""Checkpoint pruning: ``aux.save_run`` retention across .msgpack/.pth
pairs, ``log.checkpoint_epochs`` exemption, and last.* always kept
(train/trainer.py:_prune_checkpoints; the reference defines aux.save_run=2,
libs/core/opt.py:26, but never wires it)."""

import os

from decafnet_tpu.core import get_cfg_defaults
from decafnet_tpu.train.trainer import Trainer


class _Stub:
    """Carrier for cfg so _prune_checkpoints runs without a full Trainer."""

    def __init__(self, cfg):
        self.cfg = cfg


def _touch(mdir, names):
    for n in names:
        with open(os.path.join(mdir, n), "w") as f:
            f.write("x")


def _make(tmp_path, save_run, checkpoint_epochs=()):
    cfg = get_cfg_defaults("grounder")
    cfg.aux.logdir = str(tmp_path)
    cfg.aux.save_run = save_run
    cfg.log.checkpoint_epochs = list(checkpoint_epochs)
    mdir = os.path.join(str(tmp_path), "models")
    os.makedirs(mdir, exist_ok=True)
    return cfg, mdir


def test_prune_keeps_most_recent_pairs(tmp_path):
    cfg, mdir = _make(tmp_path, save_run=2)
    _touch(mdir, ["1-100.msgpack", "1-100.pth",
                  "2-200.msgpack", "2-200.pth",
                  "3-300.msgpack", "3-300.pth",
                  "4-400.msgpack", "4-400.pth",
                  "last.msgpack", "last.pth"])
    Trainer._prune_checkpoints(_Stub(cfg))
    left = sorted(os.listdir(mdir))
    assert left == ["3-300.msgpack", "3-300.pth",
                    "4-400.msgpack", "4-400.pth",
                    "last.msgpack", "last.pth"]


def test_prune_exempts_checkpoint_epochs(tmp_path):
    cfg, mdir = _make(tmp_path, save_run=1, checkpoint_epochs=[2])
    _touch(mdir, ["1-100.msgpack", "2-200.msgpack", "2-200.pth",
                  "3-300.msgpack", "last.msgpack"])
    Trainer._prune_checkpoints(_Stub(cfg))
    left = sorted(os.listdir(mdir))
    # epoch 3 retained (most recent), epoch 2 exempt, epoch 1 pruned
    assert left == ["2-200.msgpack", "2-200.pth",
                    "3-300.msgpack", "last.msgpack"]


def test_prune_disabled_keeps_everything(tmp_path):
    cfg, mdir = _make(tmp_path, save_run=0)
    names = ["1-100.msgpack", "2-200.msgpack", "last.msgpack"]
    _touch(mdir, names)
    Trainer._prune_checkpoints(_Stub(cfg))
    assert sorted(os.listdir(mdir)) == sorted(names)


def test_prune_ignores_non_checkpoint_files(tmp_path):
    cfg, mdir = _make(tmp_path, save_run=1)
    _touch(mdir, ["1-100.msgpack", "2-200.msgpack",
                  "notes-draft.txt", "opt.yaml", "last.pth"])
    Trainer._prune_checkpoints(_Stub(cfg))
    left = sorted(os.listdir(mdir))
    assert left == ["2-200.msgpack", "last.pth", "notes-draft.txt",
                    "opt.yaml"]


def test_prune_orders_by_epoch_then_itr(tmp_path):
    """(10, 5000) must outrank (9, 90000): ordering is numeric on the
    (epoch, itr) tuple, not lexicographic on the filename."""
    cfg, mdir = _make(tmp_path, save_run=1)
    _touch(mdir, ["9-90000.msgpack", "10-5000.msgpack", "last.msgpack"])
    Trainer._prune_checkpoints(_Stub(cfg))
    assert sorted(os.listdir(mdir)) == ["10-5000.msgpack", "last.msgpack"]
