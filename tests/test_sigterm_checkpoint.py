"""Preemption-signal checkpointing (SURVEY aux 5.3): SIGTERM mid-training
must write a resumable checkpoint and exit 143, and a fresh Trainer must
auto-resume from it. The reference has no preemption handling at all (its
closest analogue is auto-resume from the last per-epoch checkpoint,
/root/reference/train.py:66-69); TPU VM preemptions make the signal path
load-bearing here, so it is exercised through a real subprocess + signal.
"""

import json
import os
import signal
import subprocess
import sys
import textwrap
import time

import pytest

from decafnet_tpu.data import make_synthetic_dataset

WORKER = textwrap.dedent("""
    import json, os, sys

    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 1)
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/decafnet_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    from decafnet_tpu.core import (get_cfg_defaults, update_opt,
                                   update_eval_data)
    from decafnet_tpu.data import apply_synthetic_cfg
    from decafnet_tpu.train import Trainer

    synth_root, logdir = sys.argv[1], sys.argv[2]
    paths = json.load(open(os.path.join(synth_root, "paths.json")))
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
    cfg.train.epochs = 500          # far more than the parent lets us run
    cfg.train.warmup_epochs = 1
    cfg.train.num_workers = 0
    cfg.aux.eval_run = -1
    cfg.aux.resume = True
    cfg.aux.logdir = logdir
    cfg.seed = 7
    apply_synthetic_cfg(cfg, paths)
    update_opt(cfg)
    update_eval_data(cfg)

    trainer = Trainer(cfg)
    orig_step = trainer._step_fn

    def step(state, batch, rng, points):
        out = orig_step(state, batch, rng, points)
        print(f"STEP::{trainer.itr + 1}", flush=True)
        return out

    trainer._step_fn = step
    trainer.run()
""")


def test_sigterm_checkpoints_and_resumes(tmp_path):
    synth_root = str(tmp_path / "ds")
    synth = make_synthetic_dataset(synth_root, num_videos=3,
                                   num_queries=2, clip_range=(40, 60),
                                   vid_dim=32, shallow_dim=32, text_dim=24,
                                   seed=3)
    with open(os.path.join(synth_root, "paths.json"), "w") as f:
        json.dump(synth, f)
    logdir = str(tmp_path / "exp")
    os.makedirs(os.path.join(logdir, "models"), exist_ok=True)
    os.makedirs(os.path.join(logdir, "states"), exist_ok=True)

    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    proc = subprocess.Popen(
        [sys.executable, "-c", WORKER, synth_root, logdir],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env)

    # wait until training has taken a few real steps, then preempt
    steps_seen = 0
    lines = []
    deadline = time.time() + 600
    while time.time() < deadline:
        line = proc.stdout.readline()
        if not line:
            break
        lines.append(line)
        if line.startswith("STEP::"):
            steps_seen += 1
            if steps_seen >= 3:
                break
    assert steps_seen >= 3, "".join(lines)[-3000:]
    proc.send_signal(signal.SIGTERM)
    try:
        out, _ = proc.communicate(timeout=300)
    except subprocess.TimeoutExpired:
        proc.kill()
        raise
    assert proc.returncode == 143, (proc.returncode, out[-3000:])
    assert "SIGTERM received" in out
    assert "Preemption checkpoint for resume." in out

    # the preemption checkpoint is complete: both halves written
    assert os.path.exists(os.path.join(logdir, "models", "last.msgpack"))
    assert os.path.exists(os.path.join(logdir, "states", "last.msgpack"))

    # and a fresh Trainer auto-resumes from it mid-epoch
    from decafnet_tpu.core import (get_cfg_defaults, update_opt,
                                   update_eval_data)
    from decafnet_tpu.data import apply_synthetic_cfg
    from decafnet_tpu.train import Trainer

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
    cfg.train.epochs = 500
    cfg.train.warmup_epochs = 1
    cfg.train.num_workers = 0
    cfg.aux.eval_run = -1
    cfg.aux.resume = True
    cfg.aux.logdir = logdir
    cfg.seed = 7
    apply_synthetic_cfg(cfg, synth)
    update_opt(cfg)
    update_eval_data(cfg)

    trainer = Trainer(cfg)
    assert trainer.itr >= 3, trainer.itr  # resumed past the preempted steps
