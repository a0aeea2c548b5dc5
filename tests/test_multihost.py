"""Real multi-HOST execution: a 2-process jax.distributed CPU run of the
Trainer must produce the same loss sequence as the single-process run on
the same synthetic dataset + seed (the SPMD analogue of the reference's
multi-node DDP, /root/reference/train.py:42-46).

Each subprocess forces the CPU platform with 2 local devices, so the global
mesh is 2 processes x 2 devices = 4 mesh devices; every process loads its
contiguous half of each global batch (DataLoader ``shard_within_batch``)
and shard_batch assembles global arrays with
jax.make_array_from_process_local_data.
"""

import json
import os
import socket
import subprocess
import sys
import textwrap

import numpy as np
import pytest

from decafnet_tpu.data import make_synthetic_dataset

WORKER = textwrap.dedent("""
    import json, os, sys

    import jax

    proc_id = int(sys.argv[1])
    n_proc = int(sys.argv[2])
    coord = sys.argv[3]
    synth_root = sys.argv[4]
    logdir = sys.argv[5]

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 2)
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/decafnet_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    if n_proc > 1:
        jax.distributed.initialize(coordinator_address=coord,
                                   num_processes=n_proc,
                                   process_id=proc_id,
                                   local_device_ids=[0, 1])
        # establish the Gloo collectives context while the processes are in
        # lockstep: its KV rendezvous times out at 30s, which a first
        # collective buried after a long (skewed) XLA compile can exceed
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices("boot")

    import numpy as np
    from decafnet_tpu.core import (get_cfg_defaults, update_opt,
                                   update_eval_data)
    from decafnet_tpu.data import apply_synthetic_cfg
    from decafnet_tpu.parallel import make_mesh
    from decafnet_tpu.train import Trainer

    paths = json.load(open(os.path.join(synth_root, "paths.json")))
    cfg = get_cfg_defaults("grounder")
    cfg.model.name = "iter"
    cfg.model.vid_net.in_dim = 32
    cfg.model.vid_net.embd_dim = 16
    cfg.model.vid_net.max_seq_len = 64
    cfg.model.vid_net.arch = (1, 0, 3)
    # dropout off: JAX does not guarantee identical random bits across
    # different mesh layouts, and this test asserts loss equality between
    # a 2-device and a 4-device (2-process) mesh
    cfg.model.vid_net.proj_pdrop = 0.0
    cfg.model.vid_net.path_pdrop = 0.0
    cfg.model.fusion.proj_pdrop = 0.0
    cfg.model.fusion.path_pdrop = 0.0
    cfg.model.tcn_dropout = 0.0
    cfg.model.text_net.in_dim = 24
    cfg.model.text_net.embd_dim = 16
    cfg.model.text_net.n_layers = 1
    cfg.model.fusion.n_layers = 1
    cfg.model.sratio = 0.5
    cfg.model.sn = 8
    cfg.data.max_num_text = 2
    cfg.train.batch_size = 4
    cfg.train.epochs = 1
    cfg.train.warmup_epochs = 1
    cfg.train.num_workers = 0
    cfg.train.version = 2
    cfg.aux.eval_run = -1
    cfg.aux.resume = False
    cfg.aux.logdir = logdir
    cfg.seed = 11
    apply_synthetic_cfg(cfg, paths)
    update_opt(cfg)
    update_eval_data(cfg)

    trainer = Trainer(cfg, mesh=make_mesh())
    assert trainer.mesh.devices.size == 2 * n_proc, trainer.mesh
    if n_proc > 1:
        # AOT-compile the train step BEFORE any collective executes: each
        # executable's first run initializes a fresh Gloo context whose KV
        # rendezvous times out at 30s, so the processes must enter
        # execution nearly together (compile skew would exceed that)
        from decafnet_tpu.parallel.mesh import shard_batch
        batch0 = shard_batch(next(iter(trainer.loader)), trainer.mesh)
        trainer._step_fn.lower(trainer.state, batch0,
                               jax.random.PRNGKey(0),
                               trainer.points_t).compile()
        multihost_utils.sync_global_devices("compiled")
    losses = []
    orig_step = trainer._step_fn

    def step(state, batch, rng, points):
        new_state, metrics = orig_step(state, batch, rng, points)
        losses.append(float(metrics["total"]))
        return new_state, metrics

    trainer._step_fn = step
    trainer.run()
    out = {"proc": proc_id, "losses": losses,
           "n_devices": int(jax.device_count())}
    print("LOSSES::" + json.dumps(out), flush=True)
""")


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run_workers(n_proc, synth_root, tmp_path, tag):
    coord = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # workers pin their own device counts
    env["JAX_PLATFORMS"] = "cpu"
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    procs = []
    for r in range(n_proc):
        logdir = str(tmp_path / f"log_{tag}_{r}")
        procs.append(subprocess.Popen(
            [sys.executable, str(script), str(r), str(n_proc), coord,
             synth_root, logdir],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            env=env, cwd=os.path.dirname(os.path.dirname(__file__))))
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        out = out.decode()
        assert p.returncode == 0, out[-4000:]
        outs.append(out)
    results = []
    for out in outs:
        line = [l for l in out.splitlines() if l.startswith("LOSSES::")]
        assert line, out[-4000:]
        results.append(json.loads(line[-1][len("LOSSES::"):]))
    return results


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("mh_synth")
    paths = make_synthetic_dataset(str(root), num_videos=8, num_queries=2,
                                   clip_range=(40, 64), seed=13)
    with open(os.path.join(str(root), "paths.json"), "w") as f:
        json.dump(paths, f)
    return str(root)


def test_two_process_matches_single_process(synth_root, tmp_path):
    single = _run_workers(1, synth_root, tmp_path, "single")
    multi = _run_workers(2, synth_root, tmp_path, "multi")

    assert single[0]["n_devices"] == 2
    assert all(r["n_devices"] == 4 for r in multi)

    ref = np.asarray(single[0]["losses"])
    assert len(ref) >= 2
    for r in multi:
        got = np.asarray(r["losses"])
        assert len(got) == len(ref)
        np.testing.assert_allclose(got, ref, rtol=2e-4, atol=1e-6)

    # only process 0 writes checkpoints/logs
    assert os.path.exists(tmp_path / "log_multi_0" / "models")
    assert not os.path.exists(tmp_path / "log_multi_1" / "models")
