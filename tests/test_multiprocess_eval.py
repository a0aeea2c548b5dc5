"""Multi-PROCESS evaluation: a 2-process jax.distributed CPU run of the
Evaluator (``eval.shard_processes``: each process evaluates its rank-strided
video shard, then counts/losses are allgathered) must produce the identical
R@k/IoU count matrix and loss means as the single-process run.

Exceeds the reference, whose Evaluator is strictly bs=1 single-process
(/root/reference/libs/worker_v2.py:739)."""

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
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices("boot")

    import numpy as np
    from decafnet_tpu.core import (get_cfg_defaults, update_opt,
                                   update_eval_data)
    from decafnet_tpu.data import apply_synthetic_cfg, batchify_train
    from decafnet_tpu.eval import Evaluator
    from decafnet_tpu.models import make_model

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
    cfg.train.num_workers = 0
    cfg.seed = 3
    apply_synthetic_cfg(cfg, paths)
    update_opt(cfg)
    update_eval_data(cfg)

    ev = Evaluator(cfg, train_time=True)
    # identical random-init params on every process (fixed PRNG key)
    model = make_model(cfg)
    sample = [s for s in (ev.dataset[i] for i in range(len(ev.dataset)))
              if s["vid"].shape[1] <= cfg.data.max_vid_len][0]
    b = batchify_train([sample], cfg.data.max_vid_len,
                       cfg.data.max_text_len, 1)
    params = model.init(jax.random.PRNGKey(0), b["vid"], b["shallow_vid"],
                        b["vid_masks"], b["text"], b["text_cls"],
                        b["text_masks"], deterministic=True)["params"]

    n_local = len(ev.loader)
    metrics = ev.run(ema_params=params)
    out = {"proc": proc_id,
           "counts": np.asarray(ev.meter.counts).tolist(),
           "text_cnt": int(ev.meter.text_cnt),
           "n_local_videos": n_local,
           "metrics": np.asarray(metrics).tolist()}
    print("EVAL::" + json.dumps(out), flush=True)
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
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    script = tmp_path / f"eval_worker_{tag}.py"
    script.write_text(WORKER)
    procs = []
    for r in range(n_proc):
        procs.append(subprocess.Popen(
            [sys.executable, str(script), str(r), str(n_proc), coord,
             synth_root],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            env=env, cwd=os.path.dirname(os.path.dirname(__file__))))
    results = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        out = out.decode()
        assert p.returncode == 0, out[-4000:]
        line = [l for l in out.splitlines() if l.startswith("EVAL::")]
        assert line, out[-4000:]
        results.append(json.loads(line[-1][len("EVAL::"):]))
    return results


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("mp_eval_synth")
    # odd video count: the rank-strided shard is UNequal across processes
    paths = make_synthetic_dataset(str(root), num_videos=5, num_queries=3,
                                   clip_range=(40, 130), seed=6)
    with open(os.path.join(str(root), "paths.json"), "w") as f:
        json.dump(paths, f)
    return str(root)


def test_two_process_eval_matches_single_process(synth_root, tmp_path):
    single = _run_workers(1, synth_root, tmp_path, "single")
    multi = _run_workers(2, synth_root, tmp_path, "multi")

    ref_counts = np.asarray(single[0]["counts"])
    assert single[0]["text_cnt"] == 15

    # each process loaded only its shard of the videos...
    assert sorted(r["n_local_videos"] for r in multi) == [2, 3]
    # ...yet every process reports the identical GLOBAL table
    for r in multi:
        np.testing.assert_array_equal(np.asarray(r["counts"]), ref_counts)
        assert r["text_cnt"] == single[0]["text_cnt"]
        np.testing.assert_allclose(np.asarray(r["metrics"]),
                                   np.asarray(single[0]["metrics"]))
