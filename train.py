#!/usr/bin/env python
"""Training CLI (reference UX contract: /root/reference/train.py).

  python train.py --cfg config1.yaml [config2.yaml ...] \
                  --set dotted.key value [dotted.key value ...]

Builds the config (defaults <- files <- overrides), creates the experiment
log dir with an opt.yaml snapshot, and runs the Trainer. Multi-host SPMD
replaces torchrun: launch one process per host with JAX coordinator env vars;
in-process devices are handled automatically by the ('data',) mesh.
"""

import argparse
import os
import sys


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--cfg", nargs="*", default=[],
                        help="yaml config files, merged in order")
    parser.add_argument("--set", dest="set_cfgs", nargs="*", default=None,
                        help="dotted.key value override pairs")
    args = parser.parse_args()

    from decafnet_tpu.core import setup_cfg
    from decafnet_tpu.parallel import init_distributed, make_mesh

    init_distributed()
    cfg = setup_cfg(args.cfg, args.set_cfgs)

    import jax
    cache = cfg.tpu.get("compilation_cache")
    if cache:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser(cache))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from decafnet_tpu.ops import set_backend
    set_backend(cfg.tpu.attention_backend)

    root = cfg.aux.logdir
    os.makedirs(root, exist_ok=True)
    cfg.dump_to_file(os.path.join(root, "opt.yaml"))
    print(f"experiment: {cfg.aux.exp}")
    print(f"logdir: {root}")

    # only the version-2 Trainer exists, like the reference's live dispatch
    # (reference: train.py:72-76)
    assert cfg.task in ("grounder", "mad", "charades"), cfg.task
    assert cfg.train.version == 2, (
        "only train.version=2 is implemented (set `train: {version: 2}`)")

    from decafnet_tpu.train import Trainer
    from decafnet_tpu.utils.backend import resolve_backend_or_exit

    # resolve the local chip claim under the wedge watchdog (a stuck axon
    # claim otherwise hangs the CLI forever with no error; CLAUDE.md notes).
    # Caveat: in multi-host runs jax.distributed.initialize() above may
    # block first (it must run before any backend touch, so it cannot sit
    # behind this watchdog); the guard covers the single-host claim path.
    print(f"backend: {resolve_backend_or_exit()}")
    # precision resolves AFTER the guarded claim ("auto" asks the backend)
    # and BEFORE any tracing (Trainer construction below)
    from decafnet_tpu.models import resolve_matmul_precision
    jax.config.update("jax_default_matmul_precision",
                      resolve_matmul_precision(cfg, eval_mode=False))
    mesh = make_mesh(cfg.tpu.mesh_shape)
    trainer = Trainer(cfg, mesh=mesh)
    trainer.run()

    # completion sentinel (reference: train.py:84-85)
    if jax.process_index() == 0:
        with open(os.path.join(root, "finished"), "w") as f:
            f.write("done\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
