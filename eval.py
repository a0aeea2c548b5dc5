#!/usr/bin/env python
"""Evaluation CLI (reference UX contract: /root/reference/eval.py).

  python eval.py --name <experiment_dir> --ckpt <epoch-itr> [--dryrun] \
                 [--set dotted.key value ...]

Loads the frozen opt.yaml from the experiment dir, backfills any defaults
introduced since the snapshot, loads the EMA weights of the named checkpoint
(native .msgpack or reference-layout .pth -- released DeCafNet checkpoints
work directly), and prints the Rank@k / IoU@t table.
"""

import argparse
import os
import sys


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--name", required=True,
                        help="experiment directory containing opt.yaml")
    parser.add_argument("--ckpt", default="last",
                        help='checkpoint id, e.g. "6-36000" or "last"')
    parser.add_argument("--dryrun", action="store_true")
    parser.add_argument("--set", dest="set_cfgs", nargs="*", default=None)
    args = parser.parse_args()

    from decafnet_tpu.core import (CfgNode, get_cfg_defaults, update_from,
                                   update_opt, update_eval_data)

    opt_path = os.path.join(args.name, "opt.yaml")
    cfg = CfgNode.load_file(opt_path)
    cfg = update_from(cfg, get_cfg_defaults(cfg.get("task", "grounder")))
    if args.set_cfgs:
        cfg.merge_from_list(args.set_cfgs)
    # eval uses the dense sidekick stream (reference: eval.py:48-49)
    cfg.data.shallow_ds = 1
    cfg.eval.data.shallow_ds = 1
    update_opt(cfg)
    update_eval_data(cfg)
    cfg.aux.logdir = args.name
    cfg.aux.ckpt = args.ckpt
    cfg.aux.dryrun = args.dryrun

    import jax
    cache = cfg.tpu.get("compilation_cache")
    if cache:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser(cache))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from decafnet_tpu.ops import set_backend
    set_backend(cfg.tpu.attention_backend)

    from decafnet_tpu.eval import Evaluator
    from decafnet_tpu.utils.backend import resolve_backend_or_exit

    # first device touch: resolve under the wedge watchdog (a stuck axon
    # claim otherwise hangs the CLI forever with no error; CLAUDE.md notes)
    print(f"backend: {resolve_backend_or_exit()}")
    # precision resolves AFTER the guarded claim ("auto" asks the backend)
    # and BEFORE any tracing (Evaluator construction below)
    from decafnet_tpu.models import resolve_matmul_precision
    jax.config.update("jax_default_matmul_precision",
                      resolve_matmul_precision(cfg, eval_mode=True))
    evaluator = Evaluator(cfg)
    evaluator.run()
    return 0


if __name__ == "__main__":
    sys.exit(main())
