#!/usr/bin/env python
"""Day-1 real-data readiness drill (reference: README.md:46-49).

When the released ``decafnet_30_nlq`` checkpoint and the Ego4D-NLQ feature
files are mounted, reproducing the headline numbers is ONE command:

  python scripts/real_data_eval.py \
      --ckpt  /mnt/release/checkpoint/decafnet_30_nlq/models/6-36000.pth \
      --anno_file /mnt/release/data/ego4d/nlq_official_v2_anno_with_lens.json \
      --vid_feat_dir /mnt/release/data/ego4d/egovlp_features \
      --shallow_vid_feat_dir /mnt/release/data/ego4d/egovlp_small_features \
      --clip_token_fname /mnt/release/data/ego4d/nlq_token_features.npy \
      --text_cls_fname '/mnt/release/data/ego4d/text_cls_{split}.npy' \
      --out /tmp/decafnet_30_nlq_eval

It materializes an experiment dir in the preserved eval.py contract
(opt.yaml snapshot from configs/ego4d_nlq.yaml + models/<ckpt>) and runs
the eval CLI; the R@{1,5} x IoU@{0.3,0.5} table lands in
``<out>/eval_<ckpt>.txt``. Released .pth checkpoints import directly
(models/import_torch.py, parity-tested).

``--selftest`` rehearses the identical chain against a fabricated synthetic
layout (fake .pth checkpoint included) so the drill itself stays verified
in environments without real data.
"""

import argparse
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DATA_KEYS = ("anno_file", "vid_feat_dir", "shallow_vid_feat_dir",
             "clip_token_fname", "text_cls_fname")


def _set_permissive(cfg, kv_list):
    """merge_from_list that may CREATE leaf keys.

    Variant checkpoints can require module kwargs the reference's config
    tree never declares (e.g. ``model.text_net.n_layers`` — the reference
    hardcodes the constructor default, libs/modeling/text_net.py:108, so
    its opt.py has no such key). The model factory passes the whole
    ``cfg.model`` dict through, so a new leaf in opt.yaml reaches the
    module; the strict ``merge_from_list`` would reject it."""
    import yaml

    assert len(kv_list) % 2 == 0, "override list must be key/value pairs"
    for key, value in zip(kv_list[0::2], kv_list[1::2]):
        node = cfg
        parts = key.split(".")
        for p in parts[:-1]:
            if p not in node:
                raise KeyError(f"unknown config section: {key}")
            node = node[p]
        leaf = parts[-1]
        if leaf in node:
            node.merge_from_list([leaf, value])
        else:
            node[leaf] = yaml.safe_load(value) if isinstance(value, str) \
                else value


def prepare_expdir(out, ckpt, data_overrides, set_cfgs=None):
    """Materialize <out>/opt.yaml + <out>/models/<ckpt> for eval.py."""
    from decafnet_tpu.core import get_cfg_defaults, update_from, CfgNode

    cfg = CfgNode.load_file(os.path.join(REPO, "configs", "ego4d_nlq.yaml"))
    cfg = update_from(cfg, get_cfg_defaults("grounder"))
    for k, v in data_overrides.items():
        cfg.data[k] = v
        cfg.eval.data[k] = v
    if set_cfgs:
        _set_permissive(cfg, set_cfgs)
    os.makedirs(os.path.join(out, "models"), exist_ok=True)
    cfg.dump_to_file(os.path.join(out, "opt.yaml"))

    tag = os.path.splitext(os.path.basename(ckpt))[0]
    dst = os.path.join(out, "models", os.path.basename(ckpt))
    if not os.path.exists(dst):
        try:
            os.symlink(os.path.abspath(ckpt), dst)
        except OSError:
            shutil.copy(ckpt, dst)
    return tag


def run_eval(out, tag, dryrun=False):
    cmd = [sys.executable, os.path.join(REPO, "eval.py"),
           "--name", out, "--ckpt", tag]
    if dryrun:
        cmd.append("--dryrun")
    print("+", " ".join(cmd), flush=True)
    return subprocess.call(cmd, cwd=REPO)


def selftest(out):
    """Rehearse against a synthetic layout: fabricate the dataset, export a
    random-init reference-layout .pth, then run the identical chain."""
    import numpy as np
    import torch
    import jax

    from decafnet_tpu.core import get_cfg_defaults, update_opt, \
        update_eval_data
    from decafnet_tpu.data import (apply_synthetic_cfg, batchify_train,
                                   make_synthetic_dataset, make_dataset)
    from decafnet_tpu.models import make_model
    from decafnet_tpu.models.import_torch import params_to_state_dict

    root = os.path.join(out, "synth")
    paths = make_synthetic_dataset(root, num_videos=2, num_queries=2,
                                   clip_range=(40, 60), vid_dim=32,
                                   shallow_dim=32, text_dim=24, seed=9)

    # a fake released checkpoint in the reference layout
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
    cfg.model.msf = True  # configs/ego4d_nlq.yaml sets msf: true
    apply_synthetic_cfg(cfg, paths)
    update_opt(cfg)
    update_eval_data(cfg)
    model = make_model(cfg)
    ds = make_dataset(cfg, is_training=False)
    b = batchify_train([ds[0]], cfg.data.max_vid_len,
                       cfg.data.max_text_len, 1)
    params = model.init(jax.random.PRNGKey(0), b["vid"], b["shallow_vid"],
                        b["vid_masks"], b["text"], b["text_cls"],
                        b["text_masks"], deterministic=True)["params"]
    sd = {k: torch.from_numpy(np.array(v))
          for k, v in params_to_state_dict(jax.device_get(params)).items()}
    ckpt_path = os.path.join(out, "fake_release", "6-36000.pth")
    os.makedirs(os.path.dirname(ckpt_path), exist_ok=True)
    torch.save({"model": sd, "model_ema": sd}, ckpt_path)

    expdir = os.path.join(out, "exp")
    tag = prepare_expdir(
        expdir, ckpt_path, {k: paths[k] for k in DATA_KEYS},
        set_cfgs=["model.vid_net.in_dim", "32",
                  "model.vid_net.embd_dim", "16",
                  "model.vid_net.max_seq_len", "64",
                  "model.vid_net.arch", "[1, 0, 3]",
                  "model.text_net.in_dim", "24",
                  "model.text_net.embd_dim", "16",
                  "model.text_net.n_layers", "1",
                  "model.fusion.n_layers", "1",
                  "model.sratio", "0.5", "model.sn", "8",
                  "data.name", "video_centric_clip_twofeat"])
    rc = run_eval(expdir, tag)
    table = os.path.join(expdir, f"eval_{tag}.txt")
    assert rc == 0 and os.path.exists(table), "selftest eval failed"
    body = open(table).read()
    assert "Rank@1, IoU@0.3" in body, body
    print("selftest OK; table at", table)
    return 0


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--selftest", action="store_true")
    parser.add_argument("--ckpt", help="released .pth (or .msgpack)")
    parser.add_argument("--out", required=True,
                        help="experiment dir to materialize")
    parser.add_argument("--dryrun", action="store_true")
    parser.add_argument("--set", dest="set_cfgs", nargs="*", default=None)
    for k in DATA_KEYS:
        parser.add_argument(f"--{k}")
    args = parser.parse_args(argv)

    if args.selftest:
        return selftest(args.out)

    assert args.ckpt, "--ckpt is required (or use --selftest)"
    overrides = {k: getattr(args, k) for k in DATA_KEYS
                 if getattr(args, k)}
    tag = prepare_expdir(args.out, args.ckpt, overrides, args.set_cfgs)
    return run_eval(args.out, tag, dryrun=args.dryrun)


if __name__ == "__main__":
    sys.exit(main())
