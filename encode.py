#!/usr/bin/env python
"""Feature-encoding CLI: produce the grounder's input feature files on TPU.

The reference repo has NO encode path -- its datasets read per-video .npy
feature files produced offline by EgoVLP's video tower
(reference: libs/data/dataset.py:363-407). This CLI closes that gap: it
reads raw frames, applies the EgoVLP transforms (encode/transforms.py),
runs the expert and sidekick clip encoders on device, and writes the
(num_clips, C) .npy files the datasets consume -- so the full
frames -> features -> train/eval chain runs inside this repo.

  python encode.py --frames_dir F --out_expert_dir E --out_sidekick_dir S \
      [--expert_ckpt egovlp.pth] [--expert_opt '{"dim": 768, ...}'] \
      [--sidekick_opt '{"depth": 2, ...}'] [--input_res 224] [--antialias]

Frame files: ``{vid_id}.npy`` of shape (num_clips, frames_per_clip, H, W, 3)
uint8 or float32-in-[0,1].

Encoders: with ``--expert_ckpt`` the EgoVLP-layout SpaceTimeViT is used and
the checkpoint imported (encode/import_vit.py); without it a
deterministically seeded synthetic-weight encoder runs (honestly labeled --
features are structurally valid but not semantically meaningful).
"""

import argparse
import json
import os
import sys

import numpy as np


def build_runner(kind, opt, ckpt, input_res, frames, seed):
    import jax
    from decafnet_tpu.encode import (ClipEncoderRunner, SpaceTimeViT,
                                     load_vit_checkpoint, make_clip_encoder)

    if kind == "spacetime":
        fields = dict(img_size=input_res, frames=frames)
        fields.update(opt)
        allowed = set(SpaceTimeViT.__dataclass_fields__)
        model = SpaceTimeViT(**{k: v for k, v in fields.items()
                                if k in allowed})
    else:
        fields = dict(frames=frames)
        fields.update(opt)
        model = make_clip_encoder(fields)

    sample = np.zeros((1, frames, input_res, input_res, 3), np.float32)
    template = model.init(jax.random.PRNGKey(seed), sample)["params"]
    if ckpt:
        params = load_vit_checkpoint(ckpt, template=template)
    else:
        params = template  # synthetic weights (seeded, deterministic)
    return ClipEncoderRunner(model, params)


def encode_one(frames, runner, resize, input_res, antialias):
    """(T, F, H, W, 3) raw frames -> (T, C) float32 features."""
    import jax.numpy as jnp
    from decafnet_tpu.encode import eval_transform

    x = np.asarray(frames)
    if x.dtype == np.uint8:
        x = x.astype(np.float32) / 255.0
    if x.shape[-3] == input_res and x.shape[-2] == input_res:
        # already at encoder resolution: normalize only (synthetic tests)
        from decafnet_tpu.encode import normalize
        x = np.asarray(normalize(jnp.asarray(x)))
    else:
        x = np.asarray(eval_transform(jnp.asarray(x), center=resize,
                                      input_res=input_res,
                                      antialias=antialias))
    return runner(x).T.astype(np.float32)  # runner gives (C, T) -> (T, C)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--frames_dir", required=True)
    parser.add_argument("--out_expert_dir", required=True)
    parser.add_argument("--out_sidekick_dir", default=None)
    parser.add_argument("--expert_ckpt", default=None)
    parser.add_argument("--sidekick_ckpt", default=None)
    parser.add_argument("--expert", default=None,
                        choices=[None, "spacetime", "factorized"],
                        help="default: spacetime with --expert_ckpt, "
                             "factorized otherwise")
    parser.add_argument("--sidekick", default="factorized",
                        choices=["spacetime", "factorized"])
    parser.add_argument("--expert_opt", default="{}",
                        help="JSON encoder-field overrides")
    parser.add_argument("--sidekick_opt", default="{}")
    parser.add_argument("--frames", type=int, default=4,
                        help="frames per clip")
    parser.add_argument("--resize", type=int, default=256)
    parser.add_argument("--input_res", type=int, default=224)
    parser.add_argument("--sidekick_res", type=int, default=None,
                        help="lower sidekick resolution (default input_res)")
    parser.add_argument("--antialias", action="store_true")
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args(argv)

    expert_kind = args.expert or (
        "spacetime" if args.expert_ckpt else "factorized")
    sk_res = args.sidekick_res or args.input_res

    expert = build_runner(expert_kind, json.loads(args.expert_opt),
                          args.expert_ckpt, args.input_res, args.frames,
                          args.seed)
    sidekick = None
    if args.out_sidekick_dir:
        sidekick = build_runner(args.sidekick,
                                json.loads(args.sidekick_opt),
                                args.sidekick_ckpt, sk_res, args.frames,
                                args.seed + 1)

    os.makedirs(args.out_expert_dir, exist_ok=True)
    if args.out_sidekick_dir:
        os.makedirs(args.out_sidekick_dir, exist_ok=True)

    names = sorted(f for f in os.listdir(args.frames_dir)
                   if f.endswith(".npy"))
    assert names, f"no .npy frame files in {args.frames_dir}"
    for i, fname in enumerate(names):
        frames = np.load(os.path.join(args.frames_dir, fname))
        assert frames.ndim == 5 and frames.shape[-1] == 3, (
            f"{fname}: expected (T, F, H, W, 3), got {frames.shape}")
        feat = encode_one(frames, expert, args.resize, args.input_res,
                          args.antialias)
        np.save(os.path.join(args.out_expert_dir, fname), feat)
        if sidekick is not None:
            sk = encode_one(frames, sidekick, args.resize, sk_res,
                            args.antialias)
            np.save(os.path.join(args.out_sidekick_dir, fname), sk)
        print(f"[{i + 1}/{len(names)}] {fname}: {frames.shape} -> "
              f"{feat.shape}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
