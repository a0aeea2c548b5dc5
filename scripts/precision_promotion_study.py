#!/usr/bin/env python
"""Matmul-precision promotion study (round-4, follow-up to VERDICT item 6).

The MAD-scale stage profile (scripts/results/mad_stage_profile*.json)
measured the full T=32768 eval call at 31.8 ms under the shipped
``tpu.matmul_precision = "high"`` (bf16x3, TF32-class) but 24.1 ms (-24%)
at ``"default"`` (single-pass bf16 inputs, f32 accumulate) -- the largest
remaining eval-speed lever, and the only one left at MAD scale where the
bf16 COMPUTE mode regresses (chip_queue_r4d: 39.4 vs 31.8 ms).

This study gathers the numerics evidence to ship ``default`` as the EVAL
precision: for each of ``--seeds`` training seeds, train the synthetic
config to confident logits (``--steps``), then evaluate the SAME
checkpoint at precision "high" and precision "default" -- compute dtype
pinned to float32 on both sides so the axis is isolated -- and record the
same observables as the bf16 study (scripts/bf16_promotion_study.py):

  * the R@{1,5} x IoU@{0.3,0.5} COUNT tables per mode (exact-match check),
  * per-query top-1 mode-agreement IoU (high top-1 segment vs default's),
  * per-query |top-1 IoU-vs-GT delta| between modes.

Pre-registered promotion rule (written BEFORE the run, identical to the
bf16 study's):

  PROMOTE "default" as the EVAL-mode matmul precision iff, across >= 3
  seeds: R1 counts identical at every threshold, mean mode-agreement IoU
  >= 0.99, max |top1-IoU-vs-GT delta| <= 0.01, and R5 count flips <= 1
  per 100 queries. Training stays at "high" regardless (TF32-class, the
  same accuracy class as the reference's A100 cudnn convs), and
  ``eval.reference_exact`` stays at "highest".

Runs on the real TPU (that is where the lever lives). Strictly serial.

  python scripts/precision_promotion_study.py [--steps 600] [--seeds 0 1 2]
"""

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bf16_promotion_study import (build_cfg, compare_modes,  # noqa: E402
                                  near_tie_stats)

RULE = {
    "r1_counts": "identical at every IoU threshold, every seed",
    "mode_agreement_iou_mean": ">= 0.99 every seed",
    "top1_iou_vs_gt_abs_delta_max": "<= 0.01 every seed",
    "r5_flips_per_100_queries": "<= 1.0 every seed",
    "scope": ("eval only; training stays 'high'; reference_exact stays "
              "'highest'; compute dtype pinned float32 on both sides of "
              "this comparison to isolate the precision axis"),
}


def eval_precision(cfg, ema_params, precision, tag):
    import jax

    from decafnet_tpu.eval import Evaluator

    cfg = cfg.clone()
    cfg.tpu.compute_dtype = "float32"   # isolate the precision axis
    cfg.tpu.matmul_precision = precision
    cfg.eval.save_results = True
    jax.config.update("jax_default_matmul_precision", precision)
    ev = Evaluator(cfg, train_time=True)
    ev.run(ema_params=ema_params, tag=tag)
    from decafnet_tpu.utils.analysis import EvalResults
    res = EvalResults.load(os.path.join(cfg.aux.logdir,
                                        f"results_{tag}.pk"))
    return ev.meter.counts.copy(), int(ev.meter.text_cnt), res


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=600)
    parser.add_argument("--seeds", type=int, nargs="+", default=(0, 1, 2))
    parser.add_argument("--root", default="/tmp/precision_study")
    parser.add_argument("--out",
                        default=os.path.join(REPO, "scripts", "results",
                                             "precision_promotion.json"))
    args = parser.parse_args(argv)

    import bench
    bench.require_tpu()

    from flax import serialization
    import jax

    from decafnet_tpu.data import make_synthetic_dataset
    from decafnet_tpu.train import Trainer

    paths = make_synthetic_dataset(
        os.path.join(args.root, "ds"), num_videos=4, num_queries=3,
        clip_range=(60, 120), vid_dim=64, shallow_dim=64, text_dim=48,
        seed=7)

    rows = []
    for seed in args.seeds:
        cfg = build_cfg(args.root, paths, seed, args.steps)
        # training itself runs at the shipped parity precision
        jax.config.update("jax_default_matmul_precision",
                          cfg.tpu.matmul_precision
                          if cfg.tpu.matmul_precision != "auto" else "high")
        trainer = Trainer(cfg)
        trainer.run()
        ckpt = os.path.join(cfg.aux.logdir, "models", "last.msgpack")
        blob = serialization.msgpack_restore(open(ckpt, "rb").read())
        ema = blob["ema_params"] if "ema_params" in blob else blob["params"]
        assert all(np.isfinite(v).all()
                   for v in jax.tree_util.tree_leaves(ema)), "non-finite"

        chi, nhi, reshi = eval_precision(cfg, ema, "high", "prec_high")
        cdef, ndef, resdef = eval_precision(cfg, ema, "default",
                                            "prec_default")
        assert nhi == ndef
        agree, gt_delta = compare_modes(reshi, resdef)
        n_tie, n_conseq, n_q2 = near_tie_stats(reshi)
        r1_equal = bool((chi[0] == cdef[0]).all())
        r5_flips = int(np.abs(chi[1] - cdef[1]).sum())
        row = {
            "near_tie_queries": n_tie,
            "near_tie_consequential": n_conseq,
            "near_tie_scored_queries": n_q2,
            "seed": seed,
            "steps": int(trainer.itr),
            "queries": nhi,
            "counts_high": chi.tolist(),
            "counts_default": cdef.tolist(),
            "r1_counts_equal": r1_equal,
            "r5_count_flips": r5_flips,
            "r5_flips_per_100_queries": 100.0 * r5_flips / nhi,
            "mode_agreement_iou_mean": float(np.mean(agree)),
            "mode_agreement_iou_min": float(np.min(agree)),
            "top1_iou_vs_gt_abs_delta_max": float(np.max(gt_delta)),
            "compared_queries": len(agree),
        }
        print(json.dumps(row), flush=True)
        rows.append(row)

    delivered = min(r["steps"] for r in rows)
    assert delivered >= 0.9 * args.steps, (
        f"study under-delivered: {delivered} optimizer steps < 90% of the "
        f"requested {args.steps}; refusing to write a promotion verdict")
    promote = (
        len(rows) >= 3
        and all(r["r1_counts_equal"] for r in rows)
        and all(r["mode_agreement_iou_mean"] >= 0.99 for r in rows)
        and all(r["top1_iou_vs_gt_abs_delta_max"] <= 0.01 for r in rows)
        and all(r["r5_flips_per_100_queries"] <= 1.0 for r in rows)
    )
    blob = {"rule": RULE, "steps_requested": args.steps,
            "steps_delivered_min": delivered, "seeds": list(args.seeds),
            "rows": rows, "promote_default_precision_eval": promote}
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    json.dump(blob, open(args.out, "w"), indent=1)
    print(f"promote_default_precision_eval: {promote}  -> {args.out}",
          flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
