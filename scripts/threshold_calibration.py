#!/usr/bin/env python
"""Calibrate the two 16384 length thresholds at mid lengths (round-5
VERDICT item 4).

Both ``nn/blocks.py:_SHIFT_DW_MAX_T`` (depthwise conv3 shift-FMA vs
conv_general_dilated) and ``models/decafnet.py:_BF16_AUTO_MAX_T`` (bf16 vs
f32 eval compute) were set from TWO data points (T=2304 and T=32768).
GoalStep/TACoS-class configs ship mid lengths (4608-8192) where the
defaults were extrapolation. This measures the full-decode A/B on chip at
each requested length for both axes and records the crossovers.

  python scripts/threshold_calibration.py [--lengths 4608 9216 16384]
      [--Q 2] [--iters 24]
"""

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--lengths", type=int, nargs="+",
                        default=(4608, 9216, 16384))
    parser.add_argument("--Q", type=int, default=2)
    parser.add_argument("--iters", type=int, default=24)
    parser.add_argument("--axes", nargs="+", default=("dw", "dtype"))
    parser.add_argument("--precision", default="default",
                        help="matmul precision pin; 'default' = the "
                        "shipped EVAL resolution")
    parser.add_argument("--out",
                        default=os.path.join(REPO, "scripts", "results",
                                             "threshold_calibration.json"))
    args = parser.parse_args(argv)

    import jax
    jax.config.update("jax_default_matmul_precision", args.precision)
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/decafnet_tpu/xla"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import bench
    bench.require_tpu()
    import mad_eval_ab
    from decafnet_tpu.nn import blocks

    default_enabled = blocks._SHIFT_DW_ENABLED
    default_max_t = blocks._SHIFT_DW_MAX_T
    report = {"Q": args.Q, "iters": args.iters,
              "precision": args.precision, "rows": []}
    for T in args.lengths:
        row = {"T": T}
        if "dw" in args.axes:
            for enabled, tag in ((True, "dw_shift"), (False, "dw_conv")):
                blocks.set_depthwise_shift(enabled,
                                           max_t=10 ** 9 if enabled else 0)
                try:
                    row[tag] = mad_eval_ab.measure(
                        f"T={T} {tag}", args.Q, T,
                        iters=args.iters) * 1e3
                finally:
                    blocks.set_depthwise_shift(default_enabled,
                                               max_t=default_max_t)
        if "dtype" in args.axes:
            row["f32"] = mad_eval_ab.measure(
                f"T={T} f32", args.Q, T, iters=args.iters,
                dtype="float32") * 1e3
            row["bf16"] = mad_eval_ab.measure(
                f"T={T} bf16", args.Q, T, iters=args.iters,
                dtype="bfloat16") * 1e3
        report["rows"].append(row)
        print(json.dumps(row), flush=True)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    json.dump(report, open(args.out, "w"), indent=1)
    print(f"-> {args.out}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
