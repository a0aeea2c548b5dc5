#!/usr/bin/env python
"""Delegation-ratio sweep of the on-device encode+ground pipeline.

BASELINE.md names the exercise configs: "Ego4D-GoalStep (delegation ratio
sweep 30/50/100%)". This drives scripts/encode_ground_bench.py at each
ratio, emitting one JSON line per ratio -- the efficiency curve behind the
paper's headline claim (compute saved by delegating expert encoding to the
top-`ratio` salient bins; reference knobs: model.sratio / model.sn,
/root/reference/libs/core/opt.py:125-126).

At ratio 1.0 the delegation keeps every bin (the reference's
``int(ratio*nbins)`` truncation keeps all, matching its keep-all quirk), so
ours == encode-all plus the saliency pass: vs_baseline ~1x is the expected
honest floor there; the curve shows the structural saving appearing as the
ratio drops.

  python scripts/ratio_sweep.py [--T 1024] [--dtype bfloat16] [--iters 16]
"""

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--T", type=int, default=1024)
    parser.add_argument("--dtype", default="bfloat16",
                        choices=["bfloat16", "float32"])
    parser.add_argument("--iters", type=int, default=16)
    parser.add_argument("--ratios", type=float, nargs="+",
                        default=(0.3, 0.5, 1.0))
    args = parser.parse_args(argv)

    from scripts import encode_ground_bench as egb

    for ratio in args.ratios:
        print(f"--- ratio {ratio} ---", flush=True)
        egb.main(["--T", str(args.T), "--ratio", str(ratio),
                  "--dtype", args.dtype, "--iters", str(args.iters)])
    return 0


if __name__ == "__main__":
    sys.exit(main())
