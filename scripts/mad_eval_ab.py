#!/usr/bin/env python
"""MAD-scale (T=32768, Q=2) full-decode A/B harness on the real chip.

Measures the steady-state full eval call (forward + decode + on-device
SoftNMS, device_get-synced) under switchable backends:

  python scripts/mad_eval_ab.py                 # dual-head on vs off
  python scripts/mad_eval_ab.py --axis fused    # Pallas fused conv on vs off
  python scripts/mad_eval_ab.py --axis none     # single measurement

Timing methodology per PARITY "harness physics": strictly serial chip,
>=32 queued calls, jax.device_get sync (block_until_ready can acknowledge
early over the axon tunnel), scalar/small outputs only.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure(tag, Q, T, warmup=2, iters=32, dtype=None):
    import jax
    import bench
    overrides = {"model.vid_net.max_seq_len": T}
    if dtype:
        overrides["tpu.compute_dtype"] = dtype
    cfg = bench.build(overrides)
    decode, args = bench.make_decode_fn(cfg, Q, T)
    t0 = time.time()
    out = decode(*args)
    jax.device_get(out)
    print(f"[compile+1st {time.time() - t0:.0f}s] {tag}", flush=True)
    t = bench.timed(decode, args, warmup=warmup, iters=iters)
    print(f"full_decode {tag}: {t * 1e3:.2f} ms", flush=True)
    return t


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--T", type=int, default=32768)
    parser.add_argument("--Q", type=int, default=2)
    parser.add_argument("--axis",
                        choices=["dual", "fused", "dw", "dtype", "none"],
                        default="dual")
    parser.add_argument("--precision", default="high",
                        choices=("highest", "high", "default"),
                        help="matmul precision pin for f32-input dots. "
                        "'high' is the historical harness pin (all recorded "
                        "round-4 A/Bs) AND the shipped EVAL resolution "
                        "again since the round-5 revert of the round-4 "
                        "'default' promotion (the 2k-step study re-run "
                        "failed its pre-registered rule)")
    args = parser.parse_args(argv)

    import jax
    jax.config.update("jax_default_matmul_precision", args.precision)
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/decafnet_tpu/xla"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import bench
    bench.require_tpu()
    from decafnet_tpu.models import heads
    from decafnet_tpu.nn import blocks
    from decafnet_tpu.ops import fused_conv

    if args.axis == "none":
        measure("current-defaults", args.Q, args.T)
        return 0

    if args.axis == "dtype":
        # f32 vs bf16 compute mode over the identical full-decode program
        # (bf16 activations, fp32 params/statistics -- the validated opt-in
        # speed mode; promotion evidence: scripts/bf16_promotion_study.py)
        t32 = measure("compute=float32", args.Q, args.T)
        t16 = measure("compute=bfloat16", args.Q, args.T, dtype="bfloat16")
        print(f"bf16 speedup over f32: {t32 / t16:.2f}x", flush=True)
        return 0

    setter, default = {
        "dual": (heads.set_dual_head, heads._DUAL_ENABLED),
        "fused": (fused_conv.set_fused_conv, fused_conv._FUSED_ENABLED),
        "dw": (blocks.set_depthwise_shift, blocks._SHIFT_DW_ENABLED),
    }[args.axis]
    results = {}
    for enabled in (True, False):
        setter(enabled)
        try:
            results[enabled] = measure(f"{args.axis}={enabled}",
                                       args.Q, args.T)
        finally:
            setter(default)  # restore the module default captured above
    faster = min(results, key=results.get)
    print(f"{args.axis}={faster} is faster by "
          f"{(max(results.values()) / min(results.values()) - 1) * 100:.1f}%",
          flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
