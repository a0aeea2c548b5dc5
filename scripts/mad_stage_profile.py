#!/usr/bin/env python
"""Per-stage timing + TPU-compiler cost analysis of the MAD-scale eval
call (round-4, VERDICT item 6 groundwork).

Round-3 established the full call is HBM-bound (~82% of the f32 floor by
the CPU cost-model proxy) with stage bytes FPN 9.2 GB / fuse_and_predict
6.7 GB / delegation+fusion 5.2 GB. This script replaces the proxy with the
REAL TPU compiler's cost analysis per stage and times each stage on chip:

  pre    = grouped delegation projection + text encoder + fusion
  fpn    = 7-level video FPN (band attention lives here)
  fnp    = fuse_and_predict (cls1 -> interp/stack -> TCN -> cls2 + reg)
  decode = sigmoid/threshold/top-k/segment assembly + device SoftNMS

Timing per PARITY "harness physics": stage outputs at MAD scale are
hundreds of MB and this harness transfers outputs eagerly (~1.3 GB/s), so
each timed program reduces its outputs to ONE scalar on device (the
reduction cost is one extra read of the stage output, noted in the dump).
Stage boundaries add HBM materialization XLA would otherwise fuse away, so
the stage sum can exceed the fused full call -- the full call is also
measured for reference.

  python scripts/mad_stage_profile.py [--T 32768] [--Q 2] [--iters 32]

Round-5 additions (VERDICT items 1/2 groundwork):
  --dtype float32|bfloat16   compute-dtype override (the bf16 MAD-scale
                             regression hunt needs per-stage bf16 timings)
  --hlo-dir DIR              save each stage's OPTIMIZED HLO
                             (compiled.as_text()) for fusion-cluster diffs
  --stages pre,fpn,fnp,decode  subset selection (decode = post-model
                             sigmoid/top-k/assembly/SoftNMS, new)
"""

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def tree_scalar(x):
    import jax
    import jax.numpy as jnp
    leaves = [jnp.sum(l.astype(jnp.float32))
              for l in jax.tree_util.tree_leaves(x)]
    return sum(leaves)


def cost(compiled):
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return {k: ca[k] for k in ("flops", "bytes accessed") if k in ca}
    except Exception as e:  # cost_analysis availability varies by backend
        return {"error": str(e)}


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--T", type=int, default=32768)
    parser.add_argument("--Q", type=int, default=2)
    parser.add_argument("--iters", type=int, default=32)
    parser.add_argument("--dtype", default=None,
                        choices=("float32", "bfloat16"),
                        help="compute-dtype override (None = shipped "
                        "resolution for this config/backend)")
    parser.add_argument("--hlo-dir", default=None,
                        help="save optimized HLO text per stage here")
    parser.add_argument("--stages", default="pre,fpn,fnp,decode",
                        help="comma-separated subset of pre,fpn,fnp,decode")
    parser.add_argument("--out",
                        default=os.path.join(REPO, "scripts", "results",
                                             "mad_stage_profile.json"))
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/decafnet_tpu/xla"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import bench
    bench.require_tpu()
    from decafnet_tpu.models import make_model

    T, Q = args.T, args.Q
    overrides = {"model.vid_net.max_seq_len": T}
    if args.dtype:
        overrides["tpu.compute_dtype"] = args.dtype
    cfg = bench.build(overrides)
    # pin the shipped EVAL precision class (cfg.tpu.matmul_precision
    # resolved with eval semantics -- "high" since the round-5 revert of
    # the round-4 "default" promotion); numbers at different precisions
    # are not comparable for f32 programs (high vs default measured 31.8
    # vs 24.1 ms here) though a wash for bf16 (prec_ab_*.json)
    from decafnet_tpu.models import resolve_matmul_precision
    report_precision = resolve_matmul_precision(cfg, eval_mode=True)
    jax.config.update("jax_default_matmul_precision", report_precision)
    model = make_model(cfg, compute_dtype=args.dtype)
    decode_full, full_args = bench.make_decode_fn(cfg, Q, T,
                                                  compute_dtype=args.dtype)
    params = full_args[0]
    _, vid, shallow, vm, text, tcls, tm, points_t = full_args

    # ---- stage functions (flax method= calls on the same param tree) ----
    def pre_fn(p, vid, shallow, vm, text, tcls, tm):
        def m(mdl, vid, shallow, vm, text, tcls, tm):
            v, vmask = mdl._delegate_project_grouped(vid, shallow, vm,
                                                     tcls, Q)
            t_enc, t_mask = mdl.encode_text(text, tm, deterministic=True)
            v, vmask = mdl.fusion(v, vmask, t_enc, t_mask,
                                  deterministic=True)
            return v, vmask, t_enc, t_mask
        return model.apply({"params": p}, vid, shallow, vm, text, tcls, tm,
                           method=m)

    def fpn_fn(p, v, vmask):
        def m(mdl, v, vmask):
            return mdl.encode_video(v, vmask, deterministic=True)
        return model.apply({"params": p}, v, vmask, method=m)

    def fnp_fn(p, fpn, fpn_masks, t_enc, t_mask):
        def m(mdl, fpn, fpn_masks, t_enc, t_mask):
            return mdl.fuse_and_predict(fpn, fpn_masks, t_enc, t_mask,
                                        deterministic=True)
        return model.apply({"params": p}, fpn, fpn_masks, t_enc, t_mask,
                           method=m)

    def decode_fn(lg2, offsets, masks, points_t):
        # the post-model decode: sigmoid -> threshold/top-k -> dense
        # segment assembly -> on-device SoftNMS (bench.make_decode_fn tail)
        from decafnet_tpu.ops.nms import batched_nms_device
        nms = dict(cfg.nms)
        scores = jnp.concatenate(
            [jax.nn.sigmoid(l) * m for l, m in zip(lg2, masks)], axis=1)
        offs = jnp.concatenate(offsets, axis=2)
        valid = scores > cfg.eval.pre_nms_thresh
        ranked = jnp.where(valid, scores, -1.0)
        topk = min(cfg.eval.pre_nms_topk, scores.shape[1])
        kth = jax.lax.top_k(ranked, topk)[0][:, -1:]
        valid = valid & (scores >= kth)
        ctr = points_t[0][None]
        stride = points_t[3][None]
        left = ctr - offs[:, 0, :] * stride
        right = ctr + offs[:, 1, :] * stride
        valid = valid & ((right - left) > cfg.eval.seg_len_thresh)
        return batched_nms_device(
            left, right, jnp.where(valid, scores, 0.0), valid,
            nms["max_num_segs"], mode=nms["mode"],
            iou_thresh=nms["iou_thresh"], min_score=nms["min_score"],
            sigma=nms["sigma"], voting_thresh=nms["voting_thresh"])

    # materialize stage boundaries once (untimed)
    pre_out = jax.jit(pre_fn)(params, vid, shallow, vm, text, tcls, tm)
    v, vmask, t_enc, t_mask = pre_out
    fpn, fpn_masks = jax.jit(fpn_fn)(params, v, vmask)
    fnp_out = jax.jit(fnp_fn)(params, fpn, fpn_masks, t_enc, t_mask)
    _, lg2, offsets, out_masks = fnp_out
    jax.block_until_ready((pre_out, fpn, fpn_masks, fnp_out))

    stages = {
        "pre": (lambda p, *a: tree_scalar(pre_fn(p, *a)),
                (params, vid, shallow, vm, text, tcls, tm)),
        "fpn": (lambda p, *a: tree_scalar(fpn_fn(p, *a)),
                (params, v, vmask)),
        "fnp": (lambda p, *a: tree_scalar(fnp_fn(p, *a)),
                (params, fpn, fpn_masks, t_enc, t_mask)),
        "decode": (lambda lg2, off, mk, pts: tree_scalar(
            decode_fn(lg2, off, mk, pts)),
            (lg2, offsets, out_masks, points_t)),
    }
    keep = [s.strip() for s in args.stages.split(",") if s.strip()]
    stages = {k: v for k, v in stages.items() if k in keep}

    if args.hlo_dir:
        os.makedirs(args.hlo_dir, exist_ok=True)

    report = {"T": T, "Q": Q, "iters": args.iters, "dtype": args.dtype,
              "matmul_precision": report_precision, "stages": {}}
    for name, (fn, a) in stages.items():
        jitted = jax.jit(fn)
        compiled = jitted.lower(*a).compile()
        t0 = time.time()
        jax.device_get(jitted(*a))
        print(f"[{name}] compile+1st {time.time() - t0:.0f}s", flush=True)
        t = bench.timed(jitted, a, warmup=2, iters=args.iters)
        c = cost(compiled)
        report["stages"][name] = {"ms": t * 1e3, **c}
        print(f"[{name}] {t * 1e3:.2f} ms  {c}", flush=True)
        if args.hlo_dir:
            tag = args.dtype or "shipped"
            path = os.path.join(args.hlo_dir, f"{name}_{tag}.hlo.txt")
            with open(path, "w") as f:
                f.write(compiled.as_text())
            print(f"[{name}] hlo -> {path}", flush=True)

    # full fused call for reference
    compiled_full = None
    try:
        compiled_full = decode_full.lower(*full_args).compile()
        if args.hlo_dir:
            tag = args.dtype or "shipped"
            path = os.path.join(args.hlo_dir, f"full_{tag}.hlo.txt")
            with open(path, "w") as f:
                f.write(compiled_full.as_text())
    except Exception:
        pass
    t0 = time.time()
    jax.device_get(decode_full(*full_args))
    print(f"[full] compile+1st {time.time() - t0:.0f}s", flush=True)
    t = bench.timed(decode_full, full_args, warmup=2, iters=args.iters)
    report["full"] = {"ms": t * 1e3}
    if compiled_full is not None:
        report["full"].update(cost(compiled_full))
    print(f"[full] {t * 1e3:.2f} ms  {report['full']}", flush=True)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    json.dump(report, open(args.out, "w"), indent=1)
    print(f"-> {args.out}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
