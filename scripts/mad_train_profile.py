#!/usr/bin/env python
"""Per-stage timing + REAL-TPU-compiler cost analysis of the MAD-scale
TRAIN step (round-5 VERDICT item 2).

Round 4 measured the full train step at 195.7 ms (T=32768, Q=2,
fwd+bwd+AdamW+EMA) while the CPU cost-model proxy put the bandwidth floor
at ~72 ms -- the step runs at ~37% of its bound and no on-chip stage
breakdown existed. This script times:

  fwd      the microbatch loss forward alone (no grad)
  fwd_bwd  value_and_grad of the same loss (grads reduced to one scalar
           on device; bwd ~= fwd_bwd - fwd)
  opt      AdamW update + param add + EMA lerp + loss-norm EMA, on
           precomputed grads (the post-gradient tail of the train step)
  full     the exact jitted Trainer step (donated state)

with the TPU compiler's cost_analysis (flops / bytes accessed) per stage.
Timing per PARITY "harness physics": device_get-synced, steady-state min,
scalar outputs for the non-donated stages. The full step's donated state
cannot be queued (buffers are consumed), so it is timed per-call like the
Trainer runs it.

  python scripts/mad_train_profile.py [--T 32768] [--Q 2] [--iters 12]
      [--precision high] [--remat|--no-remat]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def cost(compiled):
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return {k: ca[k] for k in ("flops", "bytes accessed") if k in ca}
    except Exception as e:
        return {"error": str(e)}


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--T", type=int, default=32768)
    parser.add_argument("--Q", type=int, default=2)
    parser.add_argument("--iters", type=int, default=12)
    parser.add_argument("--precision", default="high",
                        choices=("highest", "high", "default"),
                        help="'high' = the shipped TRAIN resolution of "
                        "tpu.matmul_precision='auto'")
    parser.add_argument("--remat", dest="remat", action="store_true")
    parser.add_argument("--no-remat", dest="remat", action="store_false")
    parser.set_defaults(remat=False)  # shipped default (round-4 A/B)
    parser.add_argument("--out",
                        default=os.path.join(REPO, "scripts", "results",
                                             "mad_train_profile.json"))
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_default_matmul_precision", args.precision)
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/decafnet_tpu/xla"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import bench
    bench.require_tpu()
    from decafnet_tpu.models import (fpn_lengths, generate_points,
                                     make_model, select_points)
    from decafnet_tpu.train.optim import ema_update, make_optimizer, \
        make_schedule
    from decafnet_tpu.train.trainer import (TrainState,
                                            build_microbatch_loss,
                                            build_train_step)

    T, Q = args.T, args.Q
    cfg = bench.build({"model.vid_net.max_seq_len": T})
    cfg.tpu.remat = args.remat
    cfg.data.max_num_text = Q
    cfg.train.batch_size = 1

    model = make_model(cfg)
    rng = np.random.RandomState(0)
    cv, ct = cfg.model.vid_net.in_dim, cfg.model.text_net.in_dim
    L = cfg.data.max_text_len
    batch = {
        "vid": rng.randn(1, cv, T).astype(np.float32),
        "shallow_vid": rng.randn(1, cv, T).astype(np.float32),
        "vid_masks": np.ones((1, T), bool),
        "text": rng.randn(Q, ct, L).astype(np.float32),
        "text_masks": np.ones((Q, L), bool),
        "text_cls": rng.randn(Q, cv).astype(np.float32),
        "targets": np.asarray([[0.1 * T, 0.4 * T]] * Q, np.float32),
        "row_valid": np.ones((Q,), bool),
    }
    params = model.init(jax.random.PRNGKey(0), batch["vid"],
                        batch["shallow_vid"], batch["vid_masks"],
                        batch["text"], batch["text_cls"],
                        batch["text_masks"], deterministic=True,
                        queries_per_video=Q)["params"]
    lens = fpn_lengths(T // cfg.model.vid_stride, cfg.model.num_fpn_levels)
    points_t = jax.device_put(np.ascontiguousarray(np.concatenate(
        select_points(generate_points(max(cfg.pt_gen.max_seq_len, T * 4),
                                      cfg.pt_gen.num_fpn_levels,
                                      cfg.pt_gen.regression_range,
                                      cfg.pt_gen.sigma), lens)).T))
    sched_cfg = dict(cfg.scheduler)
    sched_cfg["_base_lr"] = cfg.optimizer.lr
    optimizer = make_optimizer(params, cfg.optimizer,
                               make_schedule(sched_cfg, 100))
    opt_state = optimizer.init(params)
    batch = {k: jax.device_put(v) for k, v in batch.items()}
    key = jax.random.PRNGKey(1)
    loss_norm = jnp.asarray(100.0, jnp.float32)

    micro = build_microbatch_loss(model, cfg)

    def fwd_fn(p, mb, r, ln, pts):
        total, _ = micro(p, mb, r, ln, pts)
        return total

    def fwd_bwd_fn(p, mb, r, ln, pts):
        (total, _), grads = jax.value_and_grad(micro, has_aux=True)(
            p, mb, r, ln, pts)
        gsum = sum(jnp.sum(g.astype(jnp.float32))
                   for g in jax.tree_util.tree_leaves(grads))
        return total, gsum

    def opt_fn(p, ema, ostate, grads, ln):
        # the post-gradient tail of build_train_step: AdamW (incl. clip)
        # -> param add -> EMA lerp (train/trainer.py)
        updates, ostate = optimizer.update(grads, ostate, p)
        new_p = jax.tree.map(lambda a, u: a + u, p, updates)
        new_ema = ema_update(ema, new_p, cfg.train.ema_beta)
        psum = sum(jnp.sum(x.astype(jnp.float32))
                   for x in jax.tree_util.tree_leaves((new_p, new_ema)))
        return psum

    report = {"T": T, "Q": Q, "iters": args.iters,
              "precision": args.precision, "remat": args.remat,
              "stages": {}}

    # grads materialized once for the opt stage
    grads = jax.jit(lambda p, mb, r, ln, pts: jax.grad(
        lambda q: micro(q, mb, r, ln, pts)[0])(p))(
            params, batch, key, loss_norm, points_t)
    jax.block_until_ready(grads)

    stages = {
        "fwd": (fwd_fn, (params, batch, key, loss_norm, points_t)),
        "fwd_bwd": (fwd_bwd_fn, (params, batch, key, loss_norm, points_t)),
        "opt": (opt_fn, (params, jax.tree.map(jnp.copy, params), opt_state,
                         grads, loss_norm)),
    }
    for name, (fn, a) in stages.items():
        jitted = jax.jit(fn)
        compiled = jitted.lower(*a).compile()
        t0 = time.time()
        jax.device_get(jitted(*a))
        print(f"[{name}] compile+1st {time.time() - t0:.0f}s", flush=True)
        t = bench.timed(jitted, a, warmup=2, iters=args.iters)
        report["stages"][name] = {"ms": t * 1e3, **cost(compiled)}
        print(f"[{name}] {t * 1e3:.2f} ms  {report['stages'][name]}",
              flush=True)

    # the full donated Trainer step, timed per call (donation consumes the
    # state buffers, so no queuing)
    step_fn = jax.jit(build_train_step(model, optimizer, cfg),
                      donate_argnums=(0,))
    state = TrainState(step=jnp.asarray(0), params=params,
                       ema_params=jax.tree.map(jnp.copy, params),
                       opt_state=optimizer.init(params),
                       loss_norm=loss_norm)
    compiled_full = None
    try:
        compiled_full = step_fn.lower(state, batch, key, points_t).compile()
    except Exception:
        pass
    t0 = time.time()
    state, metrics = step_fn(state, batch, key, points_t)
    jax.device_get(metrics)
    print(f"[full] compile+1st {time.time() - t0:.0f}s", flush=True)
    times = []
    for _ in range(args.iters):
        t0 = time.perf_counter()
        state, metrics = step_fn(state, batch, key, points_t)
        jax.device_get(metrics)
        times.append(time.perf_counter() - t0)
    report["full"] = {"ms": min(times) * 1e3}
    if compiled_full is not None:
        report["full"].update(cost(compiled_full))
    report["derived"] = {
        "bwd_ms": report["stages"]["fwd_bwd"]["ms"]
        - report["stages"]["fwd"]["ms"],
    }
    print(f"[full] {report['full']}", flush=True)
    print(f"[derived] bwd ~= {report['derived']['bwd_ms']:.2f} ms",
          flush=True)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    json.dump(report, open(args.out, "w"), indent=1)
    print(f"-> {args.out}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
