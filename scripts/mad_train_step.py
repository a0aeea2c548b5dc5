#!/usr/bin/env python
"""MAD-scale (32k-grid) TRAIN step on the real chip.

models/video_net.py advertises remat so MAD-scale sequences train within
HBM; round-2 review confirmed that path CRASHED on TPU because the
auto-dispatched Pallas band-attention kernel (T >= 8192) had no
reverse-mode rule. With the custom_vjp fix (ops/local_attention.py) this
script runs the full fwd+bwd+AdamW+EMA step at T=32768 -- the proof
artifact for PARITY. Reference context: the reference only ever EVALUATES
long MAD videos (libs/core/opt.py:300); training at this length is a
capability the rebuild adds.

  python scripts/mad_train_step.py [--T 32768] [--steps 3] [--no-remat]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--T", type=int, default=32768)
    parser.add_argument("--Q", type=int, default=1,
                        help="queries per video (data.max_num_text); >1 "
                        "exercises the video-major train path")
    parser.add_argument("--steps", type=int, default=3)
    parser.add_argument("--no-remat", action="store_true")
    parser.add_argument("--no-video-major", action="store_true",
                        help="force the per-query-row expansion "
                        "(tpu.video_major_train=False) for the A/B")
    parser.add_argument("--remat-policy", default="nothing",
                        choices=("nothing", "dots"),
                        help="what the checkpointed encoders save for the "
                        "backward pass (numerics identical; FLOP/HBM trade)")
    parser.add_argument("--precision", default="highest",
                        choices=("highest", "high", "default"),
                        help="matmul precision pin. 'highest' is the "
                        "historical harness pin (all recorded round-4 "
                        "A/Bs); 'high' is the shipped TRAIN resolution of "
                        "tpu.matmul_precision='auto'; 'default' is the "
                        "opt-in speed class")
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
    from decafnet_tpu.train.optim import make_optimizer, make_schedule
    from decafnet_tpu.train.trainer import TrainState, build_train_step
    from decafnet_tpu.ops.local_attention import get_backend

    T = args.T
    cfg = bench.build({"model.vid_net.max_seq_len": T})
    cfg.tpu.remat = not args.no_remat
    cfg.tpu.remat_policy = args.remat_policy
    cfg.tpu.video_major_train = not args.no_video_major
    Q = args.Q
    cfg.data.max_num_text = Q
    cfg.train.batch_size = 1
    print(f"T={T} Q={Q} remat={cfg.tpu.remat} policy={args.remat_policy} "
          f"precision={args.precision} "
          f"video_major={cfg.tpu.video_major_train} "
          f"attention_backend={get_backend()} "
          f"('auto' resolves to diag at every shape)", flush=True)

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
    pts = generate_points(max(cfg.pt_gen.max_seq_len, T * 4),
                          cfg.pt_gen.num_fpn_levels,
                          cfg.pt_gen.regression_range, cfg.pt_gen.sigma)
    points_t = jax.device_put(np.ascontiguousarray(
        np.concatenate(select_points(pts, lens)).T))

    sched_cfg = dict(cfg.scheduler)
    sched_cfg["_base_lr"] = cfg.optimizer.lr
    sched = make_schedule(sched_cfg, itrs_per_epoch=100)
    optimizer = make_optimizer(params, cfg.optimizer, sched)
    state = TrainState(step=jnp.asarray(0), params=params,
                       ema_params=jax.tree.map(jnp.copy, params),
                       opt_state=optimizer.init(params),
                       loss_norm=jnp.asarray(100.0, jnp.float32))
    step_fn = jax.jit(build_train_step(model, optimizer, cfg),
                      donate_argnums=(0,))

    batch = {k: jax.device_put(v) for k, v in batch.items()}
    key = jax.random.PRNGKey(1)
    t_compile = time.time()
    state, metrics = step_fn(state, batch, key, points_t)
    metrics = jax.device_get(metrics)
    print(f"step 1 (incl. compile {time.time() - t_compile:.0f}s): "
          f"{ {k: float(v) for k, v in metrics.items()} }", flush=True)
    assert all(np.isfinite(v) for v in metrics.values()), metrics

    times = []
    for i in range(args.steps):
        t0 = time.perf_counter()
        state, metrics = step_fn(state, batch, key, points_t)
        metrics = jax.device_get(metrics)  # true sync
        times.append(time.perf_counter() - t0)
        assert all(np.isfinite(v) for v in metrics.values()), metrics
    leaves = jax.tree_util.tree_leaves(jax.device_get(state.params))
    assert all(np.isfinite(v).all() for v in leaves)
    print(f"steady-state train step: {min(times) * 1000:.1f} ms "
          f"(T={T}, fwd+bwd+AdamW+EMA, all params finite)", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
