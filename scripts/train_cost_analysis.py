#!/usr/bin/env python
"""XLA cost-model analysis of the TRAIN step vs remat policy (CPU lowering
as a structural proxy, the same methodology as PARITY's MAD-scale HBM-floor
analysis of the eval program).

For each ``tpu.remat_policy`` the full train step (fwd+bwd+AdamW+EMA) is
lowered and compiled for CPU and XLA's cost_analysis reports FLOPs and
bytes accessed: ``nothing`` recomputes every encoder activation in the
backward (max FLOPs, min saved bytes), ``dots`` keeps matmul
outputs and skips their recompute. The prediction is confirmed on chip with
``scripts/mad_train_step.py --remat-policy ...`` (wall time) -- the CPU
cost model ranks structures, it does not predict TPU milliseconds.

  python scripts/train_cost_analysis.py [--T 8192] [--policies ...]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--T", type=int, default=8192)
    parser.add_argument("--policies", nargs="+",
                        default=("none", "nothing", "dots"))
    args = parser.parse_args(argv)

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    import bench
    from decafnet_tpu.models import (fpn_lengths, generate_points,
                                     make_model, select_points)
    from decafnet_tpu.train.optim import make_optimizer, make_schedule
    from decafnet_tpu.train.trainer import TrainState, build_train_step

    T = args.T
    rng = np.random.RandomState(0)

    for policy in args.policies:
        cfg = bench.build({"model.vid_net.max_seq_len": T})
        cfg.tpu.remat = policy != "none"
        if cfg.tpu.remat:
            cfg.tpu.remat_policy = policy
        cfg.data.max_num_text = 1
        cfg.train.batch_size = 1

        model = make_model(cfg)
        cv, ct = cfg.model.vid_net.in_dim, cfg.model.text_net.in_dim
        L = cfg.data.max_text_len
        batch = {
            "vid": rng.randn(1, cv, T).astype(np.float32),
            "shallow_vid": rng.randn(1, cv, T).astype(np.float32),
            "vid_masks": np.ones((1, T), bool),
            "text": rng.randn(1, ct, L).astype(np.float32),
            "text_masks": np.ones((1, L), bool),
            "text_cls": rng.randn(1, cv).astype(np.float32),
            "targets": np.asarray([[0.1 * T, 0.4 * T]], np.float32),
            "row_valid": np.ones((1,), bool),
        }
        params = model.init(jax.random.PRNGKey(0), batch["vid"],
                            batch["shallow_vid"], batch["vid_masks"],
                            batch["text"], batch["text_cls"],
                            batch["text_masks"],
                            deterministic=True)["params"]
        lens = fpn_lengths(T // cfg.model.vid_stride,
                           cfg.model.num_fpn_levels)
        pts = generate_points(max(cfg.pt_gen.max_seq_len, T * 4),
                              cfg.pt_gen.num_fpn_levels,
                              cfg.pt_gen.regression_range, cfg.pt_gen.sigma)
        points_t = jnp.asarray(np.ascontiguousarray(
            np.concatenate(select_points(pts, lens)).T))

        sched_cfg = dict(cfg.scheduler)
        sched_cfg["_base_lr"] = cfg.optimizer.lr
        optimizer = make_optimizer(params, cfg.optimizer,
                                   make_schedule(sched_cfg, 100))
        state = TrainState(step=jnp.asarray(0), params=params,
                           ema_params=jax.tree.map(jnp.copy, params),
                           opt_state=optimizer.init(params),
                           loss_norm=jnp.asarray(100.0, jnp.float32))
        step_fn = jax.jit(build_train_step(model, optimizer, cfg))

        compiled = step_fn.lower(state, batch, jax.random.PRNGKey(1),
                                 points_t).compile()
        c = compiled.cost_analysis()
        mem = compiled.memory_analysis()
        peak = getattr(mem, "temp_size_in_bytes", 0) if mem else 0
        print(f"T={T} policy={policy:>8}: "
              f"flops={c.get('flops', 0) / 1e9:8.2f}G  "
              f"bytes={c.get('bytes accessed', 0) / 1e9:7.2f}GB  "
              f"temp={peak / 1e9:6.2f}GB", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
