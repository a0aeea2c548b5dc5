#!/usr/bin/env python
"""Serving-layer throughput: GroundingService end-to-end (host assembly +
device decode + detections), per-request vs batched (ground_many).

bench.py measures the raw jitted program at the same V x Q shape; this
measures the SERVING path wrapped around it -- request validation, chunk
assembly, bucket grouping, host/device transfer, result conversion -- i.e.
what a deployed endpoint actually delivers. On CPU it is a smoke test; on
the chip it is the honest serving number.

  python scripts/serve_load_test.py [--T 2304] [--Q 8] [--n 32] [--cpu]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--T", type=int, default=2304)
    parser.add_argument("--Q", type=int, default=8)
    parser.add_argument("--n", type=int, default=32, help="request count")
    parser.add_argument("--max-group", type=int, default=8)
    parser.add_argument("--cpu", action="store_true",
                        help="force CPU (smoke test; timings meaningless)")
    args = parser.parse_args(argv)

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "high")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/decafnet_tpu/xla"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import bench
    from decafnet_tpu.models import make_model
    from decafnet_tpu.serve import GroundingService

    if not args.cpu:
        bench.require_tpu()

    T, Q = args.T, args.Q
    cfg = bench.build({"model.vid_net.max_seq_len": T})
    cfg.aux.logdir = ""

    rng = np.random.RandomState(0)
    cv, ct = cfg.model.vid_net.in_dim, cfg.model.text_net.in_dim
    L = cfg.data.max_text_len

    model = make_model(cfg)
    params = model.init(
        jax.random.PRNGKey(0),
        rng.randn(1, cv, T).astype(np.float32),
        rng.randn(1, cv, T).astype(np.float32),
        np.ones((1, T), bool),
        rng.randn(1, ct, L).astype(np.float32),
        rng.randn(1, cv).astype(np.float32),
        np.ones((1, L), bool), deterministic=True)["params"]
    service = GroundingService(cfg, params=params)

    def request(i):
        r = np.random.RandomState(100 + i)
        return dict(
            vid=r.randn(cv, T).astype(np.float32),
            shallow_vid=r.randn(cv, T).astype(np.float32),
            texts=[r.randn(ct, 4 + (i + q) % (L - 4)).astype(np.float32)
                   for q in range(Q)],
            text_cls=r.randn(Q, cv).astype(np.float32))

    requests = [request(i) for i in range(args.n)]
    video_sec = T * 16 / 30.0  # clip_stride 16 @ 30 fps per video

    # warm every (T, Q, L, V) bucket the requests touch on BOTH paths so
    # the timed passes are steady-state (requests carry varied text
    # lengths -> several pow-2 L buckets)
    for req in requests:
        service.ground(**req)
    service.ground_many(requests, max_group=args.max_group)

    t0 = time.perf_counter()
    for req in requests:
        service.ground(**req)
    t_seq = (time.perf_counter() - t0) / args.n

    t0 = time.perf_counter()
    service.ground_many(requests, max_group=args.max_group)
    t_batch = (time.perf_counter() - t0) / args.n

    print(f"serving end-to-end (T={T}, Q={Q}, n={args.n}, "
          f"backend={jax.default_backend()}):")
    print(f"  per-request ground():  {t_seq * 1e3:8.2f} ms/video "
          f"({video_sec / t_seq:,.0f} video-sec/s)")
    print(f"  ground_many(V<={args.max_group}):   {t_batch * 1e3:8.2f} "
          f"ms/video ({video_sec / t_batch:,.0f} video-sec/s)")
    print(f"  batching speedup: {t_seq / t_batch:.2f}x")
    return 0


if __name__ == "__main__":
    sys.exit(main())
