#!/usr/bin/env python
"""ENCODE+GROUND benchmark: the north-star metric measured on-device.

BASELINE.md's target metric is "Video-sec/sec/chip (encode+ground)" -- the
reference never runs this on-line: its expert/sidekick features are
extracted OFFLINE by EgoVLP towers over EVERY clip and loaded from disk
(reference: libs/data/dataset.py:363-407; SURVEY.md section 0). This
script measures the paper's actual pipeline end-to-end on one chip:

  DeCafNet structure (ours, one jitted program per video):
    sidekick ViT encodes EVERY clip (cheap, low-res)
      -> saliency vs the query CLS -> delegation keeps top-ratio bins
      -> expert ViT encodes ONLY the selected clips (static budget k)
      -> one-hot-matmul scatter + weight gate -> grounder forward
      -> decode + on-device SoftNMS -> detections.

  Baseline structure (the reference's): expert ViT encodes ALL clips,
    sidekick encodes ALL clips (its feature files cover every clip),
    then the per-query grounder forward ships dense candidates to the
    host for C++ SoftNMS (libs/worker_v2.py:1022-1127).

Both sides run the identical encoders/grounder compiled on the same chip
at the same precision, timed with the queued device_get sync from
bench.timed (PARITY.md "harness physics"). Frames stay device-resident
across calls: this measures ENCODE+GROUND compute, not host frame ingest
(a production loader streams frames asynchronously).

  python scripts/encode_ground_bench.py [--T 1024] [--ratio 0.3]
      [--dtype bfloat16|float32] [--iters 16]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CLIP_STRIDE, FPS = 16, 30.0  # NLQ grid: video-seconds per clip = 16/30


def make_encoders(dtype):
    from decafnet_tpu.encode import make_clip_encoder

    expert = make_clip_encoder(dict(
        patch_size=16, dim=384, depth=6, heads=6, out_dim=256, frames=4,
        dtype=dtype))
    sidekick = make_clip_encoder(dict(
        patch_size=16, dim=192, depth=2, heads=4, out_dim=256, frames=4,
        dtype=dtype))
    return expert, sidekick


def chunked_encode(enc, params, frames, chunk):
    """Encode n clips in lax.map chunks: one compiled body, working set
    capped at ``chunk`` clips (the full-video expert pass would otherwise
    materialize ~5 GB of MLP activations at T=1024)."""
    import jax
    import jax.numpy as jnp

    n = frames.shape[0]
    assert n % chunk == 0, (n, chunk)
    blocks = frames.reshape((n // chunk, chunk) + frames.shape[1:])
    feats = jax.lax.map(
        lambda fr: enc.apply({"params": params}, fr), blocks)
    return feats.reshape(n, -1)


def make_fns(cfg, T, ratio, sn, dtype, res=224, sk_res=112, frames=4,
             chunk=128):
    """Build (decafnet_fn, baseline_fn, shared args) -- both jitted
    end-to-end encode+ground programs over device-resident frames."""
    import jax
    import jax.numpy as jnp
    from decafnet_tpu.models import (fpn_lengths, generate_points,
                                     select_points, make_model)
    from decafnet_tpu.ops.delegation import (delegation_weights,
                                             saliency_correlation)
    from decafnet_tpu.ops.nms import batched_nms_device
    from decafnet_tpu.encode.pipeline import expert_budget, gather_clips

    expert, sidekick = make_encoders(dtype)
    model = make_model(cfg)
    k = expert_budget(T, sn, ratio)

    rng = np.random.RandomState(0)
    ef = rng.rand(T, frames, res, res, 3).astype(np.float32)
    sf = rng.rand(T, frames, sk_res, sk_res, 3).astype(np.float32)
    L = cfg.data.max_text_len
    text = rng.randn(1, cfg.model.text_net.in_dim, L).astype(np.float32)
    tcls = rng.randn(1, 256).astype(np.float32)
    tm = np.ones((1, L), bool)

    p_e = expert.init(jax.random.PRNGKey(0), ef[:1])["params"]
    p_s = sidekick.init(jax.random.PRNGKey(1), sf[:1])["params"]

    # grounder params initialized from encoded shapes (256-d streams)
    gvid = np.zeros((1, 256, T), np.float32)
    gm = np.ones((1, T), bool)
    p_g = model.init(jax.random.PRNGKey(2), gvid, gvid, gm, text, tcls,
                     tm, deterministic=True)["params"]

    lens = fpn_lengths(T // cfg.model.vid_stride, cfg.model.num_fpn_levels)
    points_np = np.concatenate(select_points(
        generate_points(max(cfg.pt_gen.max_seq_len, T * 4),
                        cfg.pt_gen.num_fpn_levels,
                        cfg.pt_gen.regression_range, cfg.pt_gen.sigma),
        lens))
    points_t = jax.device_put(np.ascontiguousarray(points_np.T))
    topk = min(cfg.eval.pre_nms_topk, points_np.shape[0])
    nms = dict(cfg.nms)

    def ground_decode(p_g, vid, shallow, text, tcls, tm, points_t):
        _, logits2, offsets, masks = model.apply(
            {"params": p_g}, vid, shallow,
            jnp.ones((1, T), bool), text, tcls, tm, deterministic=True)
        scores = jnp.concatenate(
            [jax.nn.sigmoid(l) * m for l, m in zip(logits2, masks)], axis=1)
        offs = jnp.concatenate(offsets, axis=2)
        valid = scores > cfg.eval.pre_nms_thresh
        ranked = jnp.where(valid, scores, -1.0)
        kth = jax.lax.top_k(ranked, topk)[0][:, -1:]
        valid = valid & (scores >= kth)
        ctr, stride = points_t[0][None], points_t[3][None]
        left = ctr - offs[:, 0, :] * stride
        right = ctr + offs[:, 1, :] * stride
        valid = valid & ((right - left) > cfg.eval.seg_len_thresh)
        return left, right, jnp.where(valid, scores, 0.0), valid

    assert T % chunk == 0 and k % chunk == 0, (T, k, chunk)

    @jax.jit
    def decafnet(p_e, p_s, p_g, ef, sf, text, tcls, tm, points_t):
        sk = chunked_encode(sidekick, p_s, sf, chunk).T       # (C, T)
        correl = saliency_correlation(sk[None], tcls)
        weight = delegation_weights(
            correl, jnp.ones((1, T), bool), sn, ratio)[0]     # (T,)
        # selected clips first (ties by index), static expert budget k
        order = jnp.argsort(-weight * 2.0
                            - (T - jnp.arange(T)) / (T + 1.0))
        idx = order[:k]
        # one-hot-matmul gather (jnp.take costs ~100 ms here; see
        # encode/pipeline.py:gather_clips)
        frames_k = gather_clips(ef, idx, dtype=dtype)
        feats_k = chunked_encode(expert, p_e, frames_k, chunk)  # (k, C)
        onehot = jax.nn.one_hot(idx, T, dtype=feats_k.dtype)  # (k, T)
        dense = feats_k.T @ onehot * weight[None, :]          # (C, T)
        left, right, scores, valid = ground_decode(
            p_g, dense[None], sk[None], text, tcls, tm, points_t)
        return batched_nms_device(
            left, right, scores, valid, nms["max_num_segs"],
            mode=nms["mode"], iou_thresh=nms["iou_thresh"],
            min_score=nms["min_score"], sigma=nms["sigma"],
            voting_thresh=nms["voting_thresh"])

    @jax.jit
    def baseline(p_e, p_s, p_g, ef, sf, text, tcls, tm, points_t):
        # reference structure: expert over EVERY clip (offline semantics),
        # dense candidates returned for host NMS
        exp_all = chunked_encode(expert, p_e, ef, chunk).T     # (C, T)
        sk = chunked_encode(sidekick, p_s, sf, chunk).T
        correl = saliency_correlation(sk[None], tcls)
        weight = delegation_weights(
            correl, jnp.ones((1, T), bool), sn, ratio)[0]
        dense = exp_all * weight[None, :]
        return ground_decode(p_g, dense[None], sk[None], text, tcls, tm,
                             points_t)

    args = (p_e, p_s, p_g, jax.device_put(ef), jax.device_put(sf),
            jax.device_put(text), jax.device_put(tcls),
            jax.device_put(tm), points_t)
    return decafnet, baseline, args, k


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--T", type=int, default=1024)
    parser.add_argument("--ratio", type=float, default=0.3)
    parser.add_argument("--sn", type=int, default=64,
                        help="bin size; 64 (vs the NLQ 60) keeps the "
                             "expert budget chunk-divisible at T=1024")
    parser.add_argument("--dtype", default="bfloat16",
                        choices=["bfloat16", "float32"])
    parser.add_argument("--iters", type=int, default=16)
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/decafnet_tpu/xla"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_default_matmul_precision", "high")

    import bench
    from decafnet_tpu.ops.nms import batched_nms_host

    bench.require_tpu()

    cfg = bench.build({"model.vid_net.in_dim": 256,
                       "model.vid_net.max_seq_len": args.T})
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    decafnet, baseline, fargs, k = make_fns(
        cfg, args.T, args.ratio, args.sn, dtype)

    t_ours = bench.timed(decafnet, fargs, warmup=2, iters=args.iters)

    t_base_fwd = bench.timed(baseline, fargs, warmup=2, iters=args.iters)
    left, right, scores, valid = (
        np.asarray(x) for x in jax.device_get(baseline(*fargs)))
    m = valid[0]
    segs = np.stack([left[0][m], right[0][m]], axis=-1)
    sc = scores[0][m]
    nms = dict(cfg.nms)

    def host_nms():
        return batched_nms_host(
            segs, sc, iou_thresh=nms["iou_thresh"],
            min_score=nms["min_score"], max_num_segs=nms["max_num_segs"],
            mode=nms["mode"], sigma=nms["sigma"],
            voting_thresh=nms["voting_thresh"])

    host_nms()
    t0 = time.perf_counter()
    for _ in range(8):
        host_nms()
    t_base = t_base_fwd + (time.perf_counter() - t0) / 8

    video_seconds = args.T * CLIP_STRIDE / FPS
    value = video_seconds / t_ours
    base = video_seconds / t_base
    print(json.dumps({
        "metric": "video_sec_per_sec_per_chip_encode_ground",
        "value": round(value, 2),
        "unit": f"video-seconds/sec/chip (on-device encode+ground: "
                f"sidekick ViT all {args.T} clips + expert ViT "
                f"{k} delegated clips (ratio {args.ratio}) + grounder "
                f"decode + device NMS, {args.dtype} encode matmuls; "
                f"baseline = reference structure, expert over ALL clips "
                f"+ host NMS, same chip/precision)",
        "t_ours_ms": round(t_ours * 1e3, 2),
        "t_baseline_ms": round(t_base * 1e3, 2),
        "vs_baseline": round(value / base, 2),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
