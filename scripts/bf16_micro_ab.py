#!/usr/bin/env python
"""Micro A/B: FPN sub-ops at MAD scale (T=32768) in f32 vs bf16.

Round-5 VERDICT item 1 drill-down: the per-stage profile
(scripts/results/mad_stage_profile_{f32,bf16}_r5.json) localized the bf16
MAD-scale regression to the FPN stage (15.2 ms bf16 vs 7.9 ms f32, 2x,
while `pre` WINS in bf16 and fnp/decode are flat). This times each FPN
ingredient standalone in both dtypes to find the op whose bf16 lowering
is pathological:

  ln         channel-first LayerNorm (f32 stats both modes)
  dw_shift   depthwise conv3, shift-FMA lowering (the sub-16384 path)
  dw_conv    depthwise conv3, conv_general_dilated (the 16384+ path)
  conv1x1    dense 1x1 conv 128->128 (the attention projections)
  ffn        conv1x1 128->512 -> GELU -> 512->128
  band_diag  diagonal band attention (B,4,T,32) w=5
  maxpool    masked stride-2 max pool (the encoder skip path)
  encoder    one full stride-1 TransformerEncoder block (win=5)
  encoder_s2 one stride-2 block

  python scripts/bf16_micro_ab.py [--T 32768] [--B 2] [--iters 64]
"""

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--T", type=int, default=32768)
    parser.add_argument("--B", type=int, default=2)
    parser.add_argument("--iters", type=int, default=64)
    parser.add_argument("--cases", default=None,
                        help="comma-separated subset")
    parser.add_argument("--out",
                        default=os.path.join(REPO, "scripts", "results",
                                             "bf16_micro_ab.json"))
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/decafnet_tpu/xla"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    # the shipped EVAL precision (cfg.tpu.matmul_precision auto->default)
    jax.config.update("jax_default_matmul_precision", "default")

    import bench
    bench.require_tpu()

    from decafnet_tpu.nn import blocks
    from decafnet_tpu.ops.local_attention import band_attention_diag
    from decafnet_tpu.ops.masked import channel_layer_norm, masked_max_pool1d

    B, T = args.B, args.T
    C, H, D = 128, 4, 32
    rng = np.random.RandomState(0)
    x32 = rng.randn(B, C, T).astype(np.float32)
    mask = np.ones((B, 1, T), bool)
    mask[-1, :, T - T // 8:] = False
    q32 = rng.randn(B, H, T, D).astype(np.float32)
    w_dw = rng.randn(C, 1, 3).astype(np.float32) * 0.1
    w_1x1 = rng.randn(C, C, 1).astype(np.float32) * 0.05
    w_up = rng.randn(4 * C, C, 1).astype(np.float32) * 0.05
    w_dn = rng.randn(C, 4 * C, 1).astype(np.float32) * 0.05
    g = np.ones((C, 1), np.float32)
    b = np.zeros((C, 1), np.float32)

    def dw(x, w, mode):
        # the two Conv1d depthwise lowerings (nn/blocks.py:108-137)
        if mode == "shift":
            taps = w[:, 0, :]
            m = jnp.asarray(mask).astype(x.dtype)
            xm = x * m
            left = jnp.pad(xm[..., :-1], ((0, 0), (0, 0), (1, 0)))
            right = jnp.pad(xm[..., 1:], ((0, 0), (0, 0), (0, 1)))
            return (left * taps[:, 0:1] + xm * taps[:, 1:2]
                    + right * taps[:, 2:3])
        return jax.lax.conv_general_dilated(
            x * jnp.asarray(mask).astype(x.dtype), w.astype(x.dtype), (1,),
            [(1, 1)], feature_group_count=C,
            dimension_numbers=("NCH", "OIH", "NCH"))

    def conv1x1(x, w):
        return jax.lax.conv_general_dilated(
            x, w.astype(x.dtype), (1,), [(0, 0)],
            dimension_numbers=("NCH", "OIH", "NCH"))

    def make_cases(dtype):
        cast = lambda a: jnp.asarray(a, dtype)  # noqa: E731
        x = cast(x32)
        q = cast(q32)
        m2 = jnp.asarray(mask[:, 0, :])
        cases = {
            "ln": (lambda x: channel_layer_norm(
                x, cast(g), cast(b)), (x,)),
            "dw_shift": (lambda x: dw(x, cast(w_dw), "shift"), (x,)),
            "dw_conv": (lambda x: dw(x, cast(w_dw), "conv"), (x,)),
            "conv1x1": (lambda x: conv1x1(x, cast(w_1x1)), (x,)),
            "ffn": (lambda x: conv1x1(
                jax.nn.gelu(conv1x1(x, cast(w_up)), approximate=False),
                cast(w_dn)), (x,)),
            "band_diag": (lambda q: band_attention_diag(
                q, q, q, m2, 5), (q,)),
            "maxpool": (lambda x: masked_max_pool1d(
                x, jnp.asarray(mask), 3, 2)[0], (x,)),
        }
        # full encoder blocks through the real module (params in f32,
        # activations cast at entry like the model does)
        enc = blocks.TransformerEncoder(embd_dim=C, stride=1, n_heads=H,
                                        window_size=5)
        p_enc = enc.init(jax.random.PRNGKey(0), x32[:1, :, :256],
                         jnp.asarray(mask[:1, :, :256]))["params"]
        cases["encoder"] = (
            lambda x: enc.apply({"params": p_enc}, x, jnp.asarray(mask))[0],
            (x,))
        enc2 = blocks.TransformerEncoder(embd_dim=C, stride=2, n_heads=H,
                                         window_size=5)
        p_enc2 = enc2.init(jax.random.PRNGKey(0), x32[:1, :, :256],
                           jnp.asarray(mask[:1, :, :256]))["params"]
        cases["encoder_s2"] = (
            lambda x: enc2.apply({"params": p_enc2}, x,
                                 jnp.asarray(mask))[0],
            (x,))

        # hypothesis probes: channel-axis (sublane) VPU reductions are the
        # long-T bottleneck; the same statistics as ones-vector DOTS run on
        # the MXU instead
        HI = jax.lax.Precision.HIGHEST

        def ln_dot(x):
            ones = jnp.full((C,), 1.0 / C, jnp.float32)
            mean = jnp.einsum("bct,c->bt", x, ones.astype(x.dtype),
                              precision=HI,
                              preferred_element_type=jnp.float32)
            xc = x.astype(jnp.float32) - mean[:, None, :]
            var = jnp.einsum("bct,bct,c->bt", xc, xc, ones, precision=HI,
                             preferred_element_type=jnp.float32)
            y = xc * jax.lax.rsqrt(var + 1e-5)[:, None, :]
            y = y * cast(g).astype(jnp.float32) + cast(b).astype(
                jnp.float32)
            return y.astype(x.dtype)
        cases["ln_dot"] = (ln_dot, (x,))

        def band_diag_dot(q):
            # per-diagonal scores via (q * k_r) @ ones over D (MXU), then
            # the same f32 softmax/accumulate as band_attention_diag
            halo = 2
            onesd = jnp.ones((D,), q.dtype)
            mask_f = m2.astype(jnp.float32)[:, None, :]
            scores = []
            for r in range(-halo, halo + 1):
                if r == 0:
                    k_r = q
                else:
                    pad = [(0, 0)] * 4
                    if r > 0:
                        pad[-2] = (0, r)
                        k_r = jax.lax.slice_in_dim(
                            jnp.pad(q, pad), r, r + T, axis=-2)
                    else:
                        pad[-2] = (-r, 0)
                        k_r = jax.lax.slice_in_dim(
                            jnp.pad(q, pad), 0, T, axis=-2)
                s = jnp.einsum("bhtd,d->bht", q * k_r, onesd,
                               precision=HI,
                               preferred_element_type=jnp.float32)
                m_r = jnp.pad(mask_f, [(0, 0), (0, 0),
                                       (max(r, 0), max(-r, 0))])
                m_r = (m_r[..., r:r + T] if r > 0
                       else m_r[..., :T])
                scores.append(jnp.where(m_r > 0, s, -jnp.inf))
            s = jnp.stack(scores, axis=-1)
            smax = jnp.max(s, axis=-1, keepdims=True)
            smax = jnp.where(jnp.isfinite(smax), smax, 0.0)
            p = jnp.exp(s - smax)
            p = jnp.where(jnp.isfinite(s), p, 0.0)
            denom = jnp.sum(p, axis=-1, keepdims=True)
            p = p / jnp.maximum(denom, jnp.finfo(p.dtype).tiny)
            out = jnp.zeros(q.shape, jnp.float32)
            for i, r in enumerate(range(-halo, halo + 1)):
                if r == 0:
                    v_r = q
                elif r > 0:
                    pad = [(0, 0)] * 4
                    pad[-2] = (0, r)
                    v_r = jax.lax.slice_in_dim(
                        jnp.pad(q, pad), r, r + T, axis=-2)
                else:
                    pad = [(0, 0)] * 4
                    pad[-2] = (-r, 0)
                    v_r = jax.lax.slice_in_dim(
                        jnp.pad(q, pad), 0, T, axis=-2)
                out = out + p[..., i:i + 1] * v_r.astype(jnp.float32)
            return (out * m2[:, None, :, None].astype(out.dtype)).astype(
                q.dtype)
        cases["band_diag_dot"] = (band_diag_dot, (q,))

        # the fused masked-conv3+LN+ReLU used by the embd convs
        # (models/video_net.py:126, ops/fused_conv.py XLA composition)
        from decafnet_tpu.ops.fused_conv import fused_conv3_ln_act
        w3 = (rng.randn(C, C, 3).astype(np.float32) * 0.05)
        cases["conv3_ln_act"] = (
            lambda x: fused_conv3_ln_act(
                x, jnp.asarray(mask[:, 0, :]), jnp.asarray(w3), None,
                cast(g), cast(b), act="relu"), (x,))

        # 7 encoder blocks chained (1 stride-1 + 6 stride-2) in ONE jit:
        # the FPN composition minus embd convs / PE -- if this keeps the
        # single-block bf16 ratio, the regression is in the seams the
        # VideoTransformer adds; if it regresses, it's the chaining itself
        def chain(x):
            m = jnp.asarray(mask)
            x, m = enc.apply({"params": p_enc}, x, m)
            outs = []
            for _ in range(6):
                x, m = enc2.apply({"params": p_enc2}, x, m)
                outs.append(jnp.sum(x.astype(jnp.float32)))
            return sum(outs)
        cases["chain7"] = (chain, (x,))

        # seam bisection: which 2-block composition regresses in bf16?
        def chain2s1(x):
            m = jnp.asarray(mask)
            x, m = enc.apply({"params": p_enc}, x, m)
            x, m = enc.apply({"params": p_enc}, x, m)
            return jnp.sum(x.astype(jnp.float32))
        cases["chain2s1"] = (chain2s1, (x,))

        def chain2s2(x):
            m = jnp.asarray(mask)
            x, m = enc.apply({"params": p_enc}, x, m)
            x, m = enc2.apply({"params": p_enc2}, x, m)
            return jnp.sum(x.astype(jnp.float32)) + jnp.sum(
                m.astype(jnp.float32))
        cases["chain2s2"] = (chain2s2, (x,))

        # chain7 with the depthwise shift-FMA path disabled everywhere
        # (hypothesis: the deep blocks at T<=16384 dispatch to shift-FMA,
        # which is bf16-hostile -- 1.83x standalone -- while dw CONV is
        # bf16-friendly at 0.49x)
        def chain7_dwconv(x):
            en0, mt0 = blocks._SHIFT_DW_ENABLED, blocks._SHIFT_DW_MAX_T
            blocks.set_depthwise_shift(False, max_t=0)
            try:
                return chain(x)
            finally:
                blocks.set_depthwise_shift(en0, max_t=mt0)
        cases["chain7_dwconv"] = (chain7_dwconv, (x,))

        # the REAL VideoTransformer (embd convs + PE + 7 branch encoders):
        # must reproduce the stage profile's fpn ratio (7.9 -> 15.2 ms)
        from decafnet_tpu.models.video_net import make_video_net
        vnet = make_video_net(dict(
            name="transformer", in_dim=C, embd_dim=C, max_seq_len=T,
            n_heads=H, mha_win_size=5, arch=(2, 0, 7), use_abs_pe=True))
        p_v = vnet.init(jax.random.PRNGKey(0), x32[:1, :, :1024],
                        jnp.asarray(mask[:1, :, :1024]))["params"]
        cases["vidnet"] = (
            lambda x: sum(jnp.sum(f.astype(jnp.float32))
                          for f in vnet.apply({"params": p_v}, x,
                                              jnp.asarray(mask))[0]),
            (x,))
        return cases

    keep = args.cases.split(",") if args.cases else None
    report = {"T": T, "B": B, "iters": args.iters, "cases": {}}
    for dtype, tag in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
        for name, (fn, fargs) in make_cases(dtype).items():
            if keep and name not in keep:
                continue
            jitted = jax.jit(lambda *a, f=fn: jnp.sum(
                f(*a).astype(jnp.float32)))
            t = bench.timed(jitted, fargs, warmup=3, iters=args.iters)
            report["cases"].setdefault(name, {})[tag] = t * 1e3
            print(f"{name:11s} {tag:5s} {t * 1e3:8.3f} ms", flush=True)

    for name, r in report["cases"].items():
        if "f32" in r and "bf16" in r:
            r["bf16_over_f32"] = r["bf16"] / r["f32"]
            print(f"{name:11s} bf16/f32 = {r['bf16_over_f32']:.2f}x",
                  flush=True)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    json.dump(report, open(args.out, "w"), indent=1)
    print(f"-> {args.out}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
