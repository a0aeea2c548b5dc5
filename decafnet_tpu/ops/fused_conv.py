"""Fused masked conv3 + channel LayerNorm + activation (Pallas TPU kernel).

The reference's hot per-position stacks are ``MaskedConv1D(k=3) ->
LayerNorm(channels) -> ReLU`` (heads/TCN trunks, embedding convs --
reference: libs/modeling/blocks.py:63-131, libs/modeling/head.py:18-108).
Composed as separate XLA ops each stage round-trips (B, C, T) activations
through HBM several times (conv out -> LN stats -> LN out -> act), which is
exactly why the long-sequence pipeline measured VPU/HBM-bound at ~17%
effective MXU (round-2 PARITY). This kernel computes the whole stack in one
VMEM-resident pass:

  y = act( LN_c( conv3(x * mask) + bias ) * ln_w + ln_b )

Kernel shape rules (this Mosaic toolchain crashes on mid-dimension
dynamic-slice DMAs, in-kernel concatenate, rank-reducing scalar-index DMAs
and program_id-derived broadcasts -- CLAUDE.md):

  * the time axis is cut into ``chunk``-column tiles; the conv halo (1
    column) is assembled from regular prev/current/next BlockSpec tiles of
    the SAME array with clamped neighbor index maps (the band-attention
    3-block trick), combined via static one-hot edge masks -- no dynamic
    slices, no concatenate;
  * zero padding at sequence edges and the validity mask enter through
    pre-shifted mask ARRAYS (mask[t-1], mask[t], mask[t+1]) so no
    program_id arithmetic is needed;
  * column shifts inside a tile use jnp.roll along the lane axis (a TPU
    rotate); the wrapped-around column is replaced by the neighbor tile's
    edge column selected by a static one-hot.

The kernel is wrapped in a ``custom_vjp`` whose backward recomputes
through the XLA composition (rematerialization), so it is safe under
``jax.grad`` -- same pattern as ops/local_attention.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

DEFAULT_CHUNK = 512


def _next_multiple(x, m):
    return (x + m - 1) // m * m


def conv3_ln_act_xla(x, mask, w, bias, ln_w, ln_b, act="relu", eps=1e-5):
    """XLA reference composition with exact module semantics.

    Args:
      x: (B, C_in, T) float32.  mask: (B, T) bool (True = valid).
      w: (C_out, C_in, 3) conv kernel (torch layout).
      bias: (C_out,) or None.
      ln_w, ln_b: (C_out,) or (C_out, 1) affine LayerNorm params (None for
        no affine).
      act: 'relu' | 'none'.
    """
    from .masked import channel_layer_norm

    xm = x * mask[:, None, :].astype(x.dtype)
    y = jax.lax.conv_general_dilated(
        xm, w.astype(x.dtype), window_strides=(1,), padding=[(1, 1)],
        dimension_numbers=("NCH", "OIH", "NCH"))
    if bias is not None:
        y = y + bias.astype(y.dtype)[None, :, None]
    # channel LN via the length-dispatched MXU statistics path (round 5)
    if ln_w is not None:
        yn = channel_layer_norm(y, ln_w, ln_b, eps)
    else:
        yn = channel_layer_norm(y, None, None, eps)
    if act == "relu":
        yn = jax.nn.relu(yn)
    return yn


def _conv3_ln_act_pallas_impl(x, mask, w, bias, ln_w, ln_b, act="relu",
                              eps=1e-5, chunk=DEFAULT_CHUNK,
                              interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ln_w = None if ln_w is None else ln_w.reshape(-1)
    ln_b = None if ln_b is None else ln_b.reshape(-1)
    B, C_in, T = x.shape
    C_out = w.shape[0]
    c = min(chunk, _next_multiple(T, 128))
    Tp = _next_multiple(T, c)
    nc = Tp // c

    pad_t = Tp - T
    if pad_t:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, pad_t)))
        mask = jnp.pad(mask, ((0, 0), (0, pad_t)))

    mask_f = mask.astype(jnp.float32)[:, None, :]           # (B, 1, Tp)
    # pre-shifted masks: m_l[t] = mask[t-1] (0 at t=0), m_r[t] = mask[t+1]
    m_l = jnp.pad(mask_f, ((0, 0), (0, 0), (1, 0)))[:, :, :Tp]
    m_r = jnp.pad(mask_f, ((0, 0), (0, 0), (0, 1)))[:, :, 1:]

    # conv taps as (C_in, C_out) matmul operands
    w0 = w[:, :, 0].T.astype(jnp.float32)
    w1 = w[:, :, 1].T.astype(jnp.float32)
    w2 = w[:, :, 2].T.astype(jnp.float32)
    b_col = (jnp.zeros((C_out, 1), jnp.float32) if bias is None
             else bias.astype(jnp.float32)[:, None])
    lw_col = (jnp.ones((C_out, 1), jnp.float32) if ln_w is None
              else ln_w.astype(jnp.float32)[:, None])
    lb_col = (jnp.zeros((C_out, 1), jnp.float32) if ln_b is None
              else ln_b.astype(jnp.float32)[:, None])

    # static one-hot edge columns (1, c)
    first_col = np.zeros((1, c), np.float32)
    first_col[0, 0] = 1.0
    last_col = np.zeros((1, c), np.float32)
    last_col[0, c - 1] = 1.0
    first_col = jnp.asarray(first_col)
    last_col = jnp.asarray(last_col)

    def prev_ix(b, n):
        return (b, 0, jnp.maximum(n - 1, 0))

    def cur_ix(b, n):
        return (b, 0, n)

    def next_ix(b, n):
        return (b, 0, jnp.minimum(n + 1, nc - 1))

    x_spec = lambda ix: pl.BlockSpec((1, C_in, c), ix,
                                     memory_space=pltpu.VMEM)
    m_spec = lambda ix: pl.BlockSpec((1, 1, c), ix,
                                     memory_space=pltpu.VMEM)
    rep2 = lambda shape: pl.BlockSpec(shape, lambda b, n: (0, 0),
                                      memory_space=pltpu.VMEM)
    relu = act == "relu"

    def kernel(xp, xc, xn, ml, mc, mr, w0r, w1r, w2r, br, lwr, lbr,
               fc, lc, o_ref):
        xc_t = xc[0].astype(jnp.float32)                    # (C_in, c)
        # left-shifted columns: x[:, t-1]; wrapped col 0 <- prev tile edge
        x_l = jnp.roll(xc_t, 1, axis=1) * (1.0 - fc[:]) \
            + jnp.roll(xp[0].astype(jnp.float32), 1, axis=1) * fc[:]
        x_r = jnp.roll(xc_t, -1, axis=1) * (1.0 - lc[:]) \
            + jnp.roll(xn[0].astype(jnp.float32), -1, axis=1) * lc[:]
        # masked taps (zero padding + validity in one multiply)
        x_l = x_l * ml[0]
        x_m = xc_t * mc[0]
        x_r = x_r * mr[0]

        # precision pinned: Mosaic rejects a global default of HIGH, and
        # the kernel math is f32 regardless
        hi = jax.lax.Precision.HIGHEST
        y = jax.lax.dot_general(w0r[:], x_l, (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32,
                                precision=hi)
        y += jax.lax.dot_general(w1r[:], x_m, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32,
                                 precision=hi)
        y += jax.lax.dot_general(w2r[:], x_r, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32,
                                 precision=hi)
        y += br[:]                                          # (C_out, c)

        mu = jnp.mean(y, axis=0, keepdims=True)
        ycen = y - mu
        sig = jnp.mean(ycen * ycen, axis=0, keepdims=True)
        yn = ycen * jax.lax.rsqrt(sig + eps)
        yn = yn * lwr[:] + lbr[:]
        if relu:
            yn = jnp.maximum(yn, 0.0)
        o_ref[0] = yn.astype(o_ref.dtype)

    out = pl.pallas_call(
        kernel,
        grid=(B, nc),
        in_specs=[
            x_spec(prev_ix), x_spec(cur_ix), x_spec(next_ix),
            m_spec(cur_ix), m_spec(cur_ix), m_spec(cur_ix),
            rep2((C_in, C_out)), rep2((C_in, C_out)), rep2((C_in, C_out)),
            rep2((C_out, 1)), rep2((C_out, 1)), rep2((C_out, 1)),
            rep2((1, c)), rep2((1, c)),
        ],
        out_specs=pl.BlockSpec((1, C_out, c), cur_ix,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, C_out, Tp), x.dtype),
        interpret=interpret,
    )(x, x, x, m_l, mask_f, m_r, w0, w1, w2, b_col, lw_col, lb_col,
      first_col, last_col)
    return out[:, :, :T]


@partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9))
def _conv3_ln_act_vjp(x, mask, w, bias, ln_w, ln_b, act, eps, chunk,
                      interpret):
    return _conv3_ln_act_pallas_impl(x, mask, w, bias, ln_w, ln_b, act=act,
                                     eps=eps, chunk=chunk,
                                     interpret=interpret)


def _fused_fwd(x, mask, w, bias, ln_w, ln_b, act, eps, chunk, interpret):
    out = _conv3_ln_act_pallas_impl(x, mask, w, bias, ln_w, ln_b, act=act,
                                    eps=eps, chunk=chunk,
                                    interpret=interpret)
    return out, (x, mask, w, bias, ln_w, ln_b)


def _fused_bwd(act, eps, chunk, interpret, res, g):
    x, mask, w, bias, ln_w, ln_b = res
    diff = [t for t in (x, w, bias, ln_w, ln_b) if t is not None]

    def f(x_, w_, bias_, ln_w_, ln_b_):
        return conv3_ln_act_xla(x_, mask, w_, bias_, ln_w_, ln_b_,
                                act=act, eps=eps)

    # wrap optional args: None stays None with a None cotangent
    def f_wrap(*args):
        it = iter(args)
        vals = [next(it) if t is not None else None
                for t in (x, w, bias, ln_w, ln_b)]
        return f(*vals)

    _, vjp = jax.vjp(f_wrap, *diff)
    grads = iter(vjp(g))
    out = []
    for t in (x, w, bias, ln_w, ln_b):
        out.append(next(grads) if t is not None else None)
    dx, dw, dbias, dln_w, dln_b = out
    dmask = np.zeros(mask.shape, jax.dtypes.float0)
    return dx, dmask, dw, dbias, dln_w, dln_b


_conv3_ln_act_vjp.defvjp(_fused_fwd, _fused_bwd)


def conv3_ln_act_pallas(x, mask, w, bias, ln_w, ln_b, act="relu", eps=1e-5,
                        chunk=DEFAULT_CHUNK, interpret=False):
    """Differentiable fused kernel (Pallas forward, XLA-recompute VJP)."""
    return _conv3_ln_act_vjp(x, mask, w, bias, ln_w, ln_b, act, float(eps),
                             int(chunk), bool(interpret))


# ---------------------------------------------------------------------------
# depthwise q/k/v trio: three depthwise conv3 + three channel LNs reading the
# SAME input (ConvAttNLayer, reference: libs/modeling/blocks.py:414-473).
# Fused: x is read from HBM once, three outputs are written -- vs 3 reads +
# 3 conv outs + 3 LN re-reads unfused.
# ---------------------------------------------------------------------------


def qkv_depthwise_ln_xla(x, mask, ws, ln_ws, ln_bs, eps=1e-5):
    """XLA reference: for each branch i, LN(depthwise_conv3(x * mask)).

    Args:
      x: (B, C, T); mask (B, T) bool.
      ws: three (C, 1, 3) depthwise kernels (torch layout, groups=C).
      ln_ws, ln_bs: three (C,)/(C, 1) affine LN params.
    Returns three (B, C, T) arrays (q, k, v order of ``ws``).
    """
    from ..nn import blocks as _blocks
    from .masked import channel_layer_norm

    xm = x * mask[:, None, :].astype(x.dtype)
    # depthwise conv3 lowering follows the Conv1d dispatch
    # (nn/blocks.py:Conv1d): shift-multiply-add (shifted tensors built ONCE
    # and shared by all three branches -- x read once) for f32 below the
    # length threshold; conv_general_dilated otherwise (bf16-friendly, and
    # the long-T winner -- the hardcoded shift here was part of the round-4
    # bf16 MAD regression, scripts/results/bf16_micro_ab*.json).
    use_shift = (_blocks._SHIFT_DW_ENABLED
                 and x.shape[-1] < _blocks._SHIFT_DW_MAX_T
                 and x.dtype == jnp.float32)
    if use_shift:
        x_l = jnp.pad(xm, ((0, 0), (0, 0), (1, 0)))[:, :, :-1]
        x_r = jnp.pad(xm, ((0, 0), (0, 0), (0, 1)))[:, :, 1:]
    C = x.shape[-2]
    outs = []
    for w, lw, lb in zip(ws, ln_ws, ln_bs):
        if use_shift:
            t = w.astype(x.dtype)[:, 0, :]                # (C, 3) taps
            y = (t[None, :, 0, None] * x_l + t[None, :, 1, None] * xm
                 + t[None, :, 2, None] * x_r)
        else:
            y = jax.lax.conv_general_dilated(
                xm, w.astype(x.dtype), (1,), [(1, 1)],
                feature_group_count=C,
                dimension_numbers=("NCH", "OIH", "NCH"))
        # channel LN with the length-dispatched MXU statistics path
        outs.append(channel_layer_norm(y, lw, lb, eps))
    return tuple(outs)


def _qkv_depthwise_ln_pallas_impl(x, mask, ws, ln_ws, ln_bs, eps=1e-5,
                                  chunk=DEFAULT_CHUNK, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, C, T = x.shape
    c = min(chunk, _next_multiple(T, 128))
    Tp = _next_multiple(T, c)
    nc = Tp // c
    pad_t = Tp - T
    if pad_t:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, pad_t)))
        mask = jnp.pad(mask, ((0, 0), (0, pad_t)))

    mask_f = mask.astype(jnp.float32)[:, None, :]
    m_l = jnp.pad(mask_f, ((0, 0), (0, 0), (1, 0)))[:, :, :Tp]
    m_r = jnp.pad(mask_f, ((0, 0), (0, 0), (0, 1)))[:, :, 1:]

    # per-channel taps as (C, 1) columns (broadcast over lanes)
    taps = []
    for w in ws:
        wc = w.reshape(C, 3).astype(jnp.float32)
        taps.extend([wc[:, 0:1], wc[:, 1:2], wc[:, 2:3]])
    lns = []
    for lw, lb in zip(ln_ws, ln_bs):
        lns.extend([lw.reshape(C, 1).astype(jnp.float32),
                    lb.reshape(C, 1).astype(jnp.float32)])

    first_col = np.zeros((1, c), np.float32)
    first_col[0, 0] = 1.0
    last_col = np.zeros((1, c), np.float32)
    last_col[0, c - 1] = 1.0
    first_col = jnp.asarray(first_col)
    last_col = jnp.asarray(last_col)

    def prev_ix(b, n):
        return (b, 0, jnp.maximum(n - 1, 0))

    def cur_ix(b, n):
        return (b, 0, n)

    def next_ix(b, n):
        return (b, 0, jnp.minimum(n + 1, nc - 1))

    x_spec = lambda ix: pl.BlockSpec((1, C, c), ix, memory_space=pltpu.VMEM)
    m_spec = pl.BlockSpec((1, 1, c), cur_ix, memory_space=pltpu.VMEM)
    colw = pl.BlockSpec((C, 1), lambda b, n: (0, 0),
                        memory_space=pltpu.VMEM)
    oh = pl.BlockSpec((1, c), lambda b, n: (0, 0), memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, C, c), cur_ix, memory_space=pltpu.VMEM)

    def kernel(xp, xc, xn, ml, mc, mr,
               q0, q1, q2, k0, k1, k2, v0, v1, v2,
               lwq, lbq, lwk, lbk, lwv, lbv,
               fc, lc, oq, ok, ov):
        xc_t = xc[0].astype(jnp.float32)
        x_l = jnp.roll(xc_t, 1, axis=1) * (1.0 - fc[:]) \
            + jnp.roll(xp[0].astype(jnp.float32), 1, axis=1) * fc[:]
        x_r = jnp.roll(xc_t, -1, axis=1) * (1.0 - lc[:]) \
            + jnp.roll(xn[0].astype(jnp.float32), -1, axis=1) * lc[:]
        x_l = x_l * ml[0]
        x_m = xc_t * mc[0]
        x_r = x_r * mr[0]

        for t0, t1, t2, lw, lb, o_ref in (
                (q0, q1, q2, lwq, lbq, oq),
                (k0, k1, k2, lwk, lbk, ok),
                (v0, v1, v2, lwv, lbv, ov)):
            y = t0[:] * x_l + t1[:] * x_m + t2[:] * x_r    # (C, c)
            mu = jnp.mean(y, axis=0, keepdims=True)
            yc_ = y - mu
            sig = jnp.mean(yc_ * yc_, axis=0, keepdims=True)
            yn = yc_ * jax.lax.rsqrt(sig + eps)
            yn = yn * lw[:] + lb[:]
            o_ref[0] = yn.astype(o_ref.dtype)

    outs = pl.pallas_call(
        kernel,
        grid=(B, nc),
        in_specs=[x_spec(prev_ix), x_spec(cur_ix), x_spec(next_ix),
                  m_spec, m_spec, m_spec]
                 + [colw] * 9 + [colw] * 6 + [oh, oh],
        out_specs=[out_spec, out_spec, out_spec],
        out_shape=[jax.ShapeDtypeStruct((B, C, Tp), x.dtype)] * 3,
        interpret=interpret,
    )(x, x, x, m_l, mask_f, m_r, *taps, *lns, first_col, last_col)
    return tuple(o[:, :, :T] for o in outs)


@partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _qkv_trio_vjp(x, mask, ws, ln_ws, ln_bs, eps, chunk, interpret):
    return _qkv_depthwise_ln_pallas_impl(x, mask, ws, ln_ws, ln_bs,
                                         eps=eps, chunk=chunk,
                                         interpret=interpret)


def _qkv_fwd(x, mask, ws, ln_ws, ln_bs, eps, chunk, interpret):
    out = _qkv_depthwise_ln_pallas_impl(x, mask, ws, ln_ws, ln_bs, eps=eps,
                                        chunk=chunk, interpret=interpret)
    return out, (x, mask, ws, ln_ws, ln_bs)


def _qkv_bwd(eps, chunk, interpret, res, g):
    x, mask, ws, ln_ws, ln_bs = res
    _, vjp = jax.vjp(
        lambda x_, ws_, lw_, lb_: qkv_depthwise_ln_xla(x_, mask, ws_, lw_,
                                                       lb_, eps=eps),
        x, ws, ln_ws, ln_bs)
    dx, dws, dlw, dlb = vjp(g)
    dmask = np.zeros(mask.shape, jax.dtypes.float0)
    return dx, dmask, dws, dlw, dlb


_qkv_trio_vjp.defvjp(_qkv_fwd, _qkv_bwd)


def qkv_depthwise_ln_pallas(x, mask, ws, ln_ws, ln_bs, eps=1e-5,
                            chunk=DEFAULT_CHUNK, interpret=False):
    """Differentiable fused q/k/v trio (Pallas fwd, XLA-recompute VJP)."""
    return _qkv_trio_vjp(x, mask, tuple(ws), tuple(ln_ws), tuple(ln_bs),
                         float(eps), int(chunk), bool(interpret))


def fused_qkv_depthwise_ln(x, mask, ws, ln_ws, ln_bs, eps=1e-5):
    """Dispatching entry point for the ConvAttNLayer q/k/v trio."""
    use_pallas = (_FUSED_ENABLED
                  and jax.default_backend() == "tpu"
                  and x.dtype == jnp.float32
                  and x.shape[-1] >= PALLAS_MIN_T)
    if use_pallas:
        return qkv_depthwise_ln_pallas(x, mask, ws, ln_ws, ln_bs, eps=eps)
    return qkv_depthwise_ln_xla(x, mask, ws, ln_ws, ln_bs, eps=eps)


# dispatch: Pallas needs a TPU backend, fp32 tensors and a long-enough time
# axis to amortize kernel launch; everything else takes the XLA composition.
# The threshold matches band attention's (MAD-scale sequences): at NLQ scale
# the pipeline is MXU-FLOP-bound, the fused kernels buy nothing, and each
# Mosaic kernel instance adds minutes of (one-time, cached) compile over the
# axon tunnel.
PALLAS_MIN_T = 8192
# Default OFF (round-3 A/B on the chip): after the diagonal band-attention
# rework, the full MAD-scale decode measures 31.7 ms with the XLA
# composition vs 33.4 ms with the Pallas kernels -- each Pallas call is a
# fusion BARRIER, so neighboring elementwise work (PE adds, residuals,
# mask multiplies) that XLA folds into the conv cluster must round-trip
# HBM. The kernels remain as a validated alternate backend
# (set_fused_conv(True); bench.py re-validates them on-chip every run).
_FUSED_ENABLED = False


def set_fused_conv(enabled):
    global _FUSED_ENABLED
    _FUSED_ENABLED = bool(enabled)


def fused_conv3_ln_act(x, mask, w, bias, ln_w, ln_b, act="relu", eps=1e-5):
    """Dispatching entry point used by the model code.

    ``mask`` is (B, T) bool. Falls back to the XLA composition off-TPU, in
    non-f32 compute, or for short sequences.
    """
    use_pallas = (_FUSED_ENABLED
                  and jax.default_backend() == "tpu"
                  and x.dtype == jnp.float32
                  and x.shape[-1] >= PALLAS_MIN_T)
    if use_pallas:
        return conv3_ln_act_pallas(x, mask, w, bias, ln_w, ln_b, act=act,
                                   eps=eps)
    return conv3_ln_act_xla(x, mask, w, bias, ln_w, ln_b, act=act, eps=eps)
