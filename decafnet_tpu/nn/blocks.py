"""Primitive NN blocks as flax modules, channel-first like the reference.

Module and parameter names deliberately mirror the reference's torch module
tree (reference: libs/modeling/blocks.py) so that importing a released
PyTorch checkpoint is a mechanical key rename (see models/import_torch.py):

  torch "xxx.conv.weight" (O, I, K)  ->  flax params["xxx"]["conv"]["weight"]

Convolution kernels are therefore stored in the torch (out, in, k) layout and
consumed directly by ``lax.conv_general_dilated`` with ("NCH","OIH","NCH")
dimension numbers -- no transposition anywhere.

All feature tensors are (bs, c, t); masks are boolean (bs, 1, t).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.masked import (
    channel_layer_norm,
    masked_avg_pool1d,
    masked_max_pool1d,
    interpolate_nearest_1d,
)
from ..ops.local_attention import band_attention
from ..ops.fused_conv import fused_qkv_depthwise_ln


def torch_conv_uniform_init(key, shape, dtype=jnp.float32):
    """torch Conv1d default weight init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))
    with fan_in = in_channels/groups * kernel_size (shape is (O, I, K))."""
    fan_in = shape[1] * shape[2]
    bound = 1.0 / np.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def trunc_normal_init(std=0.02):
    def init(key, shape, dtype=jnp.float32):
        # truncated at +/- 2 std, matching the reference's trunc_normal_
        # (reference: libs/modeling/weight_init.py:8-62)
        return std * jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype)
    return init


# Depthwise-conv3 shift-multiply-add fast path (see Conv1d.__call__).
# Module-level so the full-program A/B (scripts/mad_eval_ab.py --axis dw)
# can flip it. The dispatch is shape-dependent: the round-4 full-program
# A/B measured shift-FMA +1.6% at NLQ scale (T=2304, V=8 x Q=8) and the
# general-conv lowering winning at MAD scale. Round 5 calibrated the MID
# lengths (scripts/results/threshold_calibration.json, Q=2 full decode,
# forced-everywhere variants): conv wins at every measured T >= 4608
# (4.17 vs 4.83 ms at T=4608, 6.97 vs 7.64 at 9216, 11.64 vs 13.32 at
# 16384), so the threshold moved 16384 -> 4096: shift-FMA below (the
# NLQ-class regime where it measured ahead), conv_general_dilated at/above.
#
# The dispatch is additionally DTYPE-aware (round 5): shift-FMA is
# f32-only. In bf16 the shifted-operand VPU loops are pathological (the
# standalone op measures 1.83x its f32 time at T=32768) while the general
# conv lowering is bf16-friendly (0.49x) -- the deep FPN levels dispatching
# to shift-FMA were the root cause of the round-4 "bf16 19% slower at MAD
# scale" regression (chain7 A/B: 10.79 ms with shift at T<=16384 vs
# 5.36 ms all-conv; scripts/results/bf16_micro_ab*.json).
_SHIFT_DW_ENABLED = True
_SHIFT_DW_MAX_T = 4096


def set_depthwise_shift(enabled, max_t=None):
    """Toggle the depthwise-conv3 shift-FMA fast path (A/B harness hook).
    ``max_t`` optionally overrides the length-dispatch threshold
    (None keeps the current one; pass float('inf') for always-on)."""
    global _SHIFT_DW_ENABLED, _SHIFT_DW_MAX_T
    _SHIFT_DW_ENABLED = bool(enabled)
    if max_t is not None:
        _SHIFT_DW_MAX_T = max_t


class Conv1d(nn.Module):
    """1D convolution storing weights in the torch (out, in, k) layout.

    Parameters are declared in ``setup`` (not compact) so parent modules can
    read ``.weight``/``.bias`` directly to feed fused kernels
    (ops/fused_conv.py) without changing the parameter tree."""
    in_channels: int
    out_channels: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    groups: int = 1
    dilation: int = 1
    use_bias: bool = True
    zero_bias: bool = True

    def setup(self):
        self.weight = self.param(
            "weight", torch_conv_uniform_init,
            (self.out_channels, self.in_channels // self.groups,
             self.kernel_size),
        )
        if self.use_bias:
            init = nn.initializers.zeros if self.zero_bias else (
                lambda k, s, d=jnp.float32: jax.random.uniform(
                    k, s, d,
                    -1.0 / np.sqrt(
                        self.in_channels // self.groups * self.kernel_size),
                    1.0 / np.sqrt(
                        self.in_channels // self.groups * self.kernel_size)))
            self.bias = self.param("bias", init, (self.out_channels,))
        else:
            self.bias = None

    def __call__(self, x):
        if (_SHIFT_DW_ENABLED and x.shape[-1] < _SHIFT_DW_MAX_T
                and x.dtype == jnp.float32
                and self.groups == self.in_channels == self.out_channels
                and self.kernel_size == 3 and self.padding == 1
                and self.dilation == 1):
            # depthwise conv3 as shift-multiply-add: XLA:TPU lowers
            # groups==channels convs through the general conv emitter (no
            # MXU, poor tiling); three shifted elementwise FMAs are pure
            # VPU work that fuses with neighboring ops. Same products
            # (cross-correlation taps), reassociation-level numerics.
            w = self.weight.astype(x.dtype)[:, 0, :]  # (C, 3) taps
            x_l = jnp.pad(x, ((0, 0), (0, 0), (1, 0)))[:, :, :-1]
            x_r = jnp.pad(x, ((0, 0), (0, 0), (0, 1)))[:, :, 1:]
            y = (w[None, :, 0, None] * x_l + w[None, :, 1, None] * x
                 + w[None, :, 2, None] * x_r)
            if self.stride > 1:
                y = y[:, :, :: self.stride]
        else:
            y = jax.lax.conv_general_dilated(
                x, self.weight.astype(x.dtype),
                window_strides=(self.stride,),
                padding=[(self.padding, self.padding)],
                rhs_dilation=(self.dilation,),
                dimension_numbers=("NCH", "OIH", "NCH"),
                feature_group_count=self.groups,
            )
        if self.bias is not None:
            y = y + self.bias.astype(y.dtype)[None, :, None]
        return y


class MaskedConv1D(nn.Module):
    """Convolution over zero-filled masked inputs; the mask is nearest-
    downsampled when stride > 1 (reference: libs/modeling/blocks.py:63-106)."""
    in_channels: int
    out_channels: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    groups: int = 1
    use_bias: bool = True

    def setup(self):
        self.conv = Conv1d(
            self.in_channels, self.out_channels, self.kernel_size,
            stride=self.stride, padding=self.padding, groups=self.groups,
            use_bias=self.use_bias,
        )

    def __call__(self, x, mask):
        if mask is None:
            mask = jnp.ones_like(x[:, :1], dtype=bool)
        x = self.conv(x * mask.astype(x.dtype))
        if self.stride > 1:
            mask = interpolate_nearest_1d(mask.astype(jnp.float32), x.shape[-1])
            mask = mask.astype(bool)
        return x, mask


class LayerNorm(nn.Module):
    """Channel-first LayerNorm over (bs, c, t)
    (reference: libs/modeling/blocks.py:109-131). Setup-style params so
    fused kernels can read ``.weight``/``.bias`` from the parent."""
    n_channels: int
    affine: bool = True
    eps: float = 1e-5

    def setup(self):
        if self.affine:
            self.weight = self.param("weight", nn.initializers.ones,
                                     (self.n_channels, 1))
            self.bias = self.param("bias", nn.initializers.zeros,
                                   (self.n_channels, 1))
        else:
            self.weight = None
            self.bias = None

    def __call__(self, x):
        w, b = self.weight, self.bias
        return channel_layer_norm(
            x, None if w is None else w.astype(x.dtype),
            None if b is None else b.astype(x.dtype), self.eps)


class TorchLayerNorm(nn.Module):
    """torch.nn.LayerNorm over the channel axis of (bs, c, t) tensors, as
    used by the TCN refiner after permuting to (bs, t, c)
    (reference: libs/modeling/tcn.py:33-37). Weights have shape (c,)."""
    n_channels: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        w = self.param("weight", nn.initializers.ones, (self.n_channels,))
        b = self.param("bias", nn.initializers.zeros, (self.n_channels,))
        return channel_layer_norm(x, w.astype(x.dtype)[:, None],
                                  b.astype(x.dtype)[:, None], self.eps)


class Scale(nn.Module):
    """Learnable scalar multiplier (reference: libs/modeling/blocks.py:653-667)."""
    init: float = 1.0

    @nn.compact
    def __call__(self, x):
        s = self.param("scale", lambda k, sh: jnp.full(sh, self.init, jnp.float32), ())
        return x * s.astype(x.dtype)


class LayerScale(nn.Module):
    """Per-channel residual scaling (init 1e-4) + stochastic depth
    (reference: libs/modeling/blocks.py:670-695)."""
    n_channels: int
    pdrop: float = 0.0
    init_scale: float = 1e-4

    @nn.compact
    def __call__(self, x, deterministic=True):
        s = self.param(
            "scale",
            lambda k, sh: jnp.full(sh, self.init_scale, jnp.float32),
            (1, self.n_channels, 1),
        )
        x = s.astype(x.dtype) * x
        if self.pdrop > 0.0 and not deterministic:
            keep = 1.0 - self.pdrop
            rng = self.make_rng("dropout")
            shape = (x.shape[0],) + (1,) * (x.ndim - 1)
            gate = jnp.floor(keep + jax.random.uniform(rng, shape, x.dtype))
            x = x / keep * gate
        return x


class MaskedMHA(nn.Module):
    """Multi-head attention with masking; global and banded local variants.

    Matches the reference numerics: the per-head scale 1/sqrt(sqrt(d)) is
    applied to BOTH q and k before the score matmul
    (reference: libs/modeling/blocks.py:179,363,379); key masking is a hard
    -inf fill in the global path and the banded-softmax semantics of
    ops.local_attention in the local path.
    """
    embd_dim: int
    q_dim: Optional[int] = None
    kv_dim: Optional[int] = None
    out_dim: Optional[int] = None
    n_heads: int = 4
    window_size: int = 0
    attn_pdrop: float = 0.0
    proj_pdrop: float = 0.0

    def setup(self):
        assert self.embd_dim % self.n_heads == 0
        q_dim = self.q_dim or self.embd_dim
        kv_dim = self.kv_dim or self.embd_dim
        out_dim = self.out_dim or q_dim
        self.query = Conv1d(q_dim, self.embd_dim, 1)
        self.key = Conv1d(kv_dim, self.embd_dim, 1)
        self.value = Conv1d(kv_dim, self.embd_dim, 1)
        self.proj = Conv1d(self.embd_dim, out_dim, 1)
        self.attn_drop = nn.Dropout(self.attn_pdrop)
        self.proj_drop = nn.Dropout(self.proj_pdrop)

    def __call__(self, q, k=None, v=None, kv_mask=None, deterministic=True):
        if k is None:
            k = q
        if v is None:
            v = k
        if kv_mask is None:
            kv_mask = jnp.ones_like(k[:, :1], dtype=bool)

        bs = q.shape[0]
        h = self.n_heads
        d = self.embd_dim // h
        # Python float (weak type): a numpy scalar here silently promoted
        # bf16 activations to f32, disabling the bf16 compute mode for the
        # entire FPN + heads downstream
        scale = float(1.0 / np.sqrt(np.sqrt(d)))

        qp = self.query(q)
        kp = self.key(k)
        vp = self.value(v)

        # (bs, c, t) -> (bs, h, t, d)
        def to_heads(x):
            return x.reshape(bs, h, d, x.shape[-1]).transpose(0, 1, 3, 2)

        qh = to_heads(qp) * scale
        kh = to_heads(kp) * scale
        vh = to_heads(vp)
        mask2d = kv_mask[:, 0, :]  # (bs, t_kv)

        if self.window_size > 0:
            out = band_attention(qh, kh, vh, mask2d, self.window_size)
        else:
            scores = jnp.einsum("bhid,bhjd->bhij", qh, kh,
                                preferred_element_type=jnp.float32)
            kv_valid = mask2d[:, None, None, :]
            scores = jnp.where(kv_valid, scores, -jnp.inf)
            # NaN-safe masked softmax: identical to softmax over the -inf
            # filled scores when >= 1 key is valid (exp(-inf) = 0), but
            # resolves fully-masked rows (padded query rows, which the
            # reference never sees) to zeros instead of NaN.
            smax = jnp.max(scores, axis=-1, keepdims=True)
            smax = jnp.where(jnp.isfinite(smax), smax, 0.0)
            attn = jnp.exp(scores - smax)
            attn = jnp.where(kv_valid, attn, 0.0)
            denom = jnp.sum(attn, axis=-1, keepdims=True)
            attn = attn / jnp.maximum(denom, jnp.finfo(attn.dtype).tiny)
            attn = self.attn_drop(attn, deterministic=deterministic)
            out = jnp.einsum("bhij,bhjd->bhid", attn.astype(vh.dtype), vh,
                             preferred_element_type=jnp.float32).astype(q.dtype)

        # (bs, h, t, d) -> (bs, c, t)
        out = out.transpose(0, 1, 3, 2).reshape(bs, h * d, -1)
        return self.proj_drop(self.proj(out), deterministic=deterministic)


class AttNPool1D(nn.Module):
    """Attention pooling that prepends a pooled summary token
    (reference: libs/modeling/blocks.py:396-411)."""
    embd_dim: int
    n_heads: int = 4

    def setup(self):
        self.attn = MaskedMHA(self.embd_dim, n_heads=self.n_heads)

    def __call__(self, x, mask, deterministic=True):
        x_mean = masked_avg_pool1d(x, mask)
        h = jnp.concatenate([x_mean, x], axis=-1)
        mask = jnp.concatenate([mask[..., :1], mask], axis=-1)
        pool = self.attn(h, kv_mask=mask, deterministic=deterministic)[..., :1]
        x = jnp.concatenate([pool, x], axis=-1)
        return x, mask


class ConvAttNLayer(nn.Module):
    """Optional depthwise convs (with per-branch LN) feeding self-attention
    (reference: libs/modeling/blocks.py:414-473). stride==0 disables convs;
    stride==2 downsamples queries (and the mask)."""
    embd_dim: int
    out_dim: Optional[int] = None
    stride: int = 1
    n_heads: int = 4
    window_size: int = 0
    attn_pdrop: float = 0.0
    proj_pdrop: float = 0.0

    def setup(self):
        self.use_conv = self.stride > 0
        if self.use_conv:
            assert self.stride == 1 or self.stride % 2 == 0
            mk = lambda: MaskedConv1D(
                self.embd_dim, self.embd_dim, 3, self.stride, 1,
                groups=self.embd_dim, use_bias=False)
            self.q_conv, self.k_conv, self.v_conv = mk(), mk(), mk()
            self.q_norm = LayerNorm(self.embd_dim)
            self.k_norm = LayerNorm(self.embd_dim)
            self.v_norm = LayerNorm(self.embd_dim)
        self.attn = MaskedMHA(
            self.embd_dim, out_dim=self.out_dim or self.embd_dim,
            n_heads=self.n_heads, window_size=self.window_size,
            attn_pdrop=self.attn_pdrop, proj_pdrop=self.proj_pdrop)

    def __call__(self, x, mask, deterministic=True):
        if self.use_conv:
            if self.stride == 1:
                # fused trio: x read once, three depthwise-conv3+LN outputs
                # (ops/fused_conv.py; Pallas on TPU at long T, identical
                # XLA composition otherwise)
                q, k, v = fused_qkv_depthwise_ln(
                    x, mask[:, 0, :],
                    (self.q_conv.conv.weight, self.k_conv.conv.weight,
                     self.v_conv.conv.weight),
                    (self.q_norm.weight, self.k_norm.weight,
                     self.v_norm.weight),
                    (self.q_norm.bias, self.k_norm.bias, self.v_norm.bias))
            else:
                k, _ = self.k_conv(x, mask)
                v, _ = self.v_conv(x, mask)
                q, mask = self.q_conv(x, mask)
                q = self.q_norm(q)
                k = self.k_norm(k)
                v = self.v_norm(v)
        else:
            q = k = v = x
        out = self.attn(q, k, v, mask, deterministic=deterministic)
        return out, mask


class ConvXAttNLayer(nn.Module):
    """Optional depthwise query conv feeding cross-attention
    (reference: libs/modeling/blocks.py:476-520)."""
    embd_dim: int
    kv_dim: int
    out_dim: Optional[int] = None
    stride: int = 1
    n_heads: int = 4
    attn_pdrop: float = 0.0
    proj_pdrop: float = 0.0

    def setup(self):
        self.use_conv = self.stride > 0
        if self.use_conv:
            assert self.stride == 1 or self.stride % 2 == 0
            self.q_conv = MaskedConv1D(
                self.embd_dim, self.embd_dim, 3, self.stride, 1,
                groups=self.embd_dim, use_bias=False)
            self.q_norm = LayerNorm(self.embd_dim)
        self.xattn = MaskedMHA(
            self.embd_dim, kv_dim=self.kv_dim,
            out_dim=self.out_dim or self.embd_dim, n_heads=self.n_heads,
            attn_pdrop=self.attn_pdrop, proj_pdrop=self.proj_pdrop)

    def __call__(self, q, q_mask, kv, kv_mask, deterministic=True):
        if self.use_conv:
            q, q_mask = self.q_conv(q, q_mask)
            q = self.q_norm(q)
        out = self.xattn(q, kv, None, kv_mask, deterministic=deterministic)
        return out, q_mask


class FFN(nn.Module):
    """Conv1x1 -> GELU -> Conv1x1 MLP (reference: libs/modeling/blocks.py:523-538)."""
    channels: int
    expansion: int = 4
    pdrop: float = 0.0

    def setup(self):
        self.fc = Conv1d(self.channels, self.channels * self.expansion, 1)
        self.proj = Conv1d(self.channels * self.expansion, self.channels, 1)
        self.dropout = nn.Dropout(self.pdrop)

    def __call__(self, x, deterministic=True):
        x = self.dropout(jax.nn.gelu(self.fc(x), approximate=False),
                         deterministic=deterministic)
        x = self.dropout(self.proj(x), deterministic=deterministic)
        return x


class TransformerEncoder(nn.Module):
    """Pre-LN transformer encoder: (optional depthwise conv ->) local or
    global self-attention -> FFN, with LayerScale'd residuals and a masked
    max-pool skip path when downsampling
    (reference: libs/modeling/blocks.py:541-591)."""
    embd_dim: int
    stride: int = 1
    n_heads: int = 4
    window_size: int = 0
    expansion: int = 4
    attn_pdrop: float = 0.0
    proj_pdrop: float = 0.0
    path_pdrop: float = 0.0

    def setup(self):
        self.attn = ConvAttNLayer(
            self.embd_dim, stride=self.stride, n_heads=self.n_heads,
            window_size=self.window_size, attn_pdrop=self.attn_pdrop,
            proj_pdrop=self.proj_pdrop)
        self.ln_attn = LayerNorm(self.embd_dim)
        self.drop_path_attn = LayerScale(self.embd_dim, self.path_pdrop)
        self.ffn = FFN(self.embd_dim, self.expansion, self.proj_pdrop)
        self.ln_ffn = LayerNorm(self.embd_dim)
        self.drop_path_ffn = LayerScale(self.embd_dim, self.path_pdrop)

    def __call__(self, x, mask, deterministic=True):
        if mask is None:
            mask = jnp.ones_like(x[:, :1], dtype=bool)
        x = x * mask.astype(x.dtype)

        if self.stride > 1:
            skip = masked_max_pool1d(x, mask, 3, self.stride)[0]
        else:
            skip = x
        h, mask = self.attn(self.ln_attn(x), mask, deterministic=deterministic)
        x = skip * mask.astype(x.dtype) + self.drop_path_attn(
            h, deterministic=deterministic)

        h = self.ffn(self.ln_ffn(x), deterministic=deterministic)
        h = h * mask.astype(x.dtype)
        x = x + self.drop_path_ffn(h, deterministic=deterministic)
        return x, mask


class TransformerDecoder(nn.Module):
    """Cross-attention decoder without self-attention. In 'adaln' mode the
    cross-attention emits 2x channels that modulate a parameter-free LN of
    the query as (scale, shift) (reference: libs/modeling/blocks.py:594-650)."""
    embd_dim: int
    kv_dim: int
    n_heads: int = 4
    expansion: int = 4
    attn_pdrop: float = 0.0
    proj_pdrop: float = 0.0
    path_pdrop: float = 0.0
    xattn_mode: str = "adaln"

    def setup(self):
        assert self.xattn_mode in ("affine", "adaln")
        self.xattn = ConvXAttNLayer(
            self.embd_dim, self.kv_dim, self.embd_dim * 2,
            stride=1, n_heads=self.n_heads,
            attn_pdrop=self.attn_pdrop, proj_pdrop=self.proj_pdrop)
        self.ln_xattn_q = LayerNorm(self.embd_dim)
        self.ln_xattn_kv = LayerNorm(self.kv_dim)
        if self.xattn_mode == "adaln":
            self.adaln = LayerNorm(self.embd_dim, affine=False)
        self.ffn = FFN(self.embd_dim, self.expansion, self.proj_pdrop)
        self.ln_ffn = LayerNorm(self.embd_dim)
        self.drop_path_ffn = LayerScale(self.embd_dim, self.path_pdrop)

    def __call__(self, q, q_mask, kv, kv_mask, deterministic=True):
        if q_mask is None:
            q_mask = jnp.ones_like(q[:, :1], dtype=bool)
        q = q * q_mask.astype(q.dtype)

        h, q_mask = self.xattn(
            self.ln_xattn_q(q), q_mask, self.ln_xattn_kv(kv), kv_mask,
            deterministic=deterministic)
        q = q * q_mask.astype(q.dtype)
        if self.xattn_mode == "adaln":
            q = self.adaln(q)
        scale, shift = jnp.split(h, 2, axis=1)
        q = q * scale + shift

        h = self.ffn(self.ln_ffn(q), deterministic=deterministic)
        h = h * q_mask.astype(q.dtype)
        q = q + self.drop_path_ffn(h, deterministic=deterministic)
        return q, q_mask
