"""Classification / regression heads shared across FPN levels
(reference: libs/modeling/head.py)."""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..nn.blocks import MaskedConv1D, LayerNorm, Scale, Conv1d
from ..ops.fused_conv import fused_conv3_ln_act


class _PriorBiasConv1d(Conv1d):
    """Conv1d whose bias initializes to -log((1-p)/p) for a positive-class
    prior p (reference: libs/modeling/head.py:45-51)."""
    prior_prob: float = 0.0

    def setup(self):
        self.weight = self.param(
            "weight",
            lambda k, s: jax.random.uniform(
                k, s, jnp.float32,
                -1.0 / np.sqrt(s[1] * s[2]), 1.0 / np.sqrt(s[1] * s[2])),
            (self.out_channels, self.in_channels // self.groups,
             self.kernel_size))
        bias_init = 0.0
        if self.prior_prob > 0:
            bias_init = -float(np.log((1 - self.prior_prob) / self.prior_prob))
        self.bias = self.param(
            "bias", lambda k, s: jnp.full(s, bias_init, jnp.float32),
            (self.out_channels,))


class _MaskedPriorConv(nn.Module):
    in_channels: int
    prior_prob: float = 0.0

    def setup(self):
        self.conv = _PriorBiasConv1d(self.in_channels, 1, 3, 1, 1,
                                     prior_prob=self.prior_prob)

    def __call__(self, x, mask):
        return self.conv(x * mask.astype(x.dtype)), mask


class ClsHead(nn.Module):
    """n_layers of masked conv(k3)+LN+ReLU then a 1-logit conv, looped over
    FPN levels with shared weights (reference: libs/modeling/head.py:18-64)."""
    embd_dim: int
    n_layers: int = 2
    prior_prob: float = 0.0

    def setup(self):
        self.convs = [
            MaskedConv1D(self.embd_dim, self.embd_dim, 3, 1, 1, use_bias=False)
            for _ in range(self.n_layers)
        ]
        self.norms = [LayerNorm(self.embd_dim) for _ in range(self.n_layers)]
        self.cls_head = _MaskedPriorConv(self.embd_dim, self.prior_prob)

    def __call__(self, fpn, fpn_masks):
        out_logits, out_masks = (), ()
        for x, mask in zip(fpn, fpn_masks):
            for conv, norm in zip(self.convs, self.norms):
                # single fused masked-conv3+LN+ReLU pass (Pallas on TPU at
                # long T, XLA composition otherwise); numerics identical to
                # conv -> norm -> relu
                x = fused_conv3_ln_act(
                    x, mask[:, 0, :], conv.conv.weight, conv.conv.bias,
                    norm.weight, norm.bias, act="relu")
            logits, _ = self.cls_head(x, mask)
            out_logits += (logits[:, 0, :],)
            out_masks += (mask[:, 0, :],)
        return out_logits, out_masks


class RegHead(nn.Module):
    """Same trunk emitting 2 offsets through a per-level learnable Scale and
    a ReLU (reference: libs/modeling/head.py:67-108).

    NOTE: offsets are returned CHANNEL-FIRST (bs, 2, p), not the reference's
    (bs, p, 2) -- a trailing dim of 2 is a pathological TPU layout (the minor
    dimension pads to 128 lanes), and keeping p minor makes the downstream
    decode/losses free. Consumers index [:, 0] / [:, 1].
    """
    embd_dim: int
    num_fpn_levels: int
    n_layers: int = 2

    def setup(self):
        self.convs = [
            MaskedConv1D(self.embd_dim, self.embd_dim, 3, 1, 1, use_bias=False)
            for _ in range(self.n_layers)
        ]
        self.norms = [LayerNorm(self.embd_dim) for _ in range(self.n_layers)]
        self.reg_head = MaskedConv1D(self.embd_dim, 2, 3, 1, 1)
        self.scales = [Scale() for _ in range(self.num_fpn_levels)]

    def __call__(self, fpn, fpn_masks):
        out_offsets, out_masks = (), ()
        for i, (x, mask) in enumerate(zip(fpn, fpn_masks)):
            for conv, norm in zip(self.convs, self.norms):
                x = fused_conv3_ln_act(
                    x, mask[:, 0, :], conv.conv.weight, conv.conv.bias,
                    norm.weight, norm.bias, act="relu")
            offsets, _ = self.reg_head(x, mask)
            offsets = jax.nn.relu(self.scales[i](offsets))   # (bs, 2, p)
            out_offsets += (offsets,)
            out_masks += (mask[:, 0, :],)
        return out_offsets, out_masks


HEADS = {"cls": ClsHead, "reg": RegHead}


# ---------------------------------------------------------------------------
# Dual-head fusion: when a ClsHead and a RegHead consume the SAME fpn (the
# iterative model's cls_head2/reg_head pair over new_fpn, and the early/late
# variants' cls_head/reg_head pair), their structurally-identical trunks are
# applied as ONE pass over the input: layer-1 convs concatenate along output
# channels (the (B, C, T) level tensor is read once instead of twice), deeper
# layers run as a 2-group conv over the stacked (B, 2C, T) stream, LN
# statistics are computed per stream, and the two final 1/2-channel convs
# merge into a single block-diagonal conv. Every dot product is unchanged --
# numerics match the separate heads to fp reassociation (tested in
# tests/test_dual_head.py).
#
# Default OFF after the on-chip A/B (MAD scale, T=32768 full decode):
# dual 36.08 ms vs separate 31.04 ms -- the deeper layers' groups=2 conv
# hits XLA:TPU's weak grouped-conv emitter (the same pathology that makes
# groups==channels depthwise convs lower badly, nn/blocks.py), costing more
# than the saved shared-input reads. The CPU cost model's ~2% bytes saving
# did not survive contact with the real lowering. The path remains a
# validated opt-in (`set_dual_head(True)`; equivalence + gradient tests in
# tests/test_dual_head.py) for backends where grouped convs lower well.
# ---------------------------------------------------------------------------
_DUAL_ENABLED = False


def set_dual_head(enabled):
    """Test/A-B hook: force the per-head (separate) path when False."""
    global _DUAL_ENABLED
    _DUAL_ENABLED = bool(enabled)


def _dual_ln_relu(y, w_a, b_a, w_b, b_b, eps):
    """Per-stream channel LayerNorm + ReLU over a stacked (B, 2C, T) tensor.

    Matches ops/fused_conv.py:conv3_ln_act_xla's LN semantics (fp32
    statistics, biased variance) applied independently to each C-channel
    stream."""
    B, C2, T = y.shape
    C = C2 // 2
    yf = y.astype(jnp.float32).reshape(B, 2, C, T)
    mu = jnp.mean(yf, axis=2, keepdims=True)
    yc = yf - mu
    sigma = jnp.mean(jnp.square(yc), axis=2, keepdims=True)
    yn = yc * jax.lax.rsqrt(sigma + eps)
    w = jnp.stack([w_a.reshape(C), w_b.reshape(C)]).astype(jnp.float32)
    b = jnp.stack([b_a.reshape(C), b_b.reshape(C)]).astype(jnp.float32)
    yn = yn * w[None, :, :, None] + b[None, :, :, None]
    return jax.nn.relu(yn.astype(y.dtype).reshape(B, C2, T))


def _conv1d(x, w, groups=1):
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=(1,), padding=[(1, 1)],
        dimension_numbers=("NCH", "OIH", "NCH"), feature_group_count=groups)


def dual_head_applicable(cls_head, reg_head):
    from ..ops import fused_conv
    return (_DUAL_ENABLED
            and not fused_conv._FUSED_ENABLED  # opt-in Pallas heads win
            and isinstance(cls_head, ClsHead)
            and isinstance(reg_head, RegHead)
            and cls_head.n_layers == reg_head.n_layers
            and cls_head.embd_dim == reg_head.embd_dim
            and cls_head.n_layers >= 1)


def dual_head_apply(cls_head, reg_head, fpn, fpn_masks):
    """Apply a ClsHead and a RegHead that share their input levels, reading
    each level once. Returns (out_logits, out_offsets, out_masks) with the
    exact contract of ``cls_head(fpn)`` + ``reg_head(fpn)``."""
    eps_c = cls_head.norms[0].eps
    eps_r = reg_head.norms[0].eps
    assert eps_c == eps_r, "dual head requires matching LN eps"
    C = cls_head.embd_dim

    # trace-time weight stacking (folds into the executable; the params
    # stay the separate per-head tensors, so checkpoints/import/export are
    # unchanged)
    Ws = [jnp.concatenate([c.conv.weight, r.conv.weight], axis=0)
          for c, r in zip(cls_head.convs, reg_head.convs)]
    LNs = [(c.weight, c.bias, r.weight, r.bias)
           for c, r in zip(cls_head.norms, reg_head.norms)]
    Wc = cls_head.cls_head.conv.weight               # (1, C, 3)
    Wr = reg_head.reg_head.conv.weight               # (2, C, 3)
    Wf = jnp.concatenate([
        jnp.concatenate([Wc, jnp.zeros_like(Wc)], axis=1),
        jnp.concatenate([jnp.zeros_like(Wr), Wr], axis=1)], axis=0)
    bf = jnp.concatenate([cls_head.cls_head.conv.bias,
                          reg_head.reg_head.conv.bias])

    out_logits, out_offsets, out_masks = (), (), ()
    for i, (x, mask) in enumerate(zip(fpn, fpn_masks)):
        mf = mask.astype(x.dtype)                    # (B, 1, T)
        y = _conv1d(x * mf, Ws[0], groups=1)         # (B, 2C, T), x read once
        y = _dual_ln_relu(y, *LNs[0], eps=eps_c)
        for Wi, ln in zip(Ws[1:], LNs[1:]):
            y = _conv1d(y * mf, Wi, groups=2)
            y = _dual_ln_relu(y, *ln, eps=eps_c)
        out = _conv1d(y * mf, Wf) + bf.astype(y.dtype)[None, :, None]
        offsets = jax.nn.relu(reg_head.scales[i](out[:, 1:3, :]))
        out_logits += (out[:, 0, :],)
        out_offsets += (offsets,)
        out_masks += (mask[:, 0, :],)
    return out_logits, out_offsets, out_masks


def make_head(opt):
    """Registry constructor (reference: libs/modeling/head.py:111-113)."""
    opt = dict(opt)
    name = opt.pop("name")
    cls = HEADS[name]
    fields = set(cls.__dataclass_fields__)
    return cls(**{k: v for k, v in opt.items() if k in fields})
