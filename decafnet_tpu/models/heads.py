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


def make_head(opt):
    """Registry constructor (reference: libs/modeling/head.py:111-113)."""
    opt = dict(opt)
    name = opt.pop("name")
    cls = HEADS[name]
    fields = set(cls.__dataclass_fields__)
    return cls(**{k: v for k, v in opt.items() if k in fields})
