"""Text backbones (reference: libs/modeling/text_net.py)."""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from ..nn.blocks import (
    MaskedConv1D, AttNPool1D, TransformerEncoder, trunc_normal_init,
)
from ..ops.masked import sinusoid_encoding, interpolate_linear_1d


def _add_pe(x, mask, max_seq_len, training):
    """Scaled sinusoid PE, linearly interpolated past max_seq_len at eval
    (reference: libs/modeling/text_net.py:167-176 / video_net.py:141-151)."""
    c, t = x.shape[-2], x.shape[-1]
    pe = jnp.asarray(sinusoid_encoding(max_seq_len, c // 2)) / (c ** 0.5)
    if training:
        assert t <= max_seq_len
    elif t > max_seq_len:
        pe = interpolate_linear_1d(pe, t, align_corners=True)
    return x + pe[..., :t].astype(x.dtype) * mask.astype(x.dtype)


class TextTransformer(nn.Module):
    """Embedding projection -> (optional PE) -> optional learnable background
    token prepended -> stack of global-attention encoders
    (reference: libs/modeling/text_net.py:92-188)."""
    in_dim: int
    embd_dim: int
    n_heads: int
    max_seq_len: int
    n_layers: int = 5
    attn_pdrop: float = 0.0
    proj_pdrop: float = 0.0
    path_pdrop: float = 0.0
    use_abs_pe: bool = True
    use_bkgd_token: bool = True

    def setup(self):
        self.embd_fc = MaskedConv1D(self.in_dim, self.embd_dim, 1)
        if self.use_bkgd_token:
            self.bkgd_token = self.param(
                "bkgd_token", trunc_normal_init(0.02), (self.embd_dim, 1))
        self.transformer = [
            TransformerEncoder(
                self.embd_dim, stride=0, n_heads=self.n_heads,
                attn_pdrop=self.attn_pdrop, proj_pdrop=self.proj_pdrop,
                path_pdrop=self.path_pdrop)
            for _ in range(self.n_layers)
        ]

    def __call__(self, x, mask, deterministic=True):
        bs = x.shape[0]
        if mask.ndim == 2:
            mask = mask[:, None, :]

        x, _ = self.embd_fc(x, mask)
        if self.use_abs_pe:
            x = _add_pe(x, mask, self.max_seq_len, not deterministic)

        if self.use_bkgd_token:
            bkgd = jnp.broadcast_to(
                self.bkgd_token.astype(x.dtype)[None],
                (bs,) + self.bkgd_token.shape)
            x = jnp.concatenate([bkgd, x], axis=-1)
            mask = jnp.concatenate([mask[..., :1], mask], axis=-1)

        for layer in self.transformer:
            x, _ = layer(x, mask, deterministic=deterministic)
        return x, mask


class TextIdentity(nn.Module):
    """Pass-through text encoder with optional projection / PE / attention
    pooling (reference: libs/modeling/text_net.py:22-89)."""
    in_dim: int
    embd_dim: Optional[int] = None
    max_seq_len: int = 24
    n_heads: int = 4
    use_abs_pe: bool = False
    use_bkgd_token: bool = True

    def setup(self):
        dim = self.embd_dim
        if dim is not None:
            self.embd_fc = MaskedConv1D(self.in_dim, dim, 1)
        else:
            dim = self.in_dim
        self._dim = dim
        if self.use_bkgd_token:
            self.attn_pool = AttNPool1D(dim, n_heads=self.n_heads)

    def __call__(self, x, mask, deterministic=True):
        if mask.ndim == 2:
            mask = mask[:, None, :]
        if self.embd_dim is not None:
            x, _ = self.embd_fc(x, mask)
        if self.use_abs_pe:
            x = _add_pe(x, mask, self.max_seq_len, not deterministic)
        if self.use_bkgd_token:
            x, mask = self.attn_pool(x, mask, deterministic=deterministic)
        return x, mask


TEXT_NETS = {"transformer": TextTransformer, "identity": TextIdentity}


def make_text_net(opt):
    """Registry constructor (reference: libs/modeling/text_net.py:191-193)."""
    opt = dict(opt)
    name = opt.pop("name")
    cls = TEXT_NETS[name]
    fields = set(cls.__dataclass_fields__)
    return cls(**{k: v for k, v in opt.items() if k in fields})
