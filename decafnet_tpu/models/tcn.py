"""Dilated TCN used for multi-scale temporal refinement
(reference: libs/modeling/tcn.py)."""

from __future__ import annotations

import flax.linen as nn
import jax

from ..nn.blocks import Conv1d, TorchLayerNorm


class DilatedResidualLayer(nn.Module):
    """dilated conv(k3) -> ReLU -> 1x1 conv -> dropout -> masked residual ->
    LayerNorm over channels (reference: libs/modeling/tcn.py:4-38)."""
    dilation: int
    nchannels: int
    dropout: float = 0.5
    layernorm: bool = True
    ngroup: int = 1

    def setup(self):
        self.conv_dilated = Conv1d(
            self.nchannels, self.nchannels, 3, padding=self.dilation,
            dilation=self.dilation, groups=self.ngroup, zero_bias=False)
        self.conv_1x1 = Conv1d(self.nchannels, self.nchannels, 1,
                               zero_bias=False)
        self.drop = nn.Dropout(self.dropout)
        if self.layernorm:
            self.norm = TorchLayerNorm(self.nchannels)

    def __call__(self, x, mask=None, deterministic=True):
        out = jax.nn.relu(self.conv_dilated(x))
        out = self.conv_1x1(out)
        out = self.drop(out, deterministic=deterministic)
        if mask is not None:
            x = (x + out) * mask[:, 0:1, :].astype(x.dtype)
        else:
            x = x + out
        if self.layernorm:
            x = self.norm(x)
        return x


class TCN(nn.Module):
    """1x1 in-map -> stacked dilated residual layers (dilation 2^i) -> 1x1
    out-map, output gated by the mask (reference: libs/modeling/tcn.py:40-84)."""
    in_dim: int
    hid_dim: int
    out_dim: int
    num_layers: int
    dropout: float = 0.5
    dilation_factor: int = 2
    ln: bool = True
    ngroup: int = 1
    in_map: bool = False

    def setup(self):
        if self.in_map:
            self.conv_1x1 = Conv1d(self.in_dim, self.hid_dim, 1,
                                   zero_bias=False)
        else:
            assert self.in_dim == self.hid_dim
        self.layers = [
            DilatedResidualLayer(
                self.dilation_factor ** i, self.hid_dim, self.dropout,
                layernorm=self.ln, ngroup=self.ngroup)
            for i in range(self.num_layers)
        ]
        self.conv_out = Conv1d(self.hid_dim, self.out_dim, 1, zero_bias=False)

    def __call__(self, x, mask=None, deterministic=True):
        out = self.conv_1x1(x) if self.in_map else x
        for layer in self.layers:
            out = layer(out, mask, deterministic=deterministic)
        out = self.conv_out(out)
        if mask is not None:
            out = out * mask[:, 0:1, :].astype(out.dtype)
        return out
