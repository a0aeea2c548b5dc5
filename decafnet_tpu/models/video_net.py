"""Video FPN backbone (reference: libs/modeling/video_net.py).

Supports optional activation rematerialization (``remat``) so MAD-scale
sequences (32k grid steps) train within HBM -- the TPU-native counterpart of
the reference relying on eval-only long sequences."""

from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..nn.blocks import MaskedConv1D, LayerNorm, TransformerEncoder
from ..ops.fused_conv import fused_conv3_ln_act
from ..ops.masked import sinusoid_encoding, interpolate_linear_1d


class VideoTransformer(nn.Module):
    """conv embedding -> scaled sinusoid PE -> stem encoders -> branch
    encoders emitting the feature pyramid (stride 2 after the first branch)
    (reference: libs/modeling/video_net.py:20-164).
    """
    in_dim: int
    embd_dim: int
    max_seq_len: int
    n_heads: int
    mha_win_size: int
    stride: int = 1
    arch: tuple = (2, 1, 6)
    attn_pdrop: float = 0.0
    proj_pdrop: float = 0.0
    path_pdrop: float = 0.0
    use_abs_pe: bool = False
    pool_only: bool = False
    remat: bool = False  # rematerialize encoder blocks (trade FLOPs for HBM
                         # on long-sequence training, e.g. MAD at 32k)
    remat_policy: str = "nothing"  # what the checkpointed encoders SAVE:
        # "nothing" (recompute all -- max HBM saving) or "dots" (save every
        # dot output: backward skips re-running the MXU/attention matmuls
        # and only recomputes the cheap elementwise passes -- XLA cost
        # model at T=8192 recovers ~7G of the ~8.4G recompute FLOPs at the
        # same temp footprint; jax's dots_WITH_NO_BATCH_DIMS_saveable is
        # deliberately not offered -- it saves nothing here since every
        # dot in this model carries batch dims, measured identical to
        # "nothing"). Numerics are identical across policies -- only the
        # FLOP/HBM trade moves.

    def setup(self):
        assert len(self.arch) == 3
        assert self.stride & (self.stride - 1) == 0
        assert self.arch[0] >= int(math.log2(max(self.stride, 1)))

        self.embd_fc = MaskedConv1D(self.in_dim, self.embd_dim, 1)

        convs, norms = [], []
        stride = self.stride
        for _ in range(self.arch[0]):
            convs.append(MaskedConv1D(
                self.embd_dim, self.embd_dim,
                kernel_size=5 if stride > 1 else 3,
                stride=2 if stride > 1 else 1,
                padding=2 if stride > 1 else 1,
                use_bias=False))
            norms.append(LayerNorm(self.embd_dim))
            stride = max(stride // 2, 1)
        self.embd_convs = convs
        self.embd_norms = norms

        # optional rematerialization: recompute encoder activations in the
        # backward pass instead of storing them (jax.checkpoint via
        # nn.remat); deterministic is passed positionally and marked static
        if self.remat:
            policies = {
                "nothing": None,  # jax default: save nothing
                "dots": jax.checkpoint_policies.dots_saveable,
            }
            Encoder = nn.remat(TransformerEncoder, static_argnums=(3,),
                               policy=policies[self.remat_policy])
        else:
            Encoder = TransformerEncoder

        self.stem = [
            Encoder(
                self.embd_dim, stride=1, n_heads=self.n_heads,
                window_size=self.mha_win_size, attn_pdrop=self.attn_pdrop,
                proj_pdrop=self.proj_pdrop, path_pdrop=self.path_pdrop)
            for _ in range(self.arch[1])
        ]

        if not self.pool_only:
            self.branch = [
                Encoder(
                    self.embd_dim, stride=2 if idx > 0 else 1,
                    n_heads=self.n_heads, window_size=self.mha_win_size,
                    attn_pdrop=self.attn_pdrop, proj_pdrop=self.proj_pdrop,
                    path_pdrop=self.path_pdrop)
                for idx in range(self.arch[2])
            ]
        else:
            self.branch = [
                MaskedConv1D(self.embd_dim, self.embd_dim, 3,
                             2 if idx > 0 else 1, 1,
                             groups=self.embd_dim, use_bias=False)
                for idx in range(self.arch[2])
            ]

    def __call__(self, x, mask, deterministic=True, pe_interp=None):
        """``pe_interp``: optional (lo, hi, w) arrays of shape (t_post,) --
        host-precomputed linear-interpolation gather indices/weights mapping
        the PE table onto the *reference's* padded length (which may differ
        from this bucket's static length; see data/batching.py:pe_interp_arrays).
        The reference interpolates the PE to its eval padding length
        (libs/modeling/video_net.py:144-151, libs/worker_v2.py:969-976);
        positions beyond the valid prefix are masked out below, so the
        bucket's extra padding stays numerically inert."""
        if mask.ndim == 2:
            mask = mask[:, None, :]

        x, _ = self.embd_fc(x, mask)
        for conv, norm in zip(self.embd_convs, self.embd_norms):
            if conv.kernel_size == 3 and conv.stride == 1:
                # fused masked-conv3+LN+ReLU (ops/fused_conv.py); identical
                # numerics, one HBM pass instead of four
                x = fused_conv3_ln_act(
                    x, mask[:, 0, :], conv.conv.weight, conv.conv.bias,
                    norm.weight, norm.bias, act="relu")
            else:
                x, mask = conv(x, mask)
                x = jax.nn.relu(norm(x))

        if self.use_abs_pe:
            t = x.shape[-1]
            pe = jnp.asarray(
                sinusoid_encoding(self.max_seq_len, self.embd_dim // 2))
            pe = pe / (self.embd_dim ** 0.5)
            if pe_interp is not None:
                lo, hi, w = pe_interp
                if lo.ndim == 2:
                    # per-row interpolation plans (video-sharded eval:
                    # different videos in one batch have different
                    # reference padded lengths) -> (B, C, t)
                    def interp_one(l, h, ww):
                        ww = ww[None, :]
                        return (jnp.take(pe, l, axis=-1) * (1.0 - ww)
                                + jnp.take(pe, h, axis=-1) * ww)
                    pe = jax.vmap(interp_one)(lo, hi, w)
                else:
                    w = w[None, :]
                    pe = (jnp.take(pe, lo, axis=-1) * (1.0 - w)
                          + jnp.take(pe, hi, axis=-1) * w)
            elif not deterministic:
                assert t <= self.max_seq_len
            elif t > self.max_seq_len:
                pe = interpolate_linear_1d(pe, t, align_corners=True)
            x = x + pe[..., :t].astype(x.dtype) * mask.astype(x.dtype)

        for block in self.stem:
            x, mask = block(x, mask, deterministic)

        fpn, fpn_masks = (), ()
        for block in self.branch:
            if self.pool_only:
                x, mask = block(x, mask)
            else:
                x, mask = block(x, mask, deterministic)
            fpn += (x,)
            fpn_masks += (mask,)
        return fpn, fpn_masks


VIDEO_NETS = {"transformer": VideoTransformer}


def make_video_net(opt):
    """Registry constructor (reference: libs/modeling/video_net.py:167-186)."""
    opt = dict(opt)
    name = opt.pop("name")
    cls = VIDEO_NETS[name]
    fields = set(cls.__dataclass_fields__)
    kwargs = {k: v for k, v in opt.items() if k in fields}
    if "arch" in kwargs:
        kwargs["arch"] = tuple(kwargs["arch"])
    return cls(**kwargs)
