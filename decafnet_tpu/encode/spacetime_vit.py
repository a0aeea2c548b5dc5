"""EgoVLP-layout space-time ViT: the importable expert/sidekick encoder.

The reference's NLQ features are produced OFFLINE by EgoVLP's video tower
(reference: libs/data/dataset.py:363-407 only loads the resulting .npy
files). That tower is the Frozen-in-Time ``SpaceTimeTransformer`` -- a
divided space-time ViT with a CLS token -- plus a linear projection to the
feature dim. This module re-implements exactly those numerics TPU-natively
(static shapes, patchify as one MXU matmul, fp32 softmax) with parameters
stored in the torch layout under the torch key names, so importing a real
EgoVLP checkpoint is the same mechanical key rename used for grounder
checkpoints (models/import_torch.py; see import_vit.py).

Semantics replicated (Frozen-in-Time ``video_transformer.py``, public repo,
as used by EgoVLP):
  * tokens are [CLS, frame0 patches, frame1 patches, ...]; positional embed
    tiles the per-patch table across frames, temporal embed repeats per
    patch within a frame; CLS gets its own pos embed row 0.
  * each block: temporal attention over frames per patch location (input
    LN ``norm3``), THEN spatial attention over patches per frame (input LN
    ``norm1``) reading ``x + time_out``, with the 'frozen-in-time' residual
    ``x + space_out`` (NOT ``time_residual + space_out``), then MLP on
    ``norm2``.
  * divided attention handles CLS by splicing: the CLS query attends over
    ALL tokens; every patch-group's key/value set is prepended with the CLS
    key/value.
  * output is the final-LN CLS token, optionally projected (EgoVLP
    ``vid_proj``: Linear(dim, 256)).

Eval-only (no dropout/droppath): the encode stage produces features, it is
not trained here.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


class TorchLinear(nn.Module):
    """Linear layer storing ``weight`` (out, in) / ``bias`` in the torch
    layout so checkpoint import is a pure key rename."""
    in_dim: int
    out_dim: int

    @nn.compact
    def __call__(self, x):
        w = self.param("weight", nn.initializers.lecun_normal(),
                       (self.out_dim, self.in_dim))
        b = self.param("bias", nn.initializers.zeros, (self.out_dim,))
        return x @ w.astype(x.dtype).T + b.astype(x.dtype)


class TorchLayerNorm(nn.Module):
    """LayerNorm over the LAST axis with torch param names, fp32 stats."""
    dim: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        w = self.param("weight", nn.initializers.ones, (self.dim,))
        b = self.param("bias", nn.initializers.zeros, (self.dim,))
        in_dtype = x.dtype
        x = x.astype(jnp.float32)
        mu = jnp.mean(x, axis=-1, keepdims=True)
        x = x - mu
        var = jnp.mean(jnp.square(x), axis=-1, keepdims=True)
        x = x * jax.lax.rsqrt(var + self.eps)
        x = x * w.astype(jnp.float32) + b.astype(jnp.float32)
        return x.astype(in_dtype)


def _attend(q, k, v):
    """softmax(q k^T) v over the last two axes, fp32 softmax.

    ``q`` is assumed pre-scaled (Frozen-in-Time multiplies q by d^-0.5
    BEFORE splicing out the CLS query, so the scale applies everywhere)."""
    s = jnp.einsum("...qd,...kd->...qk", q, k,
                   preferred_element_type=jnp.float32)
    a = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    return jnp.einsum("...qk,...kd->...qd", a, v,
                      preferred_element_type=jnp.float32).astype(v.dtype)


class VarAttention(nn.Module):
    """Frozen-in-Time ``VarAttention``: grouped attention with CLS splicing.

    ``group`` = 'space' (patches attend within their frame) or 'time'
    (patches attend across frames at their patch location). The CLS query
    attends over all 1 + F*n tokens; each group's keys/values are prepended
    with the CLS key/value.
    """
    dim: int
    heads: int
    group: str  # 'space' | 'time'

    def setup(self):
        self.qkv = TorchLinear(self.dim, 3 * self.dim)
        self.proj = TorchLinear(self.dim, self.dim)

    def __call__(self, x, F, n):
        B, N, D = x.shape
        assert N == 1 + F * n
        h = self.heads
        d = D // h
        scale = float(d) ** -0.5

        q, k, v = jnp.split(self.qkv(x), 3, axis=-1)

        def heads_of(t):
            # (B, N, D) -> (B, h, N, d)
            return t.reshape(B, N, h, d).transpose(0, 2, 1, 3)

        q, k, v = map(heads_of, (q, k, v))
        q = q * scale  # applied to ALL queries incl. CLS (F-i-T order)

        cls_q, q_ = q[:, :, :1], q[:, :, 1:]
        cls_k, k_ = k[:, :, :1], k[:, :, 1:]
        cls_v, v_ = v[:, :, :1], v[:, :, 1:]

        # CLS attends over every token
        cls_out = _attend(cls_q, k, v)                      # (B, h, 1, d)

        # group the patch tokens: token order is frame-major (f, n)
        def grouped(t):
            t = t.reshape(B, h, F, n, d)
            if self.group == "time":
                t = t.transpose(0, 1, 3, 2, 4)              # (B, h, n, F, d)
            return t

        qg, kg, vg = map(grouped, (q_, k_, v_))
        G, L = qg.shape[2], qg.shape[3]                     # groups, length

        # prepend the CLS key/value to every group
        cls_kg = jnp.broadcast_to(cls_k[:, :, None], (B, h, G, 1, d))
        cls_vg = jnp.broadcast_to(cls_v[:, :, None], (B, h, G, 1, d))
        out = _attend(qg, jnp.concatenate([cls_kg, kg], axis=3),
                      jnp.concatenate([cls_vg, vg], axis=3))

        if self.group == "time":
            out = out.transpose(0, 1, 3, 2, 4)              # back to (f, n)
        out = out.reshape(B, h, F * n, d)
        out = jnp.concatenate([cls_out, out], axis=2)       # (B, h, N, d)
        out = out.transpose(0, 2, 1, 3).reshape(B, N, D)
        return self.proj(out)


class Mlp(nn.Module):
    dim: int
    hidden: int

    def setup(self):
        self.fc1 = TorchLinear(self.dim, self.hidden)
        self.fc2 = TorchLinear(self.hidden, self.dim)

    def __call__(self, x):
        return self.fc2(jax.nn.gelu(self.fc1(x), approximate=False))


class SpaceTimeBlock(nn.Module):
    dim: int
    heads: int
    mlp_ratio: float = 4.0

    def setup(self):
        self.norm1 = TorchLayerNorm(self.dim)   # space attn input
        self.attn = VarAttention(self.dim, self.heads, "space")
        self.norm3 = TorchLayerNorm(self.dim)   # time attn input
        self.timeattn = VarAttention(self.dim, self.heads, "time")
        self.norm2 = TorchLayerNorm(self.dim)   # mlp input
        self.mlp = Mlp(self.dim, int(self.dim * self.mlp_ratio))

    def __call__(self, x, F, n):
        time_out = self.timeattn(self.norm3(x), F, n)
        time_residual = x + time_out
        space_out = self.attn(self.norm1(time_residual), F, n)
        space_residual = x + space_out          # 'frozen-in-time' style
        return space_residual + self.mlp(self.norm2(space_residual))


class Conv2dPatchProj(nn.Module):
    """Conv2d(3, dim, p, p, stride p) as one matmul over unfolded patches;
    the kernel is stored in the torch conv layout (D, C, p, p) under
    ``weight`` so import is a pure rename."""
    dim: int
    patch_size: int
    in_ch: int = 3

    @nn.compact
    def __call__(self, x):
        """x: (B, N, p*p*C) unfolded patches, pixel order (ph, pw, c)."""
        p, C = self.patch_size, self.in_ch
        w = self.param("weight", nn.initializers.lecun_normal(),
                       (self.dim, C, p, p))
        b = self.param("bias", nn.initializers.zeros, (self.dim,))
        # (D, C, ph, pw) -> (ph, pw, C, D) flattened to (p*p*C, D), the
        # unfold order used by PatchEmbed
        wmat = w.transpose(2, 3, 1, 0).reshape(p * p * C, self.dim)
        return x @ wmat.astype(x.dtype) + b.astype(x.dtype)


class PatchEmbed(nn.Module):
    dim: int
    patch_size: int
    img_size: int

    def setup(self):
        self.proj = Conv2dPatchProj(self.dim, self.patch_size)

    def __call__(self, frames):
        B, F, H, W, C = frames.shape
        p = self.patch_size
        assert H == W == self.img_size, (H, W, self.img_size)
        nh = H // p
        x = frames.reshape(B, F, nh, p, nh, p, C)
        x = x.transpose(0, 1, 2, 4, 3, 5, 6).reshape(
            B, F * nh * nh, p * p * C)
        return self.proj(x)


class SpaceTimeViT(nn.Module):
    """Frozen-in-Time SpaceTimeTransformer (+ optional EgoVLP projection).

    Input  (B, F, H, W, 3) channel-last normalized frames
    Output (B, out_dim) -- the projected CLS feature (or the raw CLS
    feature when ``out_dim`` is None)
    """
    img_size: int = 224
    patch_size: int = 16
    dim: int = 768
    depth: int = 12
    heads: int = 12
    frames: int = 4
    mlp_ratio: float = 4.0
    out_dim: Optional[int] = 256

    def setup(self):
        n = (self.img_size // self.patch_size) ** 2
        self.n_patches = n
        self.cls_token = self.param(
            "cls_token", nn.initializers.zeros, (1, 1, self.dim))
        self.pos_embed = self.param(
            "pos_embed", nn.initializers.normal(0.02), (1, 1 + n, self.dim))
        self.temporal_embed = self.param(
            "temporal_embed", nn.initializers.normal(0.02),
            (1, self.frames, self.dim))
        self.patch_embed = PatchEmbed(self.dim, self.patch_size,
                                      self.img_size)
        self.blocks = [SpaceTimeBlock(self.dim, self.heads, self.mlp_ratio)
                       for _ in range(self.depth)]
        self.norm = TorchLayerNorm(self.dim)
        if self.out_dim is not None:
            self.proj = TorchLinear(self.dim, self.out_dim)

    def __call__(self, frames):
        B, F = frames.shape[0], frames.shape[1]
        assert F == self.frames, (F, self.frames)
        n = self.n_patches
        x = self.patch_embed(frames)                       # (B, F*n, D)

        cls = jnp.broadcast_to(self.cls_token.astype(x.dtype),
                               (B, 1, self.dim))
        x = jnp.concatenate([cls, x], axis=1)              # (B, 1+F*n, D)

        # tile pos embed across frames; repeat temporal embed within frames
        pe = self.pos_embed.astype(x.dtype)
        te = self.temporal_embed.astype(x.dtype)
        tile_pos = jnp.tile(pe[:, 1:], (1, F, 1))          # (1, F*n, D)
        tile_time = jnp.repeat(te, n, axis=1)              # (1, F*n, D)
        total = jnp.concatenate([pe[:, :1], tile_pos + tile_time], axis=1)
        x = x + total

        for blk in self.blocks:
            x = blk(x, F, n)
        x = self.norm(x)[:, 0]                             # CLS output
        if self.out_dim is not None:
            x = self.proj(x)
        return x
