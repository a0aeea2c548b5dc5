"""On-device clip encoders: the "sidekick encodes every clip / expert
encodes salient clips" stage that the reference performs OFFLINE (its
repo only loads precomputed features, reference: libs/data/dataset.py:363-407
+ SURVEY.md section 0). Bringing it on-device closes the full
encode -> delegate -> ground -> decode pipeline on TPU.

Design (TPU-first, not a torchvision port):
  * channel-last frames, patch embedding as one MXU matmul over unfolded
    patches (einops-free reshape), factorized space-time transformer
    (TimeSformer-family divided attention: temporal attention per patch
    location, then spatial attention per frame) -- large static-shape
    matmuls, no dynamic control flow;
  * one module serves both towers: the EXPERT encoder (full depth/res) and
    the SIDEKICK encoder (shallow + low res) are two configs of
    ``ClipEncoder``;
  * ``encode_clips`` jit-buckets the number of clips so arbitrary-length
    videos reuse a handful of compiled programs.

No public EgoVLP weights are importable in this offline environment, so the
encoders run with synthetic weights; feature-level parity with released
checkpoints remains an offline-tooling task (the grounder consumes any
(C, T) feature stream).
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class MHA(nn.Module):
    dim: int
    heads: int
    dtype: Any = None  # compute dtype for the matmuls (params stay f32)

    @nn.compact
    def __call__(self, x):
        """Self-attention over axis -2 of (..., n, dim), fp32 softmax."""
        h = self.heads
        d = self.dim // h
        qkv = nn.Dense(3 * self.dim, name="qkv", dtype=self.dtype)(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def split_heads(t):
            return t.reshape(t.shape[:-1] + (h, d)).swapaxes(-2, -3)

        q, k, v = map(split_heads, (q, k, v))
        logits = jnp.einsum("...qd,...kd->...qk", q, k,
                            preferred_element_type=jnp.float32)
        attn = jax.nn.softmax(logits / float(np.sqrt(d)), axis=-1)
        out = jnp.einsum("...qk,...kd->...qd", attn.astype(v.dtype), v)
        out = out.swapaxes(-2, -3).reshape(x.shape[:-1] + (self.dim,))
        return nn.Dense(self.dim, name="proj", dtype=self.dtype)(out)


class Block(nn.Module):
    """One divided space-time block: temporal attention (over frames, per
    patch location), spatial attention (over patches, per frame), MLP."""
    dim: int
    heads: int
    mlp_ratio: float = 4.0
    dtype: Any = None  # compute dtype (residual stream/LN stats stay f32)

    @nn.compact
    def __call__(self, x):
        # x: (B, F, N, dim). In bf16 mode the residual stream itself is
        # bf16 (the block is HBM-bound: LN/residual passes over the full
        # stream dominate; flax LN computes its statistics in f32
        # regardless of dtype, so only storage precision drops).
        t_in = nn.LayerNorm(name="norm_t", dtype=self.dtype)(x)
        t_in = t_in.swapaxes(1, 2)                  # (B, N, F, dim)
        x = x + MHA(self.dim, self.heads, dtype=self.dtype,
                    name="attn_t")(t_in).swapaxes(1, 2)
        x = x + MHA(self.dim, self.heads, dtype=self.dtype,
                    name="attn_s")(
            nn.LayerNorm(name="norm_s", dtype=self.dtype)(x))
        y = nn.LayerNorm(name="norm_m", dtype=self.dtype)(x)
        y = nn.Dense(int(self.dim * self.mlp_ratio), name="fc1",
                     dtype=self.dtype)(y)
        y = nn.gelu(y)
        return x + nn.Dense(self.dim, name="fc2", dtype=self.dtype)(y)


class ClipEncoder(nn.Module):
    """Frames of one clip -> one feature vector.

    Input  (B, F, H, W, 3) normalized frames (encode/transforms.py)
    Output (B, out_dim)
    """
    patch_size: int = 16
    dim: int = 384
    depth: int = 6
    heads: int = 6
    out_dim: int = 256
    frames: int = 4
    dtype: Any = None  # bf16 compute mode: no reference-parity constraint
    #                    exists for this stage (the reference encodes
    #                    OFFLINE), so matmuls may run bf16; params, LN
    #                    statistics and the softmax stay f32

    @nn.compact
    def __call__(self, frames):
        B, F, H, W, C = frames.shape
        p = self.patch_size
        assert H % p == 0 and W % p == 0, (H, W, p)
        nh, nw = H // p, W // p
        n = nh * nw

        # patchify as a single matmul: (B, F, nh, p, nw, p, C) -> tokens
        x = frames.reshape(B, F, nh, p, nw, p, C)
        x = x.transpose(0, 1, 2, 4, 3, 5, 6).reshape(B, F, n, p * p * C)
        x = nn.Dense(self.dim, name="patch_embed", dtype=self.dtype)(x)

        pe_s = self.param("pos_embed", nn.initializers.normal(0.02),
                          (1, 1, n, self.dim))
        pe_t = self.param("time_embed", nn.initializers.normal(0.02),
                          (1, F, 1, self.dim))
        x = x + pe_s + pe_t
        if self.dtype is not None:
            x = x.astype(self.dtype)  # bf16 residual stream (see Block)

        for i in range(self.depth):
            x = Block(self.dim, self.heads, dtype=self.dtype,
                      name=f"block{i}")(x)

        x = nn.LayerNorm(name="norm")(x)
        x = jnp.mean(x, axis=(1, 2))                # frame+patch pooling
        out = nn.Dense(self.out_dim, name="head", dtype=self.dtype)(x)
        return out.astype(jnp.float32)


def make_clip_encoder(opt: Dict[str, Any]):
    fields = set(ClipEncoder.__dataclass_fields__)
    kwargs = {k: v for k, v in opt.items() if k in fields}
    if isinstance(kwargs.get("dtype"), str):  # JSON/yaml-sourced opts
        kwargs["dtype"] = jnp.dtype(kwargs["dtype"]).type
    return ClipEncoder(**kwargs)


def _bucket(n, lo=8):
    b = lo
    while b < n:
        b *= 2
    return b


class ClipEncoderRunner:
    """Jit-bucketed driver: encode T clips of a video with a handful of
    compiled programs (clip-count padded to pow-2 buckets)."""

    def __init__(self, encoder, params):
        self.encoder = encoder
        self.params = params
        self._fns = {}

    def _fn(self, n):
        if n not in self._fns:
            enc = self.encoder

            @jax.jit
            def run(params, frames):
                return enc.apply({"params": params}, frames)

            self._fns[n] = run
        return self._fns[n]

    def __call__(self, frames):
        """frames (T, F, H, W, 3) -> features (out_dim, T) float32."""
        t = frames.shape[0]
        n = _bucket(t)
        if n != t:
            pad = np.zeros((n - t,) + frames.shape[1:], frames.dtype)
            frames = np.concatenate([np.asarray(frames), pad], axis=0)
        feats = self._fn(n)(self.params, jnp.asarray(frames))
        return np.ascontiguousarray(np.asarray(feats[:t]).T)


def encode_video(expert_runner, sidekick_runner, frames,
                 sidekick_frames=None):
    """The two-stream encode stage: the sidekick sees EVERY clip (cheap),
    the expert output feeds delegation downstream exactly like the
    reference's precomputed feature files. Returns (expert, sidekick)
    channel-first (C, T) arrays."""
    expert = expert_runner(frames)
    sidekick = sidekick_runner(
        frames if sidekick_frames is None else sidekick_frames)
    return expert, sidekick
