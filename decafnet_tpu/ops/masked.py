"""Masked 1D primitives with exact reference semantics, as pure JAX functions.

All sequence tensors are channel-first ``(..., c, t)`` like the reference.
Masks are boolean ``(..., 1, t)`` or ``(..., t)`` with True = valid.

Reference semantics reproduced here:
  * masked avg/max pooling        (reference: libs/modeling/blocks.py:9-47)
  * nearest 1D interpolation      (torch F.interpolate(mode='nearest'))
  * linear 1D interpolation       (torch align_corners=True, used for PE
                                   overflow at eval, libs/modeling/video_net.py:146-151)
  * sinusoid position encoding    (reference: libs/modeling/blocks.py:134-142)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def masked_avg_pool1d(x, mask):
    """Global masked average over time: (..., c, t) -> (..., c, 1).

    Reference: libs/modeling/blocks.py:9-17 (sum over valid / count). The
    reference divides by the raw count and NaNs on fully-masked rows; here
    the denominator is clamped to 1 so an all-masked row yields zeros --
    identical for any row with at least one valid position, and it keeps
    the framework's no-NaN-through-padding invariant
    (tests/test_padded_rows.py).
    """
    mask = mask.astype(x.dtype)
    x_sum = jnp.sum(x * mask, axis=-1, keepdims=True)
    n = jnp.sum(mask, axis=-1, keepdims=True)
    return x_sum / jnp.maximum(n, 1.0)


def max_pool1d(x, kernel_size=3, stride=2, padding=None):
    """torch.nn.functional.max_pool1d over the last axis (channel-first)."""
    if padding is None:
        padding = (kernel_size - 1) // 2
    neg = (-jnp.inf if jnp.issubdtype(x.dtype, jnp.floating)
           else jnp.iinfo(x.dtype).min)
    return jax.lax.reduce_window(
        x,
        init_value=neg,
        computation=jax.lax.max,
        window_dimensions=(1,) * (x.ndim - 1) + (kernel_size,),
        window_strides=(1,) * (x.ndim - 1) + (stride,),
        padding=[(0, 0)] * (x.ndim - 1) + [(padding, padding)],
    )


def masked_max_pool1d(x, mask, kernel_size=3, stride=2):
    """Masked strided max pooling; invalid positions are replaced by the
    per-sample minimum before pooling, and the pooled mask gates the output.

    Reference: libs/modeling/blocks.py:31-47.
    Returns (pooled_x, pooled_mask_bool).
    """
    x_min = jax.lax.stop_gradient(jnp.min(x, axis=-1, keepdims=True))
    mask_f = mask.astype(x.dtype)
    x = x * mask_f + (1.0 - mask_f) * x_min
    x = max_pool1d(x, kernel_size, stride)
    mask_f = max_pool1d(mask_f, kernel_size, stride)
    x = x * mask_f
    return x, mask_f.astype(bool)


def interpolate_nearest_1d(x, size):
    """torch F.interpolate(mode='nearest') over the last axis.

    torch maps output index i to source index floor(i * in_size / out_size)
    (computed in float32; we use the same float computation to match
    edge-case rounding).

    Gather-free fast paths (index gathers are the #1 TPU decode cost in
    this codebase) where the f32 index math is provably exact, so they are
    bit-identical to the take formulation:
      * integer downsample (in == s*size): scale == s exactly, and i*s is
        exact in f32 for all grid sizes here -> idx = i*s, a strided slice;
      * power-of-two upsample (size == r*in, r = 2^k): scale == 2^-k
        exactly and i*2^-k is exact -> idx = i >> k, a uniform repeat
        (broadcast+reshape). Non-pow-2 upsamples keep the take (1/r may
        round in f32 and shift a boundary index).
    """
    in_size = x.shape[-1]
    if size == in_size:
        return x
    if in_size % size == 0:
        return x[..., :: in_size // size]
    r, rem = divmod(size, in_size)
    if rem == 0 and r & (r - 1) == 0:
        return jnp.repeat(x, r, axis=-1)
    scale = np.float32(in_size) / np.float32(size)
    idx = np.floor(np.arange(size, dtype=np.float32) * scale).astype(np.int32)
    idx = np.clip(idx, 0, in_size - 1)
    return jnp.take(x, jnp.asarray(idx), axis=-1)


def interpolate_linear_1d(x, size, align_corners=True):
    """torch F.interpolate(mode='linear') over the last axis.

    Positions are computed in float64 like torch's CPU kernel (acc_type of
    float is double on CPU); only the final lerp weight is cast to f32.
    """
    in_size = x.shape[-1]
    if align_corners:
        if size == 1:
            pos = np.zeros((1,), np.float64)
        else:
            pos = np.arange(size, dtype=np.float64) * (in_size - 1) / (size - 1)
    else:
        scale = in_size / size
        pos = np.maximum((np.arange(size, dtype=np.float64) + 0.5) * scale - 0.5, 0.0)
    lo = np.clip(np.floor(pos).astype(np.int32), 0, in_size - 1)
    hi = np.clip(lo + 1, 0, in_size - 1)
    w = jnp.asarray((pos - lo).astype(np.float32), dtype=x.dtype)
    x_lo = jnp.take(x, jnp.asarray(lo), axis=-1)
    x_hi = jnp.take(x, jnp.asarray(hi), axis=-1)
    return x_lo * (1.0 - w) + x_hi * w


def sinusoid_encoding(seq_len, n_freqs, dtype=np.float32):
    """Sinusoid position encoding, shape (2 * n_freqs, seq_len).

    Reference: libs/modeling/blocks.py:134-142 -- frequencies are
    10000 ** linspace(0, 1, n_freqs + 1)[:n_freqs]; rows are all sines then
    all cosines (NOT interleaved). Returned as a numpy constant so it can be
    folded into the compiled graph.
    """
    tics = np.arange(seq_len, dtype=np.float32)
    freqs = (10000.0 ** np.linspace(0, 1, n_freqs + 1,
                                    dtype=np.float32))[:n_freqs]
    x = tics[None, :] / freqs[:, None]
    pe = np.concatenate([np.sin(x), np.cos(x)], axis=0)
    return pe.astype(dtype)


# Channel-stat formulation dispatch (round 5). The channel axis sits in
# TPU SUBLANES under the framework's channel-first (…, C, T) layout, and
# VPU cross-sublane reductions run far off the bandwidth floor at long T
# (measured T=32768, (2,128,T): 0.70 ms f32 / 1.50 ms bf16 for ONE LN vs
# an ~0.08 ms streaming floor). Expressing mean/variance as ones-vector
# DOTS moves the reduction onto the MXU: 0.54 ms f32 / 0.52 ms bf16
# standalone (scripts/results/bf16_micro_ab4.json) -- this was half of the
# round-4 "bf16 19% slower at MAD scale" regression. Mode "bf16" (default)
# engages the dot form only for non-f32 activations at long T: in the
# COMPOSED f32 program the HIGHEST-precision stat dots break XLA's
# elementwise fusion clusters and lose what they win standalone (full MAD
# decode f32: 23.97 ms reduce vs 25.28 ms dot,
# scripts/results/mad_stage_profile_f32_r5*.json), while the bf16 program
# improves 39.4 -> 21.3 ms. The two forms differ only by f32 summation
# order (tests/test_ops_masked.py pins them to 1e-5).
_LN_DOT_MIN_T = 4096
_LN_DOT_MODE = "bf16"  # "bf16" | "always" | "never"


def set_ln_dot(mode, min_t=None):
    """Set the MXU (ones-dot) LayerNorm statistics mode (A/B harness hook,
    like nn.blocks.set_depthwise_shift). ``mode``: "bf16" (default:
    non-f32 activations only) | "always" | "never"; bools map to
    always/never for back-compat."""
    global _LN_DOT_MODE, _LN_DOT_MIN_T
    if isinstance(mode, bool):
        mode = "always" if mode else "never"
    assert mode in ("bf16", "always", "never")
    _LN_DOT_MODE = mode
    if min_t is not None:
        _LN_DOT_MIN_T = min_t


def _use_dot_stats(mode, dtype):
    return mode == "always" or (mode == "bf16" and dtype != jnp.float32)


def channel_layer_norm(x, weight=None, bias=None, eps=1e-5):
    """LayerNorm over the channel axis of (..., c, t) tensors.

    Matches the reference's channel-first LayerNorm exactly: centered,
    then divided by sqrt(mean(x_centered^2) + eps) (biased variance)
    (reference: libs/modeling/blocks.py:109-131). ``weight``/``bias`` have
    shape (c, 1) or (c,).

    At long T the statistics are computed as ones-vector dot_generals on
    the MXU instead of VPU sublane reductions (see ``_LN_DOT_MIN_T``
    above); summation-order-level numerics, statistics in fp32 either way.
    """
    in_dtype = x.dtype
    C = x.shape[-2]
    if (x.shape[-1] >= _LN_DOT_MIN_T
            and _use_dot_stats(_LN_DOT_MODE, in_dtype)):
        hi = jax.lax.Precision.HIGHEST
        ones = jnp.ones((C,), x.dtype)
        mean = jnp.einsum("...ct,c->...t", x, ones, precision=hi,
                          preferred_element_type=jnp.float32) / C
        x = x.astype(jnp.float32) - mean[..., None, :]
        sigma = (jnp.einsum("...ct,...ct,c->...t", x, x,
                            jnp.ones((C,), jnp.float32), precision=hi,
                            preferred_element_type=jnp.float32)
                 / C)[..., None, :]
    else:
        x = x.astype(jnp.float32)  # normalization statistics always in fp32
        x = x - jnp.mean(x, axis=-2, keepdims=True)
        sigma = jnp.mean(jnp.square(x), axis=-2, keepdims=True)
    x = x * jax.lax.rsqrt(sigma + eps)
    if weight is not None:
        w = weight.reshape(weight.shape[0], 1) if weight.ndim == 1 else weight
        b = bias.reshape(bias.shape[0], 1) if bias.ndim == 1 else bias
        x = x * w.astype(jnp.float32) + b.astype(jnp.float32)
    return x.astype(in_dtype)
