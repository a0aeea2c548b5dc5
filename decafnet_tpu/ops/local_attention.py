"""Banded (local-window) multi-head attention for long sequences.

The reference implements O(t*w) local attention with an ``as_strided``
overlapping-chunk trick plus diagonal-shift band assembly and +/-inf edge
masks (reference: libs/modeling/blocks.py:204-325). The numerics reduce to:

  for query i, band offset r in [0, w):   j = i + r - w//2
    score[i, r] = q[i] . k[j]                     if 0 <= j < t
                + (-1e4 if kv_mask[j] is False)   (additive key mask)
    score[i, r] = -inf                            if j outside [0, t)
  attn = softmax(score, axis=r);  rows with invalid query -> all zeros
  out[i] = sum_r attn[i, r] * v[i + r - w//2]

This module provides TPU-native implementations of exactly those numerics:

  * ``xla`` backend: overlapping-neighborhood chunked dense attention.
    Sequences are cut into chunks of size C; each chunk of queries attends
    to a (C + 2*(w//2))-wide key/value neighborhood with a static band mask.
    Everything is static-shaped and lowers to MXU matmuls that XLA fuses.
  * ``pallas`` backend: the same math as a fused Pallas kernel built from
    prev/current/next chunk tiles (regular BlockSpecs, MXU-aligned (C, C)
    score tiles that never round-trip to HBM). Wins for long sequences
    (MAD-scale); 'auto' dispatches per shape.
  * ``reference``: a brute-force O(t^2) oracle used by the test suite.

In fp32 the additive -1e4 key mask and a hard -inf mask are bitwise
equivalent after softmax (exp underflows to exactly 0 against any realistic
score), so both invalid and out-of-range positions are handled with a single
masked, max-subtracted softmax whose fully-masked rows are zeroed.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

DEFAULT_CHUNK = 128


def _next_multiple(x, m):
    return (x + m - 1) // m * m


def _neighbor_indices(n_chunks, chunk, halo):
    """Static gather indices into a time axis padded by ``halo`` on both
    sides: chunk c covers padded positions [c*chunk, c*chunk + chunk + 2*halo)."""
    base = np.arange(n_chunks, dtype=np.int32)[:, None] * chunk
    offs = np.arange(chunk + 2 * halo, dtype=np.int32)[None, :]
    return jnp.asarray(base + offs)


def _band_mask(chunk, halo):
    """(chunk, chunk + 2*halo) bool mask of in-band positions.

    Query local index i attends to neighborhood index j iff the absolute
    offset (j - halo) - i lies in [-halo, halo], i.e. 0 <= j - i <= 2*halo.
    """
    i = np.arange(chunk)[:, None]
    j = np.arange(chunk + 2 * halo)[None, :]
    return jnp.asarray((j - i >= 0) & (j - i <= 2 * halo))


def band_attention_xla(q, k, v, kv_mask, window_size, chunk=DEFAULT_CHUNK):
    """Banded attention via overlapping-neighborhood chunked dense matmuls.

    Args:
      q, k, v: (B, H, T, D) float arrays (any common float dtype).
      kv_mask: (B, T) bool, True = valid. Also used as the query mask.
      window_size: odd int w; each query attends to [i - w//2, i + w//2].
      chunk: query chunk size (static; multiples of 128 feed the MXU).

    Returns:
      (B, H, T, D) attention output with invalid query rows zeroed.
    """
    assert window_size % 2 == 1 and window_size > 0
    halo = window_size // 2
    B, H, T, D = q.shape
    c = min(chunk, _next_multiple(T, 8))
    Tp = _next_multiple(T, c)
    nc = Tp // c

    pad_t = Tp - T
    if pad_t:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, pad_t), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, 0), (0, pad_t), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, pad_t), (0, 0)))
        kv_mask = jnp.pad(kv_mask, ((0, 0), (0, pad_t)))

    # pad the key/value time axis by the halo so every neighborhood is in range
    k2 = jnp.pad(k, ((0, 0), (0, 0), (halo, halo), (0, 0)))
    v2 = jnp.pad(v, ((0, 0), (0, 0), (halo, halo), (0, 0)))
    m2 = jnp.pad(kv_mask, ((0, 0), (halo, halo)))

    idx = _neighbor_indices(nc, c, halo)                  # (nc, c + 2*halo)
    kn = jnp.take(k2, idx, axis=2)                        # (B, H, nc, c+2h, D)
    vn = jnp.take(v2, idx, axis=2)
    mn = jnp.take(m2, idx, axis=1)                        # (B, nc, c+2h)

    qc = q.reshape(B, H, nc, c, D)
    scores = jnp.einsum("bhnid,bhnjd->bhnij", qc, kn,
                        preferred_element_type=jnp.float32)

    valid = _band_mask(c, halo)[None, None, None] & mn[:, None, :, None, :]
    neg = jnp.asarray(-jnp.inf, scores.dtype)
    scores = jnp.where(valid, scores, neg)

    # max-subtracted masked softmax; fully-masked rows resolve to zeros
    smax = jnp.max(scores, axis=-1, keepdims=True)
    smax = jnp.where(jnp.isfinite(smax), smax, 0.0)
    attn = jnp.exp(scores - smax)
    attn = jnp.where(valid, attn, 0.0)
    denom = jnp.sum(attn, axis=-1, keepdims=True)
    attn = attn / jnp.maximum(denom, jnp.finfo(attn.dtype).tiny)

    out = jnp.einsum("bhnij,bhnjd->bhnid", attn.astype(vn.dtype), vn,
                     preferred_element_type=jnp.float32)
    out = out.reshape(B, H, Tp, D)[:, :, :T]
    qmask = kv_mask[:, None, :T, None].astype(out.dtype)
    return (out * qmask).astype(q.dtype)


def _shift_time(x, r):
    """x_r[..., i, :] = x[..., i + r, :] with zero fill out of range
    (static pad + slice; time is axis -2)."""
    if r == 0:
        return x
    T = x.shape[-2]
    pad = [(0, 0)] * x.ndim
    if r > 0:
        pad[-2] = (0, r)
        x = jnp.pad(x, pad)
        return jax.lax.slice_in_dim(x, r, r + T, axis=-2)
    pad[-2] = (-r, 0)
    x = jnp.pad(x, pad)
    return jax.lax.slice_in_dim(x, 0, T, axis=-2)


# Per-diagonal q.k_r products contract over the HEAD dim D, which sits in
# TPU lanes -- a VPU cross-lane reduction that, like the LN sublane
# reductions (ops/masked.py:_LN_DOT_MIN_T), runs far off the floor at long
# T and is bf16-hostile (measured (2,4,32768,32): 0.94 ms f32 / 1.60 ms
# bf16 vs 0.71 / 0.58 ms when the contraction is a ones-vector DOT on the
# MXU; scripts/results/bf16_micro_ab4.json). Mode "bf16" (default) engages
# the dot form only for non-f32 activations: composed-f32 programs lose
# fusion around the HIGHEST stat dots (see the ops/masked.py note; the
# mad_stage_profile_f32_r5* A/B covers both dispatches together).
_DIAG_DOT_MIN_T = 4096
_DIAG_DOT_MODE = "bf16"  # "bf16" | "always" | "never"


def set_diag_dot(mode, min_t=None):
    """Set the MXU (ones-dot) diagonal-score mode ("bf16" | "always" |
    "never"; bools map to always/never)."""
    global _DIAG_DOT_MODE, _DIAG_DOT_MIN_T
    if isinstance(mode, bool):
        mode = "always" if mode else "never"
    assert mode in ("bf16", "always", "never")
    _DIAG_DOT_MODE = mode
    if min_t is not None:
        _DIAG_DOT_MIN_T = min_t


def band_attention_diag(q, k, v, kv_mask, window_size):
    """Banded attention via per-diagonal products: the (T, w) score tensor
    replaces the chunked formulation's (T, c + 2*halo) tiles, cutting the
    HBM traffic of the softmax passes by ~(c + 2*halo)/w (~27x at the
    default chunk and w=5). All shifts are static pad+slice; everything
    fuses into a handful of elementwise passes. This mirrors the
    reference's as_strided diagonal band assembly
    (libs/modeling/blocks.py:243-301) expressed as XLA-fusible shifts.

    The fastest formulation for SHORT, heavily batched sequences (NLQ-scale
    eval: measured ~5x over the chunked form at (64, 4, 2304, 32)); the
    chunked/Pallas forms win for long single sequences where per-diagonal
    shifts stop fusing.
    """
    assert window_size % 2 == 1 and window_size > 0
    halo = window_size // 2
    B, H, T, D = q.shape
    mask_f = kv_mask.astype(jnp.float32)[:, None, :]        # (B, 1, T)
    use_dot = T >= _DIAG_DOT_MIN_T and (
        _DIAG_DOT_MODE == "always"
        or (_DIAG_DOT_MODE == "bf16" and q.dtype != jnp.float32))
    ones_d = jnp.ones((D,), q.dtype)
    hi = jax.lax.Precision.HIGHEST

    scores = []
    for r in range(-halo, halo + 1):
        k_r = _shift_time(k, r)
        if use_dot:
            # contraction over lanes as a ones-dot on the MXU; the q*k_r
            # product stays in the compute dtype (exact for f32; for bf16
            # the end-to-end effect is covered by the promotion study)
            s = jnp.einsum("bhtd,d->bht", q * k_r, ones_d, precision=hi,
                           preferred_element_type=jnp.float32)
        else:
            s = jnp.einsum("bhtd,bhtd->bht", q, k_r,
                           preferred_element_type=jnp.float32)  # (B, H, T)
        m_r = _shift_time(mask_f[..., None], r)[..., 0]     # (B, 1, T)
        scores.append(jnp.where(m_r > 0, s, -jnp.inf))
    s = jnp.stack(scores, axis=-1)                          # (B, H, T, w)

    smax = jnp.max(s, axis=-1, keepdims=True)
    smax = jnp.where(jnp.isfinite(smax), smax, 0.0)
    p = jnp.exp(s - smax)
    p = jnp.where(jnp.isfinite(s), p, 0.0)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    p = p / jnp.maximum(denom, jnp.finfo(p.dtype).tiny)

    out = jnp.zeros(q.shape, jnp.float32)
    for i, r in enumerate(range(-halo, halo + 1)):
        out = out + p[..., i:i + 1] * _shift_time(v, r).astype(jnp.float32)
    qmask = kv_mask[:, None, :, None].astype(out.dtype)
    return (out * qmask).astype(q.dtype)


def band_attention_reference(q, k, v, kv_mask, window_size):
    """Brute-force O(t^2) oracle replicating the reference numerics,
    including the additive -1e4 key mask (used by tests only)."""
    halo = window_size // 2
    B, H, T, D = q.shape
    scores = jnp.einsum("bhid,bhjd->bhij", q, k,
                        preferred_element_type=jnp.float32)
    i = jnp.arange(T)[:, None]
    j = jnp.arange(T)[None, :]
    in_band = jnp.abs(i - j) <= halo
    scores = scores + jnp.where(kv_mask[:, None, None, :], 0.0, -1e4)
    scores = jnp.where(in_band[None, None], scores, -jnp.inf)
    attn = jax.nn.softmax(scores, axis=-1)
    attn = jnp.where(kv_mask[:, None, :, None], attn, 0.0)  # zero invalid rows
    out = jnp.einsum("bhij,bhjd->bhid", attn.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    return out.astype(q.dtype)


# ---------------------------------------------------------------------------
# Pallas backend
# ---------------------------------------------------------------------------


def _band_attention_pallas_impl(q, k, v, kv_mask, window_size,
                                chunk=DEFAULT_CHUNK, interpret=False):
    """Fused Pallas TPU kernel computing the same banded attention.

    Grid: (B, n_chunks). Overlapping neighborhoods are assembled from three
    regular BlockSpec tiles of the key/value/mask tensors -- the previous,
    current and next chunk (edge chunks clamp their neighbor index and are
    invalidated arithmetically). This keeps every tile MXU-aligned and avoids
    manual DMA (mid-dimension dynamic-slice DMAs crash this Mosaic
    toolchain). The (c, 3c) banded score tile lives only in VMEM/registers.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    assert window_size % 2 == 1 and window_size > 0
    halo = window_size // 2
    B, H, T, D = q.shape
    c = min(chunk, _next_multiple(T, 8))
    assert c >= halo, "chunk must be at least the attention halo"
    Tp = _next_multiple(T, c)
    nc = Tp // c

    pad_t = Tp - T
    if pad_t:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, pad_t), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, 0), (0, pad_t), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, pad_t), (0, 0)))
        kv_mask = jnp.pad(kv_mask, ((0, 0), (0, pad_t)))
    mask_f = kv_mask.astype(jnp.float32)[:, None, :]  # (B, 1, Tp)
    # edge invalidation is baked into time-shifted mask arrays (NOT
    # program_id arithmetic -- scalar pid broadcasts hang this Mosaic
    # toolchain): block n of m_prev holds chunk (n-1)'s mask, zeros at n=0.
    m_prev = jnp.pad(mask_f, ((0, 0), (0, 0), (c, 0)))[:, :, :Tp]
    m_next = jnp.pad(mask_f, ((0, 0), (0, 0), (0, c)))[:, :, c:]

    # per-segment band masks: query local i attends prev-chunk column j iff
    # (j - c) - i in [-halo, halo], etc.
    i = np.arange(c)[:, None]
    j = np.arange(c)[None, :]
    band_p = jnp.asarray((np.abs((j - c) - i) <= halo).astype(np.float32))
    band_c = jnp.asarray((np.abs(j - i) <= halo).astype(np.float32))
    band_n = jnp.asarray((np.abs((j + c) - i) <= halo).astype(np.float32))

    def prev_ix(b, n):
        return (b, 0, jnp.maximum(n - 1, 0), 0)

    def cur_ix(b, n):
        return (b, 0, n, 0)

    def next_ix(b, n):
        return (b, 0, jnp.minimum(n + 1, nc - 1), 0)

    kv_spec = lambda ix: pl.BlockSpec((1, H, c, D), ix,
                                      memory_space=pltpu.VMEM)
    m_spec = pl.BlockSpec((1, 1, c), lambda b, n: (b, 0, n),
                          memory_space=pltpu.VMEM)
    band_spec = pl.BlockSpec((c, c), lambda b, n: (0, 0),
                             memory_space=pltpu.VMEM)

    def kernel(q_ref, kp, kc, kn, vp, vc, vn, mp, mc, mn,
               bp, bc, bn, o_ref):
        big_neg = jnp.float32(-1e30)
        valid_p = bp[:] * mp[0, 0][None, :]               # (c, c)
        valid_c = bc[:] * mc[0, 0][None, :]
        valid_n = bn[:] * mn[0, 0][None, :]
        for h in range(H):
            qh = q_ref[0, h].astype(jnp.float32)          # (c, D)

            def scores(k_ref, valid):
                # precision pinned: Mosaic rejects a global default of HIGH,
                # and the kernel math is f32 regardless
                s = jax.lax.dot_general(
                    qh, k_ref[0, h].astype(jnp.float32),
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)  # (c, c)
                return jnp.where(valid > 0, s, big_neg)

            s_p = scores(kp, valid_p)
            s_c = scores(kc, valid_c)
            s_n = scores(kn, valid_n)
            smax = jnp.maximum(
                jnp.max(s_p, axis=-1, keepdims=True),
                jnp.maximum(jnp.max(s_c, axis=-1, keepdims=True),
                            jnp.max(s_n, axis=-1, keepdims=True)))
            p_p = jnp.exp(s_p - smax) * valid_p
            p_c = jnp.exp(s_c - smax) * valid_c
            p_n = jnp.exp(s_n - smax) * valid_n
            denom = (jnp.sum(p_p, axis=-1, keepdims=True)
                     + jnp.sum(p_c, axis=-1, keepdims=True)
                     + jnp.sum(p_n, axis=-1, keepdims=True))
            denom = jnp.maximum(denom, 1e-37)

            def weighted(p, v_ref):
                return jax.lax.dot_general(
                    p, v_ref[0, h].astype(jnp.float32),
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)

            out_h = (weighted(p_p, vp) + weighted(p_c, vc)
                     + weighted(p_n, vn)) / denom
            o_ref[0, h] = out_h.astype(o_ref.dtype)

    out = pl.pallas_call(
        kernel,
        grid=(B, nc),
        in_specs=[
            pl.BlockSpec((1, H, c, D), cur_ix, memory_space=pltpu.VMEM),
            kv_spec(prev_ix), kv_spec(cur_ix), kv_spec(next_ix),
            kv_spec(prev_ix), kv_spec(cur_ix), kv_spec(next_ix),
            m_spec, m_spec, m_spec,
            band_spec, band_spec, band_spec,
        ],
        out_specs=pl.BlockSpec((1, H, c, D), cur_ix,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, Tp, D), q.dtype),
        interpret=interpret,
    )(q, k, k, k, v, v, v, m_prev, mask_f, m_next, band_p, band_c, band_n)

    out = out[:, :, :T]
    qmask = kv_mask[:, None, :T, None].astype(out.dtype)
    return out * qmask


@partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _band_attention_pallas_vjp(q, k, v, kv_mask, window_size, chunk,
                               interpret):
    return _band_attention_pallas_impl(q, k, v, kv_mask, window_size,
                                       chunk=chunk, interpret=interpret)


def _band_pallas_fwd(q, k, v, kv_mask, window_size, chunk, interpret):
    out = _band_attention_pallas_impl(q, k, v, kv_mask, window_size,
                                      chunk=chunk, interpret=interpret)
    return out, (q, k, v, kv_mask)


def _band_pallas_bwd(window_size, chunk, interpret, res, g):
    q, k, v, kv_mask = res
    _, vjp = jax.vjp(
        lambda q_, k_, v_: band_attention_xla(q_, k_, v_, kv_mask,
                                              window_size, chunk=chunk),
        q, k, v)
    dq, dk, dv = vjp(g)
    # boolean mask cotangent: float0 (non-differentiable input)
    dmask = np.zeros(kv_mask.shape, jax.dtypes.float0)
    return dq, dk, dv, dmask


_band_attention_pallas_vjp.defvjp(_band_pallas_fwd, _band_pallas_bwd)


def band_attention_pallas(q, k, v, kv_mask, window_size, chunk=DEFAULT_CHUNK,
                          interpret=False):
    """Differentiable fused Pallas band attention.

    Mosaic kernels have no reverse-mode rule, so the kernel is wrapped in a
    ``custom_vjp``: the forward runs the fused kernel; the backward
    recomputes through the XLA chunked formulation (numerically identical
    to <2e-6, see tests/test_local_attention.py) and takes its VJP. This is
    effectively rematerialization -- no residuals besides the inputs are
    saved -- which is exactly the memory profile long-sequence (MAD 32k)
    training wants. Without this, ``jax.grad`` through the auto-dispatched
    Pallas path (T >= PALLAS_MIN_T on TPU) crashed with "Linearization
    failed" (round-2 VERDICT item 2)."""
    return _band_attention_pallas_vjp(q, k, v, kv_mask, window_size,
                                      int(chunk), bool(interpret))


_BACKEND = "auto"

# retained for the explicit 'pallas' backend and historical context: round-2
# measured the fused Pallas kernel beating the CHUNKED XLA formulation for
# long single sequences. Round 3's diagonal formulation beats both at every
# measured shape (v5e, w=5: 3.0x pallas at (64,4,2304,32), 3.4x pallas at
# (2,4,32768,32)), so 'auto' now always picks 'diag'.
PALLAS_MIN_T = 8192


def set_backend(name):
    """Set the global banded-attention backend:
    'diag' | 'xla' | 'pallas' | 'auto'.

    'auto' resolves to the diagonal formulation -- the fastest measured at
    every live shape (see PARITY.md round-3 kernel notes); 'xla' (chunked
    dense) and 'pallas' (fused Mosaic kernel) remain selectable for
    cross-checks."""
    global _BACKEND
    assert name in ("diag", "xla", "pallas", "auto")
    _BACKEND = name


def get_backend():
    return _BACKEND


def band_attention(q, k, v, kv_mask, window_size, chunk=DEFAULT_CHUNK,
                   backend=None):
    """Dispatch banded attention to the configured backend."""
    backend = backend or _BACKEND
    if backend == "auto":
        backend = "diag"
    if backend == "pallas":
        return band_attention_pallas(q, k, v, kv_mask, window_size,
                                     chunk=chunk)
    if backend == "diag":
        return band_attention_diag(q, k, v, kv_mask, window_size)
    return band_attention_xla(q, k, v, kv_mask, window_size, chunk=chunk)
