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
  * ``pallas`` backend: the same math as a fused Pallas kernel. Keys /
    values stay in HBM; each program DMAs its overlapping neighborhood into
    VMEM, so the (C, C + 2*halo) score tile never round-trips to HBM.
  * ``reference``: a brute-force O(t^2) oracle used by the test suite.

In fp32 the additive -1e4 key mask and a hard -inf mask are bitwise
equivalent after softmax (exp underflows to exactly 0 against any realistic
score), so both invalid and out-of-range positions are handled with a single
masked, max-subtracted softmax whose fully-masked rows are zeroed.
"""

from __future__ import annotations

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


def band_attention_pallas(q, k, v, kv_mask, window_size, chunk=DEFAULT_CHUNK,
                          interpret=False):
    """Fused Pallas TPU kernel computing the same banded attention.

    Grid: (B, n_chunks). The query chunk arrives in VMEM through a regular
    BlockSpec; the overlapping key/value/mask neighborhoods (which a tiled
    BlockSpec cannot express) are DMA'd from HBM into VMEM scratch buffers.
    Scores are computed per head in fp32 on the MXU and never leave VMEM.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    assert window_size % 2 == 1 and window_size > 0
    halo = window_size // 2
    B, H, T, D = q.shape
    c = min(chunk, _next_multiple(T, 8))
    Tp = _next_multiple(T, c)
    nc = Tp // c
    nb = c + 2 * halo

    pad_t = Tp - T
    q = jnp.pad(q, ((0, 0), (0, 0), (0, pad_t), (0, 0)))
    # halo-padded keys/values/mask stay in HBM; programs slice neighborhoods
    k2 = jnp.pad(k, ((0, 0), (0, 0), (halo, pad_t + halo), (0, 0)))
    v2 = jnp.pad(v, ((0, 0), (0, 0), (halo, pad_t + halo), (0, 0)))
    m2 = jnp.pad(kv_mask, ((0, 0), (halo, pad_t + halo))).astype(jnp.float32)

    band = _band_mask(c, halo).astype(jnp.float32)  # (c, nb)

    def kernel(q_ref, k_hbm, v_hbm, m_hbm, band_ref, o_ref,
               kb, vb, mb, sems):
        b = pl.program_id(0)
        n = pl.program_id(1)
        start = n * c

        cp_k = pltpu.make_async_copy(
            k_hbm.at[b, :, pl.ds(start, nb), :], kb, sems.at[0])
        cp_v = pltpu.make_async_copy(
            v_hbm.at[b, :, pl.ds(start, nb), :], vb, sems.at[1])
        cp_m = pltpu.make_async_copy(
            m_hbm.at[pl.ds(b, 1), pl.ds(start, nb)], mb, sems.at[2])
        cp_k.start()
        cp_v.start()
        cp_m.start()
        cp_k.wait()
        cp_v.wait()
        cp_m.wait()

        valid = band_ref[:] * mb[0][None, :]            # (c, nb)
        big_neg = jnp.float32(-1e30)
        for h in range(H):
            qh = q_ref[0, h].astype(jnp.float32)        # (c, D)
            kh = kb[h].astype(jnp.float32)              # (nb, D)
            vh = vb[h].astype(jnp.float32)
            s = jax.lax.dot_general(
                qh, kh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)     # (c, nb)
            s = jnp.where(valid > 0, s, big_neg)
            smax = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - smax) * valid
            denom = jnp.maximum(jnp.sum(p, axis=-1, keepdims=True), 1e-37)
            p = p / denom
            o_ref[0, h] = jax.lax.dot_general(
                p, vh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(o_ref.dtype)

    out = pl.pallas_call(
        kernel,
        grid=(B, nc),
        in_specs=[
            pl.BlockSpec((1, H, c, D), lambda b, n: (b, 0, n, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((c, nb), lambda b, n: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, H, c, D), lambda b, n: (b, 0, n, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, Tp, D), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((H, nb, D), q.dtype),
            pltpu.VMEM((H, nb, D), q.dtype),
            pltpu.VMEM((1, nb), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        interpret=interpret,
    )(q, k2, v2, m2, band)

    out = out[:, :, :T]
    qmask = kv_mask[:, None, :T, None].astype(out.dtype)
    return out * qmask


_BACKEND = "xla"


def set_backend(name):
    """Set the global banded-attention backend: 'xla' | 'pallas' | 'auto'."""
    global _BACKEND
    assert name in ("xla", "pallas", "auto")
    _BACKEND = "xla" if name == "auto" else name


def get_backend():
    return _BACKEND


def band_attention(q, k, v, kv_mask, window_size, chunk=DEFAULT_CHUNK,
                   backend=None):
    """Dispatch banded attention to the configured backend."""
    backend = backend or _BACKEND
    if backend == "pallas":
        return band_attention_pallas(q, k, v, kv_mask, window_size, chunk=chunk)
    return band_attention_xla(q, k, v, kv_mask, window_size, chunk=chunk)
