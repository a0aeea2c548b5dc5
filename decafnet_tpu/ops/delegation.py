"""Saliency-based top-c% delegation, fully vectorized (no per-sample loop).

The reference computes, per (video, query) row: a correlation between the
cheap "sidekick" features and the query CLS embedding, average-pools it into
bins of ``sn`` clips (ceil mode over the valid prefix), keeps the top
``int(ratio * nbins)`` bins, and nearest-upsamples the binary bin weights
back to the clip grid (reference: libs/modeling/model.py:587-612, executed
in a Python loop over the batch at model.py:594-604).

Here the whole batch is processed with one one-hot matmul (bin means on the
MXU), a vectorized rank computation, and a gathered nearest upsample --
identical outputs, no host loop, fully jittable with static shapes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def saliency_correlation(shallow_vid, text_cls, normalize=False):
    """corr[b, t] = shallow_vid[b, :, t] . text_cls[b, :], optionally with
    both sides L2-normalized with a +1e-4 denominator offset
    (reference: libs/modeling/model.py:587-592)."""
    if normalize:
        v_norm = jnp.linalg.norm(shallow_vid, axis=1, keepdims=True)
        shallow_vid = shallow_vid / (v_norm + 1e-4)
        t_norm = jnp.linalg.norm(text_cls, axis=1, keepdims=True)
        text_cls = text_cls / (t_norm + 1e-4)
    return jnp.einsum("bht,bh->bt", shallow_vid, text_cls,
                      preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("sn", "ratio"))
def delegation_weights(correl, vid_masks, sn, ratio):
    """Binary per-clip delegation weights.

    Args:
      correl: (B, T) float saliency correlation.
      vid_masks: (B, T) bool; valid positions form a prefix of each row.
      sn: bin size in clips (static).
      ratio: fraction of bins to keep (static).

    Returns:
      (B, T) float32 weights in {0, 1}; zero beyond the valid prefix.
    """
    B, T = correl.shape
    max_bins = -(-T // sn)
    correl = correl.astype(jnp.float32)
    valid = vid_masks.astype(jnp.float32)
    n_valid = jnp.sum(valid, axis=-1).astype(jnp.int32)           # (B,)

    # bin sums / counts over the valid prefix via a static one-hot matmul
    onehot = np.zeros((T, max_bins), np.float32)
    onehot[np.arange(T), np.arange(T) // sn] = 1.0
    onehot = jnp.asarray(onehot)
    bin_sum = (correl * valid) @ onehot                            # (B, K)
    bin_cnt = valid @ onehot                                       # (B, K)
    bin_valid = bin_cnt > 0
    bin_mean = bin_sum / jnp.maximum(bin_cnt, 1.0)

    nbins = jnp.sum(bin_valid.astype(jnp.int32), axis=-1)         # (B,)
    # int(ratio * nbins): the reference computes this in Python float64
    # (reference: libs/modeling/model.py:598-599). f32 on-device rounding can
    # truncate differently (e.g. ratio=0.29 where 0.29*100 is 28.999... in
    # f64 but 29.000002 in f32), so precompute the exact f64 truncation for
    # every possible nbins as a trace-time table and index it on device.
    k_table = np.asarray([int(ratio * n) for n in range(max_bins + 1)],
                         np.int32)
    k_keep = jnp.asarray(k_table)[nbins]
    # reference quirk: ranked[-0:] selects ALL bins, so k == 0 keeps every bin
    # (reference: libs/modeling/model.py:599 with int(ratio*nbins) == 0)
    k_keep = jnp.where(k_keep == 0, nbins, k_keep)

    # rank bins by mean, descending; invalid bins sink to the bottom.
    # rank = argsort(argsort(.)) gives each bin its position in sorted order.
    scores = jnp.where(bin_valid, bin_mean, -jnp.inf)
    ranks = jnp.argsort(jnp.argsort(-scores, axis=-1), axis=-1)    # (B, K)
    selected = (ranks < k_keep[:, None]) & bin_valid               # (B, K)

    # nearest upsample bin weights to the clip grid, replicating torch's
    # F.interpolate(mode='nearest'): src_bin(i) = floor(i * nbins / n_valid)
    pos = jnp.arange(T, dtype=jnp.float32)[None, :]                # (1, T)
    scale = nbins.astype(jnp.float32) / jnp.maximum(
        n_valid.astype(jnp.float32), 1.0)
    src = jnp.floor(pos * scale[:, None]).astype(jnp.int32)
    src = jnp.clip(src, 0, max_bins - 1)
    weight = jnp.take_along_axis(selected.astype(jnp.float32), src, axis=-1)
    return weight * valid


def delegate(vid, shallow_vid, vid_masks, text_cls, sn, ratio,
             normalize=False, msf=False, scat=False, sfonly=False):
    """Apply delegation to the expert stream.

    Mirrors libs/modeling/model.py:587-612: the expert features are gated by
    the binary weights; without ``msf`` the invalid gated positions are also
    removed from the mask; with ``msf`` the shallow stream is concatenated
    channel-wise (or substituted when ``sfonly``); ``scat`` appends the raw
    correlation as one extra channel.

    Args:
      vid: (B, C_exp, T) expert features (already repeated per query).
      shallow_vid: (B, C_side, T).
      vid_masks: (B, T) bool.
      text_cls: (B, C_side) query CLS embeddings.

    Returns:
      (vid, vid_masks, correl) with delegation applied.
    """
    correl = saliency_correlation(shallow_vid, text_cls, normalize=normalize)
    weight = delegation_weights(correl, vid_masks, sn, ratio)
    vid = vid * weight[:, None, :].astype(vid.dtype)
    if not msf:
        vid_masks = (weight > 0) & vid_masks
    elif sfonly:
        vid = shallow_vid
    else:
        vid = jnp.concatenate([vid, shallow_vid], axis=1)
    if scat:
        vid = jnp.concatenate([vid, correl[:, None, :].astype(vid.dtype)], axis=1)
    return vid, vid_masks, correl
