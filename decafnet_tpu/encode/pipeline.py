"""Delegate-and-conquer ENCODING on device: the paper's pipeline that the
reference performs offline (its repo only loads feature files,
SURVEY.md section 0). The sidekick encoder sees every clip cheaply; the
saliency map selects the top-``ratio`` bins; the expert encoder runs ONLY
on the selected clips -- this is where the paper's compute saving comes
from, now expressed TPU-natively:

  * the expert clip budget ``k`` is computed on the host from (T, sn,
    ratio) as the exact upper bound of selectable clips, so XLA compiles
    one expert program per (k-bucket) instead of per selection pattern;
  * clip selection reuses the tested delegation bin math
    (ops/delegation.py); the expert encodes a gathered (k, F, H, W, 3)
    frame block -- moving pixels once is far cheaper than encoding the
    unselected clips;
  * features scatter back densely via a one-hot matmul (no index scatters
    on TPU) and are gated by the binary weight, exactly like the
    reference's gating of precomputed expert features
    (libs/modeling/model.py:606-612).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ..ops.delegation import delegation_weights, saliency_correlation


def expert_budget(T, sn, ratio):
    """Exact upper bound of clips delegation can select: kept bins x bin
    size (the keep-all quirk int(ratio*nbins)==0 selects every bin,
    reference: libs/modeling/model.py:599)."""
    nbins = -(-T // sn)
    kept = int(ratio * nbins) or nbins
    return min(kept * sn, T)


def select_salient_clips(sidekick_feats, text_cls, sn, ratio, k,
                         normalize=False):
    """Top-k salient clip indices from sidekick features.

    Args:
      sidekick_feats: (C, T) array.
      text_cls: (C,) query CLS embedding.
      sn, ratio: delegation bin size / keep fraction (reference knobs).
      k: static expert clip budget (``expert_budget``; >= the number of
         selected clips by construction).

    Returns:
      idx (k,) int32 unique clip indices -- every selected clip, then the
      lowest-index unselected clips as inert filler (their features are
      zeroed by the weight gate downstream); weight (T,) float32 binary
      delegation weight.
    """
    T = sidekick_feats.shape[-1]
    correl = saliency_correlation(sidekick_feats[None], text_cls[None],
                                  normalize=normalize)
    weight = delegation_weights(correl, jnp.ones((1, T), bool), sn, ratio)[0]
    # order clips by (selected first, then index) -- static shapes
    order = jnp.argsort(-weight * 2.0 - (T - jnp.arange(T)) / (T + 1.0))
    idx = order[:k]
    return idx.astype(jnp.int32), weight


def gather_clips(frames, idx, dtype=None):
    """Device-side clip gather as a one-hot matmul (jittable).

    ``jnp.take`` on a (T, F, H, W, 3) frame tensor lowers to an XLA
    dynamic-gather that measures ~100 ms at T=512 on this TPU; the
    (k, T) @ (T, F*H*W*3) one-hot matmul is MXU-bound and effectively
    free (repo rule: no index gathers in hot paths).

    Args:
      frames: (T, ...) array; idx: (k,) int indices; dtype: matmul dtype
        (e.g. jnp.bfloat16 when the downstream encoder runs bf16 matmuls;
        default keeps the frame dtype).

    Returns:
      (k, ...) gathered frames in ``dtype``.
    """
    import jax

    T = frames.shape[0]
    dtype = dtype or frames.dtype
    sel = jax.nn.one_hot(idx, T, dtype=dtype)              # (k, T)
    flat = frames.reshape(T, -1).astype(dtype)
    return (sel @ flat).reshape((idx.shape[0],) + frames.shape[1:])


def delegated_encode(expert_runner, idx, weight, frames):
    """Expert-encode only the selected clips and scatter into the dense,
    weight-gated (out_dim, T) stream (one-hot matmul scatter)."""
    idx = np.asarray(idx)
    weight = np.asarray(weight)
    T = weight.shape[0]
    k = idx.shape[0]
    feats_k = expert_runner(np.asarray(frames)[idx])      # (out_dim, k)
    onehot = np.zeros((k, T), np.float32)
    onehot[np.arange(k), idx] = 1.0                       # idx is unique
    dense = feats_k @ onehot                              # (out_dim, T)
    return dense * weight[None, :]


def encode_delegate_ground(expert_runner, sidekick_runner, frames,
                           sidekick_frames, text_cls, sn, ratio,
                           normalize=False):
    """Full on-device DeCafNet front end: sidekick-encode every clip,
    select salient bins, expert-encode only those clips. Returns
    (expert (C,T) gated dense, sidekick (C,T), weight (T,)) ready for the
    grounder's ``msf`` concat path."""
    sidekick = sidekick_runner(np.asarray(sidekick_frames))   # (C, T)
    T = sidekick.shape[-1]
    k = expert_budget(T, sn, ratio)
    idx, weight = select_salient_clips(
        jnp.asarray(sidekick), jnp.asarray(text_cls), sn, ratio, k,
        normalize=normalize)
    expert = delegated_encode(expert_runner, idx, weight, frames)
    return expert, sidekick, np.asarray(weight)
