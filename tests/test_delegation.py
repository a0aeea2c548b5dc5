"""Vectorized delegation vs a torch oracle replicating the reference's
per-sample loop (avg_pool1d ceil_mode -> argsort top-k -> nearest upsample)."""

import numpy as np
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from decafnet_tpu.ops import delegation_weights, saliency_correlation

RNG = np.random.RandomState(2)


def torch_delegation_oracle(correl, masks, sn, ratio):
    """Mirrors libs/modeling/model.py:593-604 semantics."""
    correl = torch.from_numpy(correl)
    masks = torch.from_numpy(masks)
    all_weight = torch.zeros_like(correl)
    for b in range(correl.shape[0]):
        vid_len = int(masks[b].sum())
        if vid_len == 0:
            continue
        cb = F.avg_pool1d(correl[b, None, :vid_len], kernel_size=sn,
                          stride=sn, ceil_mode=True)[0]
        ranked = cb.argsort()
        # NOTE ranked[-0:] selects ALL bins -- the reference inherits this
        # Python slicing quirk and so must we
        topk = ranked[-int(ratio * cb.shape[0]):]
        weight = torch.zeros_like(cb)
        weight[topk] = 1
        weight = F.interpolate(weight[None, None, :], size=vid_len,
                               mode="nearest")[0, 0]
        all_weight[b, :vid_len] = weight
    return all_weight.numpy()


def test_delegation_weights_vs_torch():
    B, T, sn = 6, 512, 60
    correl = RNG.randn(B, T).astype(np.float32) * 3
    masks = np.zeros((B, T), bool)
    lens = [512, 300, 121, 60, 59, 1]
    for i, n in enumerate(lens):
        masks[i, :n] = True
    for ratio in (0.3, 0.5, 1.0):
        got = np.asarray(delegation_weights(
            jnp.asarray(correl), jnp.asarray(masks), sn, ratio))
        want = torch_delegation_oracle(correl, masks, sn, ratio)
        np.testing.assert_array_equal(got, want)


def test_delegation_small_bins():
    # fewer clips than one bin, ratio*nbins truncates to 0 or 1
    B, T, sn = 2, 100, 60
    correl = RNG.randn(B, T).astype(np.float32)
    masks = np.ones((B, T), bool)
    for ratio in (0.3, 0.9):
        got = np.asarray(delegation_weights(
            jnp.asarray(correl), jnp.asarray(masks), sn, ratio))
        want = torch_delegation_oracle(correl, masks, sn, ratio)
        np.testing.assert_array_equal(got, want)


def test_delegation_f64_truncation():
    """int(ratio * nbins) must use the reference's Python f64 semantics
    (libs/modeling/model.py:598-599): e.g. 0.29 * 100 = 28.999... -> 28 in
    f64 but 29.000002 -> 29 when both operands round through f32. The
    on-device k lookup table is built with Python ints at trace time, so
    every (ratio, nbins) matches exactly."""
    for ratio, nbins in ((0.29, 100), (0.145, 200), (0.21, 300)):
        correl = RNG.randn(1, nbins).astype(np.float32)
        masks = np.ones((1, nbins), bool)
        got = np.asarray(delegation_weights(
            jnp.asarray(correl), jnp.asarray(masks), sn=1, ratio=ratio))
        want = torch_delegation_oracle(correl, masks, 1, ratio)
        assert int(got.sum()) == int(ratio * nbins)  # the f64 truncation
        np.testing.assert_array_equal(got, want)


def test_saliency_correlation_norm():
    B, C, T = 3, 32, 50
    sv = RNG.randn(B, C, T).astype(np.float32)
    tc = RNG.randn(B, C).astype(np.float32)
    got = np.asarray(saliency_correlation(
        jnp.asarray(sv), jnp.asarray(tc), normalize=True))
    tsv = torch.from_numpy(sv)
    ttc = torch.from_numpy(tc)
    v = tsv / (tsv.norm(dim=1, keepdim=True) + 1e-4)
    t = ttc / (ttc.norm(dim=1, keepdim=True) + 1e-4)
    want = torch.einsum("bht,bh->bt", v, t).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
