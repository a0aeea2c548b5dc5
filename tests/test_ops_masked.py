"""Masked primitive ops vs torch oracles (torch CPU defines the reference
semantics: F.max_pool1d, F.interpolate, channel-first LayerNorm math)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from decafnet_tpu.ops import (
    masked_avg_pool1d,
    masked_max_pool1d,
    interpolate_nearest_1d,
    interpolate_linear_1d,
    sinusoid_encoding,
    channel_layer_norm,
)

RNG = np.random.RandomState(0)


def _prefix_mask(bs, t, lens):
    m = np.zeros((bs, 1, t), bool)
    for i, n in enumerate(lens):
        m[i, :, :n] = True
    return m


def test_masked_avg_pool1d():
    x = RNG.randn(3, 8, 40).astype(np.float32)
    mask = _prefix_mask(3, 40, [40, 17, 5])
    got = np.asarray(masked_avg_pool1d(jnp.asarray(x), jnp.asarray(mask)))
    tx = torch.from_numpy(x)
    tm = torch.from_numpy(mask)
    want = (tx * tm).sum(-1, keepdim=True) / tm.sum(-1, keepdim=True)
    np.testing.assert_allclose(got, want.numpy(), rtol=1e-6, atol=1e-6)


def test_masked_avg_pool1d_fully_masked_row_is_zero():
    """An all-masked row must pool to zeros, not NaN (the reference NaNs on
    0/0, libs/modeling/blocks.py:9-17; this framework's padded-row invariant
    forbids NaN leaking through padding)."""
    x = RNG.randn(2, 8, 40).astype(np.float32)
    mask = _prefix_mask(2, 40, [13, 0])
    got = np.asarray(masked_avg_pool1d(jnp.asarray(x), jnp.asarray(mask)))
    assert np.isfinite(got).all()
    np.testing.assert_array_equal(got[1], 0.0)
    want = (x[0] * mask[0]).sum(-1, keepdims=True) / mask[0].sum()
    np.testing.assert_allclose(got[0], want, rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("t,lens", [(40, [40, 18, 7]), (64, [64, 64, 63])])
def test_masked_max_pool1d(t, lens):
    x = RNG.randn(3, 8, t).astype(np.float32)
    mask = _prefix_mask(3, t, lens)
    got_x, got_m = masked_max_pool1d(jnp.asarray(x), jnp.asarray(mask), 3, 2)

    # torch oracle mirroring reference blocks.py:31-47
    tx = torch.from_numpy(x)
    tm = torch.from_numpy(mask)
    x_min = tx.amin(dim=-1, keepdim=True)
    mf = tm.float()
    tx2 = tx * mf + (~tm).float() * x_min
    want_x = F.max_pool1d(tx2, 3, 2, 1)
    want_m = F.max_pool1d(mf, 3, 2, 1)
    want_x = want_x * want_m
    np.testing.assert_allclose(np.asarray(got_x), want_x.numpy(),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(got_m), want_m.bool().numpy())


@pytest.mark.parametrize("in_size,out_size", [
    (7, 70), (3, 70), (16, 5), (5, 5), (37, 2304), (2, 70), (1, 7),
    # gather-free fast paths (strided-slice downsample / pow-2 repeat
    # upsample) must stay bit-identical to the torch formulation
    (64, 32), (96, 32), (70, 7), (32, 64), (16, 128), (512, 32768),
])
def test_interpolate_nearest(in_size, out_size):
    x = RNG.randn(2, 4, in_size).astype(np.float32)
    got = np.asarray(interpolate_nearest_1d(jnp.asarray(x), out_size))
    want = F.interpolate(torch.from_numpy(x), size=out_size, mode="nearest")
    np.testing.assert_array_equal(got, want.numpy())


@pytest.mark.parametrize("in_size,out_size", [(64, 100), (256, 2304), (10, 3)])
def test_interpolate_linear_align_corners(in_size, out_size):
    x = RNG.randn(1, 8, in_size).astype(np.float32)
    got = np.asarray(interpolate_linear_1d(jnp.asarray(x), out_size,
                                           align_corners=True))
    want = F.interpolate(torch.from_numpy(x), size=out_size, mode="linear",
                         align_corners=True)
    np.testing.assert_allclose(got, want.numpy(), rtol=1e-4, atol=5e-5)


def test_sinusoid_encoding():
    # torch oracle replicating reference blocks.py:134-142
    seq_len, n_freqs = 96, 64
    got = sinusoid_encoding(seq_len, n_freqs)
    tics = torch.arange(seq_len, dtype=torch.float)
    freqs = 10000 ** torch.linspace(0, 1, n_freqs + 1)[:n_freqs]
    x = tics[None, :] / freqs[:, None]
    want = torch.cat((torch.sin(x), torch.cos(x)))
    np.testing.assert_allclose(got, want.numpy(), rtol=1e-4, atol=2e-5)


def test_channel_layer_norm():
    x = RNG.randn(4, 16, 30).astype(np.float32)
    w = RNG.randn(16, 1).astype(np.float32)
    b = RNG.randn(16, 1).astype(np.float32)
    got = np.asarray(channel_layer_norm(
        jnp.asarray(x), jnp.asarray(w), jnp.asarray(b)))
    tx = torch.from_numpy(x)
    tx = tx - tx.mean(dim=1, keepdim=True)
    sigma = (tx ** 2).mean(dim=1, keepdim=True)
    want = tx / torch.sqrt(sigma + 1e-5)
    want = want * torch.from_numpy(w) + torch.from_numpy(b)
    np.testing.assert_allclose(got, want.numpy(), rtol=1e-5, atol=1e-5)


def test_channel_layer_norm_dot_path_matches_reduce():
    """Round-5 MXU statistics path: above _LN_DOT_MIN_T the channel
    mean/variance are ones-vector dots (the VPU sublane reduction runs far
    off the bandwidth floor at long T and is bf16-hostile; see
    ops/masked.py). The two formulations differ only by f32 summation
    order -- pinned here at a long-T shape against the reduce form and the
    torch oracle."""
    from decafnet_tpu.ops.masked import _LN_DOT_MIN_T, set_ln_dot

    t = max(_LN_DOT_MIN_T, 4096)
    x = RNG.randn(2, 16, t).astype(np.float32) * 3.0 + 1.5
    w = RNG.randn(16, 1).astype(np.float32)
    b = RNG.randn(16, 1).astype(np.float32)
    try:
        # default mode is "bf16" (CPU tests run f32 activations), so the
        # dot leg is forced on here and the reduce leg forced off
        set_ln_dot("always")
        got_dot = np.asarray(channel_layer_norm(
            jnp.asarray(x), jnp.asarray(w), jnp.asarray(b)))
        set_ln_dot("never")
        got_reduce = np.asarray(channel_layer_norm(
            jnp.asarray(x), jnp.asarray(w), jnp.asarray(b)))
    finally:
        set_ln_dot("bf16")
    np.testing.assert_allclose(got_dot, got_reduce, rtol=1e-5, atol=1e-5)

    tx = torch.from_numpy(x)
    tx = tx - tx.mean(dim=1, keepdim=True)
    sigma = (tx ** 2).mean(dim=1, keepdim=True)
    want = tx / torch.sqrt(sigma + 1e-5)
    want = want * torch.from_numpy(w) + torch.from_numpy(b)
    np.testing.assert_allclose(got_dot, want.numpy(), rtol=1e-4, atol=1e-4)
