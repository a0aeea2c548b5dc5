"""Depthwise conv3 shift-multiply-add fast path (nn/blocks.py:Conv1d).

Pins the fast path against both the general ``conv_general_dilated``
lowering and a torch depthwise conv oracle, at stride 1 and the stride-2
downsampling form, and through MaskedConv1D's mask handling.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from decafnet_tpu.nn.blocks import Conv1d, MaskedConv1D

RNG = np.random.RandomState(7)


def _torch_depthwise(x, w, stride):
    conv = torch.nn.Conv1d(x.shape[1], x.shape[1], 3, stride=stride,
                           padding=1, groups=x.shape[1], bias=False)
    with torch.no_grad():
        conv.weight.copy_(torch.from_numpy(w))
    return conv(torch.from_numpy(x)).detach().numpy()


@pytest.mark.parametrize("stride,T", [(1, 64), (2, 64), (1, 37), (2, 37)])
def test_depthwise_fast_path_matches_torch_and_lax(stride, T):
    C = 16
    x = RNG.randn(2, C, T).astype(np.float32)
    conv = Conv1d(C, C, 3, stride=stride, padding=1, groups=C,
                  use_bias=False)
    params = conv.init(jax.random.PRNGKey(0), jnp.asarray(x))
    w = np.asarray(params["params"]["weight"])

    got = np.asarray(conv.apply(params, jnp.asarray(x)))
    want_torch = _torch_depthwise(x, w, stride)
    np.testing.assert_allclose(got, want_torch, rtol=1e-5, atol=1e-6)

    want_lax = np.asarray(jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(w), window_strides=(stride,),
        padding=[(1, 1)], dimension_numbers=("NCH", "OIH", "NCH"),
        feature_group_count=C))
    np.testing.assert_allclose(got, want_lax, rtol=1e-5, atol=1e-6)


def test_depthwise_masked_conv_stride2_mask_downsample():
    C, T = 8, 32
    x = RNG.randn(2, C, T).astype(np.float32)
    mask = np.zeros((2, 1, T), bool)
    mask[0, :, :29] = True
    mask[1, :, :15] = True
    m = MaskedConv1D(C, C, 3, 2, 1, groups=C, use_bias=False)
    params = m.init(jax.random.PRNGKey(1), jnp.asarray(x), jnp.asarray(mask))
    w = np.asarray(params["params"]["conv"]["weight"])

    y, y_mask = m.apply(params, jnp.asarray(x), jnp.asarray(mask))
    want = _torch_depthwise(x * mask.astype(np.float32), w, 2)
    np.testing.assert_allclose(np.asarray(y), want, rtol=1e-5, atol=1e-6)
    assert y_mask.shape == (2, 1, T // 2)


def test_depthwise_fast_path_grad_matches_general():
    C, T = 8, 48
    x = jnp.asarray(RNG.randn(1, C, T).astype(np.float32))
    w = jnp.asarray(RNG.randn(C, 1, 3).astype(np.float32))

    def fast(w_, x_):
        conv = Conv1d(C, C, 3, stride=1, padding=1, groups=C,
                      use_bias=False)
        return jnp.sum(conv.apply({"params": {"weight": w_}}, x_) ** 2)

    def general(w_, x_):
        y = jax.lax.conv_general_dilated(
            x_, w_, window_strides=(1,), padding=[(1, 1)],
            dimension_numbers=("NCH", "OIH", "NCH"), feature_group_count=C)
        return jnp.sum(y ** 2)

    gw_f, gx_f = jax.grad(fast, argnums=(0, 1))(w, x)
    gw_g, gx_g = jax.grad(general, argnums=(0, 1))(w, x)
    np.testing.assert_allclose(np.asarray(gw_f), np.asarray(gw_g),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_g),
                               rtol=1e-4, atol=1e-5)
