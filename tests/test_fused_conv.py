"""Fused masked-conv3+LN+act kernel vs the unfused module composition and a
torch oracle, including gradients through the custom_vjp (XLA-recompute
backward). Reference semantics: MaskedConv1D (libs/modeling/blocks.py:63-106)
-> channel LayerNorm (blocks.py:109-131) -> ReLU, the heads/embedding hot
stack (libs/modeling/head.py:18-108)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as TF

import jax
import jax.numpy as jnp

from decafnet_tpu.ops.fused_conv import (
    conv3_ln_act_pallas,
    conv3_ln_act_xla,
)

RNG = np.random.RandomState(3)


def _inputs(b=2, c_in=16, c_out=24, t=100, lens=(100, 60), bias=True):
    x = RNG.randn(b, c_in, t).astype(np.float32)
    mask = np.zeros((b, t), bool)
    for i, n in enumerate(lens):
        mask[i, :n] = True
    w = (RNG.randn(c_out, c_in, 3) * 0.2).astype(np.float32)
    bvec = RNG.randn(c_out).astype(np.float32) if bias else None
    ln_w = (1.0 + 0.1 * RNG.randn(c_out)).astype(np.float32)
    ln_b = (0.1 * RNG.randn(c_out)).astype(np.float32)
    return x, mask, w, bvec, ln_w, ln_b


def torch_oracle(x, mask, w, bias, ln_w, ln_b, act="relu", eps=1e-5):
    tx = torch.from_numpy(x) * torch.from_numpy(mask)[:, None, :].float()
    y = TF.conv1d(tx, torch.from_numpy(w),
                  None if bias is None else torch.from_numpy(bias),
                  padding=1)
    mu = y.mean(dim=1, keepdim=True)
    yc = y - mu
    sig = (yc * yc).mean(dim=1, keepdim=True)
    yn = yc / torch.sqrt(sig + eps)
    yn = yn * torch.from_numpy(ln_w)[None, :, None] \
        + torch.from_numpy(ln_b)[None, :, None]
    if act == "relu":
        yn = TF.relu(yn)
    return yn.numpy()


@pytest.mark.parametrize("act", ["relu", "none"])
@pytest.mark.parametrize("bias", [True, False])
def test_xla_composition_vs_torch(act, bias):
    x, mask, w, b, ln_w, ln_b = _inputs(bias=bias)
    got = np.asarray(conv3_ln_act_xla(
        jnp.asarray(x), jnp.asarray(mask), jnp.asarray(w),
        None if b is None else jnp.asarray(b), jnp.asarray(ln_w),
        jnp.asarray(ln_b), act=act))
    want = torch_oracle(x, mask, w, b, ln_w, ln_b, act=act)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("t,chunk", [(100, 128), (256, 128), (700, 256),
                                     (512, 512)])
def test_pallas_interpret_vs_xla(t, chunk):
    x, mask, w, b, ln_w, ln_b = _inputs(t=t, lens=(t, t * 2 // 3))
    args = (jnp.asarray(x), jnp.asarray(mask), jnp.asarray(w),
            jnp.asarray(b), jnp.asarray(ln_w), jnp.asarray(ln_b))
    got = np.asarray(conv3_ln_act_pallas(*args, chunk=chunk,
                                         interpret=True))
    want = np.asarray(conv3_ln_act_xla(*args))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_pallas_chunk_boundary_columns_exact():
    """Columns at chunk boundaries read their conv taps from neighbor
    tiles; they must match the dense conv exactly, including the very
    first/last columns (zero padding)."""
    t, chunk = 384, 128
    x, mask, w, b, ln_w, ln_b = _inputs(t=t, lens=(t, 200))
    args = (jnp.asarray(x), jnp.asarray(mask), jnp.asarray(w),
            jnp.asarray(b), jnp.asarray(ln_w), jnp.asarray(ln_b))
    got = np.asarray(conv3_ln_act_pallas(*args, chunk=chunk,
                                         interpret=True))
    want = torch_oracle(x, mask, w, b, ln_w, ln_b)
    for col in (0, 127, 128, 255, 256, 383):
        np.testing.assert_allclose(got[:, :, col], want[:, :, col],
                                   rtol=1e-4, atol=1e-5,
                                   err_msg=f"col {col}")


def test_pallas_grad_matches_xla():
    """jax.grad through the fused kernel (custom_vjp) == XLA grads for x,
    w, bias and LN params."""
    x, mask, w, b, ln_w, ln_b = _inputs(t=96, lens=(96, 50))
    m = jnp.asarray(mask)
    args = tuple(map(jnp.asarray, (x, w, b, ln_w, ln_b)))

    def loss_p(x, w, b, lw, lb):
        out = conv3_ln_act_pallas(x, m, w, b, lw, lb, chunk=32,
                                  interpret=True)
        return jnp.sum(out * out)

    def loss_x(x, w, b, lw, lb):
        out = conv3_ln_act_xla(x, m, w, b, lw, lb)
        return jnp.sum(out * out)

    gp = jax.grad(loss_p, argnums=tuple(range(5)))(*args)
    gx = jax.grad(loss_x, argnums=tuple(range(5)))(*args)
    for a, b_ in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-4, atol=1e-4)


def _trio_inputs(b=2, c=16, t=200, lens=(200, 130)):
    x = RNG.randn(b, c, t).astype(np.float32)
    mask = np.zeros((b, t), bool)
    for i, n in enumerate(lens):
        mask[i, :n] = True
    ws = tuple((RNG.randn(c, 1, 3) * 0.3).astype(np.float32)
               for _ in range(3))
    lws = tuple((1.0 + 0.1 * RNG.randn(c)).astype(np.float32)
                for _ in range(3))
    lbs = tuple((0.1 * RNG.randn(c)).astype(np.float32) for _ in range(3))
    return x, mask, ws, lws, lbs


def test_qkv_trio_xla_matches_modules():
    """The XLA trio composition == depthwise torch conv + LN per branch."""
    from decafnet_tpu.ops.fused_conv import qkv_depthwise_ln_xla

    x, mask, ws, lws, lbs = _trio_inputs()
    got = qkv_depthwise_ln_xla(jnp.asarray(x), jnp.asarray(mask),
                               tuple(map(jnp.asarray, ws)),
                               tuple(map(jnp.asarray, lws)),
                               tuple(map(jnp.asarray, lbs)))
    xm = torch.from_numpy(x) * torch.from_numpy(mask)[:, None, :].float()
    for o, w, lw, lb in zip(got, ws, lws, lbs):
        y = TF.conv1d(xm, torch.from_numpy(w), padding=1,
                      groups=x.shape[1])
        mu = y.mean(dim=1, keepdim=True)
        yc = y - mu
        sig = (yc * yc).mean(dim=1, keepdim=True)
        yn = yc / torch.sqrt(sig + 1e-5)
        want = (yn * torch.from_numpy(lw)[None, :, None]
                + torch.from_numpy(lb)[None, :, None]).numpy()
        np.testing.assert_allclose(np.asarray(o), want, rtol=1e-4,
                                   atol=1e-5)


@pytest.mark.parametrize("t,chunk", [(200, 128), (384, 128)])
def test_qkv_trio_pallas_interpret_vs_xla(t, chunk):
    from decafnet_tpu.ops.fused_conv import (qkv_depthwise_ln_pallas,
                                             qkv_depthwise_ln_xla)

    x, mask, ws, lws, lbs = _trio_inputs(t=t, lens=(t, t // 2))
    args = (jnp.asarray(x), jnp.asarray(mask),
            tuple(map(jnp.asarray, ws)), tuple(map(jnp.asarray, lws)),
            tuple(map(jnp.asarray, lbs)))
    got = qkv_depthwise_ln_pallas(*args, chunk=chunk, interpret=True)
    want = qkv_depthwise_ln_xla(*args)
    for g, w_ in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w_),
                                   rtol=1e-4, atol=1e-5)


def test_qkv_trio_grad_matches_xla():
    from decafnet_tpu.ops.fused_conv import (qkv_depthwise_ln_pallas,
                                             qkv_depthwise_ln_xla)

    x, mask, ws, lws, lbs = _trio_inputs(t=96, lens=(96, 64))
    m = jnp.asarray(mask)
    jws = tuple(map(jnp.asarray, ws))
    jlw = tuple(map(jnp.asarray, lws))
    jlb = tuple(map(jnp.asarray, lbs))
    xj = jnp.asarray(x)

    def loss_p(x, ws):
        q, k, v = qkv_depthwise_ln_pallas(x, m, ws, jlw, jlb, chunk=32,
                                          interpret=True)
        return jnp.sum(q * q) + jnp.sum(k) + jnp.sum(v * v * v)

    def loss_x(x, ws):
        q, k, v = qkv_depthwise_ln_xla(x, m, ws, jlw, jlb)
        return jnp.sum(q * q) + jnp.sum(k) + jnp.sum(v * v * v)

    gp = jax.grad(loss_p, argnums=(0, 1))(xj, jws)
    gx = jax.grad(loss_x, argnums=(0, 1))(xj, jws)
    np.testing.assert_allclose(np.asarray(gp[0]), np.asarray(gx[0]),
                               rtol=1e-4, atol=1e-4)
    for a, b_ in zip(gp[1], gx[1]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-4, atol=1e-4)


def test_padded_region_stays_inert():
    """Fully padded tail (mask False) produces outputs only through the LN
    bias path, and gradients never flow from padded inputs."""
    t = 64
    x, mask, w, b, ln_w, ln_b = _inputs(t=t, lens=(t, 0))
    args = (jnp.asarray(x), jnp.asarray(mask), jnp.asarray(w),
            jnp.asarray(b), jnp.asarray(ln_w), jnp.asarray(ln_b))

    def loss(xx):
        out = conv3_ln_act_pallas(xx, *args[1:], chunk=32, interpret=True)
        return jnp.sum(out[0] ** 2)  # loss reads only the valid row

    g = np.asarray(jax.grad(loss)(args[0]))
    assert np.all(g[1] == 0)  # the masked row contributes nothing
    assert np.all(np.isfinite(g))
