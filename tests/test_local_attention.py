"""Banded local attention: XLA/Pallas backends vs the brute-force oracle and
vs a torch oracle replicating the reference's exact band softmax numerics."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from decafnet_tpu.ops import (
    band_attention_xla,
    band_attention_pallas,
    band_attention_reference,
)
from decafnet_tpu.ops.local_attention import band_attention_diag

RNG = np.random.RandomState(1)


def _inputs(b=2, h=4, t=96, d=16, lens=None):
    q = RNG.randn(b, h, t, d).astype(np.float32)
    k = RNG.randn(b, h, t, d).astype(np.float32)
    v = RNG.randn(b, h, t, d).astype(np.float32)
    mask = np.zeros((b, t), bool)
    lens = lens or [t, t * 2 // 3]
    for i, n in enumerate(lens):
        mask[i, :n] = True
    return q, k, v, mask


def torch_band_oracle(q, k, v, mask, w):
    """O(t^2) torch oracle of the reference band semantics: -inf outside the
    band / sequence, additive -1e4 on invalid keys, zeroed invalid rows."""
    s = w // 2
    tq, tk, tv = map(torch.from_numpy, (q, k, v))
    tm = torch.from_numpy(mask)
    scores = torch.einsum("bhid,bhjd->bhij", tq, tk)
    t = q.shape[2]
    i = torch.arange(t)[:, None]
    j = torch.arange(t)[None, :]
    in_band = (i - j).abs() <= s
    scores = scores + torch.where(tm[:, None, None, :],
                                  torch.zeros(()), torch.full((), -1e4))
    scores = scores.masked_fill(~in_band[None, None], float("-inf"))
    attn = torch.softmax(scores, dim=-1)
    attn = attn.masked_fill(~tm[:, None, :, None], 0.0)
    return torch.einsum("bhij,bhjd->bhid", attn, tv).numpy()


@pytest.mark.parametrize("t,window,chunk", [
    (96, 5, 32), (96, 5, 128), (40, 9, 16), (130, 5, 64), (8, 5, 8),
])
def test_band_attention_xla_vs_torch(t, window, chunk):
    q, k, v, mask = _inputs(t=t, lens=[t, max(1, t * 2 // 3)])
    got = np.asarray(band_attention_xla(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(mask),
        window, chunk=chunk))
    want = torch_band_oracle(q, k, v, mask, window)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("t,window", [
    (96, 5), (40, 9), (130, 5), (8, 5), (7, 5)])
def test_band_attention_diag_vs_torch(t, window):
    """The diagonal (shifted-band) formulation == the torch band oracle,
    including partial masks and sequences shorter than the window."""
    q, k, v, mask = _inputs(t=t, lens=[t, max(1, t * 2 // 3)])
    got = np.asarray(band_attention_diag(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(mask),
        window))
    want = torch_band_oracle(q, k, v, mask, window)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_band_attention_diag_dot_path_matches():
    """Round-5 MXU score path: above _DIAG_DOT_MIN_T the per-diagonal q.k
    contraction over the head dim is a ones-vector dot (the VPU cross-lane
    reduction is slow at long T and bf16-hostile; see
    ops/local_attention.py). Must match the einsum form AND the torch band
    oracle at a length that engages the dot path."""
    from decafnet_tpu.ops.local_attention import (_DIAG_DOT_MIN_T,
                                                  set_diag_dot)

    t = max(_DIAG_DOT_MIN_T, 4096)
    q, k, v, mask = _inputs(t=t, lens=[t, t * 2 // 3])
    args = tuple(map(jnp.asarray, (q, k, v, mask)))
    try:
        # default mode is "bf16" (CPU tests run f32), so force each leg
        set_diag_dot("always")
        got_dot = np.asarray(band_attention_diag(*args, 5))
        set_diag_dot("never")
        got_einsum = np.asarray(band_attention_diag(*args, 5))
    finally:
        set_diag_dot("bf16")
    np.testing.assert_allclose(got_dot, got_einsum, rtol=1e-5, atol=1e-5)
    want = torch_band_oracle(q, k, v, mask, 5)
    np.testing.assert_allclose(got_dot, want, rtol=1e-4, atol=1e-4)


def test_band_attention_diag_grad_finite_and_masked():
    """diag is the default short-sequence TRAIN path: gradients must be
    finite and zero through fully-masked rows."""
    import jax

    q, k, v, mask = _inputs(t=64, lens=[64, 0])
    args = tuple(map(jnp.asarray, (q, k, v)))
    m = jnp.asarray(mask)

    def loss(q, k, v):
        return jnp.sum(band_attention_diag(q, k, v, m, 5) ** 2)

    grads = jax.grad(loss, argnums=(0, 1, 2))(*args)
    for g in grads:
        g = np.asarray(g)
        assert np.all(np.isfinite(g))
        assert np.all(g[1] == 0)  # fully-masked row contributes nothing


def test_band_attention_xla_vs_bruteforce_jax():
    q, k, v, mask = _inputs(t=64)
    got = np.asarray(band_attention_xla(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(mask), 5))
    want = np.asarray(band_attention_reference(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(mask), 5))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_band_attention_fully_masked_rows_are_zero():
    q, k, v, mask = _inputs(t=32, lens=[20, 0])
    out = np.asarray(band_attention_xla(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(mask), 5))
    assert np.all(out[0, :, 20:] == 0)
    assert np.all(out[1] == 0)
    assert np.all(np.isfinite(out))


@pytest.mark.parametrize("t,chunk", [(96, 32), (64, 64)])
def test_band_attention_pallas_interpret(t, chunk):
    q, k, v, mask = _inputs(t=t)
    got = np.asarray(band_attention_pallas(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(mask),
        5, chunk=chunk, interpret=True))
    want = torch_band_oracle(q, k, v, mask, 5)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_band_attention_pallas_grad_matches_xla():
    """jax.grad through the Pallas kernel (custom_vjp: fused forward, XLA
    recompute backward) must equal the pure-XLA gradients. Round-2 VERDICT
    item 2: this previously crashed with 'Linearization failed'."""
    import jax

    q, k, v, mask = _inputs(t=96)
    args = tuple(map(jnp.asarray, (q, k, v)))
    m = jnp.asarray(mask)

    def loss_pallas(q, k, v):
        out = band_attention_pallas(q, k, v, m, 5, chunk=32, interpret=True)
        return jnp.sum(out * out)

    def loss_xla(q, k, v):
        out = band_attention_xla(q, k, v, m, 5, chunk=32)
        return jnp.sum(out * out)

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(*args)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(*args)
    # the ~1e-6 forward difference between the kernels enters the cotangent
    # of the quadratic loss, so gradient agreement is ~1e-5-scale, not exact
    for a, b in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_band_attention_grad_at_pallas_dispatch_scale():
    """The advertised MAD-scale training path: differentiate the Pallas
    kernel at T >= PALLAS_MIN_T (where 'auto' dispatches to it on TPU).
    Interpret mode on CPU reproduced the round-2 crash at this scale."""
    import jax
    from decafnet_tpu.ops.local_attention import PALLAS_MIN_T

    t = PALLAS_MIN_T
    b, h, d = 1, 2, 16
    q = RNG.randn(b, h, t, d).astype(np.float32)
    k = RNG.randn(b, h, t, d).astype(np.float32)
    v = RNG.randn(b, h, t, d).astype(np.float32)
    mask = np.ones((b, t), bool)
    mask[0, t - 300:] = False
    args = tuple(map(jnp.asarray, (q, k, v)))
    m = jnp.asarray(mask)

    def loss(q, k, v):
        out = band_attention_pallas(q, k, v, m, 5, interpret=True)
        return jnp.sum(out * out)

    grads = jax.grad(loss, argnums=(0, 1, 2))(*args)
    for g in grads:
        assert np.all(np.isfinite(np.asarray(g)))
    # gradients through padded key/query rows must be exactly zero
    assert np.all(np.asarray(grads[0])[0, :, t - 300:] == 0)
