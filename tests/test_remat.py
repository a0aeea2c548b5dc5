"""Rematerialization (tpu.remat): identical outputs/losses, finite grads."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from decafnet_tpu.core import get_cfg_defaults, update_opt
from decafnet_tpu.models import make_model


def _cfg(remat, policy="nothing"):
    cfg = get_cfg_defaults("grounder")
    cfg.model.name = "iter"  # the live released model
    cfg.model.vid_net.in_dim = 32
    cfg.model.vid_net.embd_dim = 16
    cfg.model.vid_net.max_seq_len = 64
    cfg.model.vid_net.arch = (1, 0, 3)
    cfg.model.text_net.in_dim = 24
    cfg.model.text_net.embd_dim = 16
    cfg.model.text_net.n_layers = 1
    cfg.model.fusion.n_layers = 1
    cfg.model.sratio = 0.5
    cfg.model.sn = 8
    cfg.tpu.remat = remat
    cfg.tpu.remat_policy = policy
    update_opt(cfg)
    return cfg


def test_remat_forward_and_grads_match():
    rng = np.random.RandomState(0)
    B, C, T, Ct, L = 2, 32, 64, 24, 8
    inputs = tuple(map(jnp.asarray, (
        rng.randn(B, C, T).astype(np.float32),
        rng.randn(B, C, T).astype(np.float32),
        np.ones((B, T), bool),
        rng.randn(B, Ct, L).astype(np.float32),
        rng.randn(B, C).astype(np.float32),
        np.ones((B, L), bool))))

    m0 = make_model(_cfg(False))
    m1 = make_model(_cfg(True))
    params = m0.init(jax.random.PRNGKey(0), *inputs, deterministic=True)

    out0 = m0.apply(params, *inputs, deterministic=True)
    out1 = m1.apply(params, *inputs, deterministic=True)
    for a, b in zip(out0[1], out1[1]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)

    def loss(p, model):
        out = model.apply(p, *inputs, deterministic=True)
        return sum(jnp.sum(l) for l in out[1])

    g0 = jax.grad(lambda p: loss(p, m0))(params)
    g1 = jax.grad(lambda p: loss(p, m1))(params)
    l0 = jax.tree_util.tree_leaves(g0)
    l1 = jax.tree_util.tree_leaves(g1)
    for a, b in zip(l0, l1):
        assert np.all(np.isfinite(np.asarray(b)))
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("policy", ["dots"])
def test_remat_policy_grads_match_full_remat(policy):
    """tpu.remat_policy only moves the FLOP/HBM trade (what the checkpointed
    encoders SAVE for the backward pass); outputs and gradients must be
    identical to the save-nothing policy."""
    rng = np.random.RandomState(1)
    B, C, T, Ct, L = 2, 32, 64, 24, 8
    inputs = tuple(map(jnp.asarray, (
        rng.randn(B, C, T).astype(np.float32),
        rng.randn(B, C, T).astype(np.float32),
        np.ones((B, T), bool),
        rng.randn(B, Ct, L).astype(np.float32),
        rng.randn(B, C).astype(np.float32),
        np.ones((B, L), bool))))

    m0 = make_model(_cfg(True, "nothing"))
    m1 = make_model(_cfg(True, policy))
    params = m0.init(jax.random.PRNGKey(0), *inputs, deterministic=True)

    def loss(p, model):
        out = model.apply(p, *inputs, deterministic=True)
        return sum(jnp.sum(l) for l in out[1])

    assert float(loss(params, m0)) == float(loss(params, m1))
    g0 = jax.tree_util.tree_leaves(jax.grad(lambda p: loss(p, m0))(params))
    g1 = jax.tree_util.tree_leaves(jax.grad(lambda p: loss(p, m1))(params))
    for a, b in zip(g0, g1):
        assert np.all(np.isfinite(np.asarray(b)))
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
