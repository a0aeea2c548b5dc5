"""Dual-head fusion (models/heads.py:dual_head_apply) equivalence.

The fused path reads each fpn level ONCE for both heads (concatenated
layer-1 conv, 2-group deeper convs, per-stream LN, block-diagonal final
conv). It must match the separate ClsHead/RegHead calls to floating-point
reassociation for every model variant and under gradients.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from decafnet_tpu.core import get_cfg_defaults, update_opt
from decafnet_tpu.models import make_model
from decafnet_tpu.models import heads as _heads
from decafnet_tpu.models.heads import set_dual_head

# module default (flipped OFF after the on-chip A/B; heads.py)
_DUAL_DEFAULT = _heads._DUAL_ENABLED

RNG = np.random.RandomState(0)


def _cfg(name):
    cfg = get_cfg_defaults("grounder")
    cfg.model.name = name
    cfg.model.vid_net.in_dim = 32
    cfg.model.vid_net.embd_dim = 32
    cfg.model.vid_net.max_seq_len = 128
    cfg.model.vid_net.arch = (2, 0, 4)
    cfg.model.text_net.in_dim = 24
    cfg.model.text_net.embd_dim = 32
    cfg.model.text_net.n_layers = 1
    cfg.model.fusion.n_layers = 1
    cfg.model.sratio = 0.3
    cfg.model.sn = 16
    cfg.seed = 0
    update_opt(cfg)
    return cfg


def _inputs(cfg, rows=2, T=128, L=8):
    cv = cfg.model.vid_net.in_dim
    ct = cfg.model.text_net.in_dim
    vid = RNG.randn(rows, cv, T).astype(np.float32)
    shallow = RNG.randn(rows, cv, T).astype(np.float32)
    vm = np.zeros((rows, T), bool)
    for i in range(rows):
        vm[i, : T - 17 * i] = True
    text = RNG.randn(rows, ct, L).astype(np.float32)
    tcls = RNG.randn(rows, cv).astype(np.float32)
    tm = np.ones((rows, L), bool)
    return tuple(map(jnp.asarray, (vid, shallow, vm, text, tcls, tm)))


@pytest.mark.parametrize("name", ["iter", "iter2", "early", "early2",
                                  "default"])
def test_dual_matches_separate(name):
    cfg = _cfg(name)
    model = make_model(cfg)
    inputs = _inputs(cfg)
    params = model.init(jax.random.PRNGKey(0), *inputs, deterministic=True)

    set_dual_head(True)
    try:
        out_dual = model.apply(params, *inputs, deterministic=True)
    finally:
        set_dual_head(False)
    try:
        out_sep = model.apply(params, *inputs, deterministic=True)
    finally:
        set_dual_head(_DUAL_DEFAULT)

    flat_d, tree_d = jax.tree_util.tree_flatten(out_dual)
    flat_s, tree_s = jax.tree_util.tree_flatten(out_sep)
    assert tree_d == tree_s
    for d, s in zip(flat_d, flat_s):
        np.testing.assert_allclose(np.asarray(d), np.asarray(s),
                                   rtol=1e-5, atol=1e-6)


def test_dual_param_tree_identical():
    """The dual path must not change the parameter tree (checkpoint
    import/export compatibility)."""
    cfg = _cfg("iter")
    model = make_model(cfg)
    inputs = _inputs(cfg)

    set_dual_head(True)
    try:
        p_dual = model.init(jax.random.PRNGKey(0), *inputs,
                            deterministic=True)
    finally:
        set_dual_head(False)
    try:
        p_sep = model.init(jax.random.PRNGKey(0), *inputs,
                           deterministic=True)
    finally:
        set_dual_head(_DUAL_DEFAULT)

    paths_d = {"/".join(map(str, p))
               for p, _ in jax.tree_util.tree_flatten_with_path(p_dual)[0]}
    paths_s = {"/".join(map(str, p))
               for p, _ in jax.tree_util.tree_flatten_with_path(p_sep)[0]}
    assert paths_d == paths_s
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_flatten_with_path(p_dual)[0],
            jax.tree_util.tree_flatten_with_path(p_sep)[0]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=str(pa))


def test_dual_grad_matches_separate():
    """Training path: gradients through the dual trunk equal the separate
    heads' gradients (reassociation-level)."""
    cfg = _cfg("iter")
    model = make_model(cfg)
    inputs = _inputs(cfg)
    params = model.init(jax.random.PRNGKey(0), *inputs, deterministic=True)

    def loss(p):
        _, l2, offs, _ = model.apply(p, *inputs, deterministic=True)
        return (sum(jnp.sum(x ** 2) for x in l2)
                + sum(jnp.sum(o ** 2) for o in offs))

    set_dual_head(True)
    try:
        g_dual = jax.grad(loss)(params)
    finally:
        set_dual_head(False)
    try:
        g_sep = jax.grad(loss)(params)
    finally:
        set_dual_head(_DUAL_DEFAULT)

    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_flatten_with_path(g_dual)[0],
            jax.tree_util.tree_flatten_with_path(g_sep)[0]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5,
            err_msg=str(pa))
