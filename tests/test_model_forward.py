"""Shape/NaN smoke tests for the full DeCafNet forward on tiny configs."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from decafnet_tpu.core import get_cfg_defaults, update_opt
from decafnet_tpu.models import make_model, generate_points, fpn_lengths


def tiny_cfg(name="iter"):
    cfg = get_cfg_defaults("grounder")
    cfg.model.name = name
    cfg.model.vid_net.in_dim = 32
    cfg.model.vid_net.embd_dim = 16
    cfg.model.vid_net.max_seq_len = 64
    cfg.model.vid_net.arch = (1, 0, 3)
    cfg.model.text_net.in_dim = 24
    cfg.model.text_net.embd_dim = 16
    cfg.model.text_net.n_layers = 2
    cfg.model.fusion.n_layers = 1
    cfg.model.sratio = 0.5
    cfg.model.sn = 8
    update_opt(cfg)
    return cfg


def make_inputs(rng, B=3, C=32, T=64, Ct=24, L=10, lens=(64, 40, 17)):
    vid = rng.randn(B, C, T).astype(np.float32)
    shallow = rng.randn(B, C, T).astype(np.float32)
    vm = np.zeros((B, T), bool)
    for i, n in enumerate(lens):
        vm[i, :n] = True
    text = rng.randn(B, Ct, L).astype(np.float32)
    tcls = rng.randn(B, C).astype(np.float32)
    tm = np.ones((B, L), bool)
    tm[1, 6:] = False
    return tuple(map(jnp.asarray, (vid, shallow, vm, text, tcls, tm)))


@pytest.mark.parametrize("name,n_out", [("iter", 4), ("early", 3), ("default", 3)])
def test_forward_shapes(name, n_out):
    rng = np.random.RandomState(0)
    cfg = tiny_cfg(name)
    model = make_model(cfg)
    inputs = make_inputs(rng)
    params = model.init(jax.random.PRNGKey(0), *inputs, deterministic=True)
    outs = model.apply(params, *inputs, deterministic=True)
    assert len(outs) == n_out

    L = cfg.model.num_fpn_levels
    lens = fpn_lengths(64, L)
    if name == "iter":
        logits1, logits2, offsets, masks = outs
    else:
        logits1, offsets, masks = outs
        logits2 = logits1
    assert len(logits1) == L
    for lvl in range(L):
        assert logits1[lvl].shape == (3, lens[lvl])
        assert logits2[lvl].shape == (3, lens[lvl])
        assert offsets[lvl].shape == (3, 2, lens[lvl])
        assert masks[lvl].shape == (3, lens[lvl])
        assert np.all(np.isfinite(np.asarray(logits2[lvl])))
        assert np.all(np.asarray(offsets[lvl]) >= 0)


def test_forward_train_mode_with_dropout_rngs():
    rng = np.random.RandomState(1)
    cfg = tiny_cfg("iter")
    model = make_model(cfg)
    inputs = make_inputs(rng)
    params = model.init(jax.random.PRNGKey(0), *inputs, deterministic=True)
    outs = model.apply(params, *inputs, deterministic=False,
                       rngs={"dropout": jax.random.PRNGKey(7)})
    assert np.all(np.isfinite(np.asarray(outs[1][0])))


def test_bfloat16_compute_mode():
    """bf16 activations with fp32 params/statistics: finite outputs close to
    the fp32 path."""
    import jax.numpy as jnp_

    rng = np.random.RandomState(5)
    cfg = tiny_cfg("iter")
    cfg.tpu.compute_dtype = "bfloat16"
    model_bf16 = make_model(cfg)
    cfg32 = tiny_cfg("iter")
    model_f32 = make_model(cfg32)

    inputs = make_inputs(rng)
    params = model_f32.init(jax.random.PRNGKey(0), *inputs,
                            deterministic=True)
    out32 = model_f32.apply(params, *inputs, deterministic=True)
    out16 = model_bf16.apply(params, *inputs, deterministic=True)
    for lvl32, lvl16 in zip(out32[1], out16[1]):   # logits2 per level
        a = np.asarray(lvl32, np.float32)
        b = np.asarray(lvl16, np.float32)
        assert np.all(np.isfinite(b))
        assert np.abs(a - b).mean() < 0.15, "bf16 drifted too far from fp32"


def test_points_generator():
    pts = generate_points(256, 7, regression_range=4, sigma=0.5)
    assert len(pts) == 7
    assert pts[0].shape == (256, 4)
    assert pts[6].shape == (4, 4)
    # level-0 range [0, 4]; doubling thereafter; last max >= max_seq_len + 1
    np.testing.assert_allclose(pts[0][0, 1:3], [0, 4])
    np.testing.assert_allclose(pts[1][0, 1:3], [2, 8])
    np.testing.assert_allclose(pts[2][0, 1:3], [4, 16])
    assert pts[6][0, 2] >= 257
    np.testing.assert_allclose(pts[3][:, 3], 8.0)


def test_compute_dtype_propagates_end_to_end():
    """tpu.compute_dtype=bfloat16 must reach the heads: a numpy-f64 scalar
    in the attention scale once silently promoted everything after the
    first attention back to f32, voiding the speed mode. eval_shape only
    traces (no bf16 execution needed on CPU)."""
    import jax
    import numpy as np
    from decafnet_tpu.models import make_model

    cfg = tiny_cfg("iter")
    cfg.tpu.compute_dtype = "bfloat16"
    model = make_model(cfg)
    Q, T = 2, cfg.data.max_vid_len
    cv, ct, L = (cfg.model.vid_net.in_dim, cfg.model.text_net.in_dim,
                 cfg.data.max_text_len)
    vid = np.zeros((Q, cv, T), np.float32)
    vm = np.ones((Q, T), bool)
    text = np.zeros((Q, ct, L), np.float32)
    tcls = np.zeros((Q, cv), np.float32)
    tm = np.ones((Q, L), bool)
    params = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), vid, vid, vm, text, tcls,
                           tm, deterministic=True))
    out = jax.eval_shape(
        lambda p: model.apply(p, vid, vid, vm, text, tcls, tm,
                              deterministic=True), params)
    logits1, logits2, offsets, masks = out
    assert logits2[0].dtype == np.dtype("bfloat16"), logits2[0].dtype
    assert offsets[0].dtype == np.dtype("bfloat16"), offsets[0].dtype
