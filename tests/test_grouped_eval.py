"""Video-major eval path (queries_per_video > 1): per-video vid_map
projection hoisting must match the standard per-row forward to floating-
point reassociation. The delegation weight broadcasts over channels, so
W_e @ (vid * w) == w * (W_e @ vid); the grouped path exploits that to run
the 2C->embd projection once per VIDEO (models/decafnet.py:
_delegate_project_grouped). Reference context: the reference re-encodes
the video once per query (libs/modeling/model.py:526-563)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from decafnet_tpu.core import get_cfg_defaults, update_opt
from decafnet_tpu.models import make_model

RNG = np.random.RandomState(11)


def _cfg(msf=True, scat=False, norm=False):
    cfg = get_cfg_defaults("grounder")
    cfg.model.name = "iter"
    cfg.model.vid_net.in_dim = 24
    cfg.model.vid_net.embd_dim = 16
    cfg.model.vid_net.max_seq_len = 64
    cfg.model.vid_net.arch = (1, 0, 3)
    cfg.model.text_net.in_dim = 20
    cfg.model.text_net.embd_dim = 16
    cfg.model.text_net.n_layers = 1
    cfg.model.fusion.n_layers = 1
    cfg.model.sratio = 0.5
    cfg.model.sn = 8
    cfg.model.msf = msf
    cfg.model.scat = scat
    cfg.model.norm = norm
    update_opt(cfg)
    return cfg


def _inputs(V, Q, T, cv, ct, L=12):
    vid = RNG.randn(V, cv, T).astype(np.float32)
    shallow = RNG.randn(V, cv, T).astype(np.float32)
    vm = np.zeros((V, T), bool)
    for i in range(V):
        vm[i, :T - 7 * i] = True
    text = RNG.randn(V * Q, ct, L).astype(np.float32)
    tcls = RNG.randn(V * Q, cv).astype(np.float32)
    tm = np.ones((V * Q, L), bool)
    return vid, shallow, vm, text, tcls, tm


@pytest.mark.parametrize("msf,scat,norm", [
    (True, False, False), (True, True, False), (False, False, False),
    (False, True, True)])
def test_grouped_matches_per_row(msf, scat, norm):
    cfg = _cfg(msf=msf, scat=scat, norm=norm)
    model = make_model(cfg)
    V, Q, T = 3, 2, 64
    cv, ct = cfg.model.vid_net.in_dim, cfg.model.text_net.in_dim
    vid, shallow, vm, text, tcls, tm = _inputs(V, Q, T, cv, ct)

    params = model.init(jax.random.PRNGKey(0),
                        np.repeat(vid, Q, 0), np.repeat(shallow, Q, 0),
                        np.repeat(vm, Q, 0), text, tcls, tm,
                        deterministic=True)["params"]

    std = model.apply({"params": params},
                      np.repeat(vid, Q, 0), np.repeat(shallow, Q, 0),
                      np.repeat(vm, Q, 0), text, tcls, tm,
                      deterministic=True)
    grp = model.apply({"params": params}, vid, shallow, vm, text, tcls, tm,
                      deterministic=True, queries_per_video=Q)

    for s_group, g_group in zip(std, grp):
        for s, g in zip(s_group, g_group):
            s, g = np.asarray(s), np.asarray(g)
            if s.dtype == bool:
                np.testing.assert_array_equal(s, g)
            else:
                np.testing.assert_allclose(g, s, rtol=2e-4, atol=2e-5)


def test_grouped_q1_is_standard_path():
    """queries_per_video=1 must be bit-identical to the default call."""
    cfg = _cfg()
    model = make_model(cfg)
    V, Q, T = 2, 1, 64
    cv, ct = cfg.model.vid_net.in_dim, cfg.model.text_net.in_dim
    vid, shallow, vm, text, tcls, tm = _inputs(V, Q, T, cv, ct)
    params = model.init(jax.random.PRNGKey(0), vid, shallow, vm, text,
                        tcls, tm, deterministic=True)["params"]
    a = model.apply({"params": params}, vid, shallow, vm, text, tcls, tm,
                    deterministic=True)
    b = model.apply({"params": params}, vid, shallow, vm, text, tcls, tm,
                    deterministic=True, queries_per_video=1)
    for ga, gb in zip(a, b):
        for x, y in zip(ga, gb):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


@pytest.mark.parametrize("name", ["early", "default"])
def test_variants_accept_video_major_batches(name):
    """The non-iterative variants expand video-major batches to rows (no
    hoisting) so the Evaluator can use one calling convention."""
    cfg = _cfg()
    cfg.model.name = name
    update_opt(cfg)
    model = make_model(cfg)
    V, Q, T = 2, 2, 64
    cv, ct = cfg.model.vid_net.in_dim, cfg.model.text_net.in_dim
    vid, shallow, vm, text, tcls, tm = _inputs(V, Q, T, cv, ct)
    params = model.init(jax.random.PRNGKey(0),
                        np.repeat(vid, Q, 0), np.repeat(shallow, Q, 0),
                        np.repeat(vm, Q, 0), text, tcls, tm,
                        deterministic=True)["params"]
    std = model.apply({"params": params},
                      np.repeat(vid, Q, 0), np.repeat(shallow, Q, 0),
                      np.repeat(vm, Q, 0), text, tcls, tm,
                      deterministic=True)
    grp = model.apply({"params": params}, vid, shallow, vm, text, tcls, tm,
                      deterministic=True, queries_per_video=Q)
    for s_group, g_group in zip(std, grp):
        for s, g in zip(s_group, g_group):
            np.testing.assert_array_equal(np.asarray(s), np.asarray(g))


def test_train_grads_match_grouped():
    """Round-4: the TRAIN step uses the video-major path too (vid_map once
    per video, decafnet_tpu/train/trainer.py:build_microbatch_loss). With
    channel dropout off (the default) gradients must match the per-row
    expansion exactly -- INCLUDING with the other dropouts ACTIVE, which
    proves the rng path (downstream of the row expansion, where all row
    shapes coincide) is byte-identical between the two formulations."""
    from decafnet_tpu.models import (fpn_lengths, generate_points,
                                     select_points)
    from decafnet_tpu.train import build_microbatch_loss

    cfg = _cfg(msf=True, scat=True)
    cfg.data.max_num_text = 2
    assert cfg.model.vid_net.proj_pdrop > 0  # dropout genuinely active
    update_opt(cfg)
    model = make_model(cfg)
    V, Q, T = 2, 2, 64
    cv, ct = cfg.model.vid_net.in_dim, cfg.model.text_net.in_dim
    vid, shallow, vm, text, tcls, tm = _inputs(V, Q, T, cv, ct,
                                               L=cfg.data.max_text_len)
    mb = {
        "vid": jnp.asarray(vid), "shallow_vid": jnp.asarray(shallow),
        "vid_masks": jnp.asarray(vm), "text": jnp.asarray(text),
        "text_masks": jnp.asarray(tm), "text_cls": jnp.asarray(tcls),
        "targets": jnp.asarray(
            RNG.uniform(1, 50, (V * Q, 2)).astype(np.float32)),
        "row_valid": jnp.asarray([True, True, True, False]),
    }
    params = model.init(jax.random.PRNGKey(0),
                        np.repeat(vid, Q, 0), np.repeat(shallow, Q, 0),
                        np.repeat(vm, Q, 0), text, tcls, tm,
                        deterministic=True)["params"]
    lens = fpn_lengths(T // cfg.model.vid_stride, cfg.model.num_fpn_levels)
    pts = generate_points(cfg.pt_gen.max_seq_len, cfg.pt_gen.num_fpn_levels,
                          cfg.pt_gen.regression_range, cfg.pt_gen.sigma)
    points_t = jnp.asarray(np.ascontiguousarray(
        np.concatenate(select_points(pts, lens)).T))

    grads, metrics = {}, {}
    for mode in (True, False):
        cfg.tpu.video_major_train = mode
        loss_fn = build_microbatch_loss(model, cfg)
        (_, m), g = jax.value_and_grad(loss_fn, has_aux=True)(
            params, mb, jax.random.PRNGKey(7), jnp.float32(100.0), points_t)
        grads[mode], metrics[mode] = jax.device_get(g), jax.device_get(m)

    for k in ("cls", "reg", "total", "norm"):
        np.testing.assert_allclose(metrics[True][k], metrics[False][k],
                                   rtol=1e-5, atol=1e-7, err_msg=k)
    flat_a = jax.tree_util.tree_leaves_with_path(grads[True])
    flat_b = dict(jax.tree_util.tree_leaves_with_path(grads[False]))
    for path, a in flat_a:
        b = flat_b[path]
        # attention KEY biases have mathematically ZERO gradient (a constant
        # added to every key shifts all scores per query equally --
        # softmax-invariant); both formulations see only fp summation noise
        # there (~1e-10 observed), with different summation orders, so
        # relative comparison is meaningless. Require both sides noise-sized.
        if max(np.abs(a).max(), np.abs(b).max()) <= 1e-8:
            continue
        scale = max(np.abs(b).max(), 1e-12)
        np.testing.assert_allclose(
            a, b, rtol=2e-4, atol=2e-5 * scale,
            err_msg=jax.tree_util.keystr(path))
