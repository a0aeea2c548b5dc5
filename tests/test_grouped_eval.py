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
