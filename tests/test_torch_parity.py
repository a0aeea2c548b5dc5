"""End-to-end numerical parity: the flax DeCafNet, loaded with a torch
reference model's randomly-initialized state_dict, must reproduce the torch
forward outputs. This is the checkpoint-import guarantee (BASELINE.md):
released .pth weights produce matching moment predictions.

The reference implementation at /root/reference is imported READ-ONLY as the
oracle (torch CPU).
"""

import sys

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/reference")

from decafnet_tpu.core import get_cfg_defaults, update_opt
from decafnet_tpu.models import make_model, generate_points
from decafnet_tpu.models.import_torch import (
    state_dict_to_params,
    params_to_state_dict,
)

torch.manual_seed(0)


def small_cfg(msf=False, scat=False, sratio=0.3):
    cfg = get_cfg_defaults("grounder")
    cfg.model.name = "iter"
    cfg.model.vid_net.in_dim = 32
    cfg.model.vid_net.embd_dim = 32
    cfg.model.vid_net.max_seq_len = 64
    cfg.model.vid_net.arch = (2, 0, 3)
    cfg.model.vid_net.proj_pdrop = 0.0
    cfg.model.vid_net.path_pdrop = 0.0
    cfg.model.text_net.in_dim = 24
    cfg.model.text_net.embd_dim = 32
    cfg.model.text_net.n_layers = 2
    cfg.model.fusion.n_layers = 2
    cfg.model.fusion.proj_pdrop = 0.0
    cfg.model.fusion.path_pdrop = 0.0
    cfg.model.sratio = sratio
    cfg.model.sn = 8
    cfg.model.msf = msf
    cfg.model.scat = scat
    update_opt(cfg)
    return cfg


def build_reference_model(cfg):
    from libs.modeling.model import PtTransformerEarlyFusionIterative

    ref_cfg = cfg.clone()  # reference ctor mutates cls/reg head dims
    model = PtTransformerEarlyFusionIterative(ref_cfg, second_fusion=False)
    model.eval()
    return model


def make_inputs(rng, B=3, C=32, T=64, Ct=24, L=8, lens=(64, 40, 17)):
    vid = rng.randn(B, C, T).astype(np.float32)
    shallow = rng.randn(B, C, T).astype(np.float32)
    vm = np.zeros((B, T), bool)
    for i, n in enumerate(lens):
        vm[i, :n] = True
    text = rng.randn(B, Ct, L).astype(np.float32)
    tcls = rng.randn(B, C).astype(np.float32)
    tm = np.ones((B, L), bool)
    tm[1, 6:] = False
    return vid, shallow, vm, text, tcls, tm


@pytest.mark.parametrize("msf,scat", [(False, False), (True, True)])
def test_forward_parity_vs_reference(msf, scat):
    cfg = small_cfg(msf=msf, scat=scat)
    ref_model = build_reference_model(cfg)
    sd = ref_model.state_dict()

    model = make_model(cfg)
    rng = np.random.RandomState(3)
    vid, shallow, vm, text, tcls, tm = make_inputs(rng)
    jinputs = tuple(map(jnp.asarray, (vid, shallow, vm, text, tcls, tm)))
    template = model.init(jax.random.PRNGKey(0), *jinputs,
                          deterministic=True)["params"]
    params = state_dict_to_params(sd, template=template)

    # param-count parity (reference: libs/helper/utils.py:94-98): the same
    # architecture must report the same count through either helper
    from decafnet_tpu.utils import count_parameters
    ref_count = sum(p.numel() for p in ref_model.parameters()
                    if p.requires_grad) / 1e6
    assert abs(count_parameters(params) - ref_count) < 1e-9

    got = model.apply({"params": params}, *jinputs, deterministic=True)

    with torch.no_grad():
        want = ref_model._drop_forward(
            torch.from_numpy(vid), torch.from_numpy(shallow),
            torch.from_numpy(vm), torch.from_numpy(text),
            torch.from_numpy(tcls), torch.from_numpy(tm),
            text_size=torch.ones(len(vid), dtype=torch.long), eval=False)

    names = ("logits1", "logits2", "offsets", "masks")
    for name, g_t, w_t in zip(names, got, want):
        for lvl, (g, w) in enumerate(zip(g_t, w_t)):
            g = np.asarray(g)
            if name == "offsets":
                g = g.transpose(0, 2, 1)  # ours is channel-first (bs, 2, p)
            w = w.numpy()
            if name == "masks":
                w = w.astype(bool) if w.dtype != bool else w
                np.testing.assert_array_equal(g, w, err_msg=f"{name}[{lvl}]")
            else:
                np.testing.assert_allclose(
                    g, w, rtol=2e-3, atol=2e-4,
                    err_msg=f"{name}[{lvl}] max|w|={np.abs(w).max():.3f}")


def test_forward_parity_identity_textnet_pool_only_norm():
    """The remaining config branches vs the reference: TextIdentity text net
    (AttNPool CLS pooling), pool_only video branches (depthwise convs
    instead of encoders), and L2-normalized saliency (model.norm)."""
    cfg = small_cfg(msf=True)
    cfg.model.text_net.name = "identity"
    del cfg.model.text_net["n_layers"]  # TextIdentity has no layer stack
    cfg.model.vid_net.pool_only = True
    cfg.model.norm = True
    ref_model = build_reference_model(cfg)
    sd = ref_model.state_dict()

    model = make_model(cfg)
    rng = np.random.RandomState(5)
    vid, shallow, vm, text, tcls, tm = make_inputs(rng)
    jinputs = tuple(map(jnp.asarray, (vid, shallow, vm, text, tcls, tm)))
    template = model.init(jax.random.PRNGKey(0), *jinputs,
                          deterministic=True)["params"]
    params = state_dict_to_params(sd, template=template)
    got = model.apply({"params": params}, *jinputs, deterministic=True)

    with torch.no_grad():
        want = ref_model._drop_forward(
            torch.from_numpy(vid), torch.from_numpy(shallow),
            torch.from_numpy(vm), torch.from_numpy(text),
            torch.from_numpy(tcls), torch.from_numpy(tm),
            text_size=torch.ones(len(vid), dtype=torch.long), eval=False)

    for name, g_t, w_t in zip(("logits1", "logits2", "offsets", "masks"),
                              got, want):
        for lvl, (g, w) in enumerate(zip(g_t, w_t)):
            g = np.asarray(g)
            if name == "offsets":
                g = g.transpose(0, 2, 1)
            w = w.numpy()
            if name == "masks":
                np.testing.assert_array_equal(g, w.astype(bool),
                                              err_msg=f"{name}[{lvl}]")
            else:
                np.testing.assert_allclose(g, w, rtol=2e-3, atol=2e-4,
                                           err_msg=f"{name}[{lvl}]")


def test_long_video_pe_interpolation_parity():
    """Videos longer than max_seq_len: the reference pads to the next
    multiple of min_chunk_size*vid_stride and interpolates the PE to THAT
    length (libs/worker_v2.py:969-976, libs/modeling/video_net.py:144-151).
    The repo pads to a pow-2 bucket (different total length) but ships
    host-computed PE interpolation arrays targeting the reference length --
    outputs must match the reference at every valid position."""
    from decafnet_tpu.data import (min_chunk_size, pe_interp_arrays,
                                   reference_padded_len, pad_axis)

    cfg = small_cfg(msf=True, scat=False)
    ref_model = build_reference_model(cfg)
    sd = ref_model.state_dict()
    model = make_model(cfg)

    base_len = cfg.data.max_vid_len                        # 64
    chunk = min_chunk_size(cfg.model.num_fpn_levels,
                           cfg.model.mha_win_size)         # 16
    t_valid = 100
    ref_len = reference_padded_len(t_valid, chunk, base_len)   # 112
    bucket = 128
    assert ref_len == 112 and ref_len != bucket

    rng = np.random.RandomState(7)
    B, C, Ct, L = 2, 32, 24, 8
    vid = rng.randn(B, C, t_valid).astype(np.float32)
    shallow = rng.randn(B, C, t_valid).astype(np.float32)
    text = rng.randn(B, Ct, L).astype(np.float32)
    tcls = rng.randn(B, C).astype(np.float32)
    tm = np.ones((B, L), bool)

    # reference: padded to ref_len, eval-mode PE interpolation to ref_len
    vm_ref = (np.arange(ref_len) < t_valid)[None].repeat(B, 0)
    with torch.no_grad():
        want = ref_model._drop_forward(
            torch.from_numpy(pad_axis(vid, ref_len)),
            torch.from_numpy(pad_axis(shallow, ref_len)),
            torch.from_numpy(vm_ref), torch.from_numpy(text),
            torch.from_numpy(tcls), torch.from_numpy(tm),
            text_size=torch.ones(B, dtype=torch.long), eval=False)

    # repo: padded to the pow-2 bucket with pe_interp arrays
    vm_b = (np.arange(bucket) < t_valid)[None].repeat(B, 0)
    pe_interp = pe_interp_arrays(ref_len, bucket, base_len)
    assert pe_interp is not None
    jinputs = tuple(map(jnp.asarray, (
        pad_axis(vid, bucket), pad_axis(shallow, bucket), vm_b,
        text, tcls, tm)))
    template = model.init(jax.random.PRNGKey(0), *jinputs,
                          deterministic=True)["params"]
    params = state_dict_to_params(sd, template=template)
    got = model.apply({"params": params}, *jinputs, deterministic=True,
                      pe_interp=tuple(map(jnp.asarray, pe_interp)))

    names = ("logits1", "logits2", "offsets", "masks")
    for name, g_t, w_t in zip(names, got, want):
        for lvl, (g, w) in enumerate(zip(g_t, w_t)):
            g = np.asarray(g)
            w = w.numpy()
            if name == "masks":
                m = w.astype(bool).reshape(B, -1)
                np.testing.assert_array_equal(
                    g.reshape(B, -1)[:, :m.shape[1]], m,
                    err_msg=f"{name}[{lvl}]")
                continue
            ref_mask = want[3][lvl].numpy().astype(bool).reshape(B, -1)
            if name == "offsets":
                g = g.transpose(0, 2, 1)   # ours channel-first (bs, 2, p)
            g = g[:, :w.shape[1]]
            np.testing.assert_allclose(
                g[ref_mask], w[ref_mask], rtol=2e-3, atol=2e-4,
                err_msg=f"{name}[{lvl}]")


@pytest.mark.parametrize("name,second_fusion", [("early", False),
                                                ("early2", True),
                                                ("default", None)])
def test_variant_forward_parity(name, second_fusion):
    """The documented architecture variants vs their reference classes:
    PtTransformerEarlyFusion (early/early2, libs/modeling/model.py:163-373)
    and the 'default' late-fusion PtTransformer (model.py:30-161). No
    released weights exist for these, so random-init state_dict import +
    train-path forward parity is the strongest available evidence."""
    from libs.modeling.model import PtTransformer, PtTransformerEarlyFusion

    cfg = small_cfg(msf=True)
    cfg.model.name = name
    if name == "default":
        ref_model = PtTransformer(cfg.clone())
    else:
        ref_model = PtTransformerEarlyFusion(cfg.clone(),
                                             second_fusion=second_fusion)
    ref_model.eval()
    sd = ref_model.state_dict()

    model = make_model(cfg)
    rng = np.random.RandomState(9)
    vid, shallow, vm, text, tcls, tm = make_inputs(rng)
    jinputs = tuple(map(jnp.asarray, (vid, shallow, vm, text, tcls, tm)))
    template = model.init(jax.random.PRNGKey(0), *jinputs,
                          deterministic=True)["params"]
    params = state_dict_to_params(sd, template=template)
    got = model.apply({"params": params}, *jinputs, deterministic=True)

    with torch.no_grad():
        want = ref_model._drop_forward(
            torch.from_numpy(vid), torch.from_numpy(shallow),
            torch.from_numpy(vm), torch.from_numpy(text),
            torch.from_numpy(tcls), torch.from_numpy(tm),
            text_size=torch.ones(len(vid), dtype=torch.long), eval=False)

    for oname, g_t, w_t in zip(("logits", "offsets", "masks"), got, want):
        for lvl, (g, w) in enumerate(zip(g_t, w_t)):
            g = np.asarray(g)
            if oname == "offsets":
                g = g.transpose(0, 2, 1)
            w = w.numpy()
            if oname == "masks":
                np.testing.assert_array_equal(
                    g.reshape(g.shape[0], -1),
                    w.astype(bool).reshape(w.shape[0], -1),
                    err_msg=f"{name} {oname}[{lvl}]")
            else:
                np.testing.assert_allclose(g, w, rtol=2e-3, atol=2e-4,
                                           err_msg=f"{name} {oname}[{lvl}]")


def test_state_dict_roundtrip():
    cfg = small_cfg()
    ref_model = build_reference_model(cfg)
    sd = {k: v.numpy() for k, v in ref_model.state_dict().items()}
    params = state_dict_to_params(sd)
    back = params_to_state_dict(params)
    assert set(back) == set(sd)
    for k in sd:
        np.testing.assert_array_equal(back[k], sd[k])


def test_point_generator_parity():
    from libs.modeling.model import PtGenerator

    ref = PtGenerator(max_seq_len=256, num_fpn_levels=7,
                      regression_range=4, sigma=0.5)
    ref_pts = [p.numpy() for p in ref.buffer_points]
    got_pts = generate_points(256, 7, regression_range=4, sigma=0.5)
    assert len(ref_pts) == len(got_pts)
    for g, w in zip(got_pts, ref_pts):
        np.testing.assert_allclose(g, w)
