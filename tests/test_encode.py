"""On-device encode stage: bilinear resize vs the torch oracle, the
reference's val/test transform pipeline shapes/values, and the two-stream
clip encoders (reference performs encoding OFFLINE; transforms replicate
libs/helper/egovlp_transforms.py:4-32)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from decafnet_tpu.encode import (
    ClipEncoderRunner,
    center_crop,
    encode_video,
    eval_transform,
    make_clip_encoder,
    normalize,
    resize_bilinear,
    resize_short_side,
    train_transform,
)

RNG = np.random.RandomState(0)


@pytest.mark.parametrize("in_hw,out_hw", [
    ((32, 48), (16, 16)), ((17, 23), (24, 24)), ((64, 64), (224, 224))])
def test_resize_bilinear_vs_torch(in_hw, out_hw):
    """MXU one-hot-matmul resize == torch F.interpolate(bilinear,
    align_corners=False) (the torchvision tensor path without antialias)."""
    x = RNG.rand(2, *in_hw, 3).astype(np.float32)
    got = np.asarray(resize_bilinear(jnp.asarray(x), *out_hw))
    tx = torch.from_numpy(x).permute(0, 3, 1, 2)
    want = F.interpolate(tx, size=out_hw, mode="bilinear",
                         align_corners=False)
    want = want.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("in_hw,out_hw", [
    ((64, 64), (16, 16)), ((37, 53), (24, 24)), ((48, 96), (24, 48)),
    ((16, 16), (32, 32))])  # upsampling: antialias is a no-op, lerp path
def test_resize_bilinear_antialias_vs_torch(in_hw, out_hw):
    """antialias=True == torch F.interpolate(bilinear, antialias=True), the
    behavior of modern torchvision tensor-input Resize (ADVICE round 2)."""
    x = RNG.rand(2, *in_hw, 3).astype(np.float32)
    got = np.asarray(resize_bilinear(jnp.asarray(x), *out_hw,
                                     antialias=True))
    tx = torch.from_numpy(x).permute(0, 3, 1, 2)
    want = F.interpolate(tx, size=out_hw, mode="bilinear",
                         align_corners=False, antialias=True)
    want = want.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_resize_short_side_aspect():
    x = RNG.rand(1, 30, 60, 3).astype(np.float32)
    y = resize_short_side(jnp.asarray(x), 256)
    assert y.shape == (1, 256, 512, 3)
    x = RNG.rand(1, 90, 45, 3).astype(np.float32)
    y = resize_short_side(jnp.asarray(x), 256)
    assert y.shape == (1, 512, 256, 3)


def test_center_crop_matches_torch_arithmetic():
    x = RNG.rand(2, 37, 51, 3).astype(np.float32)
    got = np.asarray(center_crop(jnp.asarray(x), 32))
    top = int(round((37 - 32) / 2.0))
    left = int(round((51 - 32) / 2.0))
    np.testing.assert_array_equal(got, x[:, top:top + 32, left:left + 32])


def test_eval_transform_pipeline():
    """Resize(256) -> CenterCrop(256) -> Resize(224) -> Normalize
    (egovlp_transforms.py:20-30)."""
    frames = RNG.rand(4, 300, 400, 3).astype(np.float32)
    out = np.asarray(eval_transform(jnp.asarray(frames)))
    assert out.shape == (4, 224, 224, 3)
    # normalization is exactly (x - mean) / std
    raw = np.asarray(eval_transform(jnp.asarray(frames),
                                    mean=(0, 0, 0), std=(1, 1, 1)))
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    np.testing.assert_allclose(out, (raw - mean) / std, rtol=1e-5, atol=1e-6)


def test_train_transform_shapes_and_determinism():
    frames = RNG.rand(2, 128, 160, 3).astype(np.float32)
    k = jax.random.PRNGKey(3)
    a = np.asarray(train_transform(jnp.asarray(frames), k))
    b = np.asarray(train_transform(jnp.asarray(frames), k))
    assert a.shape == (2, 224, 224, 3)
    np.testing.assert_array_equal(a, b)  # same key -> same augmentation
    c = np.asarray(train_transform(jnp.asarray(frames),
                                   jax.random.PRNGKey(4)))
    assert not np.allclose(a, c)


def test_two_stream_encoders():
    """Expert (deeper, full res) + sidekick (shallow, low res) produce the
    channel-first (C, T) streams the grounder's data contract expects."""
    expert = make_clip_encoder(dict(patch_size=16, dim=64, depth=2,
                                    heads=4, out_dim=48, frames=2))
    sidekick = make_clip_encoder(dict(patch_size=16, dim=32, depth=1,
                                      heads=2, out_dim=48, frames=2))
    T, F_, res_e, res_s = 5, 2, 64, 32
    frames_e = RNG.rand(T, F_, res_e, res_e, 3).astype(np.float32)
    frames_s = RNG.rand(T, F_, res_s, res_s, 3).astype(np.float32)

    pe = expert.init(jax.random.PRNGKey(0), frames_e[:1])["params"]
    ps = sidekick.init(jax.random.PRNGKey(1), frames_s[:1])["params"]
    run_e = ClipEncoderRunner(expert, pe)
    run_s = ClipEncoderRunner(sidekick, ps)

    feat_e, feat_s = encode_video(run_e, run_s, frames_e,
                                  sidekick_frames=frames_s)
    assert feat_e.shape == (48, T) and feat_s.shape == (48, T)
    assert np.isfinite(feat_e).all() and np.isfinite(feat_s).all()

    # clip-count bucketing cannot change per-clip features
    feat_e2 = run_e(frames_e[:3])
    np.testing.assert_allclose(feat_e2, feat_e[:, :3], rtol=2e-5, atol=2e-5)


def test_encoded_features_feed_the_grounder():
    """End-to-end: encode synthetic frames on device, then run the full
    grounder forward on the resulting two-stream features."""
    from decafnet_tpu.core import get_cfg_defaults, update_opt
    from decafnet_tpu.models import make_model

    enc = make_clip_encoder(dict(patch_size=16, dim=32, depth=1, heads=2,
                                 out_dim=32, frames=2))
    frames = RNG.rand(8, 2, 32, 32, 3).astype(np.float32)
    params_e = enc.init(jax.random.PRNGKey(0), frames[:1])["params"]
    runner = ClipEncoderRunner(enc, params_e)
    feat, shallow = encode_video(runner, runner, frames)

    cfg = get_cfg_defaults("grounder")
    cfg.model.name = "iter"
    cfg.model.vid_net.in_dim = 32
    cfg.model.vid_net.embd_dim = 16
    cfg.model.vid_net.max_seq_len = 8
    cfg.model.vid_net.arch = (1, 0, 2)
    cfg.model.text_net.in_dim = 16
    cfg.model.text_net.embd_dim = 16
    cfg.model.text_net.n_layers = 1
    cfg.model.fusion.n_layers = 1
    cfg.model.sratio = 0.5
    cfg.model.sn = 2
    update_opt(cfg)
    model = make_model(cfg)

    vid = feat[None]
    sh = shallow[None]
    vm = np.ones((1, 8), bool)
    text = RNG.randn(1, 16, 4).astype(np.float32)
    tcls = RNG.randn(1, 32).astype(np.float32)
    tm = np.ones((1, 4), bool)
    params = model.init(jax.random.PRNGKey(2), vid, sh, vm, text, tcls, tm,
                        deterministic=True)["params"]
    logits1, logits2, offsets, masks = model.apply(
        {"params": params}, vid, sh, vm, text, tcls, tm, deterministic=True)
    assert all(np.isfinite(np.asarray(x)).all() for x in logits2)


def test_delegated_encode_equals_encode_all_then_gate():
    """Expert-encoding ONLY the selected clips then scattering must equal
    encoding every clip and gating by the delegation weight (the
    reference's vid * weight on precomputed features,
    libs/modeling/model.py:606-612) -- the compute saving is free."""
    from decafnet_tpu.encode import (ClipEncoderRunner, delegated_encode,
                                     encode_delegate_ground, expert_budget,
                                     make_clip_encoder, select_salient_clips)

    enc = make_clip_encoder(dict(patch_size=16, dim=32, depth=1, heads=2,
                                 out_dim=24, frames=2))
    T, sn, ratio = 21, 4, 0.5
    frames = RNG.rand(T, 2, 32, 32, 3).astype(np.float32)
    params = enc.init(jax.random.PRNGKey(0), frames[:1])["params"]
    runner = ClipEncoderRunner(enc, params)
    text_cls = RNG.randn(24).astype(np.float32)

    expert, sidekick, weight = encode_delegate_ground(
        runner, runner, frames, frames, text_cls, sn, ratio)
    assert expert.shape == (24, T) and weight.shape == (T,)
    assert 0 < weight.sum() < T            # a strict subset was selected

    all_feats = runner(frames)             # encode every clip
    want = all_feats * weight[None, :]
    np.testing.assert_allclose(expert, want, rtol=2e-5, atol=2e-5)

    # keep-all quirk: int(ratio * nbins) == 0 selects every bin
    k_all = expert_budget(T, sn, ratio=0.01)
    assert k_all == T
    idx, w_all = select_salient_clips(
        jnp.asarray(sidekick), jnp.asarray(text_cls), sn, 0.01, k_all)
    assert np.asarray(w_all).sum() == T
    full = delegated_encode(runner, idx, w_all, frames)
    np.testing.assert_allclose(full, all_feats, rtol=2e-5, atol=2e-5)


def test_gather_clips_matches_index_gather():
    """One-hot-matmul clip gather (the TPU formulation; index gathers on
    frame tensors measure ~100 ms at T=512) == frames[idx], including a
    bf16-matmul variant that must equal gathering then casting (the one-hot
    rows are exact in any float dtype)."""
    from decafnet_tpu.encode import gather_clips

    T = 13
    frames = RNG.rand(T, 2, 8, 8, 3).astype(np.float32)
    idx = np.array([7, 0, 12, 3, 3], np.int32)   # dups allowed

    out = np.asarray(gather_clips(jnp.asarray(frames), jnp.asarray(idx)))
    np.testing.assert_array_equal(out, frames[idx])

    out16 = np.asarray(gather_clips(jnp.asarray(frames), jnp.asarray(idx),
                                    dtype=jnp.bfloat16))
    assert out16.dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        out16, frames[idx].astype(jnp.bfloat16))
