"""SpaceTimeViT vs a torch Frozen-in-Time oracle with SHARED random weights.

The reference's features come from EgoVLP's video tower -- the
Frozen-in-Time ``SpaceTimeTransformer`` (divided space-time attention with
CLS splicing) plus a linear ``vid_proj`` (the reference repo itself only
loads the resulting .npy files, libs/data/dataset.py:363-407). The torch
module below restates that architecture with the exact public key layout;
random-init weights are exported as a state_dict and imported through
``vit_state_dict_to_params`` (pure key rename), and the forwards must
agree -- the same methodology as the grounder checkpoint import
(tests/test_torch_parity.py)."""

import math

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as TF

import jax

from decafnet_tpu.encode import SpaceTimeViT, vit_state_dict_to_params

RNG = np.random.RandomState(0)


# ---------------------------------------------------------------------------
# torch oracle (Frozen-in-Time SpaceTimeTransformer, public layout)
# ---------------------------------------------------------------------------


class VarAttention(nn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.num_heads = heads
        self.scale = (dim // heads) ** -0.5
        self.qkv = nn.Linear(dim, 3 * dim)
        self.proj = nn.Linear(dim, dim)

    def forward(self, x, group, f, n):
        B, N, D = x.shape
        h = self.num_heads
        d = D // h
        q, k, v = self.qkv(x).chunk(3, dim=-1)
        q, k, v = [t.reshape(B, N, h, d).permute(0, 2, 1, 3)
                   .reshape(B * h, N, d) for t in (q, k, v)]
        q = q * self.scale

        cls_q, q_ = q[:, :1], q[:, 1:]
        cls_k, k_ = k[:, :1], k[:, 1:]
        cls_v, v_ = v[:, :1], v[:, 1:]

        # CLS attends over all tokens
        cls_out = TF.softmax(cls_q @ k.transpose(-2, -1), dim=-1) @ v

        if group == "space":     # 'b (f n) d -> (b f) n d'
            q_ = q_.reshape(B * h * f, n, d)
            k_ = k_.reshape(B * h * f, n, d)
            v_ = v_.reshape(B * h * f, n, d)
            r = f
        else:                    # 'b (f n) d -> (b n) f d'
            q_ = q_.reshape(B * h, f, n, d).permute(0, 2, 1, 3) \
                .reshape(B * h * n, f, d)
            k_ = k_.reshape(B * h, f, n, d).permute(0, 2, 1, 3) \
                .reshape(B * h * n, f, d)
            v_ = v_.reshape(B * h, f, n, d).permute(0, 2, 1, 3) \
                .reshape(B * h * n, f, d)
            r = n

        # 'b () d -> (b r) () d' is repeat_interleave on the batch axis
        ck = cls_k.repeat_interleave(r, dim=0)
        cv = cls_v.repeat_interleave(r, dim=0)
        k_ = torch.cat([ck, k_], dim=1)
        v_ = torch.cat([cv, v_], dim=1)
        out = TF.softmax(q_ @ k_.transpose(-2, -1), dim=-1) @ v_

        if group == "space":
            out = out.reshape(B * h, f * n, d)
        else:
            out = out.reshape(B * h, n, f, d).permute(0, 2, 1, 3) \
                .reshape(B * h, f * n, d)
        out = torch.cat([cls_out, out], dim=1)
        out = out.reshape(B, h, N, d).permute(0, 2, 1, 3).reshape(B, N, D)
        return self.proj(out)


class Mlp(nn.Module):
    def __init__(self, dim, hidden):
        super().__init__()
        self.fc1 = nn.Linear(dim, hidden)
        self.fc2 = nn.Linear(hidden, dim)

    def forward(self, x):
        return self.fc2(TF.gelu(self.fc1(x)))


class SpaceTimeBlock(nn.Module):
    def __init__(self, dim, heads, mlp_ratio):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim)
        self.attn = VarAttention(dim, heads)
        self.norm3 = nn.LayerNorm(dim)
        self.timeattn = VarAttention(dim, heads)
        self.norm2 = nn.LayerNorm(dim)
        self.mlp = Mlp(dim, int(dim * mlp_ratio))

    def forward(self, x, f, n):
        time_out = self.timeattn(self.norm3(x), "time", f, n)
        time_residual = x + time_out
        space_out = self.attn(self.norm1(time_residual), "space", f, n)
        space_residual = x + space_out          # 'frozen-in-time' residual
        return space_residual + self.mlp(self.norm2(space_residual))


class PatchEmbed(nn.Module):
    def __init__(self, dim, patch):
        super().__init__()
        self.proj = nn.Conv2d(3, dim, patch, stride=patch)

    def forward(self, x):                       # (B*F, 3, H, W)
        return self.proj(x).flatten(2).transpose(1, 2)


class TorchSpaceTimeTransformer(nn.Module):
    def __init__(self, img_size, patch, dim, depth, heads, frames,
                 out_dim, mlp_ratio=4.0):
        super().__init__()
        n = (img_size // patch) ** 2
        self.n = n
        self.frames = frames
        self.cls_token = nn.Parameter(torch.zeros(1, 1, dim))
        self.pos_embed = nn.Parameter(torch.zeros(1, 1 + n, dim))
        self.temporal_embed = nn.Parameter(torch.zeros(1, frames, dim))
        self.patch_embed = PatchEmbed(dim, patch)
        self.blocks = nn.ModuleList(
            [SpaceTimeBlock(dim, heads, mlp_ratio) for _ in range(depth)])
        self.norm = nn.LayerNorm(dim)
        self.proj = nn.Linear(dim, out_dim)

    def forward(self, frames):                  # (B, F, 3, H, W)
        B, F = frames.shape[:2]
        x = self.patch_embed(frames.flatten(0, 1))      # (B*F, n, D)
        x = x.reshape(B, F * self.n, -1)
        cls = self.cls_token.expand(B, -1, -1)
        x = torch.cat([cls, x], dim=1)
        tile_pos = self.pos_embed[:, 1:].repeat(1, F, 1)
        tile_time = self.temporal_embed.repeat_interleave(self.n, dim=1)
        x = x + torch.cat([self.pos_embed[:, :1], tile_pos + tile_time],
                          dim=1)
        for blk in self.blocks:
            x = blk(x, F, self.n)
        return self.proj(self.norm(x)[:, 0])


def _rand_init(model, seed=0):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)
    return model


CFG = dict(img_size=32, patch=8, dim=24, depth=2, heads=3, frames=2,
           out_dim=16)


def test_spacetime_vit_forward_parity():
    torch_model = _rand_init(TorchSpaceTimeTransformer(**CFG)).eval()

    flax_model = SpaceTimeViT(
        img_size=CFG["img_size"], patch_size=CFG["patch"], dim=CFG["dim"],
        depth=CFG["depth"], heads=CFG["heads"], frames=CFG["frames"],
        out_dim=CFG["out_dim"])
    frames = RNG.rand(2, CFG["frames"], CFG["img_size"], CFG["img_size"],
                      3).astype(np.float32)
    template = flax_model.init(jax.random.PRNGKey(0), frames)["params"]
    params = vit_state_dict_to_params(torch_model.state_dict(),
                                      template=template)

    got = np.asarray(flax_model.apply({"params": params}, frames))
    with torch.no_grad():
        want = torch_model(
            torch.from_numpy(frames).permute(0, 1, 4, 2, 3)).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_spacetime_vit_egovlp_prefixes():
    """EgoVLP wrapper keys (module.video_model.*, vid_proj.0.*, text tower
    dropped) import to the identical params tree."""
    torch_model = _rand_init(TorchSpaceTimeTransformer(**CFG), seed=1).eval()
    sd = torch_model.state_dict()
    wrapped = {}
    for k, v in sd.items():
        if k.startswith("proj."):
            wrapped["module.vid_proj.0." + k.split(".", 1)[1]] = v
        else:
            wrapped["module.video_model." + k] = v
    # text-tower keys must be ignored
    wrapped["module.text_model.encoder.weight"] = torch.zeros(3, 3)
    wrapped["module.txt_proj.0.weight"] = torch.zeros(3, 3)

    flax_model = SpaceTimeViT(
        img_size=CFG["img_size"], patch_size=CFG["patch"], dim=CFG["dim"],
        depth=CFG["depth"], heads=CFG["heads"], frames=CFG["frames"],
        out_dim=CFG["out_dim"])
    frames = RNG.rand(1, CFG["frames"], CFG["img_size"], CFG["img_size"],
                      3).astype(np.float32)
    template = flax_model.init(jax.random.PRNGKey(0), frames)["params"]
    params = vit_state_dict_to_params(wrapped, template=template)

    got = np.asarray(flax_model.apply({"params": params}, frames))
    with torch.no_grad():
        want = torch_model(
            torch.from_numpy(frames).permute(0, 1, 4, 2, 3)).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_spacetime_vit_qkv_bias_backfill():
    """qkv_bias=False-style checkpoints (missing bias rows) import with
    zero-filled biases instead of failing."""
    torch_model = _rand_init(TorchSpaceTimeTransformer(**CFG), seed=2).eval()
    sd = {k: v for k, v in torch_model.state_dict().items()}
    dropped = [k for k in sd if k.endswith("qkv.bias")]
    assert dropped
    with torch.no_grad():
        for k in dropped:
            # oracle must also run with zero bias for the comparison
            mod = torch_model
            for part in k.split(".")[:-1]:
                mod = mod[int(part)] if part.isdigit() else getattr(mod, part)
            mod.bias.zero_()
    sd = {k: v for k, v in torch_model.state_dict().items()
          if k not in dropped}

    flax_model = SpaceTimeViT(
        img_size=CFG["img_size"], patch_size=CFG["patch"], dim=CFG["dim"],
        depth=CFG["depth"], heads=CFG["heads"], frames=CFG["frames"],
        out_dim=CFG["out_dim"])
    frames = RNG.rand(1, CFG["frames"], CFG["img_size"], CFG["img_size"],
                      3).astype(np.float32)
    template = flax_model.init(jax.random.PRNGKey(0), frames)["params"]
    params = vit_state_dict_to_params(sd, template=template)
    got = np.asarray(flax_model.apply({"params": params}, frames))
    with torch.no_grad():
        want = torch_model(
            torch.from_numpy(frames).permute(0, 1, 4, 2, 3)).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
