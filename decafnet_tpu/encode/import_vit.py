"""EgoVLP / Frozen-in-Time checkpoint import for the space-time ViT.

EgoVLP checkpoints hold the video tower under ``(module.)video_model.*``
(Frozen-in-Time SpaceTimeTransformer keys: cls_token, pos_embed,
temporal_embed, patch_embed.proj.*, blocks.N.{norm1,attn,norm3,timeattn,
norm2,mlp}.*, norm.*) plus the projection ``vid_proj.0.*``. Because
``SpaceTimeViT`` stores parameters in the torch layout under the torch
names (encode/spacetime_vit.py), import is the same mechanical key rename
used for grounder checkpoints (models/import_torch.py) after prefix
stripping -- no transposes, no reshapes.

The reference consumes only the OUTPUT of this tower as offline .npy
features (reference: libs/data/dataset.py:363-407); importing the tower
itself makes the on-device encode stage runnable with real weights the day
a checkpoint file is mounted.
"""

from __future__ import annotations

import numpy as np

from ..models.import_torch import state_dict_to_params

_PREFIXES = ("module.", "model.", "video_model.")
_SKIP_PREFIXES = ("text_model.", "txt_proj.", "text_proj.", "txt_model.")
# timm buffers / heads that have no counterpart in the eval-only module
_SKIP_KEYS = ("head.weight", "head.bias", "pre_logits.fc.weight",
              "pre_logits.fc.bias")


def normalize_vit_key(key):
    """Strip wrapper prefixes; map EgoVLP's ``vid_proj.0.*`` to ``proj.*``.
    Returns None for keys that belong to other towers (text model) or to
    train-time-only heads."""
    changed = True
    while changed:
        changed = False
        for p in _PREFIXES:
            if key.startswith(p):
                key = key[len(p):]
                changed = True
    for p in _SKIP_PREFIXES:
        if key.startswith(p):
            return None
    if key in _SKIP_KEYS:
        return None
    if key.startswith("vid_proj."):
        # nn.Sequential(nn.Linear(...)) -> our single TorchLinear 'proj'
        key = "proj." + key.split(".", 2)[2]
    return key


def vit_state_dict_to_params(state_dict, template=None):
    """Torch SpaceTimeTransformer/EgoVLP state_dict -> SpaceTimeViT params.

    ``template`` (from model.init) enforces exact key-set + shape agreement.
    Missing qkv/proj biases (qkv_bias=False checkpoints) are zero-filled.
    """
    sd = {}
    for k, v in state_dict.items():
        nk = normalize_vit_key(k)
        if nk is None:
            continue
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        sd[nk] = np.asarray(v)
    # zero-fill absent biases so qkv_bias=False checkpoints import cleanly
    for k in list(sd):
        if k.endswith(".weight"):
            bk = k[:-len(".weight")] + ".bias"
            if bk not in sd and ("qkv" in k or "proj" in k):
                sd[bk] = np.zeros(sd[k].shape[0], sd[k].dtype)
    return state_dict_to_params(sd, template=template)


def load_vit_checkpoint(path, template=None):
    """Load a torch .pth/.tar checkpoint (EgoVLP layout: possibly nested
    under 'state_dict') into a SpaceTimeViT params tree."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(ckpt, dict) and "state_dict" in ckpt:
        ckpt = ckpt["state_dict"]
    return vit_state_dict_to_params(ckpt, template=template)
