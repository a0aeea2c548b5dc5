"""PyTorch checkpoint import/export for released DeCafNet weights.

The reference checkpoints are ``{epoch}-{itr}.pth`` files holding
``{'model': state_dict, 'model_ema': state_dict}``
(reference: libs/worker_v2.py:675-696); eval loads ``model_ema``
(libs/worker_v2.py:806-812).

Because this framework stores conv kernels in the torch (out, in, k) layout
and names its flax modules after the reference's torch module tree, the
import is a pure key rename: every dot-separated integer component of a
torch key is merged into its parent list name ("transformer.0" ->
"transformer_0"); tensor values are converted bitwise.
"""

from __future__ import annotations

import re

import jax.numpy as jnp
import numpy as np


def torch_key_to_path(key):
    """'text_net.transformer.0.attn.attn.query.weight'
    -> ('text_net', 'transformer_0', 'attn', 'attn', 'query', 'weight')"""
    parts = []
    for p in key.split("."):
        if re.fullmatch(r"\d+", p) and parts:
            parts[-1] = f"{parts[-1]}_{p}"
        else:
            parts.append(p)
    return tuple(parts)


def path_to_torch_key(path):
    """Inverse of torch_key_to_path."""
    parts = []
    for p in path:
        m = re.fullmatch(r"(.+)_(\d+)", p)
        if m and not re.fullmatch(r"conv_1x1|conv_\d+x\d+", p):
            parts.extend([m.group(1), m.group(2)])
        else:
            parts.append(p)
    return ".".join(parts)


def state_dict_to_params(state_dict, template=None, dtype=jnp.float32):
    """Convert a torch state_dict (or {key: np.ndarray}) to a flax params
    tree. If ``template`` (the tree from model.init(...)["params"]) is given,
    verify exact key-set and shape agreement."""
    tree = {}
    for key, value in state_dict.items():
        if hasattr(value, "detach"):
            value = value.detach().cpu().numpy()
        value = np.asarray(value)
        path = torch_key_to_path(key)
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = jnp.asarray(value, dtype=dtype)

    if template is not None:
        t_paths = _leaf_paths(template)
        g_paths = _leaf_paths(tree)
        missing = t_paths.keys() - g_paths.keys()
        extra = g_paths.keys() - t_paths.keys()
        assert not missing and not extra, (
            f"checkpoint/model mismatch; missing={sorted(missing)[:10]} "
            f"extra={sorted(extra)[:10]}")
        for p, shape in t_paths.items():
            got = g_paths[p]
            assert tuple(got) == tuple(shape), (
                f"shape mismatch at {p}: ckpt {got} vs model {shape}")
    return tree


def params_to_state_dict(params):
    """Convert a flax params tree back to a torch-layout state_dict of
    numpy arrays (usable with torch.save for reference interop)."""
    out = {}
    for path, value in _walk(params):
        out[path_to_torch_key(path)] = np.asarray(value)
    return out


def load_torch_checkpoint(path, which="model_ema", template=None,
                          dtype=jnp.float32):
    """Load a reference .pth checkpoint into a flax params tree."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=True)
    if which in ckpt:
        sd = ckpt[which]
    else:
        sd = ckpt
    return state_dict_to_params(sd, template=template, dtype=dtype)


def _walk(tree, prefix=()):
    for k, v in tree.items():
        if isinstance(v, dict):
            yield from _walk(v, prefix + (k,))
        else:
            yield prefix + (k,), v


def _leaf_paths(tree):
    return {p: np.shape(v) for p, v in _walk(tree)}
