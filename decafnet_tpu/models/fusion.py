"""Query-video cross-attention fusion (reference: libs/modeling/fusion.py)."""

from __future__ import annotations

import flax.linen as nn

from ..nn.blocks import LayerNorm, TransformerDecoder


class XAttNFusion(nn.Module):
    """Stack of adaln cross-attention decoders + output LayerNorm; accepts a
    single (x, mask) pair or an FPN tuple
    (reference: libs/modeling/fusion.py:17-78)."""
    vid_dim: int
    text_dim: int
    n_layers: int = 2
    n_heads: int = 4
    attn_pdrop: float = 0.0
    proj_pdrop: float = 0.0
    path_pdrop: float = 0.0
    xattn_mode: str = "adaln"

    def setup(self):
        self.layers = [
            TransformerDecoder(
                self.vid_dim, self.text_dim, n_heads=self.n_heads,
                attn_pdrop=self.attn_pdrop, proj_pdrop=self.proj_pdrop,
                path_pdrop=self.path_pdrop, xattn_mode=self.xattn_mode)
            for _ in range(self.n_layers)
        ]
        self.ln_out = LayerNorm(self.vid_dim)

    def _fuse(self, q, q_mask, kv, kv_mask, deterministic):
        for layer in self.layers:
            q, q_mask = layer(q, q_mask, kv, kv_mask,
                              deterministic=deterministic)
        return self.ln_out(q), q_mask

    def __call__(self, vid, vid_masks, text, text_mask, deterministic=True):
        if not isinstance(vid, tuple):
            return self._fuse(vid, vid_masks, text, text_mask, deterministic)
        out, out_masks = (), ()
        for x, mask in zip(vid, vid_masks):
            x, mask = self._fuse(x, mask, text, text_mask, deterministic)
            out += (x,)
            out_masks += (mask,)
        return out, out_masks


FUSIONS = {"xattn": XAttNFusion}


def make_fusion(opt):
    """Registry constructor (reference: libs/modeling/fusion.py:81-83)."""
    opt = dict(opt)
    name = opt.pop("name")
    cls = FUSIONS[name]
    fields = set(cls.__dataclass_fields__)
    return cls(**{k: v for k, v in opt.items() if k in fields})
