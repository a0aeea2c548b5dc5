"""The DeCafNet grounder: delegation -> early fusion -> video FPN -> dual
classification heads with TCN-based multi-scale temporal refinement ->
anchor-free boundary regression.

Re-implements the live reference model ``PtTransformerEarlyFusionIterative``
(reference: libs/modeling/model.py:397-650) plus the two documented variants.
Key structural difference from the reference: there is ONE forward for both
training and evaluation. The reference's eval path loops over text queries in
Python and re-encodes the video per query (libs/modeling/model.py:526-563);
here a (video, query) pair is simply a batch row -- the evaluator batches all
queries of a video into rows, which is numerically identical per row (every
op is row-independent) but keeps the TPU's MXU saturated.

Inputs (all static-shaped):
  vid        (B, C_exp, T) expert clip features, repeated per query row
  shallow_vid(B, C_side, T) sidekick clip features
  vid_masks  (B, T) bool valid-clip mask
  text       (B, C_txt, L) query token features
  text_cls   (B, C_side) query CLS embedding (saliency probe)
  text_masks (B, L) bool token mask
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..nn.blocks import MaskedConv1D
from ..ops.delegation import delegate, delegation_weights
from ..ops.masked import interpolate_nearest_1d, masked_max_pool1d
from .fusion import make_fusion
from .heads import dual_head_applicable, dual_head_apply, make_head
from .tcn import TCN
from .text_net import make_text_net
from .video_net import make_video_net


def _delegated_in_dim(model_cfg):
    in_dim = model_cfg["vid_net"]["in_dim"]
    if model_cfg.get("msf"):
        in_dim *= 2
    if model_cfg.get("scat"):
        in_dim += 1
    return in_dim


class DeCafNetIterative(nn.Module):
    """Live DeCafNet model (reference: libs/modeling/model.py:397-650).

    ``compute_dtype`` = 'bfloat16' casts activations at entry for MXU speed;
    parameters stay fp32 and normalization/softmax statistics are computed
    in fp32 regardless (ops/masked.py, ops/local_attention.py). Heads emit
    logits in the compute dtype; losses/decoding upcast to fp32.
    """
    cfg: Dict[str, Any]          # the `model` config subtree
    second_fusion: bool = False  # reference constructs with False (worker_v2.py:193)
    compute_dtype: Any = None

    def setup(self):
        m = self.cfg
        vid_embd = m["vid_net"]["embd_dim"]
        num_levels = m["vid_net"]["arch"][-1]
        rdim = m.get("rdim") or 32

        self.text_net = make_text_net(m["text_net"])
        self.vid_map = MaskedConv1D(_delegated_in_dim(m), vid_embd, 1)
        self.vid_net = make_video_net({**m["vid_net"], "in_dim": vid_embd})
        self.fusion = make_fusion(m["fusion"])
        self.cls_head = make_head(m["cls_head"])
        # dropout 0.5 matches the reference TCN default
        # (libs/modeling/tcn.py:41); tcn_dropout is a repo-only ablation knob
        self.refine = TCN(num_levels, rdim, rdim, num_layers=num_levels,
                          in_map=True,
                          dropout=m.get("tcn_dropout", 0.5))
        self.cls_head2 = make_head(
            {**m["cls_head"], "embd_dim": m["cls_head"]["embd_dim"] + rdim})
        self.reg_head = make_head(
            {**m["reg_head"], "embd_dim": m["reg_head"]["embd_dim"] + rdim})
        self.channel_drop = nn.Dropout(m["vid_net"].get("cdrop", 0.0),
                                       broadcast_dims=(2,))

    def encode_text(self, text, text_masks, deterministic=True):
        return self.text_net(text, text_masks, deterministic=deterministic)

    def encode_video(self, vid, vid_masks, deterministic=True,
                     pe_interp=None):
        return self.vid_net(vid, vid_masks, deterministic=deterministic,
                            pe_interp=pe_interp)

    def fuse_and_predict(self, fpn, fpn_masks, text, text_masks,
                         deterministic=True):
        """Dual heads with TCN refinement
        (reference: libs/modeling/model.py:442-471)."""
        if self.second_fusion:
            fpn, fpn_masks = self.fusion(fpn, fpn_masks, text, text_masks,
                                         deterministic=deterministic)
        fpn_logits, _ = self.cls_head(fpn, fpn_masks)

        # nearest-expand every level to the level-0 grid and stack (bs, L, T)
        ref_len = fpn_logits[0].shape[1]
        mask0 = fpn_masks[0][:, 0].astype(fpn_logits[0].dtype)
        expanded = [fpn_logits[0]]
        for logits in fpn_logits[1:]:
            up = interpolate_nearest_1d(logits[:, None, :], ref_len)[:, 0]
            expanded.append(up * mask0)
        stacked = jnp.stack(expanded, axis=1)

        refined = self.refine(stacked, fpn_masks[0],
                              deterministic=deterministic)   # (bs, rdim, T)

        # per-level concat, downsampling the refined map with masked max pool
        new_fpn = ()
        for i, f in enumerate(fpn):
            if i != 0:
                refined = masked_max_pool1d(refined, fpn_masks[i - 1])[0]
            new_fpn += (jnp.concatenate([f, refined.astype(f.dtype)], axis=1),)

        if dual_head_applicable(self.cls_head2, self.reg_head):
            # single-pass dual trunk: new_fpn levels are read ONCE for both
            # heads (concatenated layer-1 conv, 2-group deeper convs,
            # per-stream LN) -- numerics match the separate calls to fp
            # reassociation (tests/test_dual_head.py)
            fpn_logits2, fpn_offsets, out_masks = dual_head_apply(
                self.cls_head2, self.reg_head, new_fpn, fpn_masks)
        else:
            fpn_logits2, _ = self.cls_head2(new_fpn, fpn_masks)
            fpn_offsets, out_masks = self.reg_head(new_fpn, fpn_masks)
        return fpn_logits, fpn_logits2, fpn_offsets, out_masks

    def _delegate_project_grouped(self, vid, shallow_vid, vid_masks,
                                  text_cls, Q):
        """Video-major delegation + vid_map for eval batches of V videos x
        Q query rows.

        The binary delegation weight broadcasts over channels, so it
        COMMUTES with the 1x1 ``vid_map`` projection:
          W_e @ (vid * w) + W_s @ shallow + b
            == w * (W_e @ vid) + (W_s @ shallow) + b.
        The expensive 2C->embd projection therefore runs once per VIDEO (V
        rows) instead of once per query row (V*Q rows), and the Q-fold row
        expansion happens at embd_dim channels -- a structural optimization
        the reference's per-query eval loop cannot express
        (libs/modeling/model.py:526-563 re-encodes the video per query).
        Mathematically identical to delegate() -> vid_map(); floating-point
        reassociation only (tested to 1e-5 in tests/test_grouped_eval.py).

        Returns per-row (vid_rows, mask_rows) ready for fusion.
        """
        m = self.cfg
        V, _, T = vid.shape
        embd = self.vid_map.conv.weight.shape[0]
        C_exp = m["vid_net"]["in_dim"]
        C_side = shallow_vid.shape[1]

        # saliency correlation per (video, query) WITHOUT repeating videos
        sv, tc = shallow_vid, text_cls.reshape(V, Q, C_side)
        if m.get("norm", False):
            sv = sv / (jnp.linalg.norm(sv, axis=1, keepdims=True) + 1e-4)
            tc = tc / (jnp.linalg.norm(tc, axis=2, keepdims=True) + 1e-4)
        correl = jnp.einsum("vct,vqc->vqt", sv, tc,
                            preferred_element_type=jnp.float32) \
            .reshape(V * Q, T)
        mask_rows = jnp.repeat(vid_masks, Q, axis=0)
        weight = delegation_weights(correl, mask_rows,
                                    m.get("sn", 60), m.get("sratio", 0.0))

        dtype = self.compute_dtype or vid.dtype
        mask_f = vid_masks[:, None, :].astype(dtype)
        W = self.vid_map.conv.weight  # (embd, in_total, 1)
        bias = self.vid_map.conv.bias

        def proj(x, w_block):
            return jax.lax.conv_general_dilated(
                x.astype(dtype) * mask_f, w_block.astype(dtype), (1,),
                [(0, 0)], dimension_numbers=("NCH", "OIH", "NCH"))

        a = proj(vid, W[:, :C_exp])                    # (V, embd, T)
        w_rows = weight.reshape(V, Q, 1, T).astype(dtype)
        if m.get("msf", False):
            b_ = proj(shallow_vid, W[:, C_exp:C_exp + C_side])
            rows = a[:, None] * w_rows + b_[:, None]
        else:
            rows = a[:, None] * w_rows
            mask_rows = (weight > 0) & mask_rows
        rows = rows.reshape(V * Q, embd, T)
        if m.get("scat", False):
            # the correlation channel is masked by the PER-ROW mask (which
            # includes the (w>0) gating in the non-msf case), exactly like
            # the unfused MaskedConv1D input multiply
            w_scat = W[:, -1, 0].astype(dtype)         # (embd,)
            corr_rows = correl.astype(dtype) * mask_rows.astype(dtype)
            rows = rows + w_scat[None, :, None] * corr_rows[:, None, :]
        if bias is not None:
            rows = rows + bias.astype(dtype)[None, :, None]
        return rows, mask_rows[:, None, :]

    def __call__(self, vid, shallow_vid, vid_masks, text, text_cls,
                 text_masks, deterministic=True, pe_interp=None,
                 queries_per_video=1):
        """``queries_per_video`` > 1 activates the video-major path:
        ``vid``/``shallow_vid``/``vid_masks`` carry V videos while the text
        inputs carry V*Q rows (row r belongs to video r // Q); per-video
        work (the vid_map projection and the expert-stream read) is
        computed once per video. Available to training too whenever
        channel dropout is off (the default, libs/core/opt.py:104): with
        cdrop == 0 the only pre-projection stochastic op is the identity,
        so the grouped projection is the same function of the parameters
        -- gradients match the per-row path to fp reassociation
        (tests/test_grouped_eval.py::test_train_grads_match_grouped).
        With cdrop > 0 the reference applies Dropout1d per QUERY ROW on
        the delegated 2C input (libs/modeling/model.py:614), which does
        not commute with the hoisted projection -- fall back to rows."""
        m = self.cfg
        Q = queries_per_video
        grouped_ok = deterministic or m["vid_net"].get("cdrop", 0.0) == 0.0
        if Q > 1 and grouped_ok and not m.get("sfonly", False):
            vid, vm = self._delegate_project_grouped(
                vid, shallow_vid, vid_masks, text_cls, Q)
        else:
            if Q > 1:  # sfonly or non-deterministic: expand and fall back
                vid = jnp.repeat(vid, Q, axis=0)
                shallow_vid = jnp.repeat(shallow_vid, Q, axis=0)
                vid_masks = jnp.repeat(vid_masks, Q, axis=0)
            # delegation (saliency + binary weights) always in fp32
            vid, vid_masks, _ = delegate(
                vid, shallow_vid, vid_masks, text_cls,
                sn=m.get("sn", 60), ratio=m.get("sratio", 0.0),
                normalize=m.get("norm", False),
                msf=m.get("msf", False), scat=m.get("scat", False),
                sfonly=m.get("sfonly", False) and deterministic)

            if self.compute_dtype is not None:
                vid = vid.astype(self.compute_dtype)

            vid = self.channel_drop(vid, deterministic=deterministic)
            vid, vm = self.vid_map(vid, vid_masks[:, None, :])

        if self.compute_dtype is not None:
            text = text.astype(self.compute_dtype)

        text_enc, text_mask_enc = self.encode_text(
            text, text_masks, deterministic=deterministic)
        vid, vm = self.fusion(vid, vm, text_enc, text_mask_enc,
                              deterministic=deterministic)
        fpn, fpn_masks = self.encode_video(vid, vm,
                                           deterministic=deterministic,
                                           pe_interp=pe_interp)
        return self.fuse_and_predict(fpn, fpn_masks, text_enc, text_mask_enc,
                                     deterministic=deterministic)


class DeCafNetEarlyFusion(nn.Module):
    """Early-fusion variant with a single classification head
    (reference: libs/modeling/model.py:163-373)."""
    cfg: Dict[str, Any]
    second_fusion: bool = True
    compute_dtype: Any = None

    def setup(self):
        m = self.cfg
        vid_embd = m["vid_net"]["embd_dim"]
        self.text_net = make_text_net(m["text_net"])
        self.vid_map = MaskedConv1D(_delegated_in_dim(m), vid_embd, 1)
        self.vid_net = make_video_net({**m["vid_net"], "in_dim": vid_embd})
        self.fusion = make_fusion(m["fusion"])
        self.cls_head = make_head(m["cls_head"])
        self.reg_head = make_head(m["reg_head"])
        self.channel_drop = nn.Dropout(m["vid_net"].get("cdrop", 0.0),
                                       broadcast_dims=(2,))

    def __call__(self, vid, shallow_vid, vid_masks, text, text_cls,
                 text_masks, deterministic=True, pe_interp=None,
                 queries_per_video=1):
        m = self.cfg
        if queries_per_video > 1:  # video-major batches: expand to rows
            vid = jnp.repeat(vid, queries_per_video, axis=0)
            shallow_vid = jnp.repeat(shallow_vid, queries_per_video, axis=0)
            vid_masks = jnp.repeat(vid_masks, queries_per_video, axis=0)
        vid, vid_masks, _ = delegate(
            vid, shallow_vid, vid_masks, text_cls,
            sn=m.get("sn", 60), ratio=m.get("sratio", 0.0),
            normalize=m.get("norm", False),
            msf=m.get("msf", False), scat=m.get("scat", False),
            sfonly=m.get("sfonly", False) and deterministic)
        if self.compute_dtype is not None:
            vid = vid.astype(self.compute_dtype)
            text = text.astype(self.compute_dtype)
        vid = self.channel_drop(vid, deterministic=deterministic)
        vid, vm = self.vid_map(vid, vid_masks[:, None, :])
        text_enc, text_mask_enc = self.text_net(
            text, text_masks, deterministic=deterministic)
        vid, vm = self.fusion(vid, vm, text_enc, text_mask_enc,
                              deterministic=deterministic)
        fpn, fpn_masks = self.vid_net(vid, vm, deterministic=deterministic,
                                      pe_interp=pe_interp)
        if self.second_fusion:
            fpn, fpn_masks = self.fusion(fpn, fpn_masks, text_enc,
                                         text_mask_enc,
                                         deterministic=deterministic)
        if dual_head_applicable(self.cls_head, self.reg_head):
            fpn_logits, fpn_offsets, out_masks = dual_head_apply(
                self.cls_head, self.reg_head, fpn, fpn_masks)
        else:
            fpn_logits, _ = self.cls_head(fpn, fpn_masks)
            fpn_offsets, out_masks = self.reg_head(fpn, fpn_masks)
        return fpn_logits, fpn_offsets, out_masks


class DeCafNetLateFusion(nn.Module):
    """Late-fusion variant: delegation -> FPN -> fusion on every level
    (reference: libs/modeling/model.py:30-161, the 'default' architecture)."""
    cfg: Dict[str, Any]
    compute_dtype: Any = None

    def setup(self):
        m = self.cfg
        self.text_net = make_text_net(m["text_net"])
        self.vid_net = make_video_net(
            {**m["vid_net"], "in_dim": _delegated_in_dim(m)})
        self.fusion = make_fusion(m["fusion"])
        self.cls_head = make_head(m["cls_head"])
        self.reg_head = make_head(m["reg_head"])
        self.channel_drop = nn.Dropout(m["vid_net"].get("cdrop", 0.0),
                                       broadcast_dims=(2,))

    def __call__(self, vid, shallow_vid, vid_masks, text, text_cls,
                 text_masks, deterministic=True, pe_interp=None,
                 queries_per_video=1):
        m = self.cfg
        if queries_per_video > 1:  # video-major batches: expand to rows
            vid = jnp.repeat(vid, queries_per_video, axis=0)
            shallow_vid = jnp.repeat(shallow_vid, queries_per_video, axis=0)
            vid_masks = jnp.repeat(vid_masks, queries_per_video, axis=0)
        vid, vid_masks, _ = delegate(
            vid, shallow_vid, vid_masks, text_cls,
            sn=m.get("sn", 60), ratio=m.get("sratio", 0.0),
            normalize=m.get("norm", False),
            msf=m.get("msf", False), scat=m.get("scat", False))
        if self.compute_dtype is not None:
            vid = vid.astype(self.compute_dtype)
            text = text.astype(self.compute_dtype)
        vid = self.channel_drop(vid, deterministic=deterministic)
        fpn, fpn_masks = self.vid_net(vid, vid_masks[:, None, :],
                                      deterministic=deterministic,
                                      pe_interp=pe_interp)
        text_enc, text_mask_enc = self.text_net(
            text, text_masks, deterministic=deterministic)
        fpn, fpn_masks = self.fusion(fpn, fpn_masks, text_enc, text_mask_enc,
                                     deterministic=deterministic)
        if dual_head_applicable(self.cls_head, self.reg_head):
            fpn_logits, fpn_offsets, out_masks = dual_head_apply(
                self.cls_head, self.reg_head, fpn, fpn_masks)
        else:
            fpn_logits, _ = self.cls_head(fpn, fpn_masks)
            fpn_offsets, out_masks = self.reg_head(fpn, fpn_masks)
        return fpn_logits, fpn_offsets, out_masks


# Round-4 shipped a length gate here (16384): the on-chip A/B had measured
# bf16 19% SLOWER than f32 at T=32768/Q=2 (39.4 vs 31.8 ms). Round 5
# root-caused that regression to three bf16-hostile VPU formulations --
# depthwise shift-FMA at the deep FPN levels (nn/blocks.py dtype-aware
# dispatch), LN channel statistics as sublane reductions
# (ops/masked.py:_LN_DOT_MIN_T ones-dot path), and the diagonal band-score
# lane reductions (ops/local_attention.py:_DIAG_DOT_MIN_T) -- and fixed
# them; with the fixes bf16 WINS at every measured length
# (scripts/results/threshold_calibration.json + mad_stage_profile_*_r5fix:
# T=4608 4.02 vs 4.35 ms, 9216 6.92 vs 7.58, 16384 11.51 vs 12.91,
# 32768 21.32 vs 23.97). The gate is therefore DISABLED (None). The
# per-bucket dispatch machinery (resolve_compute_dtype(grid_t=...),
# Evaluator._model_for_bucket) remains live so a future regression can be
# re-gated per shape, not per config.
_BF16_AUTO_MAX_T = None


def resolve_compute_dtype(cfg, eval_mode=False, grid_t=None):
    """Resolve ``cfg.tpu.compute_dtype`` to a concrete dtype string.

    "auto" (the shipped default) means: float32 for training (the loss-norm
    EMA and AdamW moments are parity surfaces), float32 for
    ``eval.reference_exact`` parity runs and on non-TPU backends (XLA:CPU
    has no bf16-input dots), and bfloat16 for TPU eval/serving -- the mode
    the pre-registered promotion study validated
    (scripts/results/bf16_promotion.json) and, since the round-5 kernel
    fixes, the measured winner at EVERY length (see ``_BF16_AUTO_MAX_T``).

    ``grid_t`` is the model-grid length the resolved program will actually
    run at. Eval buckets grow past ``model.vid_net.max_seq_len`` in pow-2
    steps (data/batching.py:bucket_length, points buffered for 10x), so
    the Evaluator resolves PER BUCKET with ``grid_t = T_bucket //
    vid_stride`` -- the dtype gate, when one is active, is per-SHAPE like
    the depthwise dispatch at nn/blocks.py (with ``_BF16_AUTO_MAX_T``
    disabled the per-bucket resolution is currently length-independent).
    When ``grid_t`` is None the config's ``max_seq_len`` is used
    (config-level resolution). Explicit non-"auto" values always pass
    through."""
    tpu_cfg = cfg.get("tpu") if hasattr(cfg, "get") else None
    value = tpu_cfg.get("compute_dtype", "float32") if tpu_cfg else "float32"
    if value != "auto":
        return value
    if not eval_mode:
        return "float32"
    eval_cfg = cfg.get("eval") if hasattr(cfg, "get") else None
    if eval_cfg and eval_cfg.get("reference_exact", False):
        return "float32"
    if grid_t is None:
        try:
            grid_t = int(cfg.model.vid_net.max_seq_len)
        except (AttributeError, KeyError, TypeError):
            grid_t = 0
    if _BF16_AUTO_MAX_T is not None and grid_t >= _BF16_AUTO_MAX_T:
        return "float32"
    import jax
    return "bfloat16" if jax.default_backend() == "tpu" else "float32"


def resolve_matmul_precision(cfg, eval_mode=False):
    """Resolve ``cfg.tpu.matmul_precision`` to a concrete precision string
    for ``jax_default_matmul_precision``.

    Explicit values ("default" | "high" | "highest") pass through. "auto"
    means: "high" (bf16x3, TF32-class -- the same accuracy class as the
    reference's A100 cudnn convs with allow_tf32 on) for BOTH training and
    eval, and "highest" for ``eval.reference_exact`` strict-parity runs.

    History of the eval resolution: round 4 promoted "default" for TPU
    eval after a 604-step pre-registered study passed 3/3 seeds
    (scripts/results/precision_promotion_600.json) -- at that time f32 was
    the eval compute dtype at MAD lengths and "default" measured 24.1 vs
    31.8 ms. Round 5 re-ran the same rule at 2004 delivered steps and it
    FAILED (precision_promotion_2000.json: seed 0, one R@5 count flip in
    12 queries; R1 identical everywhere), firing the pre-registered revert
    trigger. The revert is free in the SHIPPED path because round 5 also
    made bf16 the eval compute dtype at every length, and bf16-input dots
    are single-pass regardless of this lever: the same-session A/B
    (scripts/results/prec_ab_{high,default}.json) measures the bf16 full
    decode at 2.92 ("high") vs 3.14 ms ("default") at T=2304 and 21.69 vs
    21.89 ms at T=32768 -- a wash. Only explicit-f32 TPU eval (an opt-out
    corner) pays the "high" cost (32.3 vs 24.1 ms at MAD scale).
    """
    tpu_cfg = cfg.get("tpu") if hasattr(cfg, "get") else None
    value = tpu_cfg.get("matmul_precision", "high") if tpu_cfg else "high"
    if value != "auto":
        return value
    eval_cfg = cfg.get("eval") if hasattr(cfg, "get") else None
    if eval_cfg and eval_cfg.get("reference_exact", False):
        return "highest"
    return "high"


def make_model(cfg, compute_dtype=None):
    """Model factory (reference: libs/worker_v2.py:182-211 -- only 'iter' is
    constructible in the released path; the variants are kept for parity
    with the documented architectures). ``cfg.tpu.compute_dtype: bfloat16``
    enables the mixed-precision fast path (fp32 params / statistics);
    ``compute_dtype`` overrides the config (the Evaluator passes the
    eval-resolved "auto" value). Without an override, "auto" resolves with
    train semantics (float32)."""
    name = cfg.model["name"]
    model_cfg = cfg.model.to_dict() if hasattr(cfg.model, "to_dict") else dict(cfg.model)
    value = compute_dtype or resolve_compute_dtype(cfg, eval_mode=False)
    dtype = jnp.bfloat16 if value in ("bfloat16", "bf16") else None
    tpu_cfg = cfg.get("tpu") if hasattr(cfg, "get") else None
    if tpu_cfg and tpu_cfg.get("remat"):
        model_cfg["vid_net"] = {
            **model_cfg["vid_net"], "remat": True,
            "remat_policy": tpu_cfg.get("remat_policy", "nothing")}
    if name == "iter":
        return DeCafNetIterative(model_cfg, second_fusion=False,
                                 compute_dtype=dtype)
    if name == "iter2":
        return DeCafNetIterative(model_cfg, second_fusion=True,
                                 compute_dtype=dtype)
    if name == "early":
        return DeCafNetEarlyFusion(model_cfg, second_fusion=False,
                                   compute_dtype=dtype)
    if name == "early2":
        return DeCafNetEarlyFusion(model_cfg, second_fusion=True,
                                   compute_dtype=dtype)
    if name == "default":
        return DeCafNetLateFusion(model_cfg, compute_dtype=dtype)
    raise ValueError(f"unknown model: {name}")
