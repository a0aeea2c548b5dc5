"""Batched evaluator: encode + ground + decode + NMS on device, queries as
batch rows.

Reference control flow (libs/worker_v2.py:726-1227): per video, encode each
text query in a Python loop, re-encode the video once per query inside the
model, move logits to CPU, run C++ SoftNMS per query. Here all queries of a
video form one batched forward (numerically identical per row), the proposal
decode (sigmoid -> threshold -> top-k -> segment assembly -> length filter ->
SoftNMS -> voting) is a single jitted program vmapped over queries, and only
the final (Q, 5, 3) detections return to the host. ``reference_exact`` mode
routes NMS through the C++ host oracle instead for bit-level checks.

Wall-clock is tracked in the same buckets as the reference
(prepare / forward+post / nms, libs/worker_v2.py:799,979,1022,1091,1127).
"""

from __future__ import annotations

import functools
import os
import time
from collections import defaultdict

import jax
import jax.numpy as jnp
import numpy as np

from ..data import DataLoader, batchify_eval, make_dataset, min_chunk_size
from ..models import fpn_lengths, generate_points, make_model, select_points
from ..ops.masked import max_pool1d
from ..ops.nms import batched_nms_device, batched_nms_host
from ..train.annotate import annotate_points
from ..train.losses import calc_focal_loss, calc_iou_loss
from ..utils.logging import Logger, easy_reduce, time_str
from .metrics import RecallMeter


class Evaluator:

    def __init__(self, cfg, mesh=None, train_time=False, params=None):
        self.cfg = cfg
        self.train_time = train_time

        self.dataset = make_dataset(cfg, is_training=False)
        self.loader = DataLoader(self.dataset, batch_size=1, shuffle=False,
                                 drop_last=False,
                                 num_threads=cfg.train.num_workers)

        self.model = make_model(cfg)
        self.params = params
        if not train_time and params is None:
            self.params = self._load_params()

        # candidate points buffered for 10x the train length
        # (reference: libs/worker_v2.py:752-754)
        self.pt_max = cfg.model.vid_net.max_seq_len * 10
        self.all_points = generate_points(
            self.pt_max, cfg.pt_gen.num_fpn_levels,
            cfg.pt_gen.regression_range, cfg.pt_gen.sigma)

        self.vid_stride = cfg.model.vid_stride
        self.chunk = min_chunk_size(cfg.model.num_fpn_levels,
                                    cfg.model.mha_win_size)
        self.base_len = cfg.data.max_vid_len
        assert self.base_len % (self.chunk * self.vid_stride) == 0, (
            f"max video length must be a multiple of {self.chunk}")

        self.ranks = tuple(cfg.eval.ranks)
        self.meter = RecallMeter(self.ranks, cfg.eval.iou_threshs)
        self.pre_nms_topk = cfg.eval.pre_nms_topk
        self.pre_nms_thresh = cfg.eval.pre_nms_thresh
        self.seg_len_thresh = cfg.eval.seg_len_thresh
        self.query_cap = cfg.eval.get("max_num_queries", 32)
        self.reference_exact = bool(cfg.eval.get("reference_exact", False))
        self.nms_cfg = dict(cfg.nms)

        root = cfg.aux.logdir
        tag = cfg.aux.get("ckpt", "eval")
        if root and not train_time:
            os.makedirs(root, exist_ok=True)
            self.logger = Logger(os.path.join(root, f"eval_{tag}.txt"))
        else:
            self.logger = Logger()
        self.time_dict = defaultdict(list)
        self._decode_cache = {}

    def reset(self):
        self.meter.reset()
        self.time_dict = defaultdict(list)

    def _load_params(self):
        """Load eval weights: the EMA branch of either a native msgpack
        checkpoint or a reference-layout .pth
        (reference: libs/worker_v2.py:806-812 loads model_ema)."""
        root = self.cfg.aux.logdir
        ckpt = self.cfg.aux.get("ckpt", "last")
        pth = os.path.join(root, "models", f"{ckpt}.pth")
        msg = os.path.join(root, "models", f"{ckpt}.msgpack")
        if os.path.exists(msg):
            from flax import serialization
            with open(msg, "rb") as f:
                blob = serialization.msgpack_restore(f.read())
            return jax.tree.map(jnp.asarray, blob["ema_params"])
        if os.path.exists(pth):
            from ..models.import_torch import load_torch_checkpoint
            return load_torch_checkpoint(pth, "model_ema")
        raise FileNotFoundError(f"no checkpoint at {msg} or {pth}")

    # ------------------------------------------------------------------
    # jitted per-shape decode
    # ------------------------------------------------------------------

    def _decode_fn(self, T, Q, L, has_ext):
        """Build (and cache) the jitted decode program for one shape bucket."""
        key = (T, Q, L, has_ext)
        if key in self._decode_cache:
            return self._decode_cache[key]

        cfg = self.cfg
        t0 = T // self.vid_stride
        lens = fpn_lengths(t0, cfg.model.num_fpn_levels)
        # (4, P) transposed, device-resident, passed as an ARGUMENT: (P, 4)
        # slices badly on TPU and jit closure constants are re-materialized
        # per call on some platforms (12x decode cost observed)
        points_np = np.concatenate(select_points(self.all_points, lens))
        points_t = jax.device_put(np.ascontiguousarray(points_np.T))
        P = points_np.shape[0]
        topk = min(self.pre_nms_topk, P)
        k_out = self.nms_cfg["max_num_segs"]
        model = self.model
        pre_thresh = self.pre_nms_thresh
        seg_thresh = self.seg_len_thresh
        nms_cfg = self.nms_cfg
        fc_a, fc_s = cfg.loss.fc_a, cfg.loss.fc_s
        cs = cfg.train.center_sampling
        csr = cfg.train.center_sampling_radius
        run_nms_on_device = not self.reference_exact

        @jax.jit
        def decode(params, vid, shallow, vid_masks, text, text_cls,
                   text_masks, q_valid, ext_scores, targets, points_t):
            vid_q = jnp.repeat(vid, Q, axis=0)
            shallow_q = jnp.repeat(shallow, Q, axis=0)
            vmask_q = jnp.repeat(vid_masks, Q, axis=0)
            _, logits2, offsets, masks = model.apply(
                {"params": params}, vid_q, shallow_q, vmask_q,
                text, text_cls, text_masks, deterministic=True)

            # per-level scores with optional external score modulation
            # (reference: libs/worker_v2.py:1142-1156)
            scores_list = []
            ext = ext_scores
            for lvl, logits in enumerate(logits2):
                s = jax.nn.sigmoid(logits)
                if ext is not None:
                    s = s * ext
                    ext = max_pool1d(ext[:, None, :], 3, 2, 1)[:, 0]
                s = s * masks[lvl].astype(s.dtype)
                scores_list.append(s)
            scores = jnp.concatenate(scores_list, axis=1)      # (Q, P)
            offs = jnp.concatenate(offsets, axis=2)            # (Q, 2, P)
            pmask = jnp.concatenate(masks, axis=1)             # (Q, P)

            # gather-free top-k: TPU index gathers cost more than the whole
            # network forward, so the top-k truncation is applied as a
            # per-query score threshold (the k-th largest value) and
            # segments are assembled densely for ALL points -- identical
            # candidate set, no gathers.
            valid = (scores > pre_thresh) & pmask
            ranked = jnp.where(valid, scores, -1.0)
            kth = jax.lax.top_k(ranked, topk)[0][:, -1:]       # (Q, 1)
            valid = valid & (scores >= kth)

            ctr = points_t[0][None]
            stride = points_t[3][None]
            left = ctr - offs[:, 0, :] * stride                # (Q, P)
            right = ctr + offs[:, 1, :] * stride
            top_valid = valid & ((right - left) > seg_thresh)
            top_scores = jnp.where(top_valid, scores, 0.0)

            # per-query eval-loss diagnostics
            # (reference: libs/worker_v2.py:1029-1061)
            logits2_cat = jnp.concatenate(logits2, axis=1)
            gt_labels, gt_offsets = annotate_points(
                points_t, targets, center_sampling=cs,
                center_sampling_radius=csr)
            pos = gt_labels & pmask
            norm = jnp.maximum(jnp.sum(pos, axis=1).astype(jnp.float32), 1.0)
            cls_l = jax.vmap(lambda lg, lb, mk: calc_focal_loss(
                lg, lb, mk, smoothing=fc_s, alpha=fc_a))(
                    logits2_cat, gt_labels, pmask) / norm
            reg_l = jax.vmap(lambda po, go, mk: calc_iou_loss(
                po, go, mk, reg_loss="iou"))(offs, gt_offsets, pos) / norm

            if run_nms_on_device:
                out_segs, out_scores, counts = batched_nms_device(
                    left, right, top_scores, top_valid, k_out,
                    mode=nms_cfg["mode"], iou_thresh=nms_cfg["iou_thresh"],
                    min_score=nms_cfg["min_score"], sigma=nms_cfg["sigma"],
                    voting_thresh=nms_cfg["voting_thresh"])
                return out_segs, out_scores, counts, cls_l, reg_l
            return left, right, top_scores, top_valid, cls_l, reg_l

        self._decode_cache[key] = (decode, points_t)
        return self._decode_cache[key]

    # ------------------------------------------------------------------

    def predict_video(self, sample, params):
        """All detections + diagnostics for one video's queries."""
        t_prep = time.perf_counter()
        meta, chunks = batchify_eval(
            sample, self.chunk, self.base_len, self.vid_stride,
            self.query_cap)
        self.time_dict["prepare"].append(time.perf_counter() - t_prep)

        results = []
        losses = []
        q_done = 0
        for chunk in chunks:
            t_fwd = time.perf_counter()
            Q = chunk["text"].shape[0]
            T = chunk["vid"].shape[-1]
            L = chunk["text"].shape[-1]
            has_ext = chunk["ext_scores"] is not None
            decode, points_t = self._decode_fn(T, Q, L, has_ext)

            n_q = int(chunk["q_valid"].sum())
            targets = np.tile(np.array([[0.0, 1.0]], np.float32), (Q, 1))
            tgt = np.asarray(meta["target"], np.float32)
            targets[:n_q] = tgt[q_done:q_done + n_q] / self.vid_stride

            out = decode(params, chunk["vid"], chunk["shallow_vid"],
                         chunk["vid_masks"], chunk["text"],
                         chunk["text_cls"], chunk["text_masks"],
                         chunk["q_valid"],
                         (jnp.asarray(chunk["ext_scores"])
                          if has_ext else None),
                         jnp.asarray(targets), points_t)
            out = jax.device_get(out)
            self.time_dict["forward"].append(time.perf_counter() - t_fwd)

            t_nms = time.perf_counter()
            if self.reference_exact:
                left_all, right_all, scores_all, valid_all, cls_l, reg_l = out
                for qi in range(n_q):
                    v = valid_all[qi]
                    segs_np = np.stack(
                        [left_all[qi][v], right_all[qi][v]], axis=-1)
                    segs, scores = batched_nms_host(
                        segs_np, scores_all[qi][v],
                        iou_thresh=self.nms_cfg["iou_thresh"],
                        min_score=self.nms_cfg["min_score"],
                        max_num_segs=self.nms_cfg["max_num_segs"],
                        mode=self.nms_cfg["mode"],
                        sigma=self.nms_cfg["sigma"],
                        voting_thresh=self.nms_cfg["voting_thresh"])
                    results.append(self._to_seconds(segs, scores, meta))
            else:
                out_segs, out_scores, counts, cls_l, reg_l = out
                for qi in range(n_q):
                    c = int(counts[qi])
                    results.append(self._to_seconds(
                        out_segs[qi][:c], out_scores[qi][:c], meta))
            self.time_dict["nms"].append(time.perf_counter() - t_nms)

            for qi in range(n_q):
                losses.append({"cls_loss": float(cls_l[qi]),
                               "reg_loss": float(reg_l[qi])})
            q_done += n_q

        return meta, results, losses

    def _to_seconds(self, segs, scores, meta):
        """Grid units -> seconds (reference: libs/worker_v2.py:1113-1122)."""
        segs = np.asarray(segs, np.float32).reshape(-1, 2)
        if len(segs):
            segs = segs * self.vid_stride
            segs = (segs * meta["clip_stride"] + 0.5 * meta["clip_size"]) \
                / meta["fps"]
            segs = np.clip(segs, 0, meta["duration"])
        return {"segments": segs, "scores": np.asarray(scores).reshape(-1)}

    def run(self, ema_params=None, tag=None):
        params = ema_params if ema_params is not None else self.params
        assert params is not None, "no parameters to evaluate"
        self.logger.write("Evaluation started.")
        start = time.time()
        loss_list = []
        dump = None
        if self.cfg.eval.get("save_results"):
            from ..utils.analysis import EvalResults
            dump = EvalResults(tag or self.cfg.aux.get("ckpt", "eval"))
        for samples in self.loader:
            sample = samples[0]
            meta, results, losses = self.predict_video(sample, params)
            targets_sec = np.asarray(meta["segment"], np.float64)
            assert len(results) == len(targets_sec)
            for result, target in zip(results, targets_sec):
                self.meter.update(result["segments"], result["scores"],
                                  target)
            loss_list.extend(losses)
            if dump is not None:
                dump.add_video(meta["clip_id"], targets_sec, results, losses)
            if self.cfg.aux.dryrun:
                break
        if dump is not None and self.cfg.aux.logdir:
            dump.save(os.path.join(
                self.cfg.aux.logdir,
                f"results_{tag or self.cfg.aux.get('ckpt', 'eval')}.pk"))

        metrics, table = self.meter.table()
        log_str = "\nFinal:\n" + table + "\n-----\n"
        if loss_list:
            loss_dict = easy_reduce(loss_list, "mean", skip_nan=True)
            log_str += "; ".join(f"{k}: {v:.3f}"
                                 for k, v in loss_dict.items())
        self.logger.write(log_str)
        phase_summary = " | ".join(
            f"{k}: {sum(v):.2f}s (n={len(v)})"
            for k, v in self.time_dict.items())
        self.logger.write(f"phase wall-times: {phase_summary}")
        self.logger.write(
            f"Evaluation completed in {time_str(time.time() - start)}.")
        return metrics
