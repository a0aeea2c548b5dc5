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
(prepare / forward / post_process / nms,
libs/worker_v2.py:799,979,1022,1091,1127).
"""

from __future__ import annotations

import os
import time
from collections import defaultdict

import jax
import jax.numpy as jnp
import numpy as np

from ..data import DataLoader, batchify_eval, make_dataset, min_chunk_size
from ..models import (fpn_lengths, generate_points, make_model,
                      resolve_compute_dtype, select_points)
from ..parallel.mesh import batch_sharding, replicated, time_sharding
from ..ops.masked import max_pool1d
from ..ops.nms import batched_nms_device, batched_nms_host
from ..train.annotate import annotate_points
from ..train.losses import calc_focal_loss, calc_iou_loss
from ..utils.logging import Logger, easy_reduce, time_str
from .metrics import RecallMeter


def modulated_level_scores(fpn_logits, fpn_masks, ext_scores):
    """Per-level sigmoid scores, optionally modulated by external scores
    which are max-pool-downsampled (k=3, s=2, p=1) level to level, then
    masked (reference: libs/worker_v2.py:1147-1156). ``ext_scores`` is
    (Q, T_level0) or None."""
    scores_list = []
    ext = ext_scores
    for lvl, logits in enumerate(fpn_logits):
        s = jax.nn.sigmoid(logits)
        if ext is not None:
            s = s * ext
            ext = max_pool1d(ext[:, None, :], 3, 2, 1)[:, 0]
        s = s * fpn_masks[lvl].astype(s.dtype)
        scores_list.append(s)
    return scores_list


class Evaluator:

    def __init__(self, cfg, mesh=None, train_time=False, params=None,
                 build_loader=True):
        self.cfg = cfg
        self.train_time = train_time

        if build_loader:
            self.dataset = make_dataset(cfg, is_training=False)
            # multi-process eval: each process evaluates its own
            # rank-strided video shard with its local devices (loading ONLY
            # that shard -- the rank shard is applied before any feature
            # IO), then the RecallMeter counts and loss sums are
            # allgathered before the table. Exceeds the reference, whose
            # Evaluator is strictly bs=1 single-process
            # (libs/worker_v2.py:739).
            n_proc = jax.process_count()
            self.shard_proc = (n_proc > 1
                               and bool(cfg.eval.get("shard_processes",
                                                     True)))
            rank = jax.process_index() if self.shard_proc else 0
            world = n_proc if self.shard_proc else 1
            self.proc_rank, self.proc_world = rank, world
            self.loader = DataLoader(self.dataset, batch_size=1,
                                     shuffle=False, drop_last=False,
                                     rank=rank, world_size=world,
                                     num_threads=cfg.train.num_workers)
        else:
            # loader-free mode (serving: decafnet_tpu/serve.py feeds
            # samples directly through predict_video)
            self.dataset = None
            self.loader = None
            self.shard_proc = False
            self.proc_rank, self.proc_world = 0, 1

        # resolve compute_dtype BEFORE the model exists: "auto" means bf16
        # on TPU eval but f32 under reference_exact (a parity surface) --
        # see models.resolve_compute_dtype + scripts/results/
        # bf16_promotion.json for the promotion evidence. The config-level
        # resolution here covers base-length buckets; _decode_fn
        # RE-resolves per bucket grid length (buckets grow past
        # max_seq_len in pow-2 steps) and caches one model per dtype --
        # the dtype gate is per-SHAPE like the depthwise dispatch at
        # nn/blocks.py, not per-config.
        self.reference_exact = bool(cfg.eval.get("reference_exact", False))
        self.compute_dtype = resolve_compute_dtype(cfg, eval_mode=True)
        self.model = make_model(cfg, compute_dtype=self.compute_dtype)
        self._models_by_dtype = {self.compute_dtype: self.model}
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
        # with an absolute text PE, padding a query past the PE table length
        # would trigger eval-time PE interpolation at VALID token positions
        # (see batchify_eval); cap the pow-2 text-length bucket there
        self.text_len_cap = (cfg.model.text_net.max_seq_len
                             if cfg.model.text_net.get("use_abs_pe")
                             else None)
        self.nms_cfg = dict(cfg.nms)

        root = cfg.aux.logdir
        tag = cfg.aux.get("ckpt", "eval")
        if root and not train_time and self.proc_rank == 0:
            os.makedirs(root, exist_ok=True)
            self.logger = Logger(os.path.join(root, f"eval_{tag}.txt"))
        else:
            self.logger = Logger()
        self.time_dict = defaultdict(list)
        self._decode_cache = {}
        self._points_dev = {}
        self.mesh = mesh

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

    def _decode_fn(self, T, Q, L, has_ext, V=1):
        """Build (and cache) the jitted decode program for one shape bucket.

        For long videos (T > base_len) the program takes host-precomputed PE
        interpolation arrays as dynamic arguments, reproducing the
        reference's PE-to-padded-length interpolation
        (libs/modeling/video_net.py:144-151) without a recompile per
        distinct video length.

        ``V`` > 1 stacks V same-bucket videos on axis 0 (V*Q query rows);
        with the batch sharded over the ('data',) mesh every device decodes
        its own videos -- the eval-over-videos scaling the reference lacks
        (its Evaluator is strictly bs=1 single-process,
        libs/worker_v2.py:739)."""
        key = (T, Q, L, has_ext, V)
        if key in self._decode_cache:
            return self._decode_cache[key]

        cfg = self.cfg
        t0 = T // self.vid_stride
        lens = fpn_lengths(t0, cfg.model.num_fpn_levels)
        # (4, P) transposed, device-resident, passed as an ARGUMENT: (P, 4)
        # slices badly on TPU and jit closure constants are re-materialized
        # per call on some platforms (12x decode cost observed)
        points_np = np.concatenate(select_points(self.all_points, lens))
        points_t = np.ascontiguousarray(points_np.T)
        P = points_np.shape[0]
        topk = min(self.pre_nms_topk, P)
        k_out = self.nms_cfg["max_num_segs"]
        model = self._model_for_bucket(t0)
        pre_thresh = self.pre_nms_thresh
        seg_thresh = self.seg_len_thresh
        nms_cfg = self.nms_cfg
        fc_a, fc_s = cfg.loss.fc_a, cfg.loss.fc_s
        cs = cfg.train.center_sampling
        csr = cfg.train.center_sampling_radius
        run_nms_on_device = not self.reference_exact

        @jax.jit
        def decode(params, vid, shallow, vid_masks, text, text_cls,
                   text_masks, q_valid, ext_scores, targets, points_t,
                   pe_interp):
            # video-major call: the model expands V videos to V*Q query
            # rows internally, hoisting per-video work (vid_map) out of
            # the per-row batch (models/decafnet.py)
            _, logits2, offsets, masks = model.apply(
                {"params": params}, vid, shallow, vid_masks,
                text, text_cls, text_masks, deterministic=True,
                pe_interp=pe_interp, queries_per_video=Q)

            # per-level scores with optional external score modulation
            # (reference: libs/worker_v2.py:1142-1156)
            scores_list = modulated_level_scores(logits2, masks, ext_scores)
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

        self._decode_cache[key] = (decode, points_t)  # points_t: host numpy
        return self._decode_cache[key]

    def _model_for_bucket(self, grid_t):
        """Model instance for one bucket's grid length: "auto" dtype is
        per-SHAPE (a long-video bucket under an NLQ config crosses
        models._BF16_AUTO_MAX_T and must run f32 -- exactly the regime the
        round-4 A/B measured bf16 19% slower and whose numerics the
        promotion study never covered). Params are dtype-independent
        (always fp32); the module only carries the activation cast."""
        dtype = resolve_compute_dtype(self.cfg, eval_mode=True,
                                      grid_t=grid_t)
        if dtype not in self._models_by_dtype:
            self._models_by_dtype[dtype] = make_model(
                self.cfg, compute_dtype=dtype)
        return self._models_by_dtype[dtype]

    def _points_device(self, T, points_np, sharded):
        """Device-resident (4, P) points per (T, placement): an ARGUMENT,
        never a closure constant (re-materialized per call on axon);
        replicated over the mesh in sharded mode."""
        key = (T, sharded)
        if key not in self._points_dev:
            if sharded:
                self._points_dev[key] = jax.device_put(
                    points_np, replicated(self.mesh))
            else:
                self._points_dev[key] = jax.device_put(points_np)
        return self._points_dev[key]

    # ------------------------------------------------------------------

    def _video_items(self, sample):
        """Split one video into per-chunk work items (+ per-row targets)."""
        t_prep = time.perf_counter()
        meta, chunks = batchify_eval(
            sample, self.chunk, self.base_len, self.vid_stride,
            self.query_cap, text_len_cap=self.text_len_cap)
        self.time_dict["prepare"].append(time.perf_counter() - t_prep)

        items = []
        q_done = 0
        tgt = np.asarray(meta["target"], np.float32)
        for chunk in chunks:
            Q = chunk["text"].shape[0]
            n_q = int(chunk["q_valid"].sum())
            targets = np.tile(np.array([[0.0, 1.0]], np.float32), (Q, 1))
            targets[:n_q] = tgt[q_done:q_done + n_q] / self.vid_stride
            items.append({"meta": meta, "chunk": chunk, "targets": targets,
                          "n_q": n_q, "q_start": q_done})
            q_done += n_q
        return meta, items

    def _bucket_key(self, item):
        c = item["chunk"]
        return (c["vid"].shape[-1], c["text"].shape[0],
                c["text"].shape[-1], c["ext_scores"] is not None)

    def _decode_group(self, items, params, sharded=False,
                      time_sharded=False):
        """Decode V same-bucket items (V videos x Q query rows) in one
        jitted call; with ``sharded`` the stacked batch is placed on the
        ('data',) mesh so each device decodes its own videos; with
        ``time_sharded`` the video TIME axis is sharded over the mesh
        instead (sequence parallelism — XLA SPMD partitions the whole
        program, inserting conv/attention halo exchanges). Returns a
        list of (results, losses) per item."""
        V = len(items)
        c0 = items[0]["chunk"]
        T, Q, L = c0["vid"].shape[-1], c0["text"].shape[0], \
            c0["text"].shape[-1]
        has_ext = c0["ext_scores"] is not None
        decode, points_np = self._decode_fn(T, Q, L, has_ext, V)
        points_t = self._points_device(T, points_np, sharded or time_sharded)

        t_fwd = time.perf_counter()
        cat = lambda k: np.concatenate(  # noqa: E731
            [it["chunk"][k] for it in items], axis=0)
        vid, shallow, vmask = cat("vid"), cat("shallow_vid"), cat("vid_masks")
        text, tmask, tcls = cat("text"), cat("text_masks"), cat("text_cls")
        q_valid = cat("q_valid")
        ext = cat("ext_scores") if has_ext else None
        targets = np.concatenate([it["targets"] for it in items], axis=0)

        pe_interp = c0["pe_interp"]
        if pe_interp is not None:
            if V == 1:
                pe_interp = tuple(jnp.asarray(a) for a in pe_interp)
            else:
                # per-row interpolation plans: (V, t) repeated to (V*Q, t)
                pe_interp = tuple(
                    jnp.asarray(np.repeat(np.stack(
                        [it["chunk"]["pe_interp"][j] for it in items]),
                        Q, axis=0))
                    for j in range(3))

        if sharded:
            sh = batch_sharding(self.mesh)
            put = lambda x: jax.device_put(x, sh)  # noqa: E731
            vid, shallow, vmask = put(vid), put(shallow), put(vmask)
            text, tmask, tcls = put(text), put(tmask), put(tcls)
            q_valid = put(q_valid)
            targets = put(targets)
            if ext is not None:
                ext = put(ext)
            if pe_interp is not None:
                pe_interp = tuple(put(a) for a in pe_interp)
        elif time_sharded:
            # sequence parallelism: the three (…, T) video tensors shard
            # on the time axis, everything else replicates; XLA SPMD
            # derives the internal shardings and collectives
            rep = replicated(self.mesh)
            putt = lambda x: jax.device_put(  # noqa: E731
                x, time_sharding(self.mesh, np.ndim(x)))
            putr = lambda x: jax.device_put(x, rep)  # noqa: E731
            vid, shallow, vmask = putt(vid), putt(shallow), putt(vmask)
            text, tmask, tcls = putr(text), putr(tmask), putr(tcls)
            q_valid, targets = putr(q_valid), putr(targets)
            if ext is not None:
                ext = putr(ext)
            if pe_interp is not None:
                pe_interp = tuple(putr(a) for a in pe_interp)
        elif ext is not None:
            ext = jnp.asarray(ext)

        out = decode(params, vid, shallow, vmask, text, tcls, tmask,
                     q_valid, ext, jnp.asarray(targets)
                     if not sharded else targets, points_t, pe_interp)
        out = jax.device_get(out)
        self.time_dict["forward"].append(time.perf_counter() - t_fwd)

        # the reference's four wall-time buckets (libs/worker_v2.py:799,
        # 979,1022,1091,1127): "post_process" = host-side candidate
        # assembly + grid->seconds conversion; "nms" = the (Soft)NMS proper
        # (on-device NMS already ran inside the fused forward, so its host
        # cost is only the detection-count slicing)
        t_post = time.perf_counter()
        nms_s = 0.0
        per_item = []
        for v, item in enumerate(items):
            meta, n_q = item["meta"], item["n_q"]
            rows = slice(v * Q, (v + 1) * Q)
            results, losses = [], []
            if self.reference_exact:
                left_a, right_a, scores_a, valid_a, cls_l, reg_l = \
                    (x[rows] for x in out)
                for qi in range(n_q):
                    m = valid_a[qi]
                    segs_np = np.stack(
                        [left_a[qi][m], right_a[qi][m]], axis=-1)
                    t_nms = time.perf_counter()
                    segs, scores = batched_nms_host(
                        segs_np, scores_a[qi][m],
                        iou_thresh=self.nms_cfg["iou_thresh"],
                        min_score=self.nms_cfg["min_score"],
                        max_num_segs=self.nms_cfg["max_num_segs"],
                        mode=self.nms_cfg["mode"],
                        sigma=self.nms_cfg["sigma"],
                        voting_thresh=self.nms_cfg["voting_thresh"])
                    nms_s += time.perf_counter() - t_nms
                    results.append(self._to_seconds(segs, scores, meta))
            else:
                out_segs, out_scores, counts, cls_l, reg_l = \
                    (x[rows] for x in out)
                for qi in range(n_q):
                    c = int(counts[qi])
                    results.append(self._to_seconds(
                        out_segs[qi][:c], out_scores[qi][:c], meta))
            for qi in range(n_q):
                losses.append({"cls_loss": float(cls_l[qi]),
                               "reg_loss": float(reg_l[qi])})
            per_item.append((results, losses))
        self.time_dict["post_process"].append(
            time.perf_counter() - t_post - nms_s)
        self.time_dict["nms"].append(nms_s)
        return per_item

    def predict_video(self, sample, params):
        """All detections + diagnostics for one video's queries."""
        meta, items = self._video_items(sample)
        results, losses = [], []
        for item in items:
            (r, l), = self._decode_group(
                [item], params,
                time_sharded=getattr(self, "_time_shard", False))
            results.extend(r)
            losses.extend(l)
        return meta, results, losses

    def _run_sharded(self, params, V, loss_list, dump):
        """Stream work items into same-bucket groups of V videos; decode a
        group when full (padding the final partial groups with inert
        all-invalid copies) and finalize each video once all its query
        chunks have returned."""
        pending = {}       # bucket key -> list of items
        states = {}        # clip_id -> assembly state

        def flush(key):
            items = pending.pop(key)
            real = len(items)
            while len(items) < V:   # inert pad: n_q = 0 rows are ignored
                items.append({**items[0], "n_q": 0})
            for item, (r, l) in zip(items[:real],
                                    self._decode_group(items, params,
                                                       sharded=True)[:real]):
                st = states[item["meta"]["clip_id"]]
                qs = item["q_start"]
                st["results"][qs:qs + item["n_q"]] = r
                st["losses"][qs:qs + item["n_q"]] = l
                st["done"] += item["n_q"]
                if st["done"] == st["total"]:
                    self._finish_video(st["meta"], st["results"],
                                       st["losses"], loss_list, dump)
                    del states[item["meta"]["clip_id"]]

        for samples in self.loader:
            sample = samples[0]
            meta, items = self._video_items(sample)
            states[meta["clip_id"]] = {
                "meta": meta, "total": meta["num_queries"], "done": 0,
                "results": [None] * meta["num_queries"],
                "losses": [None] * meta["num_queries"]}
            for item in items:
                key = self._bucket_key(item)
                pending.setdefault(key, []).append(item)
                if len(pending[key]) == V:
                    flush(key)
            if self.cfg.aux.dryrun:
                break
        for key in list(pending):
            flush(key)
        assert not states, f"unfinished videos: {list(states)}"

    def _to_seconds(self, segs, scores, meta):
        """Grid units -> seconds (reference: libs/worker_v2.py:1113-1122)."""
        segs = np.asarray(segs, np.float32).reshape(-1, 2)
        if len(segs):
            segs = segs * self.vid_stride
            segs = (segs * meta["clip_stride"] + 0.5 * meta["clip_size"]) \
                / meta["fps"]
            segs = np.clip(segs, 0, meta["duration"])
        return {"segments": segs, "scores": np.asarray(scores).reshape(-1)}

    def _finish_video(self, meta, results, losses, loss_list, dump):
        targets_sec = np.asarray(meta["segment"], np.float64)
        assert len(results) == len(targets_sec)
        for result, target in zip(results, targets_sec):
            self.meter.update(result["segments"], result["scores"], target)
        loss_list.extend(losses)
        if dump is not None:
            dump.add_video(meta["clip_id"], targets_sec, results, losses)

    def _allreduce_eval(self, loss_list):
        """Combine per-process shard results into the global table: the
        RecallMeter count matrix, text count, and per-key loss sums/counts
        travel as ONE tiny allgathered vector; every process ends with the
        identical global metrics (process 0 writes the table). Returns a
        single-dict loss list whose means are the global means."""
        from jax.experimental import multihost_utils

        keys = ("cls_loss", "reg_loss")
        sums = np.zeros(len(keys))
        cnts = np.zeros(len(keys))
        for d in loss_list:
            for i, k in enumerate(keys):
                v = d.get(k, np.nan)
                if np.isfinite(v):
                    sums[i] += v
                    cnts[i] += 1
        payload = np.concatenate([
            self.meter.counts.ravel().astype(np.float64),
            [float(self.meter.text_cnt)], sums, cnts])
        gathered = np.asarray(multihost_utils.process_allgather(payload))
        total = gathered.sum(axis=0)
        nc = self.meter.counts.size
        self.meter.counts = total[:nc].reshape(self.meter.counts.shape)
        self.meter.text_cnt = int(round(total[nc]))
        g_sums = total[nc + 1:nc + 1 + len(keys)]
        g_cnts = total[nc + 1 + len(keys):]
        return [{k: (g_sums[i] / g_cnts[i] if g_cnts[i] else float("nan"))
                 for i, k in enumerate(keys)}]

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

        # videos sharded over the mesh: same-bucket work items from
        # different videos are stacked (V videos x Q rows) and each device
        # decodes its own videos -- a capability upgrade over the
        # reference's strictly bs=1 single-process Evaluator
        # (libs/worker_v2.py:739). shard_videos = 0/1 disables.
        V = int(self.cfg.eval.get("shard_videos") or 1)
        if V > 1 and self.mesh is not None:
            n_data = self.mesh.shape["data"]
            assert V % n_data == 0, (
                f"eval.shard_videos={V} must be a multiple of the mesh data "
                f"axis ({n_data} devices), so every device decodes whole "
                f"videos (the stacked batch is sharded on the row axis)")
            assert jax.process_count() == 1, (
                "eval.shard_videos shards over this process's mesh devices; "
                "under multi-process jax.distributed use "
                "eval.shard_processes instead (per-process video sharding)")
            params = jax.device_put(params, replicated(self.mesh))
            self._run_sharded(params, V, loss_list, dump)
        else:
            # sequence parallelism over the video time axis
            # (eval.shard_time): each video's (…, T) tensors shard over
            # the mesh and ONE forward spans all devices — the
            # latency-oriented complement to shard_videos' throughput
            # sharding. shard_time = 0/1 disables.
            S = int(self.cfg.eval.get("shard_time") or 1)
            self._time_shard = S > 1 and self.mesh is not None
            if self._time_shard:
                assert V <= 1, "shard_videos and shard_time are exclusive"
                assert jax.process_count() == 1, (
                    "eval.shard_time shards over this process's mesh "
                    "devices")
                params = jax.device_put(params, replicated(self.mesh))
            for samples in self.loader:
                sample = samples[0]
                meta, results, losses = self.predict_video(sample, params)
                self._finish_video(meta, results, losses, loss_list, dump)
                if self.cfg.aux.dryrun:
                    break
        if dump is not None and self.cfg.aux.logdir:
            name = f"results_{tag or self.cfg.aux.get('ckpt', 'eval')}.pk"
            if self.shard_proc:  # per-process shard of the detections
                name += f".r{self.proc_rank}"
            dump.save(os.path.join(self.cfg.aux.logdir, name))

        if self.shard_proc:
            loss_list = self._allreduce_eval(loss_list)
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
