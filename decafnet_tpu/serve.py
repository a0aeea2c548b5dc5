"""Grounding service: checkpoint-resident, request-at-a-time inference.

A deployment surface the reference lacks entirely (its Evaluator is welded
to a dataset + bs=1 loader, libs/worker_v2.py:726-814): ``GroundingService``
holds the model params plus the Evaluator's per-shape-bucket jitted decode
cache and answers single-video requests -- expert/sidekick feature streams
and Q tokenized queries in, top-k (start_sec, end_sec, score) detections
out. Shape bucketing means a request stream with varying video/query/text
lengths reuses a small set of compiled programs (the same invariance the
Evaluator relies on); the first request per bucket pays the compile,
subsequent ones run steady-state.

``serve.py`` (repo root) wraps this in a stdlib ThreadingHTTPServer with
single-flight decode (TPU programs must run serially; see PARITY
"harness physics").
"""

from __future__ import annotations

import threading

import numpy as np

from .eval.evaluator import Evaluator


class GroundingService:
    """One video + Q queries -> detections in seconds.

    Parameters mirror the eval CLI: ``cfg`` is a full config tree (the
    experiment's opt.yaml backfilled with defaults); weights come from
    ``cfg.aux.logdir``/``cfg.aux.ckpt`` unless ``params`` is injected.
    """

    def __init__(self, cfg, params=None):
        self._ev = Evaluator(cfg, train_time=params is not None,
                             params=params, build_loader=False)
        if params is not None:
            self._ev.params = params
        self._lock = threading.Lock()  # single-flight: decode serially
        self._stats_window = 512       # rolling phase-timing retention

    @property
    def params(self):
        return self._ev.params

    def stats(self):
        """Rolling phase wall-times (the reference's four buckets) over the
        last window of requests; trims the underlying lists so a
        long-running server doesn't grow without bound."""
        out = {}
        for k, v in self._ev.time_dict.items():
            if len(v) > self._stats_window:
                del v[:-self._stats_window]
            if v:
                out[k] = {"n": len(v),
                          "mean_ms": round(1e3 * sum(v) / len(v), 3),
                          "max_ms": round(1e3 * max(v), 3)}
        return out

    def warmup(self, vid_len, num_queries=1, text_len=8,
               vid_dim=None, shallow_dim=None, text_dim=None):
        """Pre-compile the decode program for one shape bucket so the first
        real request in that bucket doesn't pay the compile."""
        cfg = self._ev.cfg
        cv = vid_dim or cfg.model.vid_net.in_dim
        cs = shallow_dim or cv
        ct = text_dim or cfg.model.text_net.in_dim
        self.ground(
            vid=np.zeros((cv, vid_len), np.float32),
            shallow_vid=np.zeros((cs, vid_len), np.float32),
            texts=[np.zeros((ct, text_len), np.float32)] * num_queries,
            text_cls=np.zeros((num_queries, cs), np.float32))

    def ground_many(self, requests, max_group=8):
        """Ground a batch of requests, stacking same-shape-bucket videos
        into one V-video jitted decode (the Evaluator's ``_decode_group``
        stacking -- the shape PARITY.md's recorded bench measures at).

        ``requests``: list of dicts of :meth:`ground` keyword arguments.
        Groups are padded to pow-2 V (inert all-invalid copies, exactly
        like sharded eval's partial-group flush) so the compile cache
        stays bounded: one program per (bucket, pow2-V <= max_group).
        Returns one detections list per request, identical to calling
        :meth:`ground` per request."""
        prepared = []                      # (req_idx, meta, items)
        for i, req in enumerate(requests):
            prepared.append((i,) + self._prepare(**req))

        by_bucket = {}
        for i, meta, items in prepared:
            for item in items:
                key = self._ev._bucket_key(item)
                by_bucket.setdefault(key, []).append((i, item))

        out = [[] for _ in requests]       # per-request result lists
        with self._lock:
            for key, tagged in by_bucket.items():
                pos = 0
                while pos < len(tagged):
                    group = tagged[pos:pos + max_group]
                    pos += len(group)
                    v = 1
                    while v < len(group):
                        v *= 2
                    items = [it for _, it in group]
                    while len(items) < v:  # inert pad: n_q = 0 rows
                        items.append({**items[0], "n_q": 0})
                    per_item = self._ev._decode_group(items,
                                                      self._ev.params)
                    for (req_i, item), (results, _) in zip(group, per_item):
                        out[req_i].append((item["q_start"], results))
        final = []
        for (i, meta, _), chunks in zip(prepared, out):
            results = [None] * meta["num_queries"]
            for q_start, r in chunks:
                results[q_start:q_start + len(r)] = r
            assert all(r is not None for r in results)
            final.append([{"segments": np.asarray(r["segments"]).tolist(),
                           "scores": np.asarray(r["scores"]).tolist()}
                          for r in results])
        return final

    def _prepare(self, vid, shallow_vid, texts, text_cls, *, fps=30.0,
                 duration=None, clip_size=32, clip_stride=16,
                 ext_scores=None):
        """Validate one request and split it into per-chunk decode work
        items (the Evaluator's _video_items view). Returns (meta, items).

        Args:
          vid: (Cv, t) expert clip features (t = clip grid length).
          shallow_vid: (Cs, t) sidekick features on the same grid.
          texts: list of Q (Ct, l_q) token-feature arrays.
          text_cls: (Q, Cs) per-query CLS embeddings.
          fps / clip_size / clip_stride: the grid->seconds mapping
            (reference: libs/worker_v2.py:1113-1122); duration defaults to
            the grid's full extent.
          ext_scores: optional (Q, t) external score streams.
        """
        vid = np.asarray(vid, np.float32)
        shallow_vid = np.asarray(shallow_vid, np.float32)
        texts = [np.asarray(tok, np.float32) for tok in texts]
        text_cls = np.asarray(text_cls, np.float32)
        assert vid.ndim == 2 and shallow_vid.ndim == 2, (
            "features are (channels, t)")
        t = vid.shape[1]
        assert shallow_vid.shape[1] == t, (vid.shape, shallow_vid.shape)
        q = len(texts)
        assert text_cls.shape[0] == q, (q, text_cls.shape)
        if duration is None:
            duration = t * clip_stride / fps

        sample = {
            "vid": vid,
            "shallow_vid": shallow_vid,
            "text": texts,
            "text_cls": text_cls,
            "fps": float(fps),
            "duration": float(duration),
            "clip_size": float(clip_size),
            "clip_stride": float(clip_stride),
            # GT-dependent fields (loss diagnostics only): inert dummies
            "segment": np.zeros((q, 2), np.float64),
            "target": np.zeros((q, 2), np.float32),
            "clip_id": "serve",
            "text_id": list(range(q)),
        }
        if ext_scores is not None:
            sample["ext_scores"] = np.asarray(ext_scores, np.float32)

        return self._ev._video_items(sample)

    def ground(self, **request):
        """Ground Q queries against one video (see :meth:`_prepare` for
        the request fields).

        Returns a list of Q dicts {"segments": [[s, e], ...] seconds,
        "scores": [...]}, each at most nms.max_num_segs detections,
        sorted by decayed score (the SoftNMS emission order).
        """
        meta, items = self._prepare(**request)
        results = []
        with self._lock:
            for item in items:
                (r, _), = self._ev._decode_group([item], self._ev.params)
                results.extend(r)
        return [{"segments": np.asarray(r["segments"]).tolist(),
                 "scores": np.asarray(r["scores"]).tolist()}
                for r in results]


def service_from_logdir(logdir, ckpt="last", set_cfgs=None):
    """Build a GroundingService from an experiment dir (eval.py's config
    contract: frozen opt.yaml + default backfill + EMA weights)."""
    import os

    from .core import (CfgNode, get_cfg_defaults, update_from, update_opt,
                       update_eval_data)

    cfg = CfgNode.load_file(os.path.join(logdir, "opt.yaml"))
    cfg = update_from(cfg, get_cfg_defaults(cfg.get("task", "grounder")))
    if set_cfgs:
        cfg.merge_from_list(list(set_cfgs))
    cfg.data.shallow_ds = 1
    cfg.eval.data.shallow_ds = 1
    update_opt(cfg)
    update_eval_data(cfg)
    cfg.aux.logdir = logdir
    cfg.aux.ckpt = ckpt

    import jax
    from .models import resolve_matmul_precision
    jax.config.update("jax_default_matmul_precision",
                      resolve_matmul_precision(cfg, eval_mode=True))
    cache = cfg.tpu.get("compilation_cache")
    if cache:
        import os as _os
        jax.config.update("jax_compilation_cache_dir",
                          _os.path.expanduser(cache))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from .ops import set_backend
    set_backend(cfg.tpu.attention_backend)
    return GroundingService(cfg)
