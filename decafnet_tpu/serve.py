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

    @property
    def params(self):
        return self._ev.params

    def warmup(self, vid_len, num_queries=1, text_len=8,
               vid_dim=None, shallow_dim=None, text_dim=None):
        """Pre-compile the decode program for one shape bucket so the first
        real request in that bucket doesn't pay the compile."""
        cfg = self._ev.cfg
        cv = vid_dim or cfg.model.vid_net.in_dim
        cs = shallow_dim or cv
        ct = text_dim or cfg.model.text_net.in_dim
        self.ground(
            np.zeros((cv, vid_len), np.float32),
            np.zeros((cs, vid_len), np.float32),
            [np.zeros((ct, text_len), np.float32)] * num_queries,
            np.zeros((num_queries, cs), np.float32))

    def ground(self, vid, shallow_vid, texts, text_cls, *, fps=30.0,
               duration=None, clip_size=32, clip_stride=16,
               ext_scores=None):
        """Ground Q queries against one video.

        Args:
          vid: (Cv, t) expert clip features (t = clip grid length).
          shallow_vid: (Cs, t) sidekick features on the same grid.
          texts: list of Q (Ct, l_q) token-feature arrays.
          text_cls: (Q, Cs) per-query CLS embeddings.
          fps / clip_size / clip_stride: the grid->seconds mapping
            (reference: libs/worker_v2.py:1113-1122); duration defaults to
            the grid's full extent.
          ext_scores: optional (Q, t) external score streams.

        Returns a list of Q dicts {"segments": [[s, e], ...] seconds,
        "scores": [...]}, each at most nms.max_num_segs detections,
        sorted by decayed score (the SoftNMS emission order).
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

        with self._lock:
            _, results, _ = self._ev.predict_video(sample, self._ev.params)
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
    jax.config.update("jax_default_matmul_precision",
                      cfg.tpu.matmul_precision)
    cache = cfg.tpu.get("compilation_cache")
    if cache:
        import os as _os
        jax.config.update("jax_compilation_cache_dir",
                          _os.path.expanduser(cache))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from .ops import set_backend
    set_backend(cfg.tpu.attention_backend)
    return GroundingService(cfg)
