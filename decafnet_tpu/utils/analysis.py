"""Offline result containers and analysis.

Covers the reference's ad-hoc result dumping and analysis tooling
(reference: libs/helper/utils.py:15-91 Checkpoint/Video containers,
libs/helper/analysis.py:4-40 compute_iou_by_length): the Evaluator can dump
per-video records (``eval.save_results: true``), and these helpers load and
bucket them.
"""

from __future__ import annotations

import pickle

import numpy as np

from ..eval.metrics import interval_iou


class EvalResults:
    """Per-video evaluation records: detections + targets in seconds."""

    def __init__(self, tag=""):
        self.tag = tag
        self.videos = []

    def add_video(self, vid_id, targets_sec, detections, losses=None):
        """detections: list per query of {'segments': (k, 2), 'scores': (k,)}."""
        self.videos.append({
            "vid_id": vid_id,
            "targets": np.asarray(targets_sec, np.float64),
            "detections": [
                {"segments": np.asarray(d["segments"], np.float32),
                 "scores": np.asarray(d["scores"], np.float32)}
                for d in detections
            ],
            "losses": losses,
        })

    def save(self, path):
        with open(path, "wb") as f:
            pickle.dump({"tag": self.tag, "videos": self.videos}, f)

    @staticmethod
    def load(path):
        with open(path, "rb") as f:
            blob = pickle.load(f)
        out = EvalResults(blob.get("tag", ""))
        out.videos = blob["videos"]
        return out

    def top1_ious(self):
        """(gt_length_sec, top1_iou) pairs over all queries."""
        pairs = []
        for v in self.videos:
            for target, det in zip(v["targets"], v["detections"]):
                segs, scores = det["segments"], det["scores"]
                if len(segs) == 0:
                    pairs.append((float(target[1] - target[0]), 0.0))
                    continue
                best = segs[int(np.argmax(scores))]
                pairs.append((
                    float(target[1] - target[0]),
                    float(interval_iou(best[None], target[None])[0])))
        return pairs


def compute_iou_by_length(results, bins=(0, 5, 10, 20, 40, np.inf)):
    """Mean top-1 IoU bucketed by ground-truth segment length in seconds
    (reference: libs/helper/analysis.py:4-40).

    Returns {(lo, hi): (mean_iou, count)}.
    """
    if isinstance(results, str):
        results = EvalResults.load(results)
    pairs = results.top1_ious()
    out = {}
    for lo, hi in zip(bins[:-1], bins[1:]):
        vals = [iou for length, iou in pairs if lo <= length < hi]
        out[(lo, hi)] = (float(np.mean(vals)) if vals else float("nan"),
                         len(vals))
    return out


class _RefVideo:
    """Attribute bag standing in for the reference's ``Video`` during
    unpickling (reference: libs/helper/utils.py:15-18). Instances are
    created by ``pickle`` via ``__reduce__`` machinery, so no ctor args."""


class _RefCheckpoint:
    """Stand-in for the reference's ``Checkpoint`` (libs/helper/utils.py:21-91)."""


class _RefUnpickler(pickle.Unpickler):
    """Unpickles reference result dumps WITHOUT the reference package on
    sys.path: the reference pickles `libs.helper.utils.Checkpoint`/`Video`
    class instances by module path; we remap those two names onto local
    attribute-bag shims.

    Everything else is resolved through an ALLOWLIST of the
    reconstruction callables a reference Checkpoint pickle legitimately
    contains (numpy array/scalar rebuilds, torch tensor rebuilds,
    OrderedDict, plain-container builtins). Result pickles come from the
    reference tree -- untrusted content -- and pickle's default
    ``find_class`` executes arbitrary importable callables, so anything
    off-list raises ``pickle.UnpicklingError`` instead of resolving."""

    _REMAP = {
        ("libs.helper.utils", "Checkpoint"): _RefCheckpoint,
        ("libs.helper.utils", "Video"): _RefVideo,
    }

    _ALLOW = {
        ("numpy", "ndarray"), ("numpy", "dtype"),
        ("numpy.core.multiarray", "_reconstruct"),
        ("numpy.core.multiarray", "scalar"),
        ("numpy._core.multiarray", "_reconstruct"),
        ("numpy._core.multiarray", "scalar"),
        ("torch._utils", "_rebuild_tensor"),
        ("torch._utils", "_rebuild_tensor_v2"),
        ("torch.storage", "_load_from_bytes"),
        ("collections", "OrderedDict"),
        ("builtins", "list"), ("builtins", "dict"), ("builtins", "tuple"),
        ("builtins", "set"), ("builtins", "frozenset"),
        ("builtins", "complex"), ("builtins", "bytearray"),
    }

    def find_class(self, module, name):
        cls = self._REMAP.get((module, name))
        if cls is not None:
            return cls
        if (module, name) in self._ALLOW or (
                module == "torch" and name.endswith("Storage")):
            return super().find_class(module, name)
        raise pickle.UnpicklingError(
            f"refusing to unpickle {module}.{name}: reference result "
            "pickles are untrusted content and only numpy/torch tensor "
            "reconstruction plus the Checkpoint/Video shims are allowed")


def _to_numpy(x):
    """torch tensor -> numpy; passthrough otherwise (no torch import unless
    the pickle actually contained tensors)."""
    if hasattr(x, "detach"):
        return x.detach().cpu().numpy()
    return np.asarray(x)


def load_reference_checkpoint(path):
    """Load a reference-format result pickle into :class:`EvalResults`.

    The reference Evaluator's (disabled-by-default) dump path builds a
    ``Checkpoint`` holding per-video ``Video`` records with ``abs_target``
    (segments in seconds, (n, 2)) and ``results`` (list per query of
    {'segments': (k, 2) tensor, 'scores': (k,) tensor})
    (reference: libs/worker_v2.py:839-855,916-919; containers
    libs/helper/utils.py:15-91; consumed by libs/helper/analysis.py:4-40).
    This loader reads those pickles without the reference package
    installed, so real-data runs can be diffed tool-to-tool against
    reference dumps. Extra per-video attributes (tid, loss, rel_target,
    outputs, ...) are preserved under the 'ref_extra' key.
    """
    with open(path, "rb") as f:
        ckpt = _RefUnpickler(f).load()
    if not isinstance(ckpt, _RefCheckpoint):
        raise ValueError(
            f"{path} is not a reference Checkpoint pickle "
            f"(got {type(ckpt).__name__})")
    out = EvalResults(tag=f"ref-ckpt-{getattr(ckpt, 'iteration', '?')}")
    core = {"vname", "abs_target", "results"}
    for vname, video in ckpt.videos.items():
        results = getattr(video, "results", [])
        out.videos.append({
            "vid_id": vname,
            "targets": _to_numpy(video.abs_target).astype(np.float64),
            "detections": [
                {"segments": _to_numpy(r["segments"]).astype(np.float32),
                 "scores": _to_numpy(r["scores"]).astype(np.float32)}
                for r in results
            ],
            "losses": getattr(video, "loss", None),
            "ref_extra": {k: v for k, v in vars(video).items()
                          if k not in core},
        })
    return out


def compute_iou(intervals1, intervals2):
    """Pairwise interval IoU between two lists of (start, end) intervals,
    returned as (s1, e1, s2, e2, iou) tuples in pair order
    (reference: libs/helper/utils.py:283-312; the reference's "union" is
    the enclosing span min(starts)..max(ends), reproduced here)."""
    out = []
    for (s1, e1) in intervals1:
        for (s2, e2) in intervals2:
            inter = max(0, min(e1, e2) - max(s1, s2))
            union = max(e1, e2) - min(s1, s2)
            out.append((s1, e1, s2, e2, inter / union if union > 0 else 0))
    return out


def interpolate_array(original_array, target_length, kind="linear"):
    """Resample a 1-D array to ``target_length`` over
    linspace(0, n-1, target_length) sample positions
    (reference: libs/helper/utils.py:315-343, scipy.interp1d-based;
    numpy-only here -- 'linear' and 'nearest' kinds)."""
    x = np.asarray(original_array, np.float64)
    n = len(x)
    pos = np.linspace(0, n - 1, target_length)
    if kind == "nearest":
        # scipy 'nearest' rounds half toward the lower sample
        idx = np.clip(np.ceil(pos - 0.5).astype(np.int64), 0, n - 1)
        return x[idx]
    if kind != "linear":
        raise ValueError(f"unsupported interpolation kind: {kind}")
    return np.interp(pos, np.arange(n), x)
