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
