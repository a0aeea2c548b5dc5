"""Result containers + IoU-by-length analysis
(reference: libs/helper/analysis.py:4-40)."""

import numpy as np

from decafnet_tpu.utils.analysis import EvalResults, compute_iou_by_length


def test_eval_results_roundtrip_and_buckets(tmp_path):
    res = EvalResults("test")
    res.add_video(
        "vid0",
        targets_sec=[[0.0, 4.0], [10.0, 40.0]],
        detections=[
            {"segments": np.array([[0.0, 4.0], [50.0, 60.0]]),
             "scores": np.array([0.9, 0.5])},          # top-1 exact: IoU 1
            {"segments": np.array([[10.0, 25.0]]),
             "scores": np.array([0.8])},               # IoU 0.5
        ])
    res.add_video(
        "vid1",
        targets_sec=[[0.0, 8.0]],
        detections=[{"segments": np.zeros((0, 2)),
                     "scores": np.zeros((0,))}])       # no detections -> 0

    path = tmp_path / "r.pk"
    res.save(str(path))
    loaded = EvalResults.load(str(path))
    assert len(loaded.videos) == 2

    buckets = compute_iou_by_length(loaded, bins=(0, 5, 10, np.inf))
    assert buckets[(0, 5)] == (1.0, 1)
    np.testing.assert_allclose(buckets[(5, 10)][0], 0.0)
    np.testing.assert_allclose(buckets[(10, np.inf)][0], 0.5)


def test_metrics_sink_jsonl_and_env_gated_wandb(tmp_path, monkeypatch):
    """MetricsSink always appends metrics.jsonl; with WANDB_API_KEY set and
    a wandb package importable it also pushes numeric fields (the reference
    hardcodes an API key, libs/helper/utils.py:100-128 -- env-gated here)."""
    import json
    import sys
    import types

    from decafnet_tpu.core import get_cfg_defaults
    from decafnet_tpu.utils import MetricsSink

    # no key -> jsonl only
    sink = MetricsSink(str(tmp_path))
    sink.log({"itr": 1, "train/total": 0.5, "note": "x"})
    lines = open(tmp_path / "metrics.jsonl").read().splitlines()
    assert json.loads(lines[0])["train/total"] == 0.5

    # fake wandb + key -> push path active, resumable id from experiment
    calls = {}

    class FakeRun:
        def log(self, payload, step=None):
            calls.setdefault("logged", []).append((payload, step))

        def finish(self):
            calls["finished"] = True

    fake = types.ModuleType("wandb")
    def _init(**kw):
        calls["init"] = kw
        return FakeRun()

    fake.init = _init
    monkeypatch.setitem(sys.modules, "wandb", fake)
    monkeypatch.setenv("WANDB_API_KEY", "test-key")

    cfg = get_cfg_defaults("grounder")
    cfg.aux.exp = "expname"
    cfg.aux.runid = 3
    sink = MetricsSink(str(tmp_path), cfg)
    sink.log({"itr": 2, "train/total": 0.25, "note": "skip-me"}, step=2)
    sink.finish()
    assert calls["init"]["id"] == "expname-3"
    assert calls["init"]["resume"] == "allow"
    assert calls["logged"] == [({"itr": 2, "train/total": 0.25}, 2)]
    assert calls["finished"]


def test_compute_iou_and_interpolate_array():
    """Offline helpers vs the reference semantics
    (libs/helper/utils.py:283-343): pairwise IoU uses the ENCLOSING span as
    the union; interpolate_array resamples over linspace(0, n-1, m)."""
    import numpy as np
    from decafnet_tpu.utils.analysis import compute_iou, interpolate_array

    out = compute_iou([(0, 10), (5, 15)], [(5, 10)])
    assert out[0] == (0, 10, 5, 10, 0.5)
    s1, e1, s2, e2, iou = out[1]
    assert (s1, e1, s2, e2) == (5, 15, 5, 10)
    np.testing.assert_allclose(iou, 5 / 10)

    x = np.array([0.0, 1.0, 4.0, 9.0])
    y = interpolate_array(x, 7)
    np.testing.assert_allclose(y, np.interp(np.linspace(0, 3, 7),
                                            np.arange(4), x))
    yn = interpolate_array(x, 7, kind="nearest")
    assert yn.shape == (7,)
    assert set(yn) <= set(x)


def test_load_reference_checkpoint_roundtrip(tmp_path):
    """Round-trip vs a Checkpoint-format file written by the REAL reference
    helper (libs/helper/utils.py:15-91): the reference's (disabled) dump
    path pickles libs.helper.utils.Checkpoint/Video instances holding torch
    tensors; our loader must read them without the reference on sys.path
    and agree with the reference's own analysis bucketing."""
    import pickle
    import sys

    import torch

    from conftest import setup_reference_imports
    from decafnet_tpu.utils.analysis import load_reference_checkpoint

    setup_reference_imports()
    from libs.helper import utils as ref_utils

    ckpt = ref_utils.Checkpoint(iteration=36000)
    v0 = ref_utils.Video("vid0")
    v0.tid = ["q0", "q1"]
    v0.abs_target = np.array([[0.0, 4.0], [10.0, 40.0]])
    v0.results = [
        {"segments": torch.tensor([[0.0, 4.0], [50.0, 60.0]]),
         "scores": torch.tensor([0.9, 0.5])},
        {"segments": torch.tensor([[10.0, 25.0]]),
         "scores": torch.tensor([0.8])},
    ]
    v0.loss = {"focal": 0.25}
    v1 = ref_utils.Video("vid1")
    v1.abs_target = np.zeros((0, 2))
    v1.results = []
    ckpt.add_videos([v0, v1])
    path = tmp_path / "ckpt-6-36000.pk"
    ckpt.save(str(path))

    # loader must work WITHOUT libs.* importable: drop the modules AND the
    # reference's sys.path entry, then re-read through our remapping unpickler
    saved = {k: sys.modules.pop(k) for k in list(sys.modules)
             if k == "libs" or k.startswith("libs.")}
    saved_path = list(sys.path)
    sys.path[:] = [p for p in sys.path if "reference" not in p]
    try:
        with open(str(path), "rb") as f:
            try:
                pickle.load(f)
            except Exception:
                pass  # plain pickle indeed cannot resolve libs.helper.utils
            else:
                raise AssertionError("expected plain pickle.load to fail")
        res = load_reference_checkpoint(str(path))
    finally:
        sys.path[:] = saved_path
        sys.modules.update(saved)

    assert res.tag == "ref-ckpt-36000"
    assert [v["vid_id"] for v in res.videos] == ["vid0", "vid1"]
    rv = res.videos[0]
    np.testing.assert_array_equal(rv["targets"], v0.abs_target)
    np.testing.assert_allclose(rv["detections"][0]["segments"],
                               [[0.0, 4.0], [50.0, 60.0]])
    np.testing.assert_allclose(rv["detections"][1]["scores"], [0.8])
    assert rv["losses"] == {"focal": 0.25}
    assert rv["ref_extra"]["tid"] == ["q0", "q1"]

    # analysis tooling consumes loaded reference dumps directly, matching
    # the reference's compute_iou_by_length semantics on the same data
    buckets = compute_iou_by_length(res, bins=(0, 5, np.inf))
    assert buckets[(0, 5)] == (1.0, 1)
    np.testing.assert_allclose(buckets[(5, np.inf)][0], 0.5)


def test_ref_unpickler_rejects_arbitrary_callables(tmp_path):
    """The reference tree is untrusted content; its result pickles must not
    be able to execute arbitrary importable callables through the loader
    (round-5 ADVICE item). A classic __reduce__ payload must raise
    UnpicklingError, not run."""
    import os
    import pickle

    import pytest

    from decafnet_tpu.utils.analysis import load_reference_checkpoint

    class Evil:
        def __reduce__(self):
            return (os.system, ("echo pwned",))

    path = tmp_path / "evil.pk"
    with open(path, "wb") as f:
        pickle.dump(Evil(), f)
    with pytest.raises(pickle.UnpicklingError, match="refusing"):
        load_reference_checkpoint(str(path))
