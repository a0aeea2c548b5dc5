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
