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
