"""RecallMeter vs the reference's R@k counting loop
(libs/worker_v2.py:857-899), run on random detections. One mismatch here
would silently shift every headline number, so the loop is replicated
verbatim with torch (using the reference's own ``iou`` from
libs/train_utils.py:81-96).
"""

import sys

import numpy as np
import torch

sys.path.insert(0, "/root/reference")

from decafnet_tpu.eval.metrics import RecallMeter, interval_iou


def reference_counting(videos, ranks=(1, 5), iou_threshs=(0.3, 0.5)):
    """Verbatim re-statement of libs/worker_v2.py:857-899."""
    from libs.train_utils import iou

    topk = max(ranks)
    iou_threshs = np.asarray(iou_threshs)
    counts = np.zeros((len(ranks), len(iou_threshs)))
    text_cnt = 0
    for results, targets in videos:
        for result, target in zip(results, targets):
            segs = torch.as_tensor(result["segments"], dtype=torch.float)
            scores = torch.as_tensor(result["scores"], dtype=torch.float)
            idx = scores.argsort(descending=True)
            segs, scores = segs[idx[:topk]], scores[idx[:topk]]
            target = torch.as_tensor(target, dtype=torch.float)
            target = target.expand(len(segs), -1)
            iou_topk = iou(segs, target)
            iou_n = []
            for i in ranks:
                tmp = iou_topk[:i]
                iou_n.append(tmp.max().item() if len(tmp) > 0 else 0)
            iou_n = np.array(iou_n)
            counts += iou_n[:, None] >= iou_threshs[None]
        text_cnt += len(targets)
    return counts, text_cnt


def random_videos(rng, n_videos=40):
    videos = []
    for _ in range(n_videos):
        n_queries = rng.randint(1, 5)
        results, targets = [], []
        for _ in range(n_queries):
            n = rng.randint(0, 9)  # includes empty detection lists
            starts = rng.rand(n) * 90
            lens = rng.rand(n) * 20
            segs = np.stack([starts, starts + lens], -1).astype(np.float32)
            scores = np.round(rng.rand(n).astype(np.float32), 1)  # ties
            results.append({"segments": segs, "scores": scores})
            t0 = rng.rand() * 80
            targets.append(np.array([t0, t0 + rng.rand() * 15 + 0.5]))
        videos.append((results, targets))
    return videos


def test_recall_meter_vs_reference_counting():
    rng = np.random.RandomState(11)
    videos = random_videos(rng)
    ranks, threshs = (1, 5), (0.3, 0.5)

    want_counts, want_cnt = reference_counting(videos, ranks, threshs)

    meter = RecallMeter(ranks, threshs)
    for results, targets in videos:
        for result, target in zip(results, targets):
            meter.update(result["segments"], result["scores"], target)
    assert meter.text_cnt == want_cnt
    np.testing.assert_array_equal(meter.counts, want_counts)

    # the emitted table lines match the reference format verbatim
    # (libs/worker_v2.py:890-899)
    metrics, table = meter.table()
    m = want_counts / want_cnt
    for i, rank in enumerate(ranks):
        for j, thresh in enumerate(threshs):
            assert f"Rank@{rank}, IoU@{thresh:.1f}: {m[i, j] * 100:.2f}" \
                in table


def test_recall_meter_extra_ranks_and_threshs():
    rng = np.random.RandomState(12)
    videos = random_videos(rng, n_videos=15)
    ranks, threshs = (1, 3, 5), (0.1, 0.3, 0.5, 0.7)
    want_counts, want_cnt = reference_counting(videos, ranks, threshs)
    meter = RecallMeter(ranks, threshs)
    for results, targets in videos:
        for result, target in zip(results, targets):
            meter.update(result["segments"], result["scores"], target)
    np.testing.assert_array_equal(meter.counts, want_counts)


def test_interval_iou_vs_reference():
    from libs.train_utils import iou

    rng = np.random.RandomState(13)
    a = rng.rand(64, 2) * 50
    a[:, 1] += a[:, 0]
    b = rng.rand(64, 2) * 50
    b[:, 1] += b[:, 0]
    got = interval_iou(a, b)
    want = iou(torch.from_numpy(a), torch.from_numpy(b)).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)
