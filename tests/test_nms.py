"""(Soft)NMS: device JAX formulation vs the C++ host oracle vs a pure-numpy
brute-force implementation of the reference algorithm."""

import numpy as np
import pytest

import jax.numpy as jnp

from decafnet_tpu.ops.nms import (
    nms_host,
    softnms_host,
    soft_nms_topk,
    hard_nms_topk,
    segment_voting,
    batched_nms_device,
    batched_nms_host,
)

RNG = np.random.RandomState(5)


def random_segs(n, t=200.0):
    starts = RNG.rand(n).astype(np.float32) * t
    lens = (RNG.rand(n).astype(np.float32) * 20 + 0.5)
    segs = np.stack([starts, starts + lens], 1)
    scores = RNG.rand(n).astype(np.float32)
    return segs, scores


def numpy_softnms(segs, scores, iou_thresh, sigma, min_score, method):
    """Straightforward numpy re-statement of the reference algorithm
    (selection + decay + drop), list-based."""
    x1 = list(segs[:, 0]); x2 = list(segs[:, 1])
    sc = list(scores); inds = list(range(len(scores)))
    area = [b - a + 1e-6 for a, b in zip(x1, x2)]
    dets = []
    i = 0
    while i < len(sc):
        m = i + int(np.argmax(sc[i:]))
        for arr in (x1, x2, sc, area, inds):
            arr[i], arr[m] = arr[m], arr[i]
        dets.append((x1[i], x2[i], sc[i]))
        p = i + 1
        while p < len(sc):
            xx1 = max(x1[i], x1[p]); xx2 = min(x2[i], x2[p])
            inter = max(0.0, xx2 - xx1)
            ovr = inter / (area[i] + area[p] - inter)
            w = 1.0
            if method == 0:
                w = 0.0 if ovr >= iou_thresh else 1.0
            elif method == 1:
                w = 1.0 - ovr if ovr >= iou_thresh else 1.0
            elif method == 2:
                w = np.exp(-(ovr * ovr) / sigma)
            sc[p] = np.float32(sc[p] * np.float32(w))
            if sc[p] < min_score:
                for arr in (x1, x2, sc, area, inds):
                    arr[p] = arr[-1]
                    arr.pop()
                continue
            p += 1
        i += 1
    return np.array(dets, np.float32).reshape(-1, 3), np.array(inds)


@pytest.mark.parametrize("n", [1, 7, 50, 300])
def test_softnms_host_vs_numpy(n):
    segs, scores = random_segs(n)
    for sigma, min_score in [(0.9, 0.001), (0.5, 0.3)]:
        dets_c, idx_c = softnms_host(segs, scores, 0.1, sigma, min_score, 2)
        dets_np, idx_np = numpy_softnms(segs, scores, 0.1, sigma, min_score, 2)
        assert len(idx_c) == len(idx_np)
        np.testing.assert_allclose(dets_c, dets_np[:len(dets_c)],
                                   rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("n,k", [(50, 5), (300, 5), (3, 5), (64, 10)])
def test_soft_nms_topk_device_vs_host(n, k):
    segs, scores = random_segs(n)
    dets_c, _ = softnms_host(segs, scores, 0.1, 0.9, 0.001, 2)
    want = dets_c[:k]

    # pad device inputs
    N = max(128, n)
    segs_p = np.zeros((N, 2), np.float32)
    scores_p = np.zeros((N,), np.float32)
    valid = np.zeros((N,), bool)
    segs_p[:n] = segs; scores_p[:n] = scores; valid[:n] = True
    dets_d, count = soft_nms_topk(
        jnp.asarray(segs_p[:, 0]), jnp.asarray(segs_p[:, 1]),
        jnp.asarray(scores_p), jnp.asarray(valid), k,
        iou_thresh=0.1, sigma=0.9, min_score=0.001, method=2)
    dets_d = np.asarray(dets_d)
    assert int(count) == min(k, len(dets_c))
    np.testing.assert_allclose(dets_d[:len(want)], want, rtol=1e-4, atol=1e-5)
    assert np.all(dets_d[len(want):] == 0)


def test_hard_nms_topk_device_vs_host():
    segs, scores = random_segs(80)
    idx = nms_host(segs, scores, 0.3)
    want_segs = segs[idx[:5]]
    want_scores = scores[idx[:5]]
    dets_d, count = hard_nms_topk(
        jnp.asarray(segs[:, 0]), jnp.asarray(segs[:, 1]), jnp.asarray(scores),
        jnp.ones(len(segs), bool), 5, iou_thresh=0.3)
    dets_d = np.asarray(dets_d)
    np.testing.assert_allclose(dets_d[:len(want_segs), :2], want_segs,
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(dets_d[:len(want_scores), 2], want_scores,
                               rtol=1e-5, atol=1e-6)
    assert int(count) == min(5, len(idx))


def test_segment_voting_vs_torch():
    import torch

    segs, scores = random_segs(100)
    nms_segs = segs[:7]
    got = np.asarray(segment_voting(
        jnp.asarray(nms_segs), jnp.asarray(segs), jnp.asarray(scores), 0.5))

    # torch oracle (reference: libs/nms/nms.py:64-103)
    a = torch.from_numpy(nms_segs)[:, None]
    b = torch.from_numpy(segs)[None, :]
    left = torch.maximum(a[..., 0], b[..., 0])
    right = torch.minimum(a[..., 1], b[..., 1])
    overlap = (right - left).clamp(min=0)
    union = (a[..., 1] - a[..., 0]) + (b[..., 1] - b[..., 0]) - overlap
    iou = overlap / union
    w = (iou >= 0.5).float() * torch.from_numpy(scores)[None]
    w = w / w.sum(dim=1, keepdim=True)
    want = (w @ b[0]).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_batched_nms_device_vs_host_pipeline():
    Q, n, N, k = 3, 60, 128, 5
    segs_p = np.zeros((Q, N, 2), np.float32)
    scores_p = np.zeros((Q, N), np.float32)
    valid = np.zeros((Q, N), bool)
    per_query = []
    for q in range(Q):
        s, sc = random_segs(n)
        segs_p[q, :n] = s; scores_p[q, :n] = sc; valid[q, :n] = True
        per_query.append((s, sc))

    got_segs, got_scores, counts = batched_nms_device(
        jnp.asarray(segs_p[..., 0]), jnp.asarray(segs_p[..., 1]),
        jnp.asarray(scores_p), jnp.asarray(valid), k,
        mode="soft_nms", iou_thresh=0.1, min_score=0.001, sigma=0.9,
        voting_thresh=0.95)
    for q in range(Q):
        want_segs, want_scores = batched_nms_host(
            per_query[q][0], per_query[q][1], iou_thresh=0.1, min_score=0.001,
            max_num_segs=k, mode="soft_nms", sigma=0.9, voting_thresh=0.95)
        c = int(counts[q])
        assert c == len(want_scores)
        np.testing.assert_allclose(np.asarray(got_scores[q][:c]), want_scores,
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(got_segs[q][:c]), want_segs,
                                   rtol=1e-4, atol=1e-4)
