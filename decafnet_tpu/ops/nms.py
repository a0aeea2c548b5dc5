"""1D segment (Soft)NMS and segment voting.

Two interchangeable execution paths, both matching the reference
(reference: libs/nms/src/nms_cpu.cpp, libs/nms/nms.py):

  * **Device (default)**: the key insight is that the reference pipeline
    only ever consumes the top ``max_num_segs`` (= 5) detections
    (libs/nms/nms.py:54-61), and SoftNMS emits detections in non-increasing
    decayed-score order -- so only ``max_num_segs`` selection iterations are
    needed. That turns the O(n^2) sequential C++ loop into a fixed-length
    ``lax.fori_loop`` of masked argmax + vectorized decay over a padded
    (N,) score vector: fully jittable, vmap-able over queries, and it keeps
    the decode on-TPU instead of a host round-trip.
  * **Host oracle**: a standalone C++ library (ops/native/nms1d.cpp, C ABI,
    loaded via ctypes) implementing the full reference algorithm; used for
    parity tests and the ``reference-exact`` eval mode.

Segment voting refines each kept segment as the score-weighted average of
all pre-NMS segments overlapping it at IoU >= voting_thresh
(reference: libs/nms/nms.py:64-103).
"""

from __future__ import annotations

import ctypes
import functools
import os
import subprocess

import jax
import jax.numpy as jnp
import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "native")


# ---------------------------------------------------------------------------
# Native host library (ctypes)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=1)
def _load_native():
    """Compile (once) and load the C++ NMS library."""
    src = os.path.join(_NATIVE_DIR, "nms1d.cpp")
    build_dir = os.environ.get(
        "DECAFNET_TPU_BUILD_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "decafnet_tpu"))
    os.makedirs(build_dir, exist_ok=True)
    lib_path = os.path.join(build_dir, "libnms1d.so")
    if (not os.path.exists(lib_path)
            or os.path.getmtime(lib_path) < os.path.getmtime(src)):
        subprocess.check_call(
            ["g++", "-O3", "-shared", "-fPIC", "-o", lib_path, src])
    lib = ctypes.CDLL(lib_path)
    f32p = ctypes.POINTER(ctypes.c_float)
    i64p = ctypes.POINTER(ctypes.c_int64)
    lib.nms1d.restype = ctypes.c_int64
    lib.nms1d.argtypes = [f32p, f32p, ctypes.c_int64, ctypes.c_float, i64p]
    lib.softnms1d.restype = ctypes.c_int64
    lib.softnms1d.argtypes = [f32p, f32p, ctypes.c_int64, ctypes.c_float,
                              ctypes.c_float, ctypes.c_float, ctypes.c_int,
                              f32p, i64p]
    return lib


def _f32p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _i64p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def nms_host(segs, scores, iou_thresh):
    """Greedy hard NMS on the host. Returns kept indices (desc. score)."""
    segs = np.ascontiguousarray(segs, np.float32)
    scores = np.ascontiguousarray(scores, np.float32)
    n = len(segs)
    out = np.empty(n, np.int64)
    kept = _load_native().nms1d(_f32p(segs), _f32p(scores), n,
                                ctypes.c_float(iou_thresh), _i64p(out))
    return out[:kept]


def softnms_host(segs, scores, iou_thresh, sigma, min_score, method):
    """Full SoftNMS on the host. Returns (dets (m, 3), surviving indices)."""
    segs = np.ascontiguousarray(segs, np.float32)
    scores = np.ascontiguousarray(scores, np.float32)
    n = len(segs)
    dets = np.zeros((n, 3), np.float32)
    idx = np.empty(n, np.int64)
    m = _load_native().softnms1d(
        _f32p(segs), _f32p(scores), n, ctypes.c_float(iou_thresh),
        ctypes.c_float(sigma), ctypes.c_float(min_score), int(method),
        _f32p(dets), _i64p(idx))
    return dets[:m], idx[:m]


# ---------------------------------------------------------------------------
# Device (JAX) formulation
# ---------------------------------------------------------------------------


def _pairwise_iou_1d(a1, a2, x1, x2):
    """IoU of one (scalar a1, a2) segment against (N,) x1/x2 segments with
    the reference's +1e-6 area epsilon (reference: libs/nms/src/nms_cpu.cpp:
    31,89). Segments are carried as separate start/end vectors -- a trailing
    dim of 2 is a pathological TPU layout."""
    area_a = a2 - a1 + 1e-6
    areas = x2 - x1 + 1e-6
    xx1 = jnp.maximum(a1, x1)
    xx2 = jnp.minimum(a2, x2)
    inter = jnp.maximum(0.0, xx2 - xx1)
    return inter / (area_a + areas - inter)


@functools.partial(jax.jit,
                   static_argnames=("k", "method"))
def soft_nms_topk(x1, x2, scores, valid, k, iou_thresh=0.1, sigma=0.9,
                  min_score=0.001, method=2):
    """Top-k SoftNMS on device.

    Args:
      x1, x2: (N,) float32 segment starts/ends, padded.
      scores: (N,) float32; padding rows must have score 0 / valid False.
      valid: (N,) bool.
      k: number of detections to emit (static).

    Returns:
      dets: (k, 3) float32 rows (x1, x2, decayed_score) in selection order,
        zero-filled past the surviving count.
      count: int32 number of valid rows (<= k).
    """
    x1 = x1.astype(jnp.float32)
    x2 = x2.astype(jnp.float32)
    neg = jnp.float32(-jnp.inf)
    sc0 = jnp.where(valid, scores.astype(jnp.float32), neg)

    def body(i, carry):
        sc, active, dets, count = carry
        cur = jnp.where(active, sc, neg)
        m = jnp.argmax(cur)
        best = cur[m]
        has = best > neg
        det_row = jnp.where(has,
                            jnp.stack([x1[m], x2[m], best]),
                            jnp.zeros((3,)))
        dets = dets.at[i].set(det_row)
        count = count + has.astype(jnp.int32)

        iou = _pairwise_iou_1d(x1[m], x2[m], x1, x2)
        if method == 0:
            w = jnp.where(iou >= iou_thresh, 0.0, 1.0)
        elif method == 1:
            w = jnp.where(iou >= iou_thresh, 1.0 - iou, 1.0)
        else:
            w = jnp.exp(-(iou * iou) / sigma)
        others = active & (jnp.arange(x1.shape[0]) != m)
        sc = jnp.where(others, sc * w, sc)
        active = others & (sc >= min_score) & has
        return sc, active, dets, count

    dets0 = jnp.zeros((k, 3), jnp.float32)
    _, _, dets, count = jax.lax.fori_loop(
        0, k, body, (sc0, valid, dets0, jnp.int32(0)))
    return dets, count


@functools.partial(jax.jit, static_argnames=("k",))
def hard_nms_topk(x1, x2, scores, valid, k, iou_thresh=0.1):
    """Top-k greedy hard NMS on device; same contract as soft_nms_topk."""
    x1 = x1.astype(jnp.float32)
    x2 = x2.astype(jnp.float32)
    neg = jnp.float32(-jnp.inf)
    sc0 = jnp.where(valid, scores.astype(jnp.float32), neg)

    def body(i, carry):
        sc, dets, count = carry
        m = jnp.argmax(sc)
        best = sc[m]
        has = best > neg
        det_row = jnp.where(
            has,
            jnp.stack([x1[m], x2[m], best]),
            jnp.zeros((3,)))
        dets = dets.at[i].set(det_row)
        count = count + has.astype(jnp.int32)
        iou = _pairwise_iou_1d(x1[m], x2[m], x1, x2)
        suppress = (iou >= iou_thresh) | (jnp.arange(x1.shape[0]) == m)
        sc = jnp.where(suppress, neg, sc)
        return sc, dets, count

    dets0 = jnp.zeros((k, 3), jnp.float32)
    _, dets, count = jax.lax.fori_loop(0, k, body, (sc0, dets0, jnp.int32(0)))
    return dets, count


def segment_voting_xy(n1, n2, a1, a2, all_scores, iou_thresh,
                      all_valid=None):
    """Refine segments by score-weighted averaging of overlapping pre-NMS
    segments (reference: libs/nms/nms.py:64-103), on separate start/end
    vectors: n1/n2 (K,) kept segments, a1/a2 (N,) candidates. Returns
    (voted_x1 (K,), voted_x2 (K,))."""
    left = jnp.maximum(n1[:, None], a1[None, :])
    right = jnp.minimum(n2[:, None], a2[None, :])
    overlap = jnp.clip(right - left, 0.0)
    union = (n2 - n1)[:, None] + (a2 - a1)[None, :] - overlap
    iou = overlap / jnp.maximum(union, 1e-12)
    weights = (iou >= iou_thresh).astype(jnp.float32) * all_scores[None, :]
    if all_valid is not None:
        weights = weights * all_valid[None, :].astype(jnp.float32)
    denom = jnp.sum(weights, axis=1, keepdims=True)
    weights = weights / jnp.maximum(denom, 1e-12)
    return weights @ a1, weights @ a2


def segment_voting(nms_segs, all_segs, all_scores, iou_thresh,
                   all_valid=None):
    """(K, 2) / (N, 2) convenience wrapper over segment_voting_xy."""
    v1, v2 = segment_voting_xy(
        nms_segs[:, 0], nms_segs[:, 1], all_segs[:, 0], all_segs[:, 1],
        all_scores, iou_thresh, all_valid=all_valid)
    return jnp.stack([v1, v2], axis=-1)


@functools.partial(jax.jit, static_argnames=(
    "k", "mode", "method", "iou_thresh", "min_score", "sigma",
    "voting_thresh"))
def batched_nms_device(x1, x2, scores, valid, k, mode="soft_nms",
                       iou_thresh=0.1, min_score=0.001, sigma=0.9,
                       voting_thresh=0.75, method=2):
    """Full decode-side NMS for a batch of queries on device.

    Args:
      x1, x2: (Q, N) segment starts/ends; scores: (Q, N); valid: (Q, N).
      k: max_num_segs.

    Returns:
      (Q, k, 2) refined segments, (Q, k) scores, (Q,) counts.
    """
    def per_query(s1, s2, sc, va):
        if mode == "soft_nms":
            dets, count = soft_nms_topk(
                s1, s2, sc, va, k, iou_thresh=iou_thresh, sigma=sigma,
                min_score=min_score, method=method)
        elif mode == "nms":
            # the reference's hard-NMS path pre-filters by min_score
            # (libs/nms/nms.py:13-16)
            va2 = va & (sc > min_score) if min_score > 0 else va
            dets, count = hard_nms_topk(s1, s2, sc, va2, k,
                                        iou_thresh=iou_thresh)
        else:
            raise NotImplementedError(f"invalid NMS mode: {mode}")
        out_scores = dets[:, 2]
        o1, o2 = dets[:, 0], dets[:, 1]
        if voting_thresh > 0:
            row_valid = jnp.arange(k) < count
            v1, v2 = segment_voting_xy(o1, o2, s1, s2,
                                       sc * va.astype(sc.dtype),
                                       voting_thresh, all_valid=va)
            o1 = jnp.where(row_valid, v1, 0.0)
            o2 = jnp.where(row_valid, v2, 0.0)
        return jnp.stack([o1, o2], axis=-1), out_scores, count

    return jax.vmap(per_query)(x1.astype(jnp.float32),
                               x2.astype(jnp.float32),
                               scores.astype(jnp.float32), valid)


# ---------------------------------------------------------------------------
# Host reference pipeline (mirrors libs/nms/nms.py:106-148)
# ---------------------------------------------------------------------------


def segment_voting_host(nms_segs, all_segs, all_scores, iou_thresh):
    """Pure-numpy segment voting (reference: libs/nms/nms.py:64-103).

    Same math as the device ``segment_voting`` -- kept host-side so the
    host decode pipeline never dispatches to the accelerator (a per-call
    device round-trip costs ~40 ms over the axon tunnel)."""
    n1, n2 = nms_segs[:, 0], nms_segs[:, 1]
    a1, a2 = all_segs[:, 0], all_segs[:, 1]
    left = np.maximum(n1[:, None], a1[None, :])
    right = np.minimum(n2[:, None], a2[None, :])
    overlap = np.clip(right - left, 0.0, None)
    union = (n2 - n1)[:, None] + (a2 - a1)[None, :] - overlap
    iou = overlap / np.maximum(union, 1e-12)
    weights = (iou >= iou_thresh).astype(np.float32) * all_scores[None, :]
    denom = np.sum(weights, axis=1, keepdims=True)
    weights = weights / np.maximum(denom, 1e-12)
    return np.stack([weights @ a1, weights @ a2], axis=-1)


def batched_nms_host(segs, scores, iou_thresh, min_score, max_num_segs,
                     mode="soft_nms", sigma=0.5, voting_thresh=0.75):
    """Reference-exact host decode for one query (numpy in / numpy out)."""
    segs = np.asarray(segs, np.float32)
    scores = np.asarray(scores, np.float32)
    if len(segs) == 0:
        return np.zeros((0, 2), np.float32), np.zeros((0,), np.float32)

    if mode == "nms":
        if min_score > 0:
            keep = scores > min_score
            segs_f, scores_f = segs[keep], scores[keep]
        else:
            segs_f, scores_f = segs, scores
        idx = nms_host(segs_f, scores_f, iou_thresh)
        idx = idx[:max_num_segs] if max_num_segs > 0 else idx
        nms_segs, nms_scores = segs_f[idx], scores_f[idx]
    elif mode == "soft_nms":
        dets, idx = softnms_host(segs, scores, iou_thresh, sigma, min_score,
                                 method=2)
        m = len(idx)
        if max_num_segs > 0:
            m = min(m, max_num_segs)
        nms_segs, nms_scores = dets[:m, :2], dets[:m, 2]
    else:
        raise NotImplementedError("invalid NMS mode")

    if voting_thresh > 0 and len(nms_segs) > 0:
        nms_segs = segment_voting_host(np.asarray(nms_segs, np.float32),
                                       segs, scores, voting_thresh)

    order = np.argsort(-nms_scores, kind="stable")
    m = min(max_num_segs, len(nms_segs))
    return nms_segs[order[:m]], nms_scores[order[:m]]
