"""FPN candidate-point generation as pure precomputed constants.

Reference: libs/modeling/model.py:668-743 (PtGenerator). Points at FPN level
l sit on a stride-2^l grid over [0, max_seq_len); each point carries
(coordinate, regression_min, regression_max, stride). Regression ranges
double per level starting from [0, r]; level l >= 1 gets
[sigma * r_{l-1,max}, 2 * r_{l-1,max}] and the last level's max is extended
to at least max_seq_len + 1.

Being static data, points are generated once with numpy and folded into the
compiled graph -- the reference's BufferList becomes a tuple of constants.
"""

from __future__ import annotations

import functools

import numpy as np


@functools.lru_cache(maxsize=None)
def generate_points(max_seq_len, num_fpn_levels, regression_range=4,
                    sigma=0.5, use_offset=False):
    """Tuple of (t_l, 4) float32 arrays, one per FPN level."""
    assert max_seq_len % 2 ** (num_fpn_levels - 1) == 0
    assert 0 < sigma <= 1

    ranges = [(0.0, float(regression_range))]
    r = float(regression_range)
    for l in range(1, num_fpn_levels):
        v_min = r * sigma
        v_max = r * 2
        if l == num_fpn_levels - 1:
            v_max = max(v_max, max_seq_len + 1)
        ranges.append((v_min, v_max))
        r = v_max

    tics = np.arange(0, max_seq_len, 1.0, dtype=np.float32)
    points_list = []
    for l in range(num_fpn_levels):
        stride = 2 ** l
        coords = tics[::stride][:, None]
        if use_offset:
            coords = coords + 0.5 * stride
        n = len(coords)
        reg = np.tile(np.asarray(ranges[l], np.float32)[None], (n, 1))
        strd = np.full((n, 1), stride, np.float32)
        points_list.append(
            np.concatenate([coords, reg, strd], axis=1))
    return tuple(points_list)


def select_points(points_list, fpn_n_points):
    """Prefix-slice each level's buffered points to the requested count
    (reference: libs/modeling/model.py:725-743)."""
    assert len(fpn_n_points) == len(points_list)
    out = []
    for n, pts in zip(fpn_n_points, points_list):
        assert n <= len(pts), (
            f"requested {n} points but only {len(pts)} are buffered")
        out.append(pts[:n])
    return tuple(out)


def fpn_lengths(t0, num_fpn_levels):
    """Sequence lengths per FPN level for a level-0 length t0 (stride 2 after
    the first branch layer, reference: libs/modeling/video_net.py:98-114)."""
    out = [t0]
    for _ in range(1, num_fpn_levels):
        out.append(-(-out[-1] // 2))
    return out
