"""Ground-truth assignment of FPN candidate points, fully vectorized.

Reference: libs/worker_v2.py:575-637 (a Python loop over targets calling a
per-video routine). Here the whole (B targets x P points) assignment is one
broadcasted computation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("center_sampling",))
def annotate_points(points_t, targets, center_sampling="radius",
                    center_sampling_radius=1.5):
    """Assign binary labels and regression offsets to candidate points.

    Args:
      points_t: (4, P) float32 -- rows (coord, reg_min, reg_max, stride).
        TRANSPOSED and passed as an argument, never a closure constant:
        (P, 4) arrays slice badly on TPU (trailing small dim), and jit
        closure constants are re-materialized per call on some platforms.
      targets: (B, 2) float32 ground-truth segments in grid units.

    Returns:
      labels: (B, P) bool -- point is positive (center-sampling window AND
        regression range hit, reference: libs/worker_v2.py:597-637).
      offsets: (B, 2, P) float32 -- (dist to start, dist to end) / stride,
        channel-first (P minor) for TPU layout friendliness.
    """
    coords = points_t[0][None]                        # (1, P)
    reg_min = points_t[1][None]
    reg_max = points_t[2][None]
    strides = points_t[3][None]
    t0 = targets[:, 0:1]                              # (B, 1)
    t1 = targets[:, 1:2]

    pt2start = coords - t0                            # (B, P)
    pt2end = t1 - coords
    offsets = jnp.stack([pt2start, pt2end], axis=1) / strides[:, None, :]

    if center_sampling == "radius":
        ctr = 0.5 * (t0 + t1)
        radius = strides * center_sampling_radius
        t_min = jnp.maximum(ctr - radius, t0)
        t_max = jnp.minimum(ctr + radius, t1)
        inside_window = (coords - t_min > 0) & (t_max - coords > 0)
    else:
        inside_window = (pt2start > 0) & (pt2end > 0)

    max_reg_dist = jnp.maximum(pt2start, pt2end)
    inside_range = (max_reg_dist >= reg_min) & (max_reg_dist < reg_max)

    labels = inside_window & inside_range
    return labels, offsets
