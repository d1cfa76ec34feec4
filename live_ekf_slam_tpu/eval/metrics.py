"""Accuracy metrics.

The reference's single benchmark metric is the average Euclidean position
error of the estimated vehicle trajectory vs ground truth, computed over the
full history at the end of a run (plotting_node.py:195-218) and appended to
per-filter CSVs (plotting_node.py:126-129). We compute the same quantity
online (a running sum inside the scanned step — no history storage needed)
plus standard extras (RMSE, landmark RMSE).
"""

from __future__ import annotations

import jax.numpy as jnp


def avg_position_error(est_xy, true_xy):
    """Mean Euclidean position error over a trajectory.

    est_xy/true_xy: (..., T, 2). Matches compute_average_error
    (plotting_node.py:195-218) with aligned timestamps (estimate after tick t
    vs truth after tick t).
    """
    err = jnp.linalg.norm(est_xy - true_xy, axis=-1)
    return jnp.mean(err, axis=-1)


def rmse_position(est_xy, true_xy):
    err2 = jnp.sum((est_xy - true_xy) ** 2, axis=-1)
    return jnp.sqrt(jnp.mean(err2, axis=-1))


def landmark_rmse(est_lms, est_ids, est_m, true_lms):
    """RMSE of active landmark estimates vs their true positions.

    est_lms: (N, 2) slot estimates; est_ids: (N,) slot ids; est_m: () count;
    true_lms: (N_world, 2) indexed by id.
    """
    n = est_lms.shape[0]
    active = jnp.arange(n) < est_m
    ids = jnp.clip(est_ids, 0, true_lms.shape[0] - 1)
    err2 = jnp.sum((est_lms - true_lms[ids]) ** 2, axis=-1)
    err2 = jnp.where(active, err2, 0.0)
    denom = jnp.maximum(est_m, 1)
    return jnp.sqrt(jnp.sum(err2) / denom)


def nees(est_pose, true_pose, pose_cov):
    """Normalized estimation error squared on vehicle position (consistency).

    e^T P^{-1} e over the (x, y) block; a consistent filter averages ~2 (the
    position dimension). est_pose/true_pose: (..., >=2); pose_cov:
    (..., 2, 2). The reference has no consistency metric; this is the
    standard addition for Monte-Carlo filter evaluation.
    """
    e = est_pose[..., :2] - true_pose[..., :2]
    a = pose_cov[..., 0, 0]
    b = pose_cov[..., 0, 1]
    c = pose_cov[..., 1, 0]
    d = pose_cov[..., 1, 1]
    det = a * d - b * c
    det = jnp.where(jnp.abs(det) > 1e-18, det, 1e-18)
    # closed-form 2x2 inverse quadratic form
    return (
        d * e[..., 0] ** 2 - (b + c) * e[..., 0] * e[..., 1] + a * e[..., 1] ** 2
    ) / det
