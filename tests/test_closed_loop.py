"""Closed-loop (igvc) smoke test on CPU: the on-device A* + pure pursuit +
EKF loop must drive the vehicle away from the start without diverging."""

import numpy as np
import jax

from live_ekf_slam_tpu.config import preset
from live_ekf_slam_tpu.eval.closed_loop import run_closed_loop


def test_igvc_closed_loop_progresses():
    cfg = preset("igvc1", num_iterations=40)
    # small capacities for CPU speed
    cfg = cfg.replace(
        num_landmark_slots=37,
        num_meas_slots=12,
        path_planning=cfg.path_planning.__class__(
            local_planner_dist=1.8,
            astar_max_iters=96,
            local_astar_max_iters=48,
            path_capacity=128,
        ),
    )
    metrics, final, _ = run_closed_loop(cfg, jax.random.PRNGKey(0), batch=2)
    err = metrics["err_" + cfg.filter]
    assert np.isfinite(err).all()
    # filter tracks truth closely over this short run
    assert err.max() < 0.5, err
    # vehicle actually moved from the igvc start (0, -8.5)
    final_pose = metrics["final_true_pose"]
    dist = np.linalg.norm(final_pose[:, :2] - np.array([0.0, -8.5]), axis=1)
    assert (dist > 0.3).all(), final_pose
