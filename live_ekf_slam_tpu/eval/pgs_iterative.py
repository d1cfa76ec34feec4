"""Host-loop iterative pose-graph mode (validation/debug path).

The reference re-optimizes the whole graph after every tick and feeds the
result back as the next initial estimate (pose_graph.cpp:262-267). The
PRODUCTION path for this mode is now fully on-device: the per-tick
matrix-free PCG Gauss-Newton solve inside the Monte-Carlo scan
(models/posegraph.py:solve_iteration, wired into eval/runner.py when
cfg.pose_graph.solve_graph_every_iteration is true — the reference default).
This host-driven loop remains as an exact, dense-solver-per-tick validation
harness for small/medium T: each tick runs the full dense LM solve with
warm-started initial values, mirroring `initial_estimate = result` feedback.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from live_ekf_slam_tpu.config import Config
from live_ekf_slam_tpu.eval import runner as R
from live_ekf_slam_tpu.models import posegraph
from live_ekf_slam_tpu.sim.trajectory import generate_trajectory


def run_iterative_pgs(
    cfg: Config, landmarks, key, solve_stride: int = 1, n_active=None
):
    """One world, pose-graph filter, re-solving every `solve_stride` ticks.

    Returns dict with per-tick true poses, secondary poses, the final solved
    history, and average errors for secondary / pgs_result.
    """
    assert cfg.filter == "pose_graph"
    lms = jnp.asarray(landmarks, jnp.float32)
    n_act = lms.shape[0] if n_active is None else n_active
    k_traj, k_roll = jax.random.split(key)
    cmds = generate_trajectory(cfg, lms, n_act, k_traj)
    carry = R.init_carry(cfg, lms, n_act)
    step = jax.jit(R.make_step(cfg, collect="poses"))
    solve = jax.jit(lambda s, p, l: posegraph.solve(cfg, s, p, l))

    keys = jax.random.split(k_roll, cfg.num_iterations)
    true_hist, sec_hist = [], []
    poses_ws = carry.primary.poses_init
    lms_ws = carry.primary.lms_init
    warm = False
    for t in range(cfg.num_iterations):
        carry, (tp, ep) = step(carry, (cmds[t], keys[t]))
        true_hist.append(np.asarray(tp))
        sec_hist.append(np.asarray(ep))
        if (t + 1) % solve_stride == 0 or t + 1 == cfg.num_iterations:
            s = carry.primary
            if warm:
                # feedback: optimized values seed the next solve, with the
                # newly-added nodes taken from the secondary estimates
                ts = int(s.timestep)
                poses0 = poses_ws.at[ts - solve_stride + 1: ts + 1].set(
                    s.poses_init[ts - solve_stride + 1: ts + 1]
                )
                lms0 = lms_ws
            else:
                poses0, lms0 = s.poses_init, s.lms_init
            poses_ws, lms_ws, _ = solve(s, poses0, lms0)
            warm = True

    t_total = cfg.num_iterations
    true_arr = np.stack(true_hist)
    sec_arr = np.stack(sec_hist)
    sol = np.asarray(poses_ws)[1: t_total + 1]
    err_sec = float(
        np.linalg.norm(sec_arr[:, :2] - true_arr[:, :2], axis=1).mean()
    )
    err_pgs = float(np.linalg.norm(sol[:, :2] - true_arr[:, :2], axis=1).mean())
    return {
        "true": true_arr,
        "secondary": sec_arr,
        "pgs_result": sol,
        "landmarks_result": np.asarray(lms_ws),
        "err_secondary": err_sec,
        "err_pose_graph_result": err_pgs,
    }
