"""Interactive clicked-goal loop + iterative PGS mode tests."""

import numpy as np
import jax

from live_ekf_slam_tpu.config import Config, preset
from live_ekf_slam_tpu.eval.interactive import GoalPursuit
from live_ekf_slam_tpu.eval.pgs_iterative import run_iterative_pgs
from live_ekf_slam_tpu.eval import runner as R
from live_ekf_slam_tpu.sim import maps as sim_maps

import jax.numpy as jnp


def test_clicked_goal_closed_loop_reaches_goal():
    """Host planner + device sim/filter: click a goal, vehicle gets there."""
    cfg = Config(num_iterations=400).replace(
        filter="ekf_slam", occ_map_img="blank.jpg",
        num_landmark_slots=5, num_meas_slots=5,
    )
    cfg = cfg.replace(map=cfg.map.__class__(num_landmarks=5))
    occ, _ = sim_maps.load_occ_map(cfg)
    rng = np.random.default_rng(0)
    lms, n = sim_maps.make_landmarks(cfg, rng, occ)

    gp = GoalPursuit(cfg, occ)
    # off-map and in-collision goals are rejected
    assert not gp.set_goal((99.0, 99.0))

    carry = R.init_carry(cfg, jnp.asarray(lms), n)
    step = jax.jit(R.make_step(cfg, collect="poses"))
    gp._cur = [0.0, 0.0, 0.0]
    assert gp.set_goal((1.5, 1.0))

    key = jax.random.PRNGKey(1)
    cmd = (0.0, 0.0)
    est = np.zeros(3)
    for t in range(cfg.num_iterations):
        carry, (tp, ep) = step(
            carry, (jnp.asarray(cmd, jnp.float32), jax.random.fold_in(key, t))
        )
        est = np.asarray(ep)
        cmd = gp.on_state(est)
        if np.hypot(est[0] - 1.5, est[1] - 1.0) < 0.2:
            break
    assert np.hypot(est[0] - 1.5, est[1] - 1.0) < 0.25, est


def test_iterative_pgs_mode():
    cfg = Config(num_iterations=60).replace(
        filter="pose_graph", num_landmark_slots=6, num_meas_slots=6,
    )
    cfg = cfg.replace(map=cfg.map.__class__(num_landmarks=6))
    rng = np.random.default_rng(3)
    lms = sim_maps.random_landmarks(cfg, rng)
    out = run_iterative_pgs(cfg, lms, jax.random.PRNGKey(2), solve_stride=10)
    assert np.isfinite(out["err_pose_graph_result"])
    assert out["pgs_result"].shape == (60, 3)
    # the solved history should not be wildly worse than the secondary's
    assert out["err_pose_graph_result"] < max(out["err_secondary"] * 3.0, 0.5)


def test_async_replan_on_native_scheduler():
    """PathPlanningConfig.async_replan: local replans run on the native
    JobScheduler worker threads (non-blocking control loop) and completed
    segments are swapped in — the vehicle still makes progress."""
    import dataclasses

    from live_ekf_slam_tpu import native

    if not native.available():
        import pytest

        pytest.skip("native lib not built")

    cfg = Config(num_iterations=200).replace(
        filter="ekf_slam", occ_map_img="building1.png",
        use_local_planner=True,
        num_landmark_slots=5, num_meas_slots=5,
    )
    cfg = cfg.replace(
        map=cfg.map.__class__(num_landmarks=5),
        path_planning=dataclasses.replace(
            cfg.path_planning, async_replan=True
        ),
    )
    occ, _ = sim_maps.load_occ_map(cfg)
    rng = np.random.default_rng(0)
    lms, n = sim_maps.make_landmarks(cfg, rng, occ)

    gp = GoalPursuit(cfg, occ)
    assert gp._sched is not None, "scheduler should be active"
    carry = R.init_carry(cfg, jnp.asarray(lms), n)
    step = jax.jit(R.make_step(cfg, collect="poses"))
    gp._cur = [0.0, 0.0, 0.0]

    key = jax.random.PRNGKey(1)
    cmd = (0.0, 0.0)
    est = np.zeros(3)
    for t in range(cfg.num_iterations):
        carry, (tp, ep) = step(
            carry, (jnp.asarray(cmd, jnp.float32), jax.random.fold_in(key, t))
        )
        est = np.asarray(ep)
        cmd = gp.on_state(est)
    # wait out any in-flight replan, then release the pool cleanly
    gp._sched.wait()
    gp._sched.close()
    assert gp.async_replans > 0, "no async replan ever landed"
    assert np.hypot(est[0], est[1]) > 0.5, (
        f"vehicle never made progress: {est}"
    )


def test_async_blocked_replan_holds_once_and_keeps_queue():
    """A completed-but-blocked async replan (seg=None) must mirror the sync
    path: ONE (0,0) hold tick, queue preserved, and it must not count as a
    landed replan (r4 review finding)."""
    cfg = Config(num_iterations=50).replace(
        filter="ekf_slam", occ_map_img="blank.jpg",
        num_landmark_slots=5, num_meas_slots=5,
    )
    cfg = cfg.replace(map=cfg.map.__class__(num_landmarks=5))
    occ, _ = sim_maps.load_occ_map(cfg)
    gp = GoalPursuit(cfg, occ)
    gp._cur = [0.0, 0.0, 0.0]
    assert gp.set_goal((1.5, 1.0))
    q_before = [list(p) for p in gp.pp.goal_queue]
    assert q_before, "goal queue should be non-empty after set_goal"

    # inject a completed blocked replan (what the worker thread produces
    # when the local planner finds no free cell)
    gp._pending = {"done": True, "seg": None}
    cmd = gp.on_state(np.zeros(3))
    assert cmd == (0.0, 0.0), "blocked replan must emit one stop tick"
    assert [list(p) for p in gp.pp.goal_queue] == q_before, (
        "blocked replan must NOT discard the still-valid path"
    )
    assert gp.async_replans == 0
    assert gp.async_replans_blocked == 1
    assert gp._pending is None

    # next tick resumes driving the preserved path
    cmd2 = gp.on_state(np.zeros(3))
    assert cmd2 != (0.0, 0.0), "vehicle should resume after the hold tick"
