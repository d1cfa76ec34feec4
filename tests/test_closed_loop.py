"""Closed-loop (igvc) tests on CPU: the on-device A* + pure pursuit + EKF
loop must drive the vehicle away from the start without diverging — at
smoke scale (batch=2, T=40) and at Monte-Carlo scale (batch=64, T=200,
segmented runner, slow tier)."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from live_ekf_slam_tpu.config import preset
from live_ekf_slam_tpu.eval.closed_loop import (
    build_closed_loop_segmented, run_closed_loop)


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


def test_igvc_closed_loop_scale():
    """64 worlds, T=200 through the segmented runner (the on-chip benchmark
    path): every world's filter stays finite and tracks truth, and the
    fleet makes real goal progress along the igvc course — the local
    planner re-goals ~1.8 m ahead every 5 ticks (goal_pursuit_node.py:30,
    astar.py:12-56), so 200 ticks at d_max=0.1 must carry the median world
    well over a meter from the start."""
    batch, t_total = 64, 200
    cfg = preset("igvc1", num_iterations=t_total)
    # astar_window=64 is the on-chip benchmark configuration: the 1.8 m
    # local plans run in a cropped 64-cell window instead of the full
    # 150^2 grid (planning/astar.py)
    cfg = cfg.replace(
        num_landmark_slots=37,
        num_meas_slots=12,
        path_planning=dataclasses.replace(
            cfg.path_planning,
            astar_max_iters=96,
            local_astar_max_iters=48,
            path_capacity=128,
            astar_window=64,
        ),
    )
    period = cfg.path_planning.replan_period
    init_fn, seg_fn, n_blocks = build_closed_loop_segmented(cfg)
    keys = jax.random.split(jax.random.PRNGKey(3), batch)
    carry = init_fn(keys)
    world_keys = jnp.swapaxes(
        jax.vmap(
            lambda k: jax.random.split(k, n_blocks * period).reshape(
                n_blocks, period, 2
            )
        )(keys),
        0, 1,
    )
    for i in range(0, n_blocks, 10):
        carry = seg_fn(carry, world_keys[i: i + 10])

    t_run = n_blocks * period
    err = np.asarray(carry.err_sum) / t_run
    assert np.isfinite(err).all()
    # filter tracks truth across the whole fleet
    assert np.median(err) < 0.2, err
    assert err.max() < 0.6, err
    # goal progress: the course driver must actually advance
    final_pose = np.asarray(carry.world.pose)
    dist = np.linalg.norm(final_pose[:, :2] - np.array([0.0, -8.5]), axis=1)
    assert np.median(dist) > 1.0, np.sort(dist)[:8]
    assert (dist > 0.3).all(), np.sort(dist)[:8]


def test_igvc_closed_loop_sharded_bitwise():
    """The segmented closed loop under world-batch sharding on the 8-device
    mesh must be bitwise identical to the single-placement run: every array
    in the carry (incl. the A* replanned paths inside PursuitState) is
    batched on the leading world axis with no cross-world coupling, so the
    mesh partitioning may not change a single bit (same guarantee the fused
    rollout's sharded test makes; SURVEY.md §2.5's metric all-reduce is the
    only collective in the framework)."""
    from live_ekf_slam_tpu.parallel.mesh import make_mesh, shard_batch

    batch, t_total = 16, 40
    cfg = preset("igvc1", num_iterations=t_total)
    cfg = cfg.replace(
        num_landmark_slots=37,
        num_meas_slots=12,
        path_planning=dataclasses.replace(
            cfg.path_planning,
            astar_max_iters=96,
            local_astar_max_iters=48,
            path_capacity=128,
        ),
    )
    period = cfg.path_planning.replan_period
    init_fn, seg_fn, n_blocks = build_closed_loop_segmented(cfg)
    keys = jax.random.split(jax.random.PRNGKey(11), batch)
    world_keys = jnp.swapaxes(
        jax.vmap(
            lambda k: jax.random.split(k, n_blocks * period).reshape(
                n_blocks, period, 2
            )
        )(keys),
        0, 1,
    )

    plain = seg_fn(init_fn(keys), world_keys)

    mesh = make_mesh(8)
    carry_sh = shard_batch(init_fn(keys), mesh)
    # seg_keys carry the batch on axis 1; shard that axis to match the carry
    from jax.sharding import NamedSharding, PartitionSpec as P

    keys_sh = jax.device_put(
        world_keys, NamedSharding(mesh, P(None, "worlds")))
    sharded = seg_fn(carry_sh, keys_sh)

    for a, b in zip(jax.tree.leaves(plain), jax.tree.leaves(sharded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
