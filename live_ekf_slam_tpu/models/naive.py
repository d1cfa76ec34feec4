"""Naive command-propagation filter (filter.h:325-370).

Ignores all measurements; directly integrates the commanded odometry. Used as a
baseline and as the pose-graph's default secondary filter.
"""

from __future__ import annotations

import jax.numpy as jnp

from live_ekf_slam_tpu.config import Config
from live_ekf_slam_tpu.core.types import Measurements, NaiveState
from live_ekf_slam_tpu.utils.geometry import wrap_angle


def init(cfg: Config, init_pose=None) -> NaiveState:
    pose = jnp.asarray(
        cfg.init_pose if init_pose is None else init_pose, jnp.float32
    )
    return NaiveState(pose=pose, timestep=jnp.int32(0))


def update(cfg: Config, s: NaiveState, cmd, meas: Measurements | None = None) -> NaiveState:
    """x += d cos(th); y += d sin(th); th = wrap(th + ang) (filter.h:345-347)."""
    th = s.pose[2]
    pose = jnp.stack(
        [
            s.pose[0] + cmd[0] * jnp.cos(th),
            s.pose[1] + cmd[0] * jnp.sin(th),
            wrap_angle(th + cmd[1]),
        ]
    )
    return NaiveState(pose=pose, timestep=s.timestep + 1)


def state_vector(s: NaiveState):
    return s.pose
