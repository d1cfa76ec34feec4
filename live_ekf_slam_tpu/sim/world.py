"""Ground-truth world dynamics + sensor model as one pure, vmappable step.

Replaces the reference's `sim_node.get_cmd` callback (sim_node.py:209-250):
noisy-command truth propagation, O(N) visibility cull over all landmarks, and
noisy range-bearing measurement emission — but as masked vector ops over the
whole landmark array instead of a Python loop, so thousands of worlds batch on
the VPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from live_ekf_slam_tpu.config import Config
from live_ekf_slam_tpu.core.types import Measurements, WorldState
from live_ekf_slam_tpu.utils.geometry import wrap_angle


def init_world(cfg: Config, landmarks, num_landmarks=None, init_pose=None) -> WorldState:
    """Build a WorldState from a (N, 2) landmark array (N = capacity)."""
    landmarks = jnp.asarray(landmarks, jnp.float32)
    n = landmarks.shape[0] if num_landmarks is None else num_landmarks
    pose = jnp.asarray(
        cfg.init_pose if init_pose is None else init_pose, jnp.float32
    )
    return WorldState(
        pose=pose,
        landmarks=landmarks,
        num_landmarks=jnp.asarray(n, jnp.int32),
    )


def propagate_truth(cfg: Config, pose, cmd, key):
    """Noisy truth propagation (sim_node.py:216-222).

    Noise is *uniform* U(-V, V) (not Gaussian), commands are clamped to the
    constraints, and the true heading is deliberately left unwrapped.
    """
    u = cfg.sim_noise_scale * jax.random.uniform(key, (2,), jnp.float32, -1.0, 1.0)
    d = cmd[0] + cfg.process_noise.V_00 * u[0]
    hdg = cmd[1] + cfg.process_noise.V_11 * u[1]
    d = jnp.clip(d, 0.0, cfg.constraints.commands.d_max)
    hdg = jnp.clip(
        hdg, -cfg.constraints.commands.th_max, cfg.constraints.commands.th_max
    )
    th = pose[2]
    return jnp.stack([pose[0] + d * jnp.cos(th), pose[1] + d * jnp.sin(th), th + hdg])


def sense(cfg: Config, world: WorldState, pose, key) -> Measurements:
    """FOV/range visibility cull + noisy (r, b) emission (sim_node.py:228-250).

    Visible iff r <= range_max and fov_min < beta < fov_max (the reference
    skips when r > range_max, then requires strict fov inequalities).
    Measurement slots are ordered by ascending landmark id, matching the
    reference's id-order emission loop.
    """
    n_cap = world.landmarks.shape[0]
    k = cfg.num_meas_slots
    dx = world.landmarks[:, 0] - pose[0]
    dy = world.landmarks[:, 1] - pose[1]
    r = jnp.sqrt(dx * dx + dy * dy)
    beta = wrap_angle(jnp.arctan2(dy, dx) - pose[2])  # remainder(gb - th, tau)
    vis = (
        (r <= cfg.constraints.vision.range_max)
        & (beta > cfg.constraints.vision.fov_min)
        & (beta < cfg.constraints.vision.fov_max)
        & (jnp.arange(n_cap) < world.num_landmarks)
    )
    u = cfg.sim_noise_scale * jax.random.uniform(key, (2, n_cap), jnp.float32, -1.0, 1.0)
    r_noisy = r + cfg.sensing_noise.W_00 * u[0]
    b_noisy = beta + cfg.sensing_noise.W_11 * u[1]
    ids = jnp.arange(n_cap, dtype=jnp.int32)

    n_visible = jnp.sum(vis.astype(jnp.int32))
    if k >= n_cap:
        meas = Measurements(
            ids=jnp.where(vis, ids, -1),
            r=r_noisy,
            b=b_noisy,
            valid=vis,
            overflow=jnp.asarray(False),
        )
    else:
        # Stable compaction: visible slots first, preserving ascending-id order.
        order = jnp.argsort(jnp.where(vis, ids, ids + n_cap))
        take = order[:k]
        keep = vis[take]
        meas = Measurements(
            ids=jnp.where(keep, ids[take], -1),
            r=r_noisy[take],
            b=b_noisy[take],
            valid=keep,
            overflow=n_visible > k,
        )
    return meas


def sim_step(cfg: Config, world: WorldState, cmd, key):
    """One sim tick: truth moves under the noisy command, then senses.

    Mirrors the reference ordering exactly: the measurement a filter receives
    alongside command t was generated *after* the truth moved by (noisy)
    command t (sim_node.py:209-250).
    """
    k_move, k_sense = jax.random.split(key)
    new_pose = propagate_truth(cfg, world.pose, cmd, k_move)
    new_world = world.replace(pose=new_pose)
    meas = sense(cfg, new_world, new_pose, k_sense)
    return new_world, meas
