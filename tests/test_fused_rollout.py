"""Parity tests for the Pallas fused sim+EKF rollout kernel.

The kernel runs in interpret mode on the CPU backend with an injected noise
array (the in-kernel TPU PRNG has no CPU lowering), replaying the exact same
noise through a numpy float64 simulation + the reference-equation EKF oracle.
Kernel landmark slots are pinned to ids; the oracle's discovery-order state is
compared through the id permutation (the EKF is permutation-equivariant).
"""

import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from live_ekf_slam_tpu.config import CompatConfig, Config
from live_ekf_slam_tpu.ops.fused_rollout import fused_ekf_rollout
from live_ekf_slam_tpu.sim import maps as sim_maps

from oracle import EKFOracle

B, T, N = 8, 25, 5


def _setup(seed=5, compat=False):
    cfg = Config(num_iterations=T).replace(
        num_landmark_slots=N, num_meas_slots=N
    )
    if compat:
        cfg = cfg.replace(compat=CompatConfig.all_on())
    cfg = cfg.replace(map=cfg.map.__class__(num_landmarks=N))
    rng = np.random.default_rng(seed)
    lms = sim_maps.random_landmarks_batched(cfg, rng, B)
    t_arr = np.arange(T, dtype=np.float32)
    cmds = np.stack(
        [0.08 + 0 * t_arr, 0.02 * np.sin(t_arr / 5)], axis=-1
    )
    cmds = np.broadcast_to(cmds[None], (B, T, 2)).copy()
    noise = rng.uniform(-1, 1, size=(T, 2 * N + 8, B)).astype(np.float32)
    return cfg, lms, cmds, noise


def _oracle_run(cfg, lms_w, cmds_w, noise_w):
    v00, v11 = cfg.process_noise.V_00, cfg.process_noise.V_11
    w00, w11 = cfg.sensing_noise.W_00, cfg.sensing_noise.W_11
    (v00f, v11f), (w00f, w11f) = cfg.filter_noise()
    o = EKFOracle(
        0, 0, 0, V=(v00f, v11f), W=(w00f, w11f),
        stale_landmarks=cfg.compat.ekf_stale_landmarks,
        unwrapped_innovation=cfg.compat.ekf_unwrapped_innovation,
    )
    pose = np.zeros(3)
    err_sum = 0.0
    for t in range(T):
        u = noise_w[t].astype(np.float64)
        d = np.clip(cmds_w[t, 0] + v00 * u[0], 0, cfg.constraints.commands.d_max)
        h = np.clip(
            cmds_w[t, 1] + v11 * u[1],
            -cfg.constraints.commands.th_max,
            cfg.constraints.commands.th_max,
        )
        pose = np.array(
            [
                pose[0] + d * math.cos(pose[2]),
                pose[1] + d * math.sin(pose[2]),
                pose[2] + h,
            ]
        )
        meas = []
        for j in range(N):
            dx, dy = lms_w[j] - pose[:2]
            r = math.hypot(dx, dy)
            beta = math.remainder(math.atan2(dy, dx) - pose[2], 2 * math.pi)
            if (
                r <= cfg.constraints.vision.range_max
                and cfg.constraints.vision.fov_min
                < beta
                < cfg.constraints.vision.fov_max
            ):
                meas.append((j, r + w00 * u[2 + j], beta + w11 * u[2 + N + j]))
        o.update((cmds_w[t, 0], cmds_w[t, 1]), meas)
        err_sum += math.hypot(o.x_t[0] - pose[0], o.x_t[1] - pose[1])
    return o, pose, err_sum


@pytest.mark.parametrize("compat", [False, True])
def test_fused_rollout_matches_oracle_with_replayed_noise(compat):
    cfg, lms, cmds, noise = _setup(compat=compat)
    out = fused_ekf_rollout(
        cfg,
        jnp.asarray(lms),
        jnp.asarray(cmds),
        0,
        block_worlds=B,
        noise=jnp.asarray(noise),
        interpret=True,
    )
    xs = np.asarray(out["x"])
    errs = np.asarray(out["err_sum"])
    seen = np.asarray(out["seen"])
    truth = np.asarray(out["true_pose"])

    for w in range(B):
        o, pose, err_sum = _oracle_run(cfg, lms[w], cmds[w], noise[:, :, w])
        np.testing.assert_allclose(truth[w], pose, atol=1e-4)
        assert abs(errs[w] - err_sum) < 1e-3 * max(err_sum, 1.0)
        assert set(o.lm_ids) == set(np.where(seen[w])[0])
        perm = [0, 1, 2]
        for sl in range(o.M):
            perm += [3 + 2 * o.lm_ids[sl], 4 + 2 * o.lm_ids[sl]]
        np.testing.assert_allclose(
            xs[w][np.array(perm)], o.x_t, atol=2e-4
        )


def test_sharded_fused_rollout_matches_single_device():
    """shard_map over the 8-device mesh: per-device kernels, identical output."""
    from live_ekf_slam_tpu.ops.fused_rollout import fused_ekf_rollout_sharded
    from live_ekf_slam_tpu.parallel import mesh as pmesh

    cfg, lms, cmds, noise = _setup()
    B16 = 16
    lms2 = np.concatenate([lms, lms])[:B16]
    cmds2 = np.concatenate([cmds, cmds])[:B16]
    noise2 = np.concatenate([noise, noise], axis=2)[:, :, :B16]
    mesh = pmesh.make_mesh(8)
    out_sh = fused_ekf_rollout_sharded(
        cfg, jnp.asarray(lms2), jnp.asarray(cmds2), 0, mesh,
        block_worlds=2, interpret=True, noise=jnp.asarray(noise2),
    )
    out_1 = fused_ekf_rollout(
        cfg, jnp.asarray(lms2), jnp.asarray(cmds2), 0,
        block_worlds=2, interpret=True, noise=jnp.asarray(noise2),
    )
    np.testing.assert_array_equal(
        np.asarray(out_sh["err_sum"]), np.asarray(out_1["err_sum"])
    )
    np.testing.assert_array_equal(
        np.asarray(out_sh["x"]), np.asarray(out_1["x"])
    )


def _iekf_xla_run(cfg, lms_w, cmds_w, noise_w):
    """Replay the kernel's in-kernel sim in float64 and drive the XLA
    RI-EKF (models/iekf.py, itself dense-oracle-parity-tested) with the
    id-ordered measurement lists."""
    from live_ekf_slam_tpu.core.types import Measurements
    from live_ekf_slam_tpu.models import iekf

    v00, v11 = cfg.process_noise.V_00, cfg.process_noise.V_11
    w00, w11 = cfg.sensing_noise.W_00, cfg.sensing_noise.W_11
    s = iekf.init(cfg)
    step = jax.jit(lambda s, cmd, m: iekf.update(cfg, s, cmd, m))
    pose = np.array(cfg.init_pose, np.float64)
    err_sum = 0.0
    for t in range(T):
        u = noise_w[t].astype(np.float64)
        d = np.clip(cmds_w[t, 0] + v00 * u[0], 0,
                    cfg.constraints.commands.d_max)
        h = np.clip(
            cmds_w[t, 1] + v11 * u[1],
            -cfg.constraints.commands.th_max,
            cfg.constraints.commands.th_max,
        )
        pose = np.array(
            [pose[0] + d * math.cos(pose[2]),
             pose[1] + d * math.sin(pose[2]), pose[2] + h]
        )
        ids = np.full(N, -1, np.int32)
        r = np.zeros(N, np.float32)
        b = np.zeros(N, np.float32)
        valid = np.zeros(N, bool)
        k = 0
        for j in range(N):
            dx, dy = lms_w[j] - pose[:2]
            rr = math.hypot(dx, dy)
            beta = math.remainder(math.atan2(dy, dx) - pose[2], 2 * math.pi)
            if (
                rr <= cfg.constraints.vision.range_max
                and cfg.constraints.vision.fov_min
                < beta
                < cfg.constraints.vision.fov_max
            ):
                ids[k] = j
                r[k] = rr + w00 * u[2 + j]
                b[k] = beta + w11 * u[2 + N + j]
                valid[k] = True
                k += 1
        m = Measurements(
            ids=jnp.asarray(ids), r=jnp.asarray(r), b=jnp.asarray(b),
            valid=jnp.asarray(valid), overflow=jnp.asarray(False),
        )
        s = step(s, jnp.asarray(cmds_w[t], jnp.float32), m)
        xs = np.asarray(s.x)
        err_sum += math.hypot(xs[0] - pose[0], xs[1] - pose[1])
    return s, pose, err_sum


def test_fused_iekf_matches_xla_model():
    from live_ekf_slam_tpu.ops.fused_rollout import fused_iekf_rollout

    cfg, lms, cmds, noise = _setup()
    out = fused_iekf_rollout(
        cfg, jnp.asarray(lms), jnp.asarray(cmds), 0,
        block_worlds=B, interpret=True, noise=jnp.asarray(noise),
    )
    xs = np.asarray(out["x"])
    ps = np.asarray(out["P"])
    errs = np.asarray(out["err_sum"])
    seen = np.asarray(out["seen"])
    truth = np.asarray(out["true_pose"])
    assert seen.sum(axis=1).max() >= 2, "test maps saw <2 landmarks"

    for w in range(B):
        s, pose, err_sum = _iekf_xla_run(cfg, lms[w], cmds[w], noise[:, :, w])
        np.testing.assert_allclose(truth[w], pose, atol=1e-4)
        assert abs(errs[w] - err_sum) < 2e-3 * max(err_sum, 1.0)
        sx = np.asarray(s.x)
        np.testing.assert_allclose(xs[w][:3], sx[:3], atol=5e-4)
        ids = np.asarray(s.ids)[: int(s.M)]
        assert set(ids.tolist()) == set(np.where(seen[w])[0].tolist())
        for sl, mid in enumerate(ids.tolist()):
            np.testing.assert_allclose(
                xs[w][3 + 2 * mid:5 + 2 * mid],
                sx[3 + 2 * sl:5 + 2 * sl],
                atol=5e-4,
            )
        np.testing.assert_allclose(
            ps[w][:3, :3], np.asarray(s.P)[:3, :3], atol=5e-4
        )
