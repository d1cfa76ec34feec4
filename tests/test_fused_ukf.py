"""Parity tests for the Pallas fused sim+UKF rollout kernel.

The kernel is replayed (interpret mode, injected noise) against the XLA UKF
path (models/ukf.py) configured with the identical pivot-clamped Cholesky
sigma-point sqrt (UKFConfig.sigma_sqrt="chol"); the XLA path itself is
parity-tested against the reference-equation float64 oracle in
test_ukf_parity.py. Measurements are fed to the XLA path in id order, the
order the kernel's slot=id loop processes them.
"""

import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from live_ekf_slam_tpu.config import CompatConfig, Config
from live_ekf_slam_tpu.core.types import Measurements
from live_ekf_slam_tpu.models import ukf
from live_ekf_slam_tpu.ops.fused_ukf import fused_ukf_rollout
from live_ekf_slam_tpu.sim import maps as sim_maps

B, T, N = 6, 25, 5


def _setup(seed=7, compat=False, noise_mean=False):
    cfg = Config(num_iterations=T).replace(
        num_landmark_slots=N, num_meas_slots=N
    )
    if compat:
        cfg = cfg.replace(compat=CompatConfig.all_on())
    if noise_mean:
        # nonzero filter-side noise means exercise the kernel's w_r offset
        # and constant-w_b bearing-rotation branch (ekf.cpp:130-131 analog)
        cfg = cfg.replace(
            sensing_noise=cfg.sensing_noise.__class__(
                W_00=cfg.sensing_noise.W_00, W_11=cfg.sensing_noise.W_11,
                w_r=0.01, w_b=0.02,
            )
        )
    cfg = cfg.replace(
        # bound=3 packs the landmarks around the short test trajectory so
        # several are visible (and updated) simultaneously
        map=cfg.map.__class__(num_landmarks=N, bound=3.0),
        ukf=cfg.ukf.__class__(W_0=cfg.ukf.W_0, sigma_sqrt="chol"),
    )
    rng = np.random.default_rng(seed)
    lms = sim_maps.random_landmarks_batched(cfg, rng, B)
    t_arr = np.arange(T, dtype=np.float32)
    cmds = np.stack([0.08 + 0 * t_arr, 0.02 * np.sin(t_arr / 5)], axis=-1)
    cmds = np.broadcast_to(cmds[None], (B, T, 2)).copy()
    noise = rng.uniform(-1, 1, size=(T, 2 * N + 8, B)).astype(np.float32)
    return cfg, lms, cmds, noise


def _sim_measurements(cfg, lms_w, cmds_w, noise_w):
    """Float64 replay of the kernel's in-kernel simulator: per-tick true pose
    and id-sorted (id, r, b) measurement lists."""
    v00, v11 = cfg.process_noise.V_00, cfg.process_noise.V_11
    w00, w11 = cfg.sensing_noise.W_00, cfg.sensing_noise.W_11
    pose = np.array(cfg.init_pose, np.float64)
    poses, measlists = [], []
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
        poses.append(pose.copy())
        measlists.append(meas)
    return poses, measlists


def _xla_run(cfg, lms_w, cmds_w, noise_w, slam):
    poses, measlists = _sim_measurements(cfg, lms_w, cmds_w, noise_w)
    s = ukf.init(cfg, slam)
    true_map = None if slam else jnp.asarray(lms_w, jnp.float32)
    step = jax.jit(
        lambda s, cmd, m: ukf.update(cfg, s, cmd, m, slam, true_map=true_map)
    )
    err_sum = 0.0
    n_slots = cfg.num_meas_slots
    for t in range(T):
        meas = measlists[t]
        ids = np.full(n_slots, -1, np.int32)
        r = np.zeros(n_slots, np.float32)
        b = np.zeros(n_slots, np.float32)
        valid = np.zeros(n_slots, bool)
        for k, (mid, mr, mb) in enumerate(meas):
            ids[k], r[k], b[k], valid[k] = mid, mr, mb, True
        m = Measurements(
            ids=jnp.asarray(ids), r=jnp.asarray(r), b=jnp.asarray(b),
            valid=jnp.asarray(valid), overflow=jnp.asarray(False),
        )
        s = step(s, jnp.asarray(cmds_w[t], jnp.float32), m)
        xs = np.asarray(s.x)
        err_sum += math.hypot(xs[0] - poses[t][0], xs[1] - poses[t][1])
    return s, poses[-1], err_sum


@pytest.mark.parametrize(
    "slam,noise_mean",
    [(True, False), (False, False), (True, True)],
    ids=["slam", "loc", "slam-noise-mean"],
)
def test_fused_ukf_matches_xla_chol_path(slam, noise_mean):
    cfg, lms, cmds, noise = _setup(noise_mean=noise_mean)
    out = fused_ukf_rollout(
        cfg, jnp.asarray(lms), jnp.asarray(cmds), 0, slam=slam,
        block_worlds=B, interpret=True, noise=jnp.asarray(noise),
    )
    xs = np.asarray(out["x"])
    ps = np.asarray(out["P"])
    errs = np.asarray(out["err_sum"])
    seen = np.asarray(out["seen"])
    truth = np.asarray(out["true_pose"])
    if slam:
        # the dense test map must actually exercise multi-landmark SLAM
        assert seen.sum(axis=1).max() >= 2, "test map saw <2 landmarks"

    for w in range(B):
        s, pose, err_sum = _xla_run(cfg, lms[w], cmds[w], noise[:, :, w], slam)
        np.testing.assert_allclose(truth[w], pose, atol=1e-4)
        assert abs(errs[w] - err_sum) < 2e-3 * max(err_sum, 1.0)
        sx = np.asarray(s.x)
        # vehicle state
        np.testing.assert_allclose(xs[w][:4], sx[:4], atol=5e-4)
        if slam:
            ids = np.asarray(s.ids)[: int(s.M)]
            assert set(ids.tolist()) == set(np.where(seen[w])[0].tolist())
            # landmark estimates through the id->slot permutation
            for k, mid in enumerate(ids.tolist()):
                np.testing.assert_allclose(
                    xs[w][4 + 2 * mid: 6 + 2 * mid],
                    sx[4 + 2 * k: 6 + 2 * k],
                    atol=5e-4,
                )
            # covariance vehicle block
            np.testing.assert_allclose(
                ps[w][:4, :4], np.asarray(s.P)[:4, :4], atol=5e-4
            )


def test_sharded_fused_ukf_matches_single_device():
    """shard_map over the 8-device mesh: per-device kernels, identical
    output (injected noise, so per-device PRNG decorrelation is inert)."""
    from live_ekf_slam_tpu.ops.fused_ukf import fused_ukf_rollout_sharded
    from live_ekf_slam_tpu.parallel import mesh as pmesh

    cfg, lms, cmds, noise = _setup()
    b16 = 16
    reps = -(-b16 // B)
    lms2 = np.concatenate([lms] * reps)[:b16]
    cmds2 = np.concatenate([cmds] * reps)[:b16]
    noise2 = np.concatenate([noise] * reps, axis=2)[:, :, :b16]
    mesh = pmesh.make_mesh(8)
    out_sh = fused_ukf_rollout_sharded(
        cfg, jnp.asarray(lms2), jnp.asarray(cmds2), 0, mesh, slam=True,
        block_worlds=2, interpret=True, noise=jnp.asarray(noise2),
    )
    out_1 = fused_ukf_rollout(
        cfg, jnp.asarray(lms2), jnp.asarray(cmds2), 0, slam=True,
        block_worlds=2, interpret=True, noise=jnp.asarray(noise2),
    )
    for key in ("err_sum", "x", "seen"):
        np.testing.assert_array_equal(
            np.asarray(out_sh[key]), np.asarray(out_1[key])
        )


def test_fused_ukf_compat_quirks():
    """Zero-bearing-mean + committed-yaw compat flags run and stay finite."""
    cfg, lms, cmds, noise = _setup(compat=True)
    out = fused_ukf_rollout(
        cfg, jnp.asarray(lms), jnp.asarray(cmds), 0, slam=True,
        block_worlds=B, interpret=True, noise=jnp.asarray(noise),
    )
    for v in out.values():
        assert np.isfinite(np.asarray(v)).all()
