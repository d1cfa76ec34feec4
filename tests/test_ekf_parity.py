"""Golden parity: padded fixed-capacity EKF vs the reference-equation oracle."""

import numpy as np
import jax.numpy as jnp
import pytest

from live_ekf_slam_tpu.config import CompatConfig, Config
from live_ekf_slam_tpu.core.types import Measurements
from live_ekf_slam_tpu.models import ekf

from oracle import EKFOracle

N_CAP = 6


def _cfg(compat=True, id_known=True):
    cfg = Config(num_iterations=60).replace(
        num_landmark_slots=N_CAP, num_meas_slots=N_CAP
    )
    if compat:
        cfg = cfg.replace(compat=CompatConfig.all_on())
    mc = cfg.constraints.measurements.__class__(
        landmark_id_is_known=id_known, min_landmark_separation=0.1
    )
    cfg = cfg.replace(
        constraints=cfg.constraints.__class__(
            commands=cfg.constraints.commands,
            vision=cfg.constraints.vision,
            measurements=mc,
        )
    )
    return cfg


def _oracle(cfg, id_known=True):
    (v00, v11), (w00, w11) = cfg.filter_noise()
    return EKFOracle(
        0.0, 0.0, 0.0,
        V=(v00, v11), W=(w00, w11),
        id_known=id_known,
        min_sep=cfg.constraints.measurements.min_landmark_separation,
        stale_landmarks=cfg.compat.ekf_stale_landmarks,
        unwrapped_innovation=cfg.compat.ekf_unwrapped_innovation,
    )


def _random_script(rng, n_ticks, n_lms, id_known=True):
    """Random commands + plausible measurement sets with consistent geometry."""
    lms = rng.uniform(-4, 4, size=(n_lms, 2))
    pose = np.zeros(3)
    script = []
    for _ in range(n_ticks):
        cmd = (rng.uniform(0, 0.1), rng.uniform(-0.05, 0.05))
        pose = np.array(
            [
                pose[0] + cmd[0] * np.cos(pose[2]),
                pose[1] + cmd[0] * np.sin(pose[2]),
                pose[2] + cmd[1],
            ]
        )
        meas = []
        for lid in range(n_lms):
            dx, dy = lms[lid] - pose[:2]
            r = np.hypot(dx, dy)
            b = np.arctan2(dy, dx) - pose[2]
            b = np.arctan2(np.sin(b), np.cos(b))
            if r < 3.0 and rng.random() < 0.7:
                meas.append(
                    (lid, r + rng.uniform(-0.01, 0.01), b + rng.uniform(-0.01, 0.01))
                )
        script.append((cmd, meas))
    return script


def _to_slots(meas, k):
    ids = np.full(k, -1, np.int32)
    r = np.zeros(k, np.float32)
    b = np.zeros(k, np.float32)
    valid = np.zeros(k, bool)
    for j, (mid, rr, bb) in enumerate(meas):
        ids[j], r[j], b[j], valid[j] = mid, rr, bb, True
    return Measurements(
        ids=jnp.asarray(ids),
        r=jnp.asarray(r),
        b=jnp.asarray(b),
        valid=jnp.asarray(valid),
        overflow=jnp.asarray(False),
    )


@pytest.mark.parametrize("id_known", [True, False])
@pytest.mark.parametrize("compat", [True, False])
def test_trajectory_parity(compat, id_known):
    rng = np.random.default_rng(7 if compat else 8)
    cfg = _cfg(compat=compat, id_known=id_known)
    oracle = _oracle(cfg, id_known=id_known)
    s = ekf.init(cfg)
    script = _random_script(rng, n_ticks=40, n_lms=N_CAP, id_known=id_known)
    for cmd, meas in script:
        oracle.update(cmd, meas)
        s = ekf.update(cfg, s, jnp.asarray(cmd, jnp.float32), _to_slots(meas, N_CAP))

    m = int(s.M)
    assert m == oracle.M
    assert [int(i) for i in np.asarray(s.ids)[:m]] == oracle.lm_ids
    n_active = 3 + 2 * m
    np.testing.assert_allclose(
        np.asarray(s.x)[:n_active], oracle.x_t, atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(s.P)[:n_active, :n_active], oracle.P_t, atol=2e-3
    )


def test_single_step_parity_tight():
    """Many independent single-step comparisons from the same start state —
    no error accumulation, tight tolerance."""
    rng = np.random.default_rng(11)
    cfg = _cfg(compat=True)
    for trial in range(10):
        oracle = _oracle(cfg)
        s = ekf.init(cfg)
        # one insertion tick then one update tick
        script = _random_script(rng, n_ticks=2, n_lms=4)
        for cmd, meas in script:
            oracle.update(cmd, meas)
            s = ekf.update(cfg, s, jnp.asarray(cmd, jnp.float32), _to_slots(meas, N_CAP))
        m = int(s.M)
        n_active = 3 + 2 * m
        np.testing.assert_allclose(
            np.asarray(s.x)[:n_active], oracle.x_t, atol=5e-5
        )
        np.testing.assert_allclose(
            np.asarray(s.P)[:n_active, :n_active], oracle.P_t, atol=5e-5
        )


def test_no_measurement_is_pure_predict():
    cfg = _cfg(compat=True)
    oracle = _oracle(cfg)
    s = ekf.init(cfg)
    cmd = (0.05, 0.01)
    oracle.update(cmd, [])
    s = ekf.update(cfg, s, jnp.asarray(cmd, jnp.float32), _to_slots([], N_CAP))
    np.testing.assert_allclose(np.asarray(s.x)[:3], oracle.x_t, atol=1e-6)
    np.testing.assert_allclose(np.asarray(s.P)[:3, :3], oracle.P_t, atol=1e-6)
    assert int(s.M) == 0


def test_inactive_slots_stay_inert():
    """Padded slots must not leak into active covariance blocks."""
    rng = np.random.default_rng(3)
    cfg = _cfg(compat=True)
    s = ekf.init(cfg)
    script = _random_script(rng, n_ticks=20, n_lms=3)
    for cmd, meas in script:
        s = ekf.update(cfg, s, jnp.asarray(cmd, jnp.float32), _to_slots(meas, N_CAP))
    assert np.isfinite(np.asarray(s.x)).all()
    assert np.isfinite(np.asarray(s.P)).all()
    m = int(s.M)
    assert 1 <= m <= 3
    # slots beyond M stay untouched
    assert (np.asarray(s.ids)[m:] == -1).all()
