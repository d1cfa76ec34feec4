"""Right-invariant EKF-SLAM (models/iekf.py) tests.

1. Parity vs a float64 DENSE oracle that builds the full G / H / insertion
   matrices explicitly (structurally different from the model's masked
   rank-1/one-hot algebra, so shared algebra bugs can't cancel).
2. Masked no-op exactness: an all-invalid measurement tick is bitwise
   identical to pure prediction.
3. End-to-end accuracy: comparable to EKF-SLAM and better than naive
   dead-reckoning at high noise.
"""

import math

import numpy as np
import jax
import jax.numpy as jnp

from live_ekf_slam_tpu.config import Config
from live_ekf_slam_tpu.core.types import Measurements
from live_ekf_slam_tpu.models import iekf

T, N = 40, 5


def _cfg():
    cfg = Config(num_iterations=T).replace(
        num_landmark_slots=N, num_meas_slots=N
    )
    return cfg.replace(map=cfg.map.__class__(num_landmarks=N, bound=3.0))


# ---------------------------------------------------------------------------
# float64 dense oracle
# ---------------------------------------------------------------------------


def _rot(t):
    c, s = math.cos(t), math.sin(t)
    return np.array([[c, -s], [s, c]])


def _wrap(t):
    return math.remainder(t, 2 * math.pi)


class Oracle:
    """Dense dynamically-sized RI-EKF; same equations, different structure."""

    def __init__(self, cfg):
        self.x = np.array(cfg.init_pose, np.float64)  # (x, y, th)
        self.lms = []  # list of (id, np.array([x, y]))
        self.P = np.diag([0.01 ** 2, 0.01 ** 2, 0.005 ** 2])
        (self.v00, self.v11), (self.w00, self.w11) = cfg.filter_noise()
        pn = cfg.process_noise
        self.v_d, self.v_th = pn.v_d, pn.v_th

    @property
    def dim(self):
        return 3 + 2 * len(self.lms)

    def predict(self, cmd):
        d, a = float(cmd[0]), float(cmd[1])
        th = self.x[2]
        g_d = np.zeros(self.dim)
        g_d[:2] = [math.cos(th), math.sin(th)]
        g_a = np.zeros(self.dim)
        g_a[0] = d * math.sin(th) + self.x[1]
        g_a[1] = -d * math.cos(th) - self.x[0]
        g_a[2] = 1.0
        for k, (_, p) in enumerate(self.lms):
            g_a[3 + 2 * k] = p[1]
            g_a[4 + 2 * k] = -p[0]
        g = np.stack([g_d, g_a], axis=1)
        self.P = self.P + g @ np.diag([self.v00, self.v11]) @ g.T
        self.x = np.array(
            [
                self.x[0] + (d + self.v_d) * math.cos(th),
                self.x[1] + (d + self.v_d) * math.sin(th),
                _wrap(th + a + self.v_th),
            ]
        )

    def _rtil(self, r, b):
        th = self.x[2]
        jpc = np.array(
            [[math.cos(b), -r * math.sin(b)], [math.sin(b), r * math.cos(b)]]
        )
        jr = _rot(th) @ jpc
        return jr @ np.diag([self.w00, self.w11]) @ jr.T

    def update_one(self, mid, r, b):
        th = self.x[2]
        y_w = _rot(th) @ np.array([r * math.cos(b), r * math.sin(b)])
        rtil = self._rtil(r, b)
        idx = [k for k, (i, _) in enumerate(self.lms) if i == mid]
        if not idx:
            # insertion: rows copy vehicle-position rows + fresh noise corner
            d0 = self.dim
            a_mat = np.zeros((d0 + 2, d0))
            a_mat[:d0, :d0] = np.eye(d0)
            a_mat[d0:, 0:2] = np.eye(2)
            b_mat = np.zeros((d0 + 2, 2))
            b_mat[d0:] = np.eye(2)
            self.P = a_mat @ self.P @ a_mat.T + b_mat @ rtil @ b_mat.T
            self.lms.append((mid, self.x[:2] + y_w))
            return
        k = idx[0]
        li = 3 + 2 * k
        d0 = self.dim
        h = np.zeros((2, d0))
        h[:, 0:2] = -np.eye(2)
        h[:, li:li + 2] = np.eye(2)
        lm = self.lms[k][1]
        nu = y_w - (lm - self.x[:2])
        s = h @ self.P @ h.T + rtil
        kk = self.P @ h.T @ np.linalg.inv(s)
        xi = kk @ nu
        self.P = (np.eye(d0) - kk @ h) @ self.P
        # retraction X <- exp(xi) X
        dth = xi[2]
        rr = _rot(dth)
        if abs(dth) < 1e-12:
            vv = np.eye(2)
        else:
            vv = np.array(
                [
                    [math.sin(dth) / dth, -(1 - math.cos(dth)) / dth],
                    [(1 - math.cos(dth)) / dth, math.sin(dth) / dth],
                ]
            )
        self.x[:2] = vv @ xi[0:2] + rr @ self.x[:2]
        self.x[2] = _wrap(self.x[2] + dth)
        self.lms = [
            (i, vv @ xi[3 + 2 * j:5 + 2 * j] + rr @ p)
            for j, (i, p) in enumerate(self.lms)
        ]

    def update(self, cmd, meas_list):
        self.predict(cmd)
        for mid, r, b in meas_list:
            self.update_one(mid, r, b)


def _simulate(cfg, seed):
    """Float64 world sim emitting (cmd, id-sorted measurement list) per tick."""
    rng = np.random.default_rng(seed)
    lms = rng.uniform(-3, 3, (N, 2))
    pose = np.array(cfg.init_pose, np.float64)
    ticks = []
    for t in range(T):
        cmd = (0.08, 0.02 * math.sin(t / 5))
        d = np.clip(
            cmd[0] + cfg.process_noise.V_00 * rng.uniform(-1, 1),
            0, cfg.constraints.commands.d_max,
        )
        h = np.clip(
            cmd[1] + cfg.process_noise.V_11 * rng.uniform(-1, 1),
            -cfg.constraints.commands.th_max, cfg.constraints.commands.th_max,
        )
        pose = np.array(
            [pose[0] + d * math.cos(pose[2]), pose[1] + d * math.sin(pose[2]),
             pose[2] + h]
        )
        meas = []
        for j in range(N):
            dx, dy = lms[j] - pose[:2]
            r = math.hypot(dx, dy)
            beta = math.remainder(math.atan2(dy, dx) - pose[2], 2 * math.pi)
            if (
                r <= cfg.constraints.vision.range_max
                and cfg.constraints.vision.fov_min
                < beta
                < cfg.constraints.vision.fov_max
            ):
                meas.append(
                    (j, r + cfg.sensing_noise.W_00 * rng.uniform(-1, 1),
                     beta + cfg.sensing_noise.W_11 * rng.uniform(-1, 1))
                )
        ticks.append((cmd, meas))
    return ticks


def test_iekf_matches_dense_oracle():
    cfg = _cfg()
    ticks = _simulate(cfg, seed=3)
    assert any(len(m) >= 2 for _, m in ticks), "sim must co-observe landmarks"

    s = iekf.init(cfg)
    step = jax.jit(lambda s, cmd, m: iekf.update(cfg, s, cmd, m))
    o = Oracle(cfg)
    for cmd, meas in ticks:
        ids = np.full(N, -1, np.int32)
        r = np.zeros(N, np.float32)
        b = np.zeros(N, np.float32)
        valid = np.zeros(N, bool)
        for k, (mid, mr, mb) in enumerate(meas):
            ids[k], r[k], b[k], valid[k] = mid, mr, mb, True
        m = Measurements(
            ids=jnp.asarray(ids), r=jnp.asarray(r), b=jnp.asarray(b),
            valid=jnp.asarray(valid), overflow=jnp.asarray(False),
        )
        s = step(s, jnp.asarray(cmd, jnp.float32), m)
        o.update(np.asarray(cmd), meas)

    xs = np.asarray(s.x)
    np.testing.assert_allclose(xs[:3], o.x, atol=2e-4)
    assert int(s.M) == len(o.lms)
    slot_of_id = {i: k for k, (i, _) in enumerate(o.lms)}
    ids = np.asarray(s.ids)[: int(s.M)]
    ps = np.asarray(s.P)
    for sl, mid in enumerate(ids.tolist()):
        np.testing.assert_allclose(
            xs[3 + 2 * sl:5 + 2 * sl], o.lms[slot_of_id[mid]][1], atol=2e-4
        )
    # covariance vehicle block (invariant coordinates)
    np.testing.assert_allclose(ps[:3, :3], o.P[:3, :3], atol=2e-4)


def test_iekf_masked_noop_is_pure_predict():
    cfg = _cfg()
    s = iekf.init(cfg)
    cmd = jnp.asarray([0.08, 0.01], jnp.float32)
    empty = Measurements(
        ids=jnp.full(N, -1, jnp.int32), r=jnp.zeros(N, jnp.float32),
        b=jnp.zeros(N, jnp.float32), valid=jnp.zeros(N, bool),
        overflow=jnp.asarray(False),
    )
    out = iekf.update(cfg, s, cmd, empty)
    x_pred, p_pred = iekf.predict(cfg, s, cmd)
    np.testing.assert_array_equal(np.asarray(out.x), np.asarray(x_pred))
    np.testing.assert_array_equal(
        np.asarray(out.P), np.asarray(0.5 * (p_pred + p_pred.T))
    )
    assert int(out.M) == 0


def test_iekf_end_to_end_accuracy():
    """High noise, 12 worlds x 150 ticks: RI-EKF beats naive dead-reckoning
    and lands in the same accuracy class as the standard EKF."""
    from live_ekf_slam_tpu.eval.runner import run_monte_carlo

    base = Config(num_iterations=150).replace(
        num_landmark_slots=8, num_meas_slots=8
    )
    base = base.replace(map=base.map.__class__(num_landmarks=8))
    means = {}
    for filt in ("iekf_slam", "ekf_slam", "naive"):
        cfg = base.replace(filter=filt)
        res, _, _ = run_monte_carlo(cfg, jax.random.PRNGKey(5), 12, seed=5)
        err = np.asarray(res["err_" + filt])
        div = np.asarray(res["diverged_" + filt])
        assert not div.any(), f"{filt} diverged"
        means[filt] = float(err.mean())
    assert means["iekf_slam"] < means["naive"]
    assert means["iekf_slam"] < 3.0 * means["ekf_slam"]
    assert np.isfinite(means["iekf_slam"])


def test_iekf_consistency_advantage(tmp_path):
    """Drift regime (sparse sightings + strong heading noise): standard
    EKF-SLAM's NEES drifts upward over the run while the RI-EKF's stays
    near the 3-dof expectation (scripts/consistency.py at small scale)."""
    import json
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = tmp_path / "consistency.json"
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    subprocess.run(
        [sys.executable, os.path.join(repo, "scripts", "consistency.py"),
         "--worlds", "8", "--t", "700", "--slots", "6",
         "--regime", "drift", "--out", str(out)],
        check=True, env=env, cwd=repo, timeout=540,
    )
    res = json.load(open(out))["filters"]
    ekf_late = res["ekf_slam"]["nees_late_third"]
    iekf_late = res["iekf_slam"]["nees_late_third"]
    assert iekf_late < 8.0, f"RI-EKF late NEES should stay near 3: {iekf_late}"
    assert ekf_late > 1.5 * iekf_late, (
        f"expected EKF NEES drift above RI-EKF: {ekf_late} vs {iekf_late}"
    )


def test_iekf_long_horizon_fp32_stability():
    """T=1000 full-length rollout: the invariant update's retraction and
    rank-1 predict stay finite and accurate in fp32 (the EKF kernel needed
    a specific HP spelling for this; the IEKF's constant-H algebra has no
    such hazard, but lock it in)."""
    from live_ekf_slam_tpu.eval.runner import run_monte_carlo

    cfg = Config(num_iterations=1000).replace(
        num_landmark_slots=8, num_meas_slots=8, filter="iekf_slam"
    )
    cfg = cfg.replace(map=cfg.map.__class__(num_landmarks=8))
    res, _, _ = run_monte_carlo(cfg, jax.random.PRNGKey(11), 4, seed=11)
    err = np.asarray(res["err_iekf_slam"])
    div = np.asarray(res["diverged_iekf_slam"])
    assert not div.any()
    assert np.isfinite(err).all()
    assert err.mean() < 0.5, f"long-run drift too large: {err}"
