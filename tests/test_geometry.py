import math

import numpy as np
import jax.numpy as jnp

from live_ekf_slam_tpu.utils.geometry import (
    wrap_angle,
    se2_between,
    se2_compose,
    range_bearing,
    project_measurement,
)


def test_wrap_angle_matches_c_remainder():
    rng = np.random.default_rng(0)
    ts = rng.uniform(-30, 30, size=200)
    ours = np.asarray(wrap_angle(jnp.asarray(ts)))
    ref = np.array([math.remainder(t, 2 * math.pi) for t in ts])
    # both wrap to (-pi, pi]; compare on the circle
    d = np.abs(np.angle(np.exp(1j * (ours - ref))))
    assert d.max() < 1e-5


def test_se2_roundtrip():
    a = jnp.array([1.0, 2.0, 0.7])
    b = jnp.array([-0.5, 0.3, -1.2])
    rel = se2_between(a, b)
    b2 = se2_compose(a, rel)
    np.testing.assert_allclose(np.asarray(b2), np.asarray(b), atol=1e-6)


def test_range_bearing_project_inverse():
    pose = jnp.array([0.5, -1.0, 0.3])
    pt = jnp.array([2.0, 1.5])
    r, b = range_bearing(pose, pt)
    back = project_measurement(pose, r, b)
    np.testing.assert_allclose(np.asarray(back), np.asarray(pt), atol=1e-6)
