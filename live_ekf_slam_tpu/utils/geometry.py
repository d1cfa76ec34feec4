"""SE(2) / angle utilities shared by the simulator, filters and planners.

The reference wraps every heading with C's ``remainder(theta, 2*pi)``
(ekf.cpp:59,129,139; sim_node.py:128,237; filter.h:347). IEEE remainder is
exactly ``theta - 2*pi*rint(theta / (2*pi))`` with round-half-to-even, which
is what ``jnp.round`` implements — so the formula below matches the C
semantics bit-for-bit up to fp32 rounding, is branch-free, and costs one
multiply-round-fma on the VPU (vs three transcendentals for the
atan2(sin, cos) alternative).
"""

from __future__ import annotations

import jax.numpy as jnp

_TWO_PI = 6.283185307179586


def wrap_angle(theta):
    """Wrap angle(s) to [-pi, pi] (C remainder(theta, 2pi)); jit/vmap-safe."""
    return theta - _TWO_PI * jnp.round(theta / _TWO_PI)


def yaw_to_mat(theta):
    """2x2 rotation matrix from yaw (filter.h:122-130)."""
    c, s = jnp.cos(theta), jnp.sin(theta)
    return jnp.array([[c, -s], [s, c]])


def mat_to_yaw(r):
    """Yaw from a 2x2 rotation matrix (filter.h:131-133)."""
    return jnp.arctan2(r[1, 0], r[0, 0])


def se2_compose(a, b):
    """Compose two SE(2) poses given as (x, y, theta) arrays: a ∘ b."""
    ca, sa = jnp.cos(a[..., 2]), jnp.sin(a[..., 2])
    x = a[..., 0] + ca * b[..., 0] - sa * b[..., 1]
    y = a[..., 1] + sa * b[..., 0] + ca * b[..., 1]
    th = a[..., 2] + b[..., 2]
    return jnp.stack([x, y, th], axis=-1)


def se2_between(a, b):
    """Relative pose a^-1 ∘ b with wrapped heading (used by pose-graph factors)."""
    ca, sa = jnp.cos(a[..., 2]), jnp.sin(a[..., 2])
    dx = b[..., 0] - a[..., 0]
    dy = b[..., 1] - a[..., 1]
    x = ca * dx + sa * dy
    y = -sa * dx + ca * dy
    th = wrap_angle(b[..., 2] - a[..., 2])
    return jnp.stack([x, y, th], axis=-1)


def range_bearing(pose, point):
    """(range, global-bearing-relative-to-heading) from pose to point.

    Matches the sim's measurement model (sim_node.py:233-237) and the filters'
    sensing models (ekf.cpp:115,129; ukf.cpp:144-145): r = ||p - x||,
    beta = wrap(atan2(dy, dx) - theta).
    """
    dx = point[..., 0] - pose[..., 0]
    dy = point[..., 1] - pose[..., 1]
    r = jnp.sqrt(dx * dx + dy * dy)
    beta = wrap_angle(jnp.arctan2(dy, dx) - pose[..., 2])
    return r, beta


def project_measurement(pose, r, b):
    """Global landmark position implied by a (range, bearing) detection.

    Matches ekf.cpp:147-148 / ukf.cpp:358-359 / pose_graph.cpp:163.
    """
    th = pose[..., 2] + b
    return jnp.stack(
        [pose[..., 0] + r * jnp.cos(th), pose[..., 1] + r * jnp.sin(th)], axis=-1
    )
