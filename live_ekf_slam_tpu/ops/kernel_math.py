"""Scalar math helpers shared by the Pallas rollout kernels.

Mosaic has no atan2/remainder lowerings; these implement both from
primitives, matching the C semantics the reference relies on
(sim_node.py:237, ekf.cpp:59,129,139 use remainder(., 2*pi); the sensing
models use atan2).
"""

from __future__ import annotations

import jax.numpy as jnp

TWO_PI = 6.283185307179586
PI = 3.141592653589793
HALF_PI = 1.5707963267948966


def rint(x):
    """Round-half-to-even. jnp.round lowers fine in Mosaic; the classic
    (x + 1.5*2^23) - 1.5*2^23 magic-number trick is NOT safe here because the
    pallas interpreter evaluates f32 ops at higher precision, where the trick
    degenerates to the identity (and wrap then zeroes every heading)."""
    return jnp.round(x)


def wrap(t):
    """C remainder(t, 2*pi): exact IEEE nearest-integer remainder."""
    return t - TWO_PI * rint(t * jnp.float32(1.0 / TWO_PI))


def atan_01(z):
    """arctan on [0, 1], ~1e-7 max error (odd minimax polynomial in z^2)."""
    w = z * z
    p = jnp.float32(-0.0117212)
    p = p * w + jnp.float32(0.05265332)
    p = p * w + jnp.float32(-0.11643287)
    p = p * w + jnp.float32(0.19354346)
    p = p * w + jnp.float32(-0.33262347)
    p = p * w + jnp.float32(0.99997726)
    return z * p


def atan2(y, x):
    """Full-quadrant atan2 built from the [0,1] arctan core."""
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    hi = jnp.maximum(ax, ay)
    lo = jnp.minimum(ax, ay)
    z = lo / jnp.maximum(hi, jnp.float32(1e-30))
    a = atan_01(z)
    a = jnp.where(ay > ax, HALF_PI - a, a)        # reflect above the diagonal
    a = jnp.where(x < 0.0, PI - a, a)             # left half-plane
    return jnp.where(y < 0.0, -a, a)              # lower half-plane


def uniform_pm1(bits):
    """Random bits -> float32 uniform in [-1, 1).

    prng_random_bits yields SIGNED int32 on TPU; the arithmetic shift keeps
    the sign, giving a symmetric 24-bit integer in [-2^23, 2^23).
    """
    return (bits >> 8).astype(jnp.float32) * jnp.float32(1.0 / 8388608.0)


def round_up(x, m):
    return ((x + m - 1) // m) * m
