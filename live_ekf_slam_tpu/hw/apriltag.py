"""Hardware landmark frontend: AprilTag detections -> [id, range, bearing].

Rebuild of landmark_detection_pkg/src/tag_detection_node.py: converts 3-D tag
poses (translation + quaternion, as published by an AprilTag detector) into
the same flat [id, r, b]* measurement format the simulator emits, so real
camera detections can drive the filters as a drop-in for the sim's `/landmark`
stream (tag_detection_node.py:28-64). We assume landmarks are orientation
invariant, like the reference.

Note the reference computes the bearing as ``tan(t_y / t_z)``
(tag_detection_node.py:57) — almost certainly a typo for atan2. Default here
is the correct planar bearing; `compat_tan_bearing=True` reproduces the
reference formula.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np

from live_ekf_slam_tpu.core.types import Measurements


def quat_to_mat(w, x, y, z):
    """Rotation matrix from a (w, x, y, z) quaternion."""
    n = math.sqrt(w * w + x * x + y * y + z * z) or 1.0
    w, x, y, z = w / n, x / n, y / n, z / n
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
            [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
            [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
        ]
    )


@dataclass
class TagDetection:
    tag_id: int
    translation: tuple  # (x, y, z) in the camera frame
    quaternion: tuple = (1.0, 0.0, 0.0, 0.0)  # (w, x, y, z)


def detections_to_measurements(
    detections, compat_tan_bearing: bool = False
):
    """AprilTag detections -> flat [id, r, b]* list (tag_detection_node.py:28-64)."""
    out = []
    for det in detections:
        t = det.translation
        rng = math.hypot(t[0], t[1])
        if compat_tan_bearing:
            b = math.tan(t[1] / t[2]) if t[2] != 0 else 0.0
        else:
            b = math.atan2(t[1], t[0])
        out += [float(det.tag_id), rng, b]
    return out


def flat_to_measurement_slots(flat, k_slots: int):
    """Flat [id, r, b]* -> fixed-capacity Measurements PyTree (the filters'
    input format)."""
    import jax.numpy as jnp

    n = len(flat) // 3
    ids = np.full(k_slots, -1, np.int32)
    r = np.zeros(k_slots, np.float32)
    b = np.zeros(k_slots, np.float32)
    valid = np.zeros(k_slots, bool)
    for j in range(min(n, k_slots)):
        ids[j] = int(flat[3 * j])
        r[j] = flat[3 * j + 1]
        b[j] = flat[3 * j + 2]
        valid[j] = True
    return Measurements(
        ids=jnp.asarray(ids),
        r=jnp.asarray(r),
        b=jnp.asarray(b),
        valid=jnp.asarray(valid),
        overflow=jnp.asarray(n > k_slots),
    )
