"""Async viewer feed over the native frame ring buffer.

The reference plotter decouples from the filter nodes by ROS queues and keeps
only the latest message (plotting_node.py:233-252). TPU-native equivalent:
the device-stepping loop runs in a producer thread and pushes fixed-layout
frame snapshots into `native.FrameRing` (C++, overwrite-oldest); the
matplotlib main thread pops the NEWEST frame at its own cadence. Rendering
never stalls device work; skipped frames are counted by the ring.

Frame layout (fixed capacity, float32):
  [timestep, true_pose(3), est_pose(3), M, landmarks(N * 3 as id, x, y)]
Async mode carries the core artists (truth, estimate, landmark estimates);
covariance/sigma/pose-graph panels remain synchronous-mode features.
"""

from __future__ import annotations

import numpy as np

from live_ekf_slam_tpu import native
from live_ekf_slam_tpu.viz.live import Frame


class AsyncFrameFeed:
    """Encode/decode viewer frames through the native ring buffer."""

    def __init__(self, n_landmark_slots: int, n_slots: int = 8):
        self.n = int(n_landmark_slots)
        self.slot_floats = 1 + 3 + 3 + 1 + 3 * self.n
        self.ring = native.FrameRing(self.slot_floats, n_slots)

    # -- producer side (compute thread) --------------------------------
    def push(self, timestep: int, true_pose, est_pose, landmarks=None) -> bool:
        buf = np.zeros(self.slot_floats, np.float32)
        buf[0] = timestep
        buf[1:4] = np.asarray(true_pose, np.float32)
        buf[4:7] = np.asarray(est_pose, np.float32)
        m = 0
        if landmarks is not None and len(landmarks):
            m = min(len(landmarks), self.n)
            buf[8: 8 + 3 * m] = np.asarray(
                landmarks[:m], np.float32
            ).reshape(-1)
        buf[7] = m
        return self.ring.push(buf)

    # -- consumer side (render thread) ----------------------------------
    def pop_latest(self) -> Frame | None:
        buf = self.ring.pop_latest()
        if buf is None:
            return None
        m = int(buf[7])
        lms = buf[8: 8 + 3 * m].reshape(m, 3).copy() if m else None
        return Frame(
            timestep=int(buf[0]),
            true_pose=buf[1:4].copy(),
            est_pose=buf[4:7].copy(),
            landmarks=lms,
        )

    @property
    def dropped(self) -> int:
        return self.ring.dropped

    def close(self):
        self.ring.close()
