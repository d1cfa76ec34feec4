from live_ekf_slam_tpu.core.types import (  # noqa: F401
    WorldState,
    Measurements,
    GaussianState,
    UKFState,
    NaiveState,
    PoseGraphState,
)
