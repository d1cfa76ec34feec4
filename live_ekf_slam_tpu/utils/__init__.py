from live_ekf_slam_tpu.utils.geometry import wrap_angle  # noqa: F401
