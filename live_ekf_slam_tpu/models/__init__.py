from live_ekf_slam_tpu.models import naive, ekf, ukf, posegraph  # noqa: F401
