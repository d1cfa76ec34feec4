from live_ekf_slam_tpu.ops.precision import dot32, einsum32, HIGHEST  # noqa: F401
