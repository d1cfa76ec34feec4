from live_ekf_slam_tpu.ops.precision import dot32, einsum32, HIGHEST  # noqa: F401
from live_ekf_slam_tpu.ops.fused_rollout import (  # noqa: F401
    fused_ekf_rollout,
    fused_ekf_rollout_sharded,
)
