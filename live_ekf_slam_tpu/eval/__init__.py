from live_ekf_slam_tpu.eval.runner import make_step, run_monte_carlo  # noqa: F401
from live_ekf_slam_tpu.eval import metrics  # noqa: F401
