from live_ekf_slam_tpu.sim.world import init_world, sim_step  # noqa: F401
from live_ekf_slam_tpu.sim.maps import (  # noqa: F401
    DEMO_MAP,
    IGVC1_BARRELS,
    make_landmarks,
    random_landmarks_batched,
    load_occ_map,
    blank_occ_map,
)
from live_ekf_slam_tpu.sim.trajectory import generate_trajectory  # noqa: F401
