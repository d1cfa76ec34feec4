from live_ekf_slam_tpu.parallel.mesh import (  # noqa: F401
    WORLD_AXIS,
    make_mesh,
    world_sharding,
    shard_batch,
    sharded_step,
)
