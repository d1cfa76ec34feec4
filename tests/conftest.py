"""Test config: force the CPU backend with 8 virtual devices so sharding tests
run without TPU hardware. Must run before jax imports."""

import os

# Hard override: the environment pins JAX_PLATFORMS=axon (TPU tunnel);
# tests must run on CPU (and two processes sharing the one TPU deadlock).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
