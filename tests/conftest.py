"""Test config: force the CPU backend with 8 virtual devices so sharding tests
run without TPU hardware.

Note: this environment's axon TPU plugin force-prepends itself to
jax_platforms regardless of the JAX_PLATFORMS env var, so we must override the
config *after* importing jax (two processes sharing the one TPU deadlock, and
TPU default matmul precision is bf16 — tests want deterministic fp32 CPU).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
