"""Headline benchmark: fused sim+EKF-SLAM steps/sec/world at 4096 worlds.

North star (BASELINE.json): >=10k sim+EKF-SLAM steps/sec/world at 4096
vmapped worlds on one v5e chip. The run mirrors the reference's benchmark
configuration (num_iterations=1000, random 20-landmark map, TSP trajectory;
params.yaml:14-15,69-71) with the whole tick — truth propagation, sensing,
EKF predict + 20 sequential masked measurement-slot updates — fused into one
jitted lax.scan and vmapped over the batch.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def main():
    batch = int(os.environ.get("BENCH_WORLDS", "4096"))
    t_total = int(os.environ.get("BENCH_STEPS", "1000"))
    target = 10_000.0

    import jax
    import jax.numpy as jnp

    from live_ekf_slam_tpu.config import Config
    from live_ekf_slam_tpu.eval.runner import init_carry, make_step
    from live_ekf_slam_tpu.sim import maps as sim_maps
    from live_ekf_slam_tpu.sim.trajectory import generate_trajectory

    # 8 measurement slots: the FOV/range cull rarely yields >6 simultaneous
    # detections on the 20-landmark random map; the overflow flag tracks any
    # dropped ones (sense() compacts in id order).
    k_slots = int(os.environ.get("BENCH_MEAS_SLOTS", "8"))
    cfg = Config(num_iterations=t_total).replace(
        filter="ekf_slam", num_meas_slots=k_slots
    )

    rng = np.random.default_rng(0)
    lms = jnp.asarray(sim_maps.random_landmarks_batched(cfg, rng, batch))
    step = make_step(cfg, collect="sums")

    @jax.jit
    def prepare(lms, keys):
        def one(l, k):
            carry = init_carry(cfg, l)
            cmds = generate_trajectory(cfg, l, l.shape[0], k)
            return carry, cmds

        return jax.vmap(one)(lms, keys)

    @jax.jit
    def rollout(carry, cmds, keys):
        # scan over time with the batch axis inside each step
        def batched(c, inp):
            cmd_t, key_t = inp
            return jax.vmap(step)(c, (cmd_t, key_t))

        cmds_t = jnp.swapaxes(cmds, 0, 1)  # (T, B, 2)
        keys_t = jnp.swapaxes(keys, 0, 1)
        final, _ = jax.lax.scan(batched, carry, (cmds_t, keys_t))
        return final

    def log(msg):
        print(msg, file=sys.stderr, flush=True)

    t_start = time.perf_counter()
    keys0 = jax.random.split(jax.random.PRNGKey(0), batch)
    carry, cmds = prepare(lms, keys0)
    jax.block_until_ready(cmds)
    log(f"prepare done {time.perf_counter()-t_start:.1f}s")
    run_keys = jax.vmap(lambda k: jax.random.split(k, t_total))(
        jax.random.split(jax.random.PRNGKey(1), batch)
    )

    # warmup / compile. Force a real device round-trip: block_until_ready is
    # unreliable through the axon tunnel, so fetch the tiny error vector.
    t1 = time.perf_counter()
    final = rollout(carry, cmds, run_keys)
    _ = np.asarray(final.err_sum_primary)
    log(f"warmup (compile+run) {time.perf_counter()-t1:.1f}s")

    reps = int(os.environ.get("BENCH_REPS", "2"))
    t0 = time.perf_counter()
    for _ in range(reps):
        final = rollout(carry, cmds, run_keys)
        _ = np.asarray(final.err_sum_primary)
    elapsed = (time.perf_counter() - t0) / reps
    log(f"timed: {elapsed:.3f}s/rep")

    steps_per_sec_per_world = t_total / elapsed
    err = float(np.mean(np.asarray(final.err_sum_primary) / t_total))

    print(
        json.dumps(
            {
                "metric": (
                    "fused sim+EKF-SLAM steps/sec/world "
                    f"at {batch} vmapped worlds (T={t_total}; "
                    f"mean avg-pos-err {err:.3f} m)"
                ),
                "value": round(steps_per_sec_per_world, 1),
                "unit": "steps/s/world",
                "vs_baseline": round(steps_per_sec_per_world / target, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
