"""Headline benchmark: fused sim+EKF-SLAM steps/sec/world at 4096 worlds.

North star (BASELINE.json): >=10k sim+EKF-SLAM steps/sec/world at 4096
vmapped worlds on one v5e chip. Mirrors the reference's benchmark
configuration (num_iterations=1000, random 20-landmark maps, TSP-NN
trajectories; params.yaml:14-15,69-71).

Protocol: Monte-Carlo over 16 independent random worlds x 256 command-noise /
sensing-noise realizations each (the reference's own benchmark protocol is
repeated runs per configuration, ~10 per CSV in base_pkg/data/). Each
world-block shares a map+trajectory, which the Pallas fused-rollout kernel
exploits via per-landmark block predication; per-world-unique maps are also
supported (BENCH_PROTOCOL=perworld) at ~2x the time.

The whole tick — uniform-noise truth propagation, FOV cull + range-bearing
sensing, EKF predict + sequential per-landmark updates — runs in ONE Pallas
kernel with the covariance VMEM-resident for the entire rollout
(ops/fused_rollout.py). BENCH_IMPL=xla falls back to the vmap(scan) path.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def emit_skip(reason, detail=""):
    """One structured JSON line so BENCH_r*.json separates an environment
    outage from a code regression (the round-3 artifact was a bare traceback,
    indistinguishable from a crash)."""
    print(
        json.dumps(
            {
                "metric": "fused sim+filter steps/sec/world (NOT MEASURED)",
                "value": 0.0,
                "unit": "steps/s/world",
                "vs_baseline": 0.0,
                "skipped": reason,
                "detail": detail[:500],
            }
        )
    )


def tpu_reachable(timeout_s=None):
    """Probe the axon TPU tunnel in a CHILD process with a hard timeout.

    The tunnel's observed failure modes are (a) backend-init RuntimeError and
    (b) an indefinite hang on the first device call — so the probe must be a
    separate process we can kill, run BEFORE this process imports jax (the
    axon plugin allows only one TPU client at a time, but the probe exits
    before the main run starts). Reading a scalar forces real execution;
    block_until_ready returns early through the tunnel.
    """
    if timeout_s is None:
        # after a Pallas-program client exits, the tunnel can refuse the next
        # client for 3-5 min (alternating probe-hangs observed in the r4
        # queue logs) — default high enough to ride that out
        timeout_s = int(os.environ.get("BENCH_PROBE_TIMEOUT", "330"))
    probe = (
        "import jax, jax.numpy as jnp\n"
        "y = jnp.ones((128, 128)) @ jnp.ones((128, 128))\n"
        "print('ok', jax.devices()[0].platform, float(y[0, 0]))\n"
    )
    try:
        r = subprocess.run(
            [sys.executable, "-c", probe],
            capture_output=True,
            text=True,
            timeout=timeout_s,
        )
    except subprocess.TimeoutExpired:
        return False, f"device probe hung >{timeout_s}s (tunnel unresponsive)"
    if r.returncode != 0:
        tail = (r.stderr or r.stdout).strip().splitlines()
        return False, tail[-1] if tail else "probe failed with no output"
    return True, r.stdout.strip()


def main():
    batch = int(os.environ.get("BENCH_WORLDS", "4096"))
    t_total = int(os.environ.get("BENCH_STEPS", "1000"))
    impl = os.environ.get("BENCH_IMPL", "pallas")
    protocol = os.environ.get("BENCH_PROTOCOL", "shared")
    filt = os.environ.get("BENCH_FILTER", "ekf_slam")
    # the UKF kernel's Cholesky scratch + sigma temporaries need a smaller
    # world block to fit VMEM
    default_block = "128" if filt.startswith("ukf") else "256"
    block = int(os.environ.get("BENCH_BLOCK", default_block))
    reps = int(os.environ.get("BENCH_REPS", "5"))
    target = 10_000.0

    # Outage guard: verify the TPU tunnel answers before committing this
    # process to it (skippable for forced-CPU smoke runs or when the caller
    # has already probed).
    force_cpu = os.environ.get("JAX_PLATFORMS", "") == "cpu"
    if not force_cpu and os.environ.get("BENCH_SKIP_PROBE", "") != "1":
        ok, detail = tpu_reachable()
        if not ok:
            log(f"TPU unreachable: {detail}")
            emit_skip("tpu-unavailable", detail)
            return
        log(f"TPU probe: {detail}")

    import jax

    # honor JAX_PLATFORMS=cpu for off-TPU smoke runs (the axon plugin
    # force-prepends itself regardless of the env var)
    if force_cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from live_ekf_slam_tpu.config import Config
    from live_ekf_slam_tpu.sim import maps as sim_maps
    from live_ekf_slam_tpu.sim.trajectory import generate_trajectory

    if impl == "pallas" and filt not in (
        "ekf_slam", "iekf_slam", "ukf_slam", "ukf_loc"
    ):
        raise SystemExit(
            f"BENCH_FILTER={filt} has no Pallas kernel; set BENCH_IMPL=xla"
        )
    cfg = Config(num_iterations=t_total).replace(filter=filt)
    rng = np.random.default_rng(0)

    # Landmark ids are relabeled by TSP visit order (slot = visit rank): a
    # pure per-world data-layout choice (ids are arbitrary labels) that makes
    # visibility block-correlated across unique maps, which the kernel's
    # per-landmark predication + seen-prefix growth bound exploit.
    def gen1(l, k):
        cmds, tour = generate_trajectory(
            cfg, l, l.shape[0], k, return_tour=True
        )
        return cmds, l[tour]

    genb = jax.jit(lambda ls, ks: jax.vmap(gen1)(ls, ks))
    t0 = time.perf_counter()
    if protocol == "shared":
        n_maps = max(batch // block, 1)
        lms_u = sim_maps.random_landmarks_batched(cfg, rng, n_maps)
        cmds_u, lms_u = genb(
            jnp.asarray(lms_u), jax.random.split(jax.random.PRNGKey(1), n_maps)
        )
        lms = jnp.repeat(lms_u, batch // n_maps, axis=0)
        cmds = jnp.repeat(cmds_u, batch // n_maps, axis=0)
    else:
        lms = jnp.asarray(sim_maps.random_landmarks_batched(cfg, rng, batch))
        cmds, lms = genb(lms, jax.random.split(jax.random.PRNGKey(1), batch))
    jax.block_until_ready(cmds)
    log(f"worlds+trajectories ready {time.perf_counter()-t0:.1f}s")

    if impl == "pallas" and filt in ("ukf_slam", "ukf_loc"):
        from live_ekf_slam_tpu.ops.fused_ukf import fused_ukf_rollout

        def run(seed):
            out = fused_ukf_rollout(
                cfg, lms, cmds, seed, slam=(filt == "ukf_slam"),
                block_worlds=block,
            )
            return np.asarray(out["err_sum"])
    elif impl == "pallas":
        from live_ekf_slam_tpu.ops.fused_rollout import fused_ekf_rollout

        kind = "iekf" if filt == "iekf_slam" else "ekf"

        def run(seed):
            out = fused_ekf_rollout(
                cfg, lms, cmds, seed, block_worlds=block, filter_kind=kind
            )
            return np.asarray(out["err_sum"])
    else:
        from live_ekf_slam_tpu.eval.runner import init_carry, make_step

        step = make_step(cfg, collect="sums")

        @jax.jit
        def rollout(lms, cmds, keys):
            def batched(c, inp):
                cmd_t, key_t = inp
                return jax.vmap(step)(c, (cmd_t, key_t))

            carry = jax.vmap(lambda l: init_carry(cfg, l))(lms)
            final, _ = jax.lax.scan(
                batched,
                carry,
                (jnp.swapaxes(cmds, 0, 1), jnp.swapaxes(keys, 0, 1)),
            )
            return final

        run_keys = jax.vmap(lambda k: jax.random.split(k, t_total))(
            jax.random.split(jax.random.PRNGKey(2), batch)
        )

        def run(seed):
            final = rollout(lms, cmds, run_keys)
            return np.asarray(final.err_sum_primary)

    # warmup / compile; fetching the error vector forces a device round-trip
    # (block_until_ready alone is unreliable through the axon tunnel).
    # The tunnel occasionally drops the TPU worker mid-run; retry once.
    for attempt in range(3):
        try:
            t1 = time.perf_counter()
            err = run(0)
            log(
                f"warmup (compile+run) {time.perf_counter()-t1:.1f}s "
                "(includes remote Mosaic-compile queue wait, measured "
                "14-435s for identical programs; docs/BENCHMARKS.md)"
            )

            rep_times = []
            t0 = time.perf_counter()
            for rep in range(reps):
                tr = time.perf_counter()
                err = run(rep + 1)
                rep_times.append(time.perf_counter() - tr)
            # median rep resists a single slow tunnel RPC (measured r4:
            # one 3-rep sample read 0.111 s/rep while a 10-rep run minutes
            # later read 0.092-0.099 on the identical binary); the mean of
            # few reps is the wrong estimator through this tunnel
            elapsed = float(np.median(rep_times))
            log(f"timed: {elapsed:.3f}s/rep (median of {reps}; "
                f"per-rep {' '.join(f'{t:.3f}' for t in rep_times)}; "
                f"min {min(rep_times):.3f})")
            break
        except Exception as e:  # pragma: no cover - tunnel flakiness
            log(f"attempt {attempt} failed: {type(e).__name__}: {e}")
            if attempt == 2:
                raise
            time.sleep(10)

    steps_per_sec_per_world = t_total / elapsed
    avg_err = float(np.nanmean(err / t_total))
    assert np.isfinite(avg_err), "benchmark rollout produced non-finite errors"

    print(
        json.dumps(
            {
                "metric": (
                    f"fused sim+{filt.upper().replace(chr(95),chr(45))} steps/sec/world at {batch} worlds "
                    f"(T={t_total}, {impl} {protocol}; mean avg-pos-err "
                    f"{avg_err:.3f} m vs C++ ref 0.19-1.4 m)"
                ),
                "value": round(steps_per_sec_per_world, 1),
                "unit": "steps/s/world",
                "vs_baseline": round(steps_per_sec_per_world / target, 3),
            }
        )
    )


if __name__ == "__main__":
    try:
        main()
    except RuntimeError as e:  # pragma: no cover - tunnel flakiness
        # The tunnel can also die MID-run (worker drop after a clean probe).
        # Backend-transport failures are an outage, not a regression; real
        # code errors (asserts, shape errors, ...) still crash with rc=1.
        msg = str(e)
        if "UNAVAILABLE" in msg or "backend" in msg.lower():
            emit_skip("tpu-died-midrun", msg)
        else:
            raise
