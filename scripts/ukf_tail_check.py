"""Measure the UKF chol-mode divergence tail at scale (VERDICT r2 weak #3):
512 per-world-unique worlds x T=1000, count worlds with any update
rejection, coasting worlds, and the mean/median error gap.

Usage: python scripts/ukf_tail_check.py [--worlds 512] [--t 1000]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--worlds", type=int, default=512)
    ap.add_argument("--t", type=int, default=1000)
    ap.add_argument("--block", type=int, default=128)
    ap.add_argument("--relabel", action="store_true",
                    help="TSP-visit-order landmark relabeling (bench protocol)")
    ap.add_argument("--noise", choices=("default", "low", "high"),
                    default="default",
                    help="accuracy-matrix noise profile (low = chase the "
                    "VERDICT r3 weak-#4 low-noise heavy tail)")
    args = ap.parse_args()

    import dataclasses

    import jax
    import jax.numpy as jnp

    from live_ekf_slam_tpu.config import Config
    from live_ekf_slam_tpu.ops.fused_ukf import fused_ukf_rollout
    from live_ekf_slam_tpu.sim import maps as sim_maps
    from live_ekf_slam_tpu.sim.trajectory import generate_trajectory

    cfg = Config(num_iterations=args.t).replace(filter="ukf_slam")
    cfg = cfg.replace(ukf=dataclasses.replace(cfg.ukf, sigma_sqrt="chol"))
    if args.noise != "default":
        from accuracy_matrix import HIGH_NOISE, LOW_NOISE

        prof = LOW_NOISE if args.noise == "low" else HIGH_NOISE
        cfg = cfg.replace(
            process_noise=dataclasses.replace(
                cfg.process_noise, V_00=prof["V_00"], V_11=prof["V_11"]),
            sensing_noise=dataclasses.replace(
                cfg.sensing_noise, W_00=prof["W_00"], W_11=prof["W_11"]),
        )
    rng = np.random.default_rng(0)
    lms = jnp.asarray(sim_maps.random_landmarks_batched(cfg, rng, args.worlds))
    keys = jax.random.split(jax.random.PRNGKey(1), args.worlds)
    if args.relabel:
        def gen1(l, k):
            cmds, tour = generate_trajectory(
                cfg, l, l.shape[0], k, return_tour=True
            )
            return cmds, l[tour]

        cmds, lms = jax.jit(lambda ls, ks: jax.vmap(gen1)(ls, ks))(lms, keys)
    else:
        cmds = jax.jit(
            jax.vmap(lambda l, k: generate_trajectory(cfg, l, l.shape[0], k))
        )(lms, keys)
    jax.block_until_ready(cmds)

    t0 = time.perf_counter()
    out = fused_ukf_rollout(cfg, lms, cmds, 0, slam=True,
                            block_worlds=args.block)
    err = np.asarray(out["err_sum"]) / args.t
    warm = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = fused_ukf_rollout(cfg, lms, cmds, 1, slam=True,
                            block_worlds=args.block)
    err = np.asarray(out["err_sum"]) / args.t
    elapsed = time.perf_counter() - t0
    rejects = np.asarray(out["update_rejects"])
    err_max = np.asarray(out["err_max"])

    rej = rejects > 0
    print(json.dumps({
        "worlds": args.worlds, "t": args.t, "noise": args.noise,
        "steps_per_s_per_world": round(args.t / elapsed, 1),
        "warmup_s": round(warm, 1),
        "mean_err": round(float(np.nanmean(err)), 4),
        "median_err": round(float(np.nanmedian(err)), 4),
        "p90_err": round(float(np.nanpercentile(err, 90)), 4),
        "p99_err": round(float(np.nanpercentile(err, 99)), 4),
        "worlds_with_any_reject": int(rej.sum()),
        "total_rejects": int(rejects.sum()),
        # tail attribution: is the mean/median skew carried by the worlds
        # whose updates the innovation gate rejected (coasting), or by
        # cleanly-updating worlds (which would point at the sigma algebra)?
        "mean_err_rejecting": round(float(np.nanmean(err[rej])), 4)
        if rej.any() else None,
        "mean_err_clean": round(float(np.nanmean(err[~rej])), 4)
        if (~rej).any() else None,
        "median_err_clean": round(float(np.nanmedian(err[~rej])), 4)
        if (~rej).any() else None,
        "worlds_err_over_1m": int((err > 1.0).sum()),
        "worlds_diverged_50m": int((err_max > 50.0).sum()),
        "max_err": round(float(np.nanmax(err)), 3),
    }))


if __name__ == "__main__":
    main()
