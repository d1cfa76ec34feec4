"""Diagnose the UKF chol-mode large-batch divergence (round-3 finding):
512-world runs are clean (median err ~0.145 m) while >=1024-world runs of the
same kernel reject updates in ~90% of worlds (median 4-10 m). The kernel is
recompiled per batch size (grid = (B/block, T/t_chunk)), so this script
separates a grid-size-dependent kernel bug from a statistical effect:

1. per-block stats on a full PRNG-path run (is brokenness uniform across the
   batch or concentrated in specific world blocks?)
2. bitwise split test: identical injected noise, one 1024-world call vs two
   512-world half calls -- per-world outputs must match exactly if the kernel
   is grid-size-independent.

Usage: python scripts/ukf_batch_diag.py [--worlds 1024] [--t 1000]
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np


def block_stats(err, rejects, bl=128):
    out = []
    for s in range(0, err.shape[0], bl):
        e = err[s:s + bl]
        r = rejects[s:s + bl]
        out.append({
            "worlds": f"{s}..{s + bl - 1}",
            "median_err": round(float(np.nanmedian(e)), 4),
            "rejecting": int((r > 0).sum()),
            "over_1m": int((e > 1.0).sum()),
        })
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--worlds", type=int, default=1024)
    ap.add_argument("--t", type=int, default=1000)
    ap.add_argument("--block", type=int, default=128)
    ap.add_argument("--skip-prng", action="store_true")
    ap.add_argument("--skip-split", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from live_ekf_slam_tpu.config import Config
    from live_ekf_slam_tpu.ops.fused_ukf import fused_ukf_rollout
    from live_ekf_slam_tpu.sim import maps as sim_maps
    from live_ekf_slam_tpu.sim.trajectory import generate_trajectory

    cfg = Config(num_iterations=args.t).replace(filter="ukf_slam")
    cfg = cfg.replace(ukf=dataclasses.replace(cfg.ukf, sigma_sqrt="chol"))
    rng = np.random.default_rng(0)
    b = args.worlds
    lms = jnp.asarray(sim_maps.random_landmarks_batched(cfg, rng, b))
    keys = jax.random.split(jax.random.PRNGKey(1), b)
    cmds = jax.jit(
        jax.vmap(lambda l, k: generate_trajectory(cfg, l, l.shape[0], k))
    )(lms, keys)
    jax.block_until_ready(cmds)
    n_lm = lms.shape[1]

    if not args.skip_prng:
        t0 = time.perf_counter()
        out = fused_ukf_rollout(cfg, lms, cmds, 1, slam=True,
                                block_worlds=args.block)
        err = np.asarray(out["err_sum"]) / args.t
        rejects = np.asarray(out["update_rejects"])
        print(json.dumps({
            "phase": "prng_full",
            "worlds": b,
            "wall_s": round(time.perf_counter() - t0, 1),
            "median_err": round(float(np.nanmedian(err)), 4),
            "rejecting": int((rejects > 0).sum()),
            "blocks": block_stats(err, rejects, args.block),
        }), flush=True)

    if args.skip_split:
        return

    # ---- bitwise split test with injected noise
    nrng = np.random.default_rng(7)
    noise = nrng.uniform(-1.0, 1.0,
                         size=(args.t, 2 * n_lm + 8, b)).astype(np.float32)
    t0 = time.perf_counter()
    out_full = fused_ukf_rollout(cfg, lms, cmds, 0, slam=True,
                                 block_worlds=args.block, noise=noise)
    err_full = np.asarray(out_full["err_sum"])
    rej_full = np.asarray(out_full["update_rejects"])
    wall_full = time.perf_counter() - t0
    h = b // 2
    t0 = time.perf_counter()
    halves = []
    for lo, hi in ((0, h), (h, b)):
        o = fused_ukf_rollout(cfg, lms[lo:hi], cmds[lo:hi], 0, slam=True,
                              block_worlds=args.block,
                              noise=noise[:, :, lo:hi])
        halves.append((np.asarray(o["err_sum"]),
                       np.asarray(o["update_rejects"])))
    err_half = np.concatenate([hh[0] for hh in halves])
    rej_half = np.concatenate([hh[1] for hh in halves])
    wall_half = time.perf_counter() - t0

    diff = np.abs(err_full - err_half)
    nd = int((diff > 0).sum())
    print(json.dumps({
        "phase": "split_test",
        "worlds": b,
        "wall_full_s": round(wall_full, 1),
        "wall_halves_s": round(wall_half, 1),
        "median_err_full": round(float(np.nanmedian(err_full / args.t)), 4),
        "median_err_halves": round(float(np.nanmedian(err_half / args.t)), 4),
        "rejecting_full": int((rej_full > 0).sum()),
        "rejecting_halves": int((rej_half > 0).sum()),
        "worlds_differing": nd,
        "max_abs_diff_errsum": float(diff.max()),
        "first_differing_world": int(np.argmax(diff > 0)) if nd else -1,
        "blocks_full": block_stats(err_full / args.t, rej_full, args.block),
    }), flush=True)


if __name__ == "__main__":
    main()
