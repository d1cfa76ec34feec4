"""A/B the predicated UKF kernel against the unpredicated one ON HARDWARE
(ADVICE r3 #4): the pl.when pivot-skip / update-skip guards are forced off in
interpret mode, so CPU parity tests never exercise them — their 'identical
results' claim needs an on-chip bitwise comparison of x/P/err outputs.

Usage: python scripts/ukf_predication_ab.py [--worlds 256] [--t 1000]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--worlds", type=int, default=256)
    ap.add_argument("--t", type=int, default=1000)
    ap.add_argument("--block", type=int, default=128)
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
    rng = np.random.default_rng(0)
    lms = jnp.asarray(sim_maps.random_landmarks_batched(cfg, rng, args.worlds))
    keys = jax.random.split(jax.random.PRNGKey(1), args.worlds)
    cmds = jax.jit(
        jax.vmap(lambda l, k: generate_trajectory(cfg, l, l.shape[0], k))
    )(lms, keys)
    jax.block_until_ready(cmds)

    outs = {}
    for label, pred in (("predicated", True), ("unpredicated", False)):
        out = fused_ukf_rollout(cfg, lms, cmds, 7, slam=True,
                                block_worlds=args.block, predicated=pred)
        outs[label] = {k: np.asarray(v) for k, v in out.items()}

    a, b = outs["predicated"], outs["unpredicated"]
    report = {"worlds": args.worlds, "t": args.t}
    identical = True
    for k in sorted(set(a) & set(b)):
        is_float = np.issubdtype(a[k].dtype, np.floating)
        same = bool(np.array_equal(a[k], b[k], equal_nan=is_float))
        identical &= same
        report[f"bitwise_{k}"] = same
        if not same:
            fa, fb = a[k].astype(np.float64), b[k].astype(np.float64)
            report[f"maxabs_{k}"] = float(np.nanmax(np.abs(fa - fb)))
    report["identical"] = identical
    print(json.dumps(report))


if __name__ == "__main__":
    main()
