"""On-chip confirmation of the landmark-density reconstruction.

Runs the worst-gap parity config (naive_high_one_time) at the reconstructed
num_landmarks=60 with a proper world count, so the density finding from the
8-world CPU probes (docs/pgs_lmdensity_anchors.json) gets a tight CI against
the published 0.9265 m (base_pkg/data/naive_high_noise_one_time/
pose_graph_result.csv).

Usage: python scripts/parity_lm60.py [--worlds 128] [--nl 60]
           [--out docs/parity_lm60.json]
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from accuracy_matrix import log, robust_stats, run_config
from reference_parity import REFERENCE, make_compat_cfg


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--worlds", type=int, default=128)
    ap.add_argument("--chunk", type=int, default=64)
    ap.add_argument("--t", type=int, default=1000)
    ap.add_argument("--nl", type=int, default=60)
    ap.add_argument("--scale", type=float, default=10.0)
    ap.add_argument("--secondary", default="naive",
                    help="secondary filter: naive | ekf_slam")
    ap.add_argument("--gn", type=int, default=None,
                    help="override bulk_gn_iters")
    ap.add_argument("--cg", type=int, default=None,
                    help="override bulk_cg_iters")
    ap.add_argument("--out", default="docs/parity_lm60.json")
    args = ap.parse_args()
    if os.environ.get("JAX_PLATFORMS", "") == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")

    if os.path.exists(args.out):
        with open(args.out) as f:
            prev = json.load(f)
        if prev.get("worlds") == args.worlds and prev.get(
                "num_landmarks") == args.nl and prev.get(
                "secondary_filter", "naive") == args.secondary and \
                prev.get("gn") == args.gn and prev.get("cg") == args.cg:
            log(f"{args.out} already has this run; nothing to do")
            return

    from live_ekf_slam_tpu.config import Config

    base = Config(num_iterations=args.t)
    sec = args.secondary
    cfg = make_compat_cfg(base, args.scale, "pose_graph",
                          secondary=sec, iterative=False, profile="ang")
    cfg = cfg.replace(
        map=dataclasses.replace(cfg.map, num_landmarks=args.nl),
        num_landmark_slots=args.nl, num_meas_slots=args.nl)
    if args.gn is not None or args.cg is not None:
        pg = cfg.pose_graph
        cfg = cfg.replace(pose_graph=dataclasses.replace(
            pg,
            bulk_gn_iters=pg.bulk_gn_iters if args.gn is None else args.gn,
            bulk_cg_iters=pg.bulk_cg_iters if args.cg is None else args.cg))
    t0 = time.perf_counter()
    log(f"[{sec}_high_one_time nl={args.nl}] {args.worlds} worlds ...")
    res, timing = run_config(cfg, args.worlds, args.chunk, key_seed=31337,
                             collect="poses", impl="streams")
    out = {
        "t": args.t, "worlds": args.worlds, "num_landmarks": args.nl,
        "scale": args.scale, "secondary_filter": sec,
        "gn": args.gn, "cg": args.cg, "timing": timing,
        "secondary": robust_stats(res["err_" + sec],
                                  res["diverged_" + sec]),
        "pgs_initial": robust_stats(res["err_pose_graph_initial"],
                                    res["diverged_" + sec]),
        "pgs_result": robust_stats(res["err_pose_graph_result"],
                                   res["diverged_" + sec]),
        "reference": REFERENCE[f"{sec}_high_one_time"],
        "wall_s": round(time.perf_counter() - t0, 1),
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    log(f"{out}")
    log(f"wrote {args.out}")


if __name__ == "__main__":
    main()
