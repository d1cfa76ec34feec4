"""Probe: is the high-noise pgs_result parity gap a solver-budget artifact?

reference_parity.py (profile=ang) reproduces the published secondary-filter
means but its pgs_result at high noise lands ~1.8x above the reference's
(repo 1.83 vs published 0.93 for naive_high_one_time). The reference solves
with GTSAM LM to convergence (maxIterations=100, rel tol; pose_graph.cpp:
solve via LevenbergMarquardtOptimizer); the repo's bulk path is a
fixed-budget Schur-PCG GN (bulk_gn_iters=50 x bulk_cg_iters=40). At x10
angular noise the initial iterate is far from the optimum, so a fixed budget
may stop early. This sweeps the budget at small world count.

Usage: JAX_PLATFORMS=cpu python scripts/pgs_budget_probe.py \
           [--worlds 8] [--t 1000] [--out docs/pgs_budget_probe.json]
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
from reference_parity import make_compat_cfg


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--worlds", type=int, default=8)
    ap.add_argument("--t", type=int, default=1000)
    ap.add_argument("--scale", type=float, default=10.0,
                    help="calibrated high-noise angular V scale")
    ap.add_argument("--secondary", default="naive")
    ap.add_argument("--budgets", default="50x40,150x40,150x80,400x80",
                    help="comma list of GNxCG budgets")
    ap.add_argument("--scale-w", action="store_true",
                    help="also scale the sensing half-widths by the V scale "
                    "(hypothesis-D profile; see reference_parity.py)")
    ap.add_argument("--w-scale", type=float, default=None,
                    help="sensing half-width multiplier independent of the "
                    "V scale (interior W-family points, e.g. 3 or 5) — the "
                    "reachability check needs each member's CONVERGED "
                    "optimum, not just the default-budget value")
    ap.add_argument("--init", default="secondary",
                    help="cold-start mode: secondary | chordal")
    ap.add_argument("--solver", default="schur",
                    help="bulk solver: schur | dense (graduated LM)")
    ap.add_argument("--num-landmarks", type=int, default=None,
                    help="override MapConfig.num_landmarks (loop-closure "
                    "richness probe)")
    ap.add_argument("--range-max", type=float, default=None,
                    help="override VisionConstraints.range_max")
    ap.add_argument("--out", default="docs/pgs_budget_probe.json")
    args = ap.parse_args()
    if os.environ.get("JAX_PLATFORMS", "") == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")

    from live_ekf_slam_tpu.config import Config

    base = Config(num_iterations=args.t)
    out = {"t": args.t, "worlds": args.worlds, "scale": args.scale,
           "scale_w": args.scale_w, "w_scale": args.w_scale,
           "secondary": args.secondary, "init": args.init,
           "solver": args.solver, "budgets": {}}
    variants = [tuple(map(int, b.split("x"))) for b in args.budgets.split(",")]
    for gn, cg in variants:
        cfg = make_compat_cfg(base, args.scale, "pose_graph",
                              secondary=args.secondary, iterative=False,
                              scale_w=args.scale_w, profile="ang",
                              w_scale=args.w_scale)
        cfg = cfg.replace(pose_graph=dataclasses.replace(
            cfg.pose_graph, bulk_gn_iters=gn, bulk_cg_iters=cg,
            init=args.init, solver=args.solver))
        if args.num_landmarks is not None:
            cfg = cfg.replace(
                map=dataclasses.replace(
                    cfg.map, num_landmarks=args.num_landmarks),
                num_landmark_slots=args.num_landmarks,
                num_meas_slots=args.num_landmarks,
            )
            out["num_landmarks"] = args.num_landmarks
        if args.range_max is not None:
            cfg = cfg.replace(constraints=dataclasses.replace(
                cfg.constraints, vision=dataclasses.replace(
                    cfg.constraints.vision, range_max=args.range_max)))
            out["range_max"] = args.range_max
        t0 = time.perf_counter()
        res, _ = run_config(cfg, args.worlds, args.worlds, key_seed=777,
                            collect="poses", impl="streams")
        st = {
            "pgs_initial": robust_stats(res["err_pose_graph_initial"],
                                        res["diverged_" + args.secondary]),
            "pgs_result": robust_stats(res["err_pose_graph_result"],
                                       res["diverged_" + args.secondary]),
            "wall_s": round(time.perf_counter() - t0, 1),
        }
        out["budgets"][f"{gn}x{cg}"] = st
        log(f"[{gn}x{cg}] init {st['pgs_initial']['mean']} -> "
            f"result {st['pgs_result']['mean']} ({st['wall_s']}s)")
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)
    log(f"wrote {args.out}")


if __name__ == "__main__":
    main()
