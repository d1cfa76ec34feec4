"""Monte-Carlo consistency (NEES) comparison: standard EKF-SLAM vs the
right-invariant EKF-SLAM (models/iekf.py).

The classic EKF-SLAM inconsistency result: linearizing about the estimate
injects spurious information along the unobservable (global translation +
rotation) directions, so the filter becomes overconfident — the normalized
estimation error squared e^T P^{-1} e drifts above its chi-square expectation
as the map grows. The right-invariant error formulation preserves the
unobservable subspace by construction (docs/FILTERS.md), so its NEES should
stay near the dimension.

Per filter this script reports, over B worlds x T ticks:
  * pose NEES (dim 3) time-average per world -> mean/median across worlds
  * fraction of (world, tick) samples above the one-sided 95% chi2 bound
    (7.815 for 3 dof) — the "overconfident fraction"
  * mean position error (sanity: accuracy should be comparable)

Error coordinates match each filter's own covariance definition: additive
(dx, dy, wrap(dth)) for the EKF; right-invariant (p_t - R(dth) p_hat, dth)
for the RI-EKF.

Usage:
  [JAX_PLATFORMS=cpu] python scripts/consistency.py \
      [--worlds 64] [--t 400] [--slots 12] [--out docs/consistency.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np


CHI2_95_3DOF = 7.815


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def rollout_with_cov(cfg, filt, lms, cmds, keys):
    """(B,)-world rollout emitting per-tick true pose, est pose, pose cov."""
    import jax
    import jax.numpy as jnp

    from live_ekf_slam_tpu.models import ekf, iekf
    from live_ekf_slam_tpu.sim.world import init_world, sim_step

    mod = {"ekf_slam": ekf, "iekf_slam": iekf}[filt]

    def one_world(lms_w, cmds_w, keys_w):
        world = init_world(cfg, lms_w)
        st = mod.init(cfg)

        def body(carry, inp):
            cmd, k = inp
            world, st = carry
            world, meas = sim_step(cfg, world, cmd, k)
            st = mod.update(cfg, st, cmd, meas)
            return (world, st), (world.pose, st.x[:3], st.P[:3, :3])

        _, out = jax.lax.scan(body, (world, st), (cmds_w, keys_w))
        return out

    return jax.jit(jax.vmap(one_world))(lms, cmds, keys)


def nees_series(filt, true_pose, est_pose, cov):
    """(B, T) NEES in the filter's own error coordinates (3 dof)."""
    dth = np.remainder(
        true_pose[..., 2] - est_pose[..., 2] + np.pi, 2 * np.pi
    ) - np.pi
    if filt == "iekf_slam":
        c, s = np.cos(dth), np.sin(dth)
        ex = true_pose[..., 0] - (c * est_pose[..., 0] - s * est_pose[..., 1])
        ey = true_pose[..., 1] - (s * est_pose[..., 0] + c * est_pose[..., 1])
    else:
        ex = true_pose[..., 0] - est_pose[..., 0]
        ey = true_pose[..., 1] - est_pose[..., 1]
    e = np.stack([ex, ey, dth], axis=-1)[..., None]  # (B, T, 3, 1)
    # solve P n = e per sample; P is 3x3
    sol = np.linalg.solve(cov.astype(np.float64), e.astype(np.float64))
    return (e * sol).sum(axis=(-2, -1))


def main():
    if os.environ.get("JAX_PLATFORMS", "") == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
    ap = argparse.ArgumentParser()
    ap.add_argument("--worlds", type=int, default=32)
    ap.add_argument("--t", type=int, default=700)
    ap.add_argument("--slots", type=int, default=8)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--regime", choices=("nominal", "drift"), default="drift",
                    help="nominal = reference noise/visibility (both filters "
                    "consistent); drift = sparse sightings + 10x heading "
                    "noise, where standard EKF-SLAM's NEES drifts and the "
                    "RI-EKF's does not")
    ap.add_argument("--out", default="docs/consistency.json")
    args = ap.parse_args()

    import dataclasses

    import jax
    import jax.numpy as jnp

    from live_ekf_slam_tpu.config import Config
    from live_ekf_slam_tpu.sim import maps as sim_maps
    from live_ekf_slam_tpu.sim.trajectory import generate_trajectory

    # calibrated mode: the filter's V/W match the simulator's true
    # clipped-uniform moments (core/noise.py). Without it the reference's
    # bound-as-variance quirk makes every filter ~100x underconfident
    # (NEES ~0.02), masking the consistency difference this script measures.
    cfg = Config(num_iterations=args.t).replace(
        num_landmark_slots=args.slots, num_meas_slots=args.slots,
        calibrated_motion=True,
    )
    bound = 8.0 if args.regime == "drift" else cfg.map.bound
    cfg = cfg.replace(
        map=cfg.map.__class__(num_landmarks=args.slots, bound=bound)
    )
    if args.regime == "drift":
        # sparse corrections (short sensor range over a wide map) + strong
        # heading noise: heading uncertainty grows between sightings, which
        # is exactly where EKF-SLAM's linearization injects spurious
        # information along the unobservable directions
        cfg = cfg.replace(
            constraints=dataclasses.replace(
                cfg.constraints,
                vision=dataclasses.replace(
                    cfg.constraints.vision, range_max=2.0
                ),
            ),
            process_noise=dataclasses.replace(
                cfg.process_noise, V_11=0.01
            ),
        )
    rng = np.random.default_rng(args.seed)
    lms = jnp.asarray(sim_maps.random_landmarks_batched(cfg, rng, args.worlds))
    gen = jax.jit(jax.vmap(lambda l, k: generate_trajectory(
        cfg, l, l.shape[0], k)))
    cmds = gen(lms, jax.random.split(jax.random.PRNGKey(args.seed + 1),
                                     args.worlds))
    keys = jax.vmap(lambda k: jax.random.split(k, args.t))(
        jax.random.split(jax.random.PRNGKey(args.seed + 2), args.worlds)
    )

    out = {"worlds": args.worlds, "t": args.t, "slots": args.slots,
           "regime": args.regime, "chi2_95_3dof": CHI2_95_3DOF,
           "filters": {}}
    for filt in ("ekf_slam", "iekf_slam"):
        log(f"[{filt}] {args.worlds} worlds x {args.t} ticks ...")
        tp, ep, cov = (np.asarray(v) for v in
                       rollout_with_cov(cfg, filt, lms, cmds, keys))
        # skip the first 50 ticks (prior-dominated transient)
        n = nees_series(filt, tp[:, 50:], ep[:, 50:], cov[:, 50:])
        per_world = n.mean(axis=1)
        third = n.shape[1] // 3
        err = np.hypot(tp[..., 0] - ep[..., 0], tp[..., 1] - ep[..., 1])
        out["filters"][filt] = {
            "nees_mean": round(float(per_world.mean()), 3),
            "nees_median": round(float(np.median(per_world)), 3),
            # time drift: a consistent filter's NEES is flat over the run
            "nees_early_third": round(float(n[:, :third].mean()), 3),
            "nees_late_third": round(float(n[:, -third:].mean()), 3),
            "overconfident_frac": round(float((n > CHI2_95_3DOF).mean()), 4),
            "pos_err_mean": round(float(err.mean()), 4),
        }
        log(f"[{filt}] {out['filters'][filt]}")

    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    e, i = out["filters"]["ekf_slam"], out["filters"]["iekf_slam"]
    print(f"regime: {args.regime}")
    print("| filter | NEES mean (ideal 3) | early->late third "
          "| P(NEES>chi2_95) | pos err (m) |")
    print("|---|---|---|---|---|")
    for name, row in (("ekf_slam", e), ("iekf_slam", i)):
        print(f"| {name} | {row['nees_mean']} "
              f"| {row['nees_early_third']} -> {row['nees_late_third']} "
              f"| {row['overconfident_frac']} | {row['pos_err_mean']} |")


if __name__ == "__main__":
    main()
