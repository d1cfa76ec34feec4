"""Measure the UKF bearing-deviation range (TODO r3: atan2 -> small-angle).

The fused UKF kernel's last non-structural transcendental cost is the
per-sigma-element wrapped bearing deviation dev = atan2(sin_d, cos_d) (3
sweeps per landmark update, ops/fused_ukf.py dev_b). A small-angle
substitution (dev ~= sin_d * rsqrt(sin_d^2 + cos_d^2), error < 1% below
0.24 rad) is only safe if the deviation range is provably small. This probe
measures that range over real rollouts: it replays ukf.predict exactly and
recomputes each measured landmark's sigma bearing deviations (the same math
as models/ukf.py:_landmark_update's diff[1]), reporting max / quantiles.

Usage: python scripts/ukf_bearing_range.py [--worlds 16] [--t 500]
           [--noise default|low|high]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--worlds", type=int, default=16)
    ap.add_argument("--t", type=int, default=500)
    ap.add_argument("--noise", choices=("default", "low", "high"),
                    default="default")
    args = ap.parse_args()
    if os.environ.get("JAX_PLATFORMS", "") == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")

    import dataclasses

    import jax
    import jax.numpy as jnp

    from live_ekf_slam_tpu.config import Config
    from live_ekf_slam_tpu.models import ukf
    from live_ekf_slam_tpu.sim import maps as sim_maps
    from live_ekf_slam_tpu.sim.trajectory import generate_trajectory
    from live_ekf_slam_tpu.sim.world import init_world, sim_step
    from live_ekf_slam_tpu.utils.geometry import wrap_angle

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
    keys0 = jax.random.split(jax.random.PRNGKey(1), args.worlds)
    cmds = jax.jit(jax.vmap(
        lambda l, k: generate_trajectory(cfg, l, l.shape[0], k)
    ))(lms, keys0)

    n_cap = cfg.num_landmark_slots
    slot_idx = jnp.arange(n_cap)

    def max_dev_for_slot(s, x_pred_sig, wts, committed_yaw, mid, valid):
        """Max |wrapped bearing deviation| over the sigma set for one
        measured landmark (mirrors _landmark_update's diff[1] math)."""
        match = (s.ids == mid) & (slot_idx < s.M)
        li = 4 + 2 * jnp.argmax(match)
        gate = valid & jnp.any(match)
        e = ukf.sel_cols(x_pred_sig.shape[0], li)
        lm_pos_cols = ukf.dot32(e.T, x_pred_sig)
        z_cols = jax.vmap(
            lambda xc, lmc: ukf._sensing(cfg, xc, lmc, committed_yaw),
            in_axes=(1, 1), out_axes=1,
        )(x_pred_sig, lm_pos_cols)
        z_b = jnp.arctan2(ukf.dot32(jnp.sin(z_cols[1]), wts),
                          ukf.dot32(jnp.cos(z_cols[1]), wts))
        dev = wrap_angle(z_cols[1] - z_b)
        return jnp.where(gate, jnp.max(jnp.abs(dev)), 0.0), \
            jnp.where(gate, jnp.max(jnp.abs(dev)), jnp.nan)

    def one_world(lms_w, cmds_w, keys_w):
        world = init_world(cfg, lms_w)
        st = ukf.init(cfg, slam=True)

        def body(carry, inp):
            cmd, k = inp
            world, s = carry
            world, meas = sim_step(cfg, world, cmd, k)
            committed_yaw = ukf._yaw_of(s.x)
            _, _, _, x_pred_sig, wts = ukf.predict(cfg, s, cmd, slam=True)
            devs, devs_nan = jax.vmap(
                lambda mid, valid: max_dev_for_slot(
                    s, x_pred_sig, wts, committed_yaw, mid, valid)
            )(meas.ids, meas.valid)
            s = ukf.update(cfg, s, cmd, meas, slam=True)
            return (world, s), (jnp.max(devs), devs_nan)

        _, (maxdev, all_devs) = jax.lax.scan(
            body, (world, st), (cmds_w, keys_w))
        return maxdev, all_devs

    keys = jax.vmap(lambda k: jax.random.split(k, args.t))(
        jax.random.split(jax.random.PRNGKey(2), args.worlds))
    maxdev, all_devs = jax.jit(jax.vmap(one_world))(lms, cmds, keys)
    maxdev = np.asarray(maxdev)          # (B, T)
    flat = np.asarray(all_devs).ravel()  # per-slot maxima, NaN where gated
    flat = flat[np.isfinite(flat)]

    print(json.dumps({
        "worlds": args.worlds, "t": args.t, "noise": args.noise,
        "n_slot_updates": int(flat.size),
        "max_dev_rad": round(float(flat.max()), 4),
        "p999_dev_rad": round(float(np.percentile(flat, 99.9)), 4),
        "p99_dev_rad": round(float(np.percentile(flat, 99)), 4),
        "p90_dev_rad": round(float(np.percentile(flat, 90)), 4),
        "median_dev_rad": round(float(np.median(flat)), 4),
        "frac_over_0.24rad": round(float((flat > 0.24).mean()), 5),
        "frac_over_1rad": round(float((flat > 1.0).mean()), 5),
        "worlds_ticks_over_1rad": int((maxdev > 1.0).sum()),
    }))


if __name__ == "__main__":
    main()
