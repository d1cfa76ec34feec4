"""Isolate the relabel x large-batch UKF divergence: check that the TSP
tours coming off jit(vmap(generate_trajectory(return_tour=True))) are valid
permutations at B=1024, and that per-world outputs are bitwise identical
between a 512-batch and a 1024-batch call on the same per-world inputs.
"""
from __future__ import annotations

import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from live_ekf_slam_tpu.config import Config
    from live_ekf_slam_tpu.sim import maps as sim_maps
    from live_ekf_slam_tpu.sim.trajectory import generate_trajectory

    t = int(os.environ.get("T", "1000"))
    cfg = Config(num_iterations=t).replace(filter="ukf_slam")
    cfg = cfg.replace(ukf=dataclasses.replace(cfg.ukf, sigma_sqrt="chol"))
    rng = np.random.default_rng(0)
    b = 1024
    lms = jnp.asarray(sim_maps.random_landmarks_batched(cfg, rng, b))
    keys = jax.random.split(jax.random.PRNGKey(1), b)

    def gen1(l, k):
        cmds, tour = generate_trajectory(cfg, l, l.shape[0], k,
                                         return_tour=True)
        return cmds, tour, l[tour]

    f = jax.jit(lambda ls, ks: jax.vmap(gen1)(ls, ks))
    cmds_full, tours_full, rel_full = jax.block_until_ready(f(lms, keys))
    cmds_half, tours_half, rel_half = jax.block_until_ready(
        f(lms[:512], keys[:512])
    )

    tf = np.asarray(tours_full)
    th = np.asarray(tours_half)
    n = lms.shape[1]
    perm_ok_full = int(
        (np.sort(tf, axis=1) == np.arange(n)[None]).all(axis=1).sum()
    )
    perm_ok_half = int(
        (np.sort(th, axis=1) == np.arange(n)[None]).all(axis=1).sum()
    )
    tours_match = int((tf[:512] == th).all(axis=1).sum())
    cf = np.asarray(cmds_full[:512])
    ch = np.asarray(cmds_half)
    cmds_match = int((cf == ch).all(axis=(1, 2)).sum())
    cmd_diff = float(np.abs(cf - ch).max())
    rf = np.asarray(rel_full[:512])
    rh = np.asarray(rel_half)
    rel_match = int((rf == rh).all(axis=(1, 2)).sum())
    # relabeled map must equal host gather of the original by the tour
    host_rel = np.take_along_axis(
        np.asarray(lms), tf[:, :, None].repeat(2, axis=2), axis=1
    )
    rel_vs_host = float(np.abs(np.asarray(rel_full) - host_rel).max())

    print(json.dumps({
        "perm_ok_full_of_1024": perm_ok_full,
        "perm_ok_half_of_512": perm_ok_half,
        "tours_match_of_512": tours_match,
        "cmds_match_of_512": cmds_match,
        "max_cmd_diff": cmd_diff,
        "relabeled_match_of_512": rel_match,
        "relabeled_vs_host_gather_maxdiff": rel_vs_host,
    }))


if __name__ == "__main__":
    main()
