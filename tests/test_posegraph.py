"""Pose-graph GN/LM solver tests: Jacobian correctness, convergence, and the
reference's accuracy ordering (PGS result <= secondary filter)."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from live_ekf_slam_tpu.config import CompatConfig, Config
from live_ekf_slam_tpu.eval.runner import run_monte_carlo
from live_ekf_slam_tpu.models import posegraph


def _small_cfg(**kw):
    cfg = Config(num_iterations=80).replace(
        filter="pose_graph",
        num_landmark_slots=8,
        num_meas_slots=8,
    )
    cfg = cfg.replace(
        map=cfg.map.__class__(num_landmarks=8), **kw
    )
    return cfg


def _built_graph(cfg, batch=1, seed=0):
    res, final, outs = run_monte_carlo(
        cfg, jax.random.PRNGKey(0), batch=batch, seed=seed, collect="poses"
    )
    return res, final, outs


def test_assembled_gradient_matches_autodiff():
    """g from the hand-written factor Jacobians must equal -grad(error)."""
    cfg = _small_cfg()
    _, final, _ = _built_graph(cfg)
    s = jax.tree.map(lambda a: a[0], final.primary)

    poses = s.poses_init + 0.01  # perturb away from the optimum
    lms = s.lms_init + 0.01

    h, g, var_active = jax.jit(
        lambda p, l: posegraph._assemble(cfg, s, p, l)
    )(poses, lms)

    grad_p, grad_l = jax.jit(
        jax.grad(lambda p, l: posegraph.graph_error(cfg, s, p, l), argnums=(0, 1))
    )(poses, lms)
    g_auto = -jnp.concatenate([grad_p.reshape(-1), grad_l.reshape(-1)])
    g_auto = jnp.where(var_active, g_auto, 0.0)

    np.testing.assert_allclose(
        np.asarray(g), np.asarray(g_auto), rtol=2e-3, atol=2e-2
    )


def test_lm_converges_to_global_optimum():
    """Structural solver checks: LM monotonically reduces the graph error and
    reaches (at least) the cost of the ground-truth configuration, from both
    the naive initialization and from truth itself."""
    cfg = _small_cfg()
    cfg = cfg.replace(
        process_noise=cfg.process_noise.__class__(V_00=0.02, V_11=0.02)
    )
    batch = 2
    seed = 5
    res, final, outs = _built_graph(cfg, batch=batch, seed=seed)
    true_poses = np.asarray(outs[0])  # (B, T, 3)
    # recover the true landmark maps (same generator+seed as the runner)
    from live_ekf_slam_tpu.sim import maps as sim_maps

    lms_world = sim_maps.random_landmarks_batched(
        cfg, np.random.default_rng(seed), batch
    )
    solve = jax.jit(lambda s: posegraph.solve(cfg, s))
    solve_from = jax.jit(lambda s, p, l: posegraph.solve(cfg, s, p, l))
    for w in range(batch):
        s = jax.tree.map(lambda a: a[w], final.primary)
        err0 = float(posegraph.graph_error(cfg, s, s.poses_init, s.lms_init))
        poses, lms, err = solve(s)
        assert float(err) < err0
        # ground-truth configuration (true poses AND true landmark positions,
        # mapped id->slot) upper-bounds the optimum
        poses_truth = jnp.concatenate(
            [s.poses_init[:1], jnp.asarray(true_poses[w])], axis=0
        )
        ids = np.clip(np.asarray(s.ids), 0, lms_world.shape[1] - 1)
        lms_truth = jnp.asarray(lms_world[w][ids])
        err_truth = float(
            posegraph.graph_error(cfg, s, poses_truth, lms_truth)
        )
        assert float(err) < err_truth
        # solving from truth lands at (essentially) the same optimum
        _, _, err2 = solve_from(s, poses_truth, lms_truth)
        assert abs(float(err2) - float(err)) / max(float(err), 1.0) < 0.25


@pytest.mark.skipif(
    not os.environ.get("RUN_SLOW"), reason="slow full-scale statistical test"
)
def test_pgs_beats_naive_at_reference_scale():
    """data/naive_high_noise_*: PGS-result < naive over 1000-tick runs with
    TSP loop closures, under the reference's compat noise weighting."""
    cfg = Config(num_iterations=1000).replace(
        filter="pose_graph", compat=CompatConfig.all_on()
    )
    res, _, _ = run_monte_carlo(
        cfg, jax.random.PRNGKey(2), batch=4, seed=42, collect="poses",
        solve_chunk=2,
    )
    assert res["err_pose_graph_result"].mean() < res["err_naive"].mean()


def test_monte_carlo_orderings():
    """EKF << naive at (default) high noise; B small for CI speed."""
    cfg_e = Config(num_iterations=100).replace(filter="ekf_slam")
    cfg_n = Config(num_iterations=100).replace(filter="naive")
    res_e, _, _ = run_monte_carlo(cfg_e, jax.random.PRNGKey(1), batch=8, seed=9)
    res_n, _, _ = run_monte_carlo(cfg_n, jax.random.PRNGKey(1), batch=8, seed=9)
    e = res_e["err_ekf_slam"].mean()
    n = res_n["err_naive"].mean()
    assert np.isfinite(e) and np.isfinite(n)
    assert e < n, (e, n)
