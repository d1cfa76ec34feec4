import math

import numpy as np
import jax
import jax.numpy as jnp

from live_ekf_slam_tpu.config import Config
from live_ekf_slam_tpu.sim.world import init_world, propagate_truth, sense


def _cfg(**kw):
    return Config(num_iterations=50).replace(**kw)


def test_propagate_truth_noise_free():
    cfg = _cfg(
        process_noise=Config().process_noise.__class__(V_00=0.0, V_11=0.0)
    )
    pose = jnp.array([1.0, 2.0, 0.5])
    cmd = jnp.array([0.08, 0.03])
    out = np.asarray(propagate_truth(cfg, pose, cmd, jax.random.PRNGKey(0)))
    exp = [1.0 + 0.08 * math.cos(0.5), 2.0 + 0.08 * math.sin(0.5), 0.53]
    np.testing.assert_allclose(out, exp, rtol=1e-5)


def test_propagate_clamps_commands():
    cfg = _cfg(
        process_noise=Config().process_noise.__class__(V_00=0.0, V_11=0.0)
    )
    pose = jnp.array([0.0, 0.0, 0.0])
    # forward command above d_max, angular beyond +/-th_max
    out = np.asarray(
        propagate_truth(cfg, pose, jnp.array([5.0, -1.0]), jax.random.PRNGKey(1))
    )
    np.testing.assert_allclose(out[0], cfg.constraints.commands.d_max, rtol=1e-5)
    np.testing.assert_allclose(out[2], -cfg.constraints.commands.th_max, rtol=1e-5)
    # negative forward commands clamp at 0
    out2 = np.asarray(
        propagate_truth(cfg, pose, jnp.array([-3.0, 0.0]), jax.random.PRNGKey(2))
    )
    assert out2[0] == 0.0


def test_visibility_cull_matches_reference_loop():
    rng = np.random.default_rng(3)
    cfg = _cfg(
        sensing_noise=Config().sensing_noise.__class__(W_00=0.0, W_11=0.0),
    )
    lms = rng.uniform(-10, 10, size=(20, 2)).astype(np.float32)
    world = init_world(cfg, jnp.asarray(lms))
    for trial in range(10):
        pose = np.array(
            [rng.uniform(-8, 8), rng.uniform(-8, 8), rng.uniform(-6, 6)],
            dtype=np.float32,
        )
        meas = sense(cfg, world, jnp.asarray(pose), jax.random.PRNGKey(trial))
        # reference loop (sim_node.py:229-243)
        expect = []
        for lid in range(20):
            dx, dy = lms[lid, 0] - pose[0], lms[lid, 1] - pose[1]
            r = math.sqrt(dx * dx + dy * dy)
            beta = math.remainder(math.atan2(dy, dx) - pose[2], 2 * math.pi)
            if r > cfg.constraints.vision.range_max:
                continue
            if cfg.constraints.vision.fov_min < beta < cfg.constraints.vision.fov_max:
                expect.append((lid, r, beta))
        got_ids = [int(i) for i, v in zip(np.asarray(meas.ids), np.asarray(meas.valid)) if v]
        assert got_ids == [e[0] for e in expect]
        got_r = np.asarray(meas.r)[np.asarray(meas.valid)]
        got_b = np.asarray(meas.b)[np.asarray(meas.valid)]
        np.testing.assert_allclose(got_r, [e[1] for e in expect], atol=1e-4)
        np.testing.assert_allclose(got_b, [e[2] for e in expect], atol=1e-4)


def test_meas_slot_compaction_preserves_order():
    cfg = _cfg(num_meas_slots=3)
    cfg = cfg.replace(
        sensing_noise=Config().sensing_noise.__class__(W_00=0.0, W_11=0.0)
    )
    # 5 landmarks straight ahead within range -> all visible, only 3 slots
    lms = np.array([[0.5, 0], [1.0, 0], [1.5, 0], [2.0, 0], [2.5, 0]], np.float32)
    world = init_world(cfg, jnp.asarray(lms))
    meas = sense(cfg, world, jnp.array([0.0, 0.0, 0.0]), jax.random.PRNGKey(0))
    assert bool(meas.overflow)
    assert list(np.asarray(meas.ids)) == [0, 1, 2]
    assert np.asarray(meas.valid).all()


def test_monte_carlo_landmarks_respect_occupancy():
    """run_monte_carlo passes the occupancy map into the random landmark
    sampler (sim_node.py:177-188); random maps on igvc1 may not place
    landmarks inside obstacles."""
    import numpy as np
    import jax
    from live_ekf_slam_tpu.config import Config
    from live_ekf_slam_tpu.sim import maps as sim_maps

    cfg = Config(num_iterations=5).replace(
        filter="naive", occ_map_img="igvc1.png",
        num_landmark_slots=8, num_meas_slots=8,
    )
    cfg = cfg.replace(map=cfg.map.__class__(num_landmarks=8))
    occ, _ = sim_maps.load_occ_map(cfg)
    rng = np.random.default_rng(0)
    lms = sim_maps.random_landmarks_batched(cfg, rng, 64, occ=occ)
    i = np.clip(
        (cfg.grid_shift - lms[:, :, 1] / cfg.grid_scale).astype(int), 0, 149
    )
    j = np.clip(
        (cfg.grid_shift + lms[:, :, 0] / cfg.grid_scale).astype(int), 0, 149
    )
    assert (occ[i, j] >= 0.5).all()

    from live_ekf_slam_tpu.eval.runner import run_monte_carlo

    res, _, _ = run_monte_carlo(cfg, jax.random.PRNGKey(0), 4)
    assert np.isfinite(res["err_naive"]).all()


def test_sim_streams_matches_scan_path():
    """sim/streams.py: the closed-form cumsum rollout must reproduce the
    sequential sim_step scan — same keys, same trajectories, same noisy
    measurement streams (slot = landmark id) to float tolerance."""
    import jax

    from live_ekf_slam_tpu.sim.streams import naive_deadreckon, sim_streams
    from live_ekf_slam_tpu.sim.world import init_world, sim_step
    from live_ekf_slam_tpu.models import naive

    T, N = 60, 7
    cfg = Config(num_iterations=T).replace(
        num_landmark_slots=N, num_meas_slots=N
    )
    cfg = cfg.replace(map=cfg.map.__class__(num_landmarks=N))
    rng = np.random.default_rng(5)
    lms = jnp.asarray(rng.uniform(-8, 8, (N, 2)), jnp.float32)
    cmds = jnp.asarray(
        np.stack([rng.uniform(0, 0.1, T), rng.uniform(-0.05, 0.05, T)], 1),
        jnp.float32,
    )
    k_roll = jax.random.PRNGKey(17)

    out = sim_streams(cfg, lms, N, cmds, k_roll)

    world = init_world(cfg, lms, N)
    keys = jax.random.split(k_roll, T)
    nstate = naive.init(cfg)
    for t in range(T):
        world, meas = sim_step(cfg, world, cmds[t], keys[t])
        nstate = naive.update(cfg, nstate, cmds[t])
        np.testing.assert_allclose(
            np.asarray(out["poses_true"][t]), np.asarray(world.pose),
            atol=2e-5,
        )
        np.testing.assert_array_equal(
            np.asarray(out["vis"][t]), np.asarray(meas.valid)
        )
        np.testing.assert_allclose(
            np.asarray(out["r"][t]), np.asarray(meas.r), atol=2e-5
        )
        np.testing.assert_allclose(
            np.asarray(out["b"][t]), np.asarray(meas.b), atol=2e-5
        )
    np.testing.assert_allclose(
        np.asarray(naive_deadreckon(cfg, cmds)[-1]),
        np.asarray(nstate.pose), atol=2e-5,
    )
