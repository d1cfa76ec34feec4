"""Infrastructure tests: YAML config round-trip, checkpoint/restore, mesh
sharding with cross-chip metric reduction, viz artists, recorder CSVs."""

import os

import numpy as np
import jax
import jax.numpy as jnp

from live_ekf_slam_tpu.config import Config, config_from_dict, load_config, preset
from live_ekf_slam_tpu.eval.runner import init_carry, make_step
from live_ekf_slam_tpu.parallel import mesh as pmesh
from live_ekf_slam_tpu.utils import checkpoint as ckpt


def test_yaml_config_roundtrip(tmp_path):
    """A reference-format params.yaml loads into the Config schema."""
    yaml_text = """
filter: "ukf_slam"
dt: 0.01
num_iterations: 123
init_pose: {x: 1.0, y: -2.0, yaw: 0.5}
constraints:
  commands: {d_max: 0.2, th_max: 0.1}
  vision: {range_max: 4.0, fov_min: -1.0, fov_max: 1.0}
  measurements: {landmark_id_is_known: false, min_landmark_separation: 0.2}
process_noise:
  mean: {v_d: 0.0, v_th: 0.0}
  cov: {V_00: 0.02, V_11: 0.002}
sensing_noise:
  mean: {w_r: 0.0, w_b: 0.0}
  cov: {W_00: 0.03, W_11: 0.004}
ukf: {W_0: 0.3}
pose_graph:
  filter_to_compare: "ekf_slam"
  solve_graph_every_iteration: false
map: {bound: 5.0, num_landmarks: 7, occ_map_size: 100}
path_planning: {nav_method: "direct", astar_incl_diagonals: false}
"""
    p = tmp_path / "params.yaml"
    p.write_text(yaml_text)
    cfg = load_config(str(p))
    assert cfg.filter == "ukf_slam"
    assert cfg.dt == 0.01
    assert cfg.num_iterations == 123
    assert cfg.init_pose == (1.0, -2.0, 0.5)
    assert cfg.constraints.commands.d_max == 0.2
    assert not cfg.constraints.measurements.landmark_id_is_known
    assert cfg.process_noise.V_11 == 0.002
    assert cfg.sensing_noise.W_00 == 0.03
    assert cfg.ukf.W_0 == 0.3
    assert cfg.pose_graph.filter_to_compare == "ekf_slam"
    assert not cfg.pose_graph.solve_graph_every_iteration
    assert cfg.map.num_landmarks == 7
    assert cfg.num_landmark_slots == 7  # capacity tracks the landmark count
    assert cfg.path_planning.nav_method == "direct"
    # grid transforms (sim_node.py:332-337)
    assert cfg.grid_shift == 50.0
    assert cfg.grid_scale == 0.1


def test_presets_match_launch_files():
    live = preset("filter_demo_live")
    assert live.precompute_trajectory and not live.plot_result_only
    res = preset("filter_demo_results_only")
    assert res.plot_result_only and res.dt == 0.005
    igvc = preset("igvc1")
    assert igvc.use_local_planner and igvc.tight_control
    assert igvc.init_pose == (0.0, -8.5, 0.0)  # sim_node.py:355-356
    assert igvc.landmark_map == "igvc1"


def test_checkpoint_roundtrip(tmp_path):
    cfg = Config(num_iterations=10).replace(
        num_landmark_slots=4, num_meas_slots=4
    )
    lms = jnp.asarray(np.random.default_rng(0).uniform(-5, 5, (4, 2)), jnp.float32)
    carry = init_carry(cfg, lms)
    step = jax.jit(make_step(cfg))
    key = jax.random.PRNGKey(0)
    for t in range(3):
        carry, _ = step(carry, (jnp.asarray([0.05, 0.01]), jax.random.fold_in(key, t)))
    path = str(tmp_path / "ck.npz")
    ckpt.save(path, carry)
    restored = ckpt.restore(path, carry)
    for a, b in zip(jax.tree.leaves(carry), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # resumed run continues identically
    c1, _ = step(carry, (jnp.asarray([0.05, 0.01]), jax.random.fold_in(key, 9)))
    c2, _ = step(restored, (jnp.asarray([0.05, 0.01]), jax.random.fold_in(key, 9)))
    np.testing.assert_array_equal(
        np.asarray(c1.primary.x), np.asarray(c2.primary.x)
    )


def test_mesh_sharded_step_and_reduction():
    """8-virtual-device mesh: sharded fused step + psum-style metric mean."""
    assert len(jax.devices()) == 8, "conftest must set 8 virtual cpu devices"
    cfg = Config(num_iterations=4).replace(
        num_landmark_slots=3, num_meas_slots=3
    )
    cfg = cfg.replace(map=cfg.map.__class__(num_landmarks=3))
    batch = 16
    rng = np.random.default_rng(0)
    lms = jnp.asarray(rng.uniform(-5, 5, (batch, 3, 2)), jnp.float32)
    carry = jax.vmap(lambda l: init_carry(cfg, l))(lms)
    step = make_step(cfg)

    mesh = pmesh.make_mesh(8)
    sh = pmesh.world_sharding(mesh)
    carry = pmesh.shard_batch(carry, mesh)
    cmds = jnp.tile(jnp.asarray([[0.05, 0.0]], jnp.float32), (batch, 1))
    keys = jax.random.split(jax.random.PRNGKey(1), batch)
    inp = pmesh.shard_batch((cmds, keys), mesh)

    @jax.jit
    def sharded(carry, inp):
        carry, _ = jax.vmap(step)(carry, inp)
        return carry, jnp.mean(carry.err_sum_primary)

    out_carry, mean_err = sharded(carry, inp)
    assert np.isfinite(float(mean_err))
    # matches the unsharded computation
    carry_local = jax.device_get(carry)
    out2, mean2 = jax.jit(sharded)(
        jax.tree.map(jnp.asarray, carry_local), (cmds, keys)
    )
    np.testing.assert_allclose(float(mean_err), float(mean2), rtol=1e-6)


def test_recorder_and_bar_charts(tmp_path):
    from live_ekf_slam_tpu.eval.recorder import bar_chart, write_run_csvs

    run = tmp_path / "ekf_high_noise_iter"
    write_run_csvs(
        str(run),
        {
            "ekf": [1.0, 1.2, 1.4],
            "pose_graph_result": [0.6, 0.7, 0.8],
        },
    )
    pgs_m, filt_m, ftype = bar_chart(str(run), str(tmp_path / "plots"))
    assert ftype == "EKF-SLAM"
    assert abs(pgs_m - 0.7) < 1e-9
    assert abs(filt_m - 1.2) < 1e-9
    assert (tmp_path / "plots" / "ekf_high_noise_iter.png").exists()


def test_cov_ellipse_shape():
    from live_ekf_slam_tpu.viz.artists import cov_to_ellipse

    ell = cov_to_ellipse(np.diag([4.0, 1.0]), n_std=1.0)
    assert ell.shape[0] == 2
    # semi-axes ~ 2*sqrt(vals): x extent 4, y extent 2
    assert abs(ell[0].max() - 4.0) < 0.05
    assert abs(ell[1].max() - 2.0) < 0.05


def test_apriltag_bridge():
    from live_ekf_slam_tpu.hw.apriltag import (
        TagDetection,
        detections_to_measurements,
        flat_to_measurement_slots,
    )

    dets = [
        TagDetection(tag_id=3, translation=(1.0, 1.0, 0.5)),
        TagDetection(tag_id=7, translation=(2.0, 0.0, 0.5)),
    ]
    flat = detections_to_measurements(dets)
    assert flat[0] == 3.0 and abs(flat[1] - np.sqrt(2.0)) < 1e-9
    assert abs(flat[2] - np.pi / 4) < 1e-9
    meas = flat_to_measurement_slots(flat, 4)
    assert int(meas.ids[0]) == 3 and int(meas.ids[1]) == 7
    assert bool(meas.valid[1]) and not bool(meas.valid[2])


def test_nees_consistency_metric():
    from live_ekf_slam_tpu.eval.metrics import nees

    e = jnp.asarray([1.0, 0.0, 0.0])
    t_ = jnp.zeros(3)
    cov = jnp.asarray([[0.5, 0.0], [0.0, 2.0]])
    # e^T P^-1 e = 1/0.5 = 2
    assert abs(float(nees(e, t_, cov)) - 2.0) < 1e-6


def test_divergence_masks():
    """SURVEY §5 / ukf.cpp:207-211 role: a deliberately-diverged world must
    not move the batch mean, and the count is surfaced."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from live_ekf_slam_tpu.config import Config
    from live_ekf_slam_tpu.eval import runner as R

    cfg = Config(num_iterations=30).replace(
        filter="naive", num_landmark_slots=4, num_meas_slots=4
    )
    cfg = cfg.replace(map=cfg.map.__class__(num_landmarks=4))

    # healthy batch
    res, final, _ = R.run_monte_carlo(cfg, jax.random.PRNGKey(0), 4)
    assert res["diverged_naive"].sum() == 0

    # poison world 0 by teleporting its filter state beyond the radius
    carry = jax.vmap(lambda l: R.init_carry(cfg, l))(
        jnp.zeros((4, 4, 2), jnp.float32)
    )
    pose = carry.primary.pose.at[0, 0].set(1e6)
    carry = carry.replace(primary=carry.primary.replace(pose=pose))
    step = R.make_step(cfg)
    cmds = jnp.zeros((4, 2), jnp.float32)
    keys = jax.random.split(jax.random.PRNGKey(1), 4)
    carry2, _ = jax.jit(lambda c, i: jax.vmap(step)(c, i))(carry, (cmds, keys))
    alive = np.asarray(carry2.alive_primary)
    assert not alive[0] and alive[1:].all()
    # the poisoned world accumulated nothing
    assert float(carry2.err_sum_primary[0]) == 0.0
    assert int(carry2.ticks_primary[0]) == 0


def test_apriltag_recorded_replay():
    """Recorded-detections demo (tag_detection_node.py:28-91): a synthetic
    camera-frame detection log drives the EKF through the AprilTag bridge —
    TF'd from the camera mount frame — and the filter tracks the truth."""
    import math

    import numpy as np
    from live_ekf_slam_tpu.config import Config
    from live_ekf_slam_tpu.hw.apriltag import (
        FrameTransforms,
        TagDetection,
        replay_detection_log,
        se3,
    )

    cfg = Config(num_iterations=40).replace(
        num_landmark_slots=3, num_meas_slots=3
    )
    lms = np.array([[2.0, 0.5], [3.0, -0.8], [4.0, 1.2]])

    # camera mounted at the robot origin, axes aligned (identity mount);
    # registry exercises the TF lookup path
    tf = FrameTransforms()
    tf.register("base_link", "camera", se3((0.0, 0.0, 0.0)))
    T = tf.get_transform("base_link", "camera")
    assert T is not None and np.allclose(T, np.eye(4))
    assert tf.get_transform("camera", "base_link") is not None
    assert tf.get_transform("camera", "laser") is None

    # noiseless straight drive: build the log from exact geometry
    pose = np.zeros(3)
    cmds, log = [], []
    for t in range(40):
        pose[0] += 0.1
        cmds.append((0.1, 0.0))
        dets = []
        for j, lm in enumerate(lms):
            dx, dy = lm - pose[:2]
            r = math.hypot(dx, dy)
            if r <= cfg.constraints.vision.range_max:
                b = math.atan2(dy, dx) - pose[2]
                # camera-frame translation whose (x, y) give (r, b)
                dets.append(
                    TagDetection(
                        tag_id=j,
                        translation=(r * math.cos(b), r * math.sin(b), 0.5),
                    )
                )
        log.append(dets)

    state, poses = replay_detection_log(
        cfg, log, np.asarray(cmds, np.float32), "ekf_slam", T_base_cam=T
    )
    assert int(state.M) >= 2  # saw and inserted landmarks
    # noiseless measurements + exact odometry -> tight tracking
    err = np.linalg.norm(poses[-1][:2] - pose[:2])
    assert err < 0.05, err


def test_sim_base_preset_runs_filterless():
    """sim_base.launch semantics: simulator + plotter, no localization node
    (sim_base.launch:11-15). Both trajectory modes must run headless."""
    import matplotlib

    matplotlib.use("Agg")
    from live_ekf_slam_tpu import cli as C
    from live_ekf_slam_tpu.config import Config, preset

    cfg = preset("sim_base", Config(num_iterations=12)).replace(
        num_iterations=12
    )
    C.run_sim_base(cfg, seed=0)
    C.run_sim_base(cfg.replace(precompute_trajectory=False), seed=0)


def test_native_frame_ring_and_scheduler():
    """Native runtime components (native/src/{ringbuf,scheduler}.cpp):
    latest-wins ring semantics under a threaded producer, FIFO pop, drop
    accounting; job scheduler runs all jobs; batched A* matches single."""
    from live_ekf_slam_tpu import native

    if not native.available():
        import pytest

        pytest.skip("native lib not built (make -C native)")

    # ring buffer: overwrite-oldest + latest-wins
    ring = native.FrameRing(4, n_slots=3)
    for i in range(5):
        assert ring.push(np.full(4, float(i), np.float32))
    assert len(ring) == 3 and ring.dropped == 2
    latest = ring.pop_latest()
    assert latest is not None and latest[0] == 4.0
    assert len(ring) == 0 and ring.pop_latest() is None
    # FIFO pop
    ring.push(np.full(4, 7.0, np.float32))
    ring.push(np.full(4, 8.0, np.float32))
    assert ring.pop_oldest()[0] == 7.0
    assert ring.pop_oldest()[0] == 8.0
    # threaded producer
    import threading

    def produce():
        for i in range(100):
            ring.push(np.full(4, float(i), np.float32))

    th = threading.Thread(target=produce)
    th.start()
    th.join()
    assert ring.pop_latest()[0] == 99.0
    ring.close()

    # scheduler: all jobs execute, wait() blocks until done
    sched = native.JobScheduler(4)
    results = []
    lock = threading.Lock()
    for i in range(32):
        def job(i=i):
            with lock:
                results.append(i)
        sched.submit(job)
    sched.wait()
    assert sorted(results) == list(range(32))
    sched.close()

    # batched A* == sequential A* per pair
    rng = np.random.default_rng(0)
    occ = np.ones((40, 40), np.float32)
    occ[10:30, 18:22] = 0.0  # wall with gaps at the edges
    pairs = []
    while len(pairs) < 6:
        s = tuple(rng.integers(0, 40, 2))
        g = tuple(rng.integers(0, 40, 2))
        if occ[s] > 0 and occ[g] > 0:
            pairs.append((s, g))
    starts = np.array([p[0] for p in pairs], np.int32)
    goals = np.array([p[1] for p in pairs], np.int32)
    batch = native.astar_plan_batch(occ, starts, goals, n_threads=4)
    for (s, g), got in zip(pairs, batch):
        ref = native.astar_plan(occ, s, g)
        assert got == ref, (s, g)


def test_async_frame_feed_roundtrip():
    """viz.async_feed: encode -> ring -> decode preserves the frame."""
    from live_ekf_slam_tpu import native

    if not native.available():
        import pytest

        pytest.skip("native lib not built")
    from live_ekf_slam_tpu.viz.async_feed import AsyncFrameFeed
    from live_ekf_slam_tpu.viz.live import Frame

    rng = np.random.default_rng(2)
    du = 14  # 4 + 2*5
    feed = AsyncFrameFeed(
        n_landmark_slots=5, d_cov=13, du_sigma=du, t_pg=10, n_pg_meas=4
    )
    lms = np.array([[0, 1.0, 2.0], [3, -1.0, 0.5]], np.float32)
    cov = rng.normal(size=(13, 13)).astype(np.float32)
    sig = rng.normal(size=(du, 2 * du + 1)).astype(np.float32)
    pg_i = rng.normal(size=(8, 3)).astype(np.float32)
    pg_r = rng.normal(size=(8, 3)).astype(np.float32)
    pg_l = rng.normal(size=(3, 2)).astype(np.float32)
    pg_m = np.array([[1, 0], [2, 2], [3, 1], [5, 0], [6, 2]], np.int64)
    feed.push(Frame(
        timestep=7,
        true_pose=np.array([1.0, 2.0, 0.3]),
        est_pose=np.array([1.1, 2.1, 0.25]),
        landmarks=lms, cov=cov, sigma_pts=sig,
        pg_initial=pg_i, pg_result=pg_r, pg_landmarks=pg_l, pg_meas=pg_m,
    ))
    fr = feed.pop_latest()
    assert fr is not None and fr.timestep == 7
    np.testing.assert_allclose(fr.true_pose, [1.0, 2.0, 0.3], atol=1e-6)
    np.testing.assert_allclose(fr.est_pose, [1.1, 2.1, 0.25], atol=1e-6)
    np.testing.assert_allclose(fr.landmarks, lms, atol=1e-6)
    np.testing.assert_allclose(fr.cov, cov, atol=1e-6)
    np.testing.assert_allclose(fr.sigma_pts, sig, atol=1e-6)
    np.testing.assert_allclose(fr.pg_initial, pg_i, atol=1e-6)
    np.testing.assert_allclose(fr.pg_result, pg_r, atol=1e-6)
    np.testing.assert_allclose(fr.pg_landmarks, pg_l, atol=1e-6)
    # 5 pairs into capacity 4: the NEWEST 4 survive, dtype back to int
    np.testing.assert_array_equal(fr.pg_meas, pg_m[-4:])
    assert feed.pop_latest() is None
    feed.close()
    # minimal layout still round-trips (no optional blocks)
    feed2 = AsyncFrameFeed(n_landmark_slots=5)
    feed2.push(Frame(
        timestep=1, true_pose=np.zeros(3), est_pose=np.ones(3),
        landmarks=lms,
    ))
    fr2 = feed2.pop_latest()
    assert fr2.cov is None and fr2.sigma_pts is None and fr2.pg_initial is None
    np.testing.assert_allclose(fr2.landmarks, lms, atol=1e-6)
    feed2.close()


def test_async_viz_demo_headless():
    """PlotterConfig.async_viz: producer-thread stepping + ring-buffer feed
    drives the demo end-to-end headless with a finite metric."""
    import dataclasses

    import matplotlib

    matplotlib.use("Agg")
    from live_ekf_slam_tpu import native
    from live_ekf_slam_tpu import cli as C
    from live_ekf_slam_tpu.config import Config, preset

    if not native.available():
        import pytest

        pytest.skip("native lib not built")
    cfg = preset("filter_demo_live", Config(num_iterations=30))
    cfg = cfg.replace(plotter=dataclasses.replace(cfg.plotter, async_viz=True))
    C.run_demo(cfg, seed=0, live=True)


def test_async_viz_ukf_and_posegraph_headless():
    """Async viz with the extended frame layout: UKF sigma points +
    covariance, and the pose-graph panel, all through the ring buffer
    (plotting_node.py:337-372,444-455 parity in async mode)."""
    import dataclasses

    import matplotlib

    matplotlib.use("Agg")
    from live_ekf_slam_tpu import native
    from live_ekf_slam_tpu import cli as C
    from live_ekf_slam_tpu.config import Config, preset

    if not native.available():
        import pytest

        pytest.skip("native lib not built")
    for filt in ("ukf_slam", "pose_graph"):
        cfg = preset("filter_demo_live", Config(num_iterations=25))
        cfg = cfg.replace(
            filter=filt,
            plotter=dataclasses.replace(
                cfg.plotter, async_viz=True,
                # exercise the measurement-connection block of the frame
                # layout in the pose-graph pass
                pg_show_meas_connections=(filt == "pose_graph"),
            ),
        )
        avg = C.run_demo(cfg, seed=0, live=True)
        assert np.isfinite(avg)


def test_apriltag_detector_config_schema():
    """hw.apriltag: the reference's landmark_detection_pkg config pair
    (settings.yaml tag36h11 detector params, tags.yaml standalone tag
    registry) loads unchanged and filters detections to registered ids."""
    import textwrap

    from live_ekf_slam_tpu.hw.apriltag import (
        DetectorSettings, TagDetection, TagRegistry, load_detector_config,
    )

    settings_yaml = textwrap.dedent("""\
        tag_family:        'tag36h11'
        tag_threads:       2
        tag_decimate:      1.0
        tag_blur:          0.0
        tag_refine_edges:  1
        tag_debug:         0
        max_hamming_dist:  2
        publish_tf:        true
        transport_hint:    "raw"
    """)
    tags_yaml = textwrap.dedent("""\
        standalone_tags:
          [
            {id: 0, size: 0.054},
            {id: 1, size: 0.054},
            {id: 8, size: 0.02635},
          ]
        tag_bundles:
          [
          ]
    """)
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        sp = os.path.join(d, "settings.yaml")
        tp = os.path.join(d, "tags.yaml")
        with open(sp, "w") as f:
            f.write(settings_yaml)
        with open(tp, "w") as f:
            f.write(tags_yaml)
        settings, registry = load_detector_config(sp, tp)

    assert settings.tag_family == "tag36h11"
    assert settings.max_hamming_dist == 2
    assert registry.ids == {0, 1, 8}
    assert registry.size_of(8) == 0.02635
    assert registry.size_of(99) is None

    dets = [
        TagDetection(tag_id=0, translation=(1.0, 0.0, 0.5)),
        TagDetection(tag_id=99, translation=(2.0, 0.0, 0.5)),
        TagDetection(tag_id=8, translation=(0.5, 0.2, 0.5)),
    ]
    kept = registry.filter_detections(dets)
    assert [d.tag_id for d in kept] == [0, 8]

    # invalid configs are rejected
    import pytest

    with pytest.raises(ValueError):
        DetectorSettings(tag_family="not_a_family")
    with pytest.raises(ValueError):
        TagRegistry(standalone_tags=[
            {"id": 0, "size": 0.05}, {"id": 0, "size": 0.05},
        ])


def test_matrix_to_artifacts_script(tmp_path):
    """scripts/matrix_to_artifacts.py: docs/accuracy_matrix.json -> the
    reference's offline artifact tree (data/<run>/*.csv one-float-per-line
    + plots/err_comparisons/<run>.png, make_bar_graphs.py layout), with
    per-run CSV means pinned to the matrix means."""
    import json
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    matrix = os.path.join(repo, "docs", "accuracy_matrix.json")
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "scripts", "matrix_to_artifacts.py"),
         "--matrix", matrix, "--data-dir", str(tmp_path / "data"),
         "--plots-dir", str(tmp_path / "plots"), "--runs", "10"],
        capture_output=True, text=True, env={**os.environ,
                                             "MPLBACKEND": "Agg"},
    )
    assert r.returncode == 0, r.stderr[-2000:]
    with open(matrix) as f:
        mat = json.load(f)
    n_pgs = sum(1 for k in mat["configs"] if not k.startswith("solo_"))
    runs = sorted(p.name for p in (tmp_path / "data").iterdir())
    assert len(runs) == n_pgs
    # reference naming + mean pinning for one known config
    assert "naive_high_noise_one_time" in runs
    vals = [float(x) for x in (
        tmp_path / "data" / "naive_high_noise_one_time" / "naive.csv"
    ).read_text().split()]
    assert len(vals) == 10
    ref_mean = mat["configs"]["naive_high_one_time"]["secondary"]["mean"]
    assert abs(np.mean(vals) - ref_mean) < 1e-6
    pngs = sorted(p.name for p in (tmp_path / "plots").iterdir())
    assert len(pngs) == n_pgs and pngs[0].endswith(".png")


def test_committed_artifact_trees_match_their_stats():
    """The committed data/ trees must track their source JSONs: data/<run>/
    is the calibrated compat tree (adopted profile W ×5 high rows +
    shared-with-C low rows) and data/honest_mode/<run>/ the params-default
    matrix — so same-named files stay number-comparable with the
    reference's published CSVs (VERDICT r4 #3; base_pkg/data layout,
    make_bar_graphs.py:57-79)."""
    import json

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    def load_cfgs(*paths):
        merged = {}
        for p in paths:
            with open(os.path.join(repo, "docs", p)) as f:
                merged.update(json.load(f)["configs"])
        return merged

    def check_tree(data_dir, cfgs):
        for name, cfg in cfgs.items():
            if name.startswith("solo_"):
                continue
            mode = "iter" if name.endswith("_iter") else "one_time"
            sec_noise = name[: -(len(mode) + 1)]
            secondary, noiselvl = sec_noise.rsplit("_", 1)
            ref_sec = "ekf" if secondary == "ekf_slam" else secondary
            run_dir = os.path.join(
                repo, data_dir, f"{ref_sec}_{noiselvl}_noise_{mode}")
            assert os.path.isdir(run_dir), run_dir
            for csv, col in ((f"{ref_sec}.csv", "secondary"),
                             ("pose_graph_result.csv", "pgs_result")):
                vals = np.loadtxt(os.path.join(run_dir, csv))
                assert abs(vals.mean() - cfg[col]["mean"]) < 1e-6, (
                    run_dir, csv, vals.mean(), cfg[col]["mean"])

    check_tree("data", load_cfgs("reference_parity.json",
                                 "reference_parity_w5x.json"))
    check_tree(os.path.join("data", "honest_mode"),
               load_cfgs("accuracy_matrix_v2.json"))
    # magnitude parity of the calibrated tree with the reference's own
    # published mean (ekf_high_noise_iter: published 1.397, adopted-profile
    # repo ~1.32 — same regime, vs honest mode's ~0.12)
    cal = np.loadtxt(os.path.join(
        repo, "data", "ekf_high_noise_iter", "ekf.csv")).mean()
    honest = np.loadtxt(os.path.join(
        repo, "data", "honest_mode", "ekf_high_noise_iter", "ekf.csv")).mean()
    assert 0.9 < cal < 1.8, cal
    assert honest < 0.3, honest


def test_reference_parity_smoke(tmp_path):
    """scripts/reference_parity.py --smoke --solos-only: the published-
    magnitude parity pipeline (calibration secant + compat solo configs,
    reference_parity.py) runs end-to-end on CPU and emits the structure
    parity_report.py consumes."""
    import json
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = tmp_path / "parity.json"
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "scripts", "reference_parity.py"),
         "--smoke", "--solos-only", "--out", str(out)],
        capture_output=True, text=True,
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )
    assert r.returncode == 0, (r.stdout + r.stderr)[-2000:]
    with open(out) as f:
        d = json.load(f)
    assert d["profile"] == "ang"
    assert set(d["calibration"]) == {"high", "low"}
    for regime in ("high", "low"):
        assert d["calibration"][regime]["scale"] > 0
    for name in ("solo_naive_high", "solo_ekf_slam_high",
                 "solo_naive_low", "solo_ekf_slam_low"):
        filt = "ekf_slam" if "ekf" in name else "naive"
        st = d["configs"][name][filt]
        assert np.isfinite(st["mean"]) and st["n"] > 0, (name, st)
    # the high-noise profile must actually be hotter than the low one
    assert d["calibration"]["high"]["scale"] > d["calibration"]["low"]["scale"]


def test_adopted_profile_config_chain():
    """The adopted noise-profile reconstruction (REFERENCE_PARITY.md:
    V_11 ×10, W ×5) pins an exact config chain: the sim runs a hotter
    angular process dial and ×5 sensing half-widths, and — through the
    reference's V/W-overwrite quirk (filter.h:110-117) — the pose graph's
    between-factor sigmas become the SCALED SENSING half-widths while the
    bearing-range sigmas stay (1, 1): exactly the reweighting the W-dial
    family sweep measured. A change to any link (make_compat_cfg,
    CompatConfig, filter_noise, _noise_sigmas) that silently altered the
    adopted profile would break this before it could skew a
    re-measurement."""
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.join(repo, "scripts"))
    try:
        from accuracy_matrix import HIGH_NOISE
        from reference_parity import make_compat_cfg
    finally:
        sys.path.pop(0)
    from live_ekf_slam_tpu.config import Config
    from live_ekf_slam_tpu.models.posegraph import _noise_sigmas

    base = Config(num_iterations=100)
    cfg = make_compat_cfg(base, 10.0, "pose_graph", secondary="naive",
                          iterative=False, profile="ang", w_scale=5.0)
    # sim dials: angular process x10, forward unscaled, sensing x5
    assert cfg.process_noise.V_00 == HIGH_NOISE["V_00"]
    assert cfg.process_noise.V_11 == HIGH_NOISE["V_11"] * 10.0
    assert cfg.sensing_noise.W_00 == HIGH_NOISE["W_00"] * 5.0
    assert cfg.sensing_noise.W_11 == HIGH_NOISE["W_11"] * 5.0
    assert cfg.compat.noise_vw_swap and cfg.compat.pg_variances_as_sigmas
    # quirk: the filters see V <- scaled sensing half-widths, W <- I2
    (v00, v11), (w00, w11) = cfg.filter_noise()
    assert (v00, v11) == (cfg.sensing_noise.W_00, cfg.sensing_noise.W_11)
    assert (w00, w11) == (1.0, 1.0)
    # graph wiring: between-factor sigmas ARE the scaled sensing
    # half-widths (0.05 at W x5); bearing-range sigmas stay (1, 1)
    odom_s, meas_s = _noise_sigmas(cfg)
    assert tuple(np.round(odom_s, 12)) == (0.05, 0.05, 0.05)
    assert tuple(meas_s) == (1.0, 1.0)


def test_parity_report_renders(tmp_path):
    """scripts/parity_report.py renders the committed on-chip parity JSON
    into the full markdown report (all 8 PGS rows + the probe tables)."""
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = tmp_path / "REFERENCE_PARITY.md"
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "scripts", "parity_report.py"),
         "--json", os.path.join(repo, "docs", "reference_parity.json"),
         "--out", str(out)],
        capture_output=True, text=True, cwd=repo,
    )
    assert r.returncode == 0, (r.stdout + r.stderr)[-2000:]
    assert "(8/8 PGS rows)" in r.stdout
    text = out.read_text()
    for section in ("## The unrecorded noise profile", "## Calibration",
                    "## The 8 published pose-graph configs",
                    "## Scorecard: every published number, C vs D",
                    "## What remains unexplained",
                    "Remaining-DOF sweep"):
        assert section in text, section
    # the adjudication totals line is computed from the committed JSONs
    assert "Totals — C:" in text and "D:" in text
    # every published config row is present (low rows carry the
    # shared-with-C dagger)
    for row in ("| naive_high_one_time |", "| ekf_slam_low_iter† |"):
        assert row in text, row
    # adoption invariant: the profile named in the header is the member
    # whose all-22 scorecard row is bolded, and it has the family's max
    # inside-the-CI count (the renderer picks it by rank(), so a data
    # change that dethrones it must also move the narrative)
    import re

    m = re.search(r"\*\*Adopted reconstruction: ([^*]+)\*\*", text)
    assert m, "missing adopted-reconstruction statement"
    bold_row = re.search(r"\| \*\*(.+?) \(adopted\)\*\* \| \*\*(\d+)/20",
                         text)
    assert bold_row, "missing bolded adopted row in the all-22 table"
    insides = [int(n) for n in re.findall(r"\| (\d+)/20 inside", text)]
    assert int(bold_row.group(2)) == max(insides), (bold_row.group(0),
                                                    insides)
    # floor-aware reachability renders when any budget sweep exists
    if "### The W-dial family" in text:
        assert "Floors are each member's best measured pgs_result" in text


def test_parity_report_low_noise_floor_section(tmp_path):
    """The phase-8 low-noise convergence sweeps render an adjudication
    subsection: a floor at/below the published value is declared
    convergence-explainable, one that stays above it is not, and a split
    outcome says so explicitly."""
    import json as _json
    import shutil
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    docs = os.path.join(repo, "docs")
    workdir = tmp_path / "docs"
    workdir.mkdir()
    for f in os.listdir(docs):
        if f.endswith(".json") or f.endswith(".jsonl"):
            shutil.copy(os.path.join(docs, f), workdir / f)
    # synthetic naive floor passing BELOW published 0.192 -> explainable
    (workdir / "pgs_convergence_low.json").write_text(_json.dumps({
        "worlds": 64, "budgets": {
            "50x40": {"pgs_result": {"mean": 0.24, "ci95": 0.01, "n": 64}},
            "400x80": {"pgs_result": {"mean": 0.185, "ci95": 0.01,
                                      "n": 64}}}}))
    # synthetic EKF floor staying ABOVE published 0.181 -> not explainable
    (workdir / "pgs_convergence_low_ekf.json").write_text(_json.dumps({
        "worlds": 64, "budgets": {
            "50x40": {"pgs_result": {"mean": 0.22, "ci95": 0.008, "n": 64}},
            "400x80": {"pgs_result": {"mean": 0.21, "ci95": 0.008,
                                      "n": 64}}}}))
    out = tmp_path / "REFERENCE_PARITY.md"
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "scripts", "parity_report.py"),
         "--json", str(workdir / "reference_parity.json"),
         "--out", str(out)],
        capture_output=True, text=True, cwd=repo,
    )
    assert r.returncode == 0, (r.stdout + r.stderr)[-2000:]
    text = out.read_text()
    assert "### The low-noise misses against the same convergence DOF" in text
    assert "explainable by early stopping" in text
    assert "NOT a convergence artifact" in text
    assert "The floors split" in text


def test_parity_report_cx_floor_at_uniform_protocol(tmp_path):
    """Once the C-profile budget sweep exists at the uniform 64-world
    on-chip protocol (docs/pgs_convergence_cx.json, >1 budget), the
    renderer must (a) source the W x1 reachability floor from it instead
    of the 8-world CPU probe and (b) add the matrix-scale exclusion row
    to the appendix sweep table."""
    import json as _json
    import shutil
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    docs = os.path.join(repo, "docs")
    workdir = tmp_path / "docs"
    workdir.mkdir()
    for f in os.listdir(docs):
        if f.endswith(".json") or f.endswith(".jsonl"):
            shutil.copy(os.path.join(docs, f), workdir / f)
    (workdir / "pgs_convergence_cx.json").write_text(_json.dumps({
        "worlds": 64, "budgets": {
            "50x40": {"pgs_result": {"mean": 2.05, "ci95": 0.23, "n": 64}},
            "150x40": {"pgs_result": {"mean": 1.92, "ci95": 0.25, "n": 64}},
            "400x80": {"pgs_result": {"mean": 1.80, "ci95": 0.24,
                                      "n": 64}}}}))
    out = tmp_path / "REFERENCE_PARITY.md"
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "scripts", "parity_report.py"),
         "--json", str(workdir / "reference_parity.json"),
         "--out", str(out)],
        capture_output=True, text=True, cwd=repo,
    )
    assert r.returncode == 0, (r.stdout + r.stderr)[-2000:]
    text = out.read_text()
    # (a) the W x1 floor row now cites the chip sweep's best point, n=64
    assert "W ×1 (C): `pgs_convergence_cx.json`" in text
    assert "floor 1.80 (400x80, n=64)" in text
    # C stays unreachable at matrix scale (floor far above published 0.93)
    import re

    wx1 = next(l for l in text.splitlines() if l.startswith("| W ×1 (C) |"))
    assert "UNREACHABLE" in wx1 or "no —" in wx1
    # (b) the appendix gains the uniform-protocol confirmation row
    assert re.search(
        r"\| Solver budget, re-run at the uniform protocol \(n=64, chip\) "
        r"\| 50x40: 2\.05 → 150x40: 1\.92 → 400x80: 1\.80 \| C's floor "
        r"stays far above the published 0\.93", text), text[-3000:]


def test_probe_index_covers_every_docs_json():
    """docs/PROBES.md is the provenance index: every measurement JSON in
    docs/ must have a row (question -> answer -> superseded-by), and every
    file the index cites must exist. Keeps the evidence auditable as
    probes accumulate."""
    import re

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    docs = os.path.join(repo, "docs")
    with open(os.path.join(docs, "PROBES.md")) as f:
        idx = f.read()
    listed = set(re.findall(r"`([\w./]+\.jsonl?)`", idx))
    actual = {f for f in os.listdir(docs)
              if f.endswith(".json") or f.endswith(".jsonl")}
    assert actual - listed == set(), (
        f"docs JSONs missing a PROBES.md row: {sorted(actual - listed)}")
    assert listed - actual == set(), (
        f"PROBES.md cites files that do not exist: {sorted(listed - actual)}")

    # every bench_runs.jsonl line is a parseable on-chip record with the
    # fields BENCHMARKS.md's tables are built from
    import json as _json

    with open(os.path.join(docs, "bench_runs.jsonl")) as f:
        rows = [_json.loads(line) for line in f if line.strip()]
    assert rows, "bench_runs.jsonl must hold at least one on-chip record"
    for r in rows:
        assert r["platform"] == "tpu", r
        for k in ("ts", "filter", "worlds", "t",
                  "steps_per_sec_per_world", "rep_times_s", "avg_err_m"):
            assert k in r, (k, r)


def test_bench_probe_rides_out_refusal_window(monkeypatch):
    """tpu_reachable must retry with FRESH probe processes: a child that
    connects during the tunnel's post-exit refusal window hangs forever,
    while the next fresh connection succeeds (observed r5 queue logs)."""
    import importlib.util
    import subprocess
    import sys as _sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "bench_mod", os.path.join(repo, "bench.py"))
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    monkeypatch.setenv("BENCH_PROBE_GAP", "0")
    calls = {"n": 0}

    class _Ok:
        returncode = 0
        stdout = "ok tpu 128.0"
        stderr = ""

    def fake_run(*a, **kw):
        calls["n"] += 1
        if calls["n"] == 1:
            raise subprocess.TimeoutExpired(cmd="probe", timeout=kw["timeout"])
        return _Ok()

    monkeypatch.setattr(bench.subprocess, "run", fake_run)
    ok, detail = bench.tpu_reachable(timeout_s=1)
    assert ok and detail == "ok tpu 128.0" and calls["n"] == 2

    # every attempt hangs -> structured failure naming the attempt count
    calls["n"] = 0

    def always_hang(*a, **kw):
        calls["n"] += 1
        raise subprocess.TimeoutExpired(cmd="probe", timeout=kw["timeout"])

    monkeypatch.setattr(bench.subprocess, "run", always_hang)
    monkeypatch.setenv("BENCH_PROBE_ATTEMPTS", "3")
    monkeypatch.setenv("BENCH_PROBE_DEADLINE", "0")
    ok, detail = bench.tpu_reachable(timeout_s=1)
    assert not ok and calls["n"] == 3 and "x3" in detail

    # the wall-clock deadline extends probing past the attempt count (the
    # observed refusal windows vary 4-15 min; a fixed count under-rides
    # the long ones) — with an instant always-hang fake and a 1 s deadline
    # the loop must keep trying well beyond the 3-attempt minimum
    calls["n"] = 0
    monkeypatch.setenv("BENCH_PROBE_DEADLINE", "1")
    ok, detail = bench.tpu_reachable(timeout_s=1)
    assert not ok and calls["n"] > 3 and f"x{calls['n']}" in detail
