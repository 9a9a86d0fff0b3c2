"""Real-bag-path end-to-end tests.

These close the validation loop the reference closes with `rosbag play`
(src/liorf/README.md:137-158): a REAL epoch-stamped .bag file is written by
io.synthetic_bag, replayed through `replay_bag` -> Runner.process_scan, and
the mission is scored (ATE, loop closures, GPS factor gating).

Regression coverage for the float32-epoch-timestamp bug: at stamp ~1.7e9 the
f32 ulp is 128 s, so un-rebased stamps silently destroy the 30 s loop gate
and the 10 s recent-keyframe window.  Every test here uses epoch stamps.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from lio_slam_tpu.config import (Config, StaticConfig, RegistrationConfig,
                                 GpsConfig, LoopClosureConfig)
from lio_slam_tpu.io import formats, synthetic
from lio_slam_tpu.io.bag_replay import BagTopics, replay_bag
from lio_slam_tpu.io.synthetic_bag import write_synthetic_bag
from lio_slam_tpu.pipeline.runner import Runner
from lio_slam_tpu.utils import se3

EPOCH = 1.7e9


def bag_cfg(**kw):
    return Config(
        static=StaticConfig(max_raw_points=4096, max_scan_points=4096,
                            max_map_points=16384, max_keyframes=64,
                            max_keyframe_points=2048, max_loop_queue=4,
                            max_gps_queue=8, window_size=16,
                            max_imu_window=128),
        registration=RegistrationConfig(degeneracy_eig_thresh=10.0),
        **kw)


def rebase_truth(poses):
    return np.stack([
        np.asarray(se3.pose6_between(jnp.asarray(poses[0]), jnp.asarray(p)))
        for p in poses])


# ---------------------------------------------------------------------------
# epoch-stamp regression (unit-level, no bag)
# ---------------------------------------------------------------------------

def test_epoch_stamps_rebased_in_runner():
    """Feeding epoch-magnitude stamps must leave only mission-relative times
    on device: keyframe stamps stay small and the trajectory is identical to
    the same mission at zero-based stamps."""
    seq = synthetic.make_sequence(n_scans=6, n_points=2048, seed=3)

    def run(offset):
        runner = Runner(Config(
            static=StaticConfig(max_raw_points=2048, max_scan_points=2048,
                                max_map_points=8192, max_keyframes=16,
                                max_keyframe_points=1024, max_loop_queue=2,
                                max_gps_queue=2, window_size=8,
                                max_imu_window=32),
            registration=RegistrationConfig(degeneracy_eig_thresh=10.0)),
            loop_every=100)
        for i in range(6):
            m = seq.scan_masks[i]
            scan = formats.StandardScan(
                xyz=seq.scans[i][m],
                intensity=np.zeros(int(m.sum()), np.float32),
                ring=np.zeros(int(m.sum()), np.uint16),
                time=np.zeros(int(m.sum()), np.float32),
                stamp=float(seq.stamps[i]) + offset)
            runner.process_scan(scan)
        return runner

    r_epoch = run(EPOCH)
    r_zero = run(0.0)
    n = int(r_epoch.state.store.count)
    stamps = np.asarray(r_epoch.state.store.stamps[:n])
    assert stamps.max() < 1e5, "device keyframe stamps must be mission-relative"
    np.testing.assert_allclose(np.stack(r_epoch.trajectory),
                               np.stack(r_zero.trajectory), atol=1e-5)


# ---------------------------------------------------------------------------
# full bag replay: loop mission
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def loop_bag(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("bags") / "loop.bag")
    n = 36
    truth = write_synthetic_bag(
        path, n_scans=n, n_points=4096, seed=0, epoch=EPOCH,
        scan_period=1.0, yaw_rate=2 * np.pi / n, speed=2.0)
    return path, truth


@pytest.fixture(scope="module")
def loop_replay(loop_bag):
    path, truth = loop_bag
    runner = Runner(bag_cfg(), loop_every=1)
    results = list(replay_bag(runner, path, BagTopics()))
    return runner, results, truth


@pytest.mark.slow
def test_bag_replay_processes_all_scans(loop_replay):
    runner, results, truth = loop_replay
    assert len(results) == len(truth.stamps)
    assert int(runner.state.store.count) >= 30


@pytest.mark.slow
def test_bag_replay_ate(loop_replay):
    runner, results, truth = loop_replay
    est = np.stack([r.pose for r in results])
    rel = rebase_truth(truth.poses)
    d = est[:, 3:] - rel[:, 3:]
    ate = float(np.sqrt((d * d).sum(1).mean()))
    assert ate < 0.5, f"bag-replay ATE {ate:.3f} m"


@pytest.mark.slow
def test_bag_replay_loop_closes(loop_replay):
    """The circular mission revisits its start after >30 s: the loop detector
    must fire on epoch-stamped data (the f32 bug made this gate impossible)."""
    runner, results, truth = loop_replay
    assert int(runner.state.loop_count) >= 1


@pytest.mark.slow
def test_bag_replay_deskew_active(loop_replay):
    """The bag carries rotational in-sweep skew; the pipeline must have used
    the IMU window (imu_rate_poses present on every scan after the first)."""
    _, results, _ = loop_replay
    assert any(r.imu_rate_poses is not None for r in results[1:])


# ---------------------------------------------------------------------------
# GPS mission: covariance plumbing + gating
# ---------------------------------------------------------------------------

def test_bag_replay_gps_covariance_gating(tmp_path):
    """NavSatFix covariance must flow bag -> intake -> factor gating: fixes
    with covariance 100 >> gpsCovThreshold are rejected (addGPSFactor
    :1984-1989), good fixes become factors."""
    path = str(tmp_path / "gps.bag")
    n = 16
    write_synthetic_bag(path, n_scans=n, n_points=4096, seed=1, epoch=EPOCH,
                        scan_period=1.0, yaw_rate=0.0, speed=2.0,
                        gps=True, gps_cov=0.25, gps_bad_cov_every=2)
    cfg = bag_cfg(gps=GpsConfig(use_gps=True, gps_cov_threshold=2.0,
                                pose_cov_threshold=0.0,
                                min_travel_before_gps=3.0,
                                gps_distance_frequency=2.0))
    runner = Runner(cfg, loop_every=100)
    results = list(replay_bag(runner, path,
                              BagTopics(gps="/gps/fix")))
    assert len(results) == n
    n_gps = int(runner.state.gps_count)
    assert n_gps >= 2, "good-covariance fixes must become GPS factors"
    # bad-covariance fixes (every 2nd) were rejected: far fewer factors than
    # fixes, and the information stored for accepted factors reflects 0.25
    g = runner.state.graph
    infos = np.asarray(g.gps_info)[np.asarray(g.gps_mask)]
    # the reference floors factor variances at 1.0 m^2 (addGPSFactor :2030),
    # so good fixes (cov 0.25) land at info exactly 1.0; a bad fix (cov 100,
    # info 0.01) would only appear here if the covariance gate leaked it
    assert np.all(infos[:, :2] >= 0.99), \
        "accepted GPS factors must carry the good-fix information"
    assert runner.gps_intake.datum is not None
