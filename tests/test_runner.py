"""Runner surface tests: the user-facing mission API."""

import numpy as np
import jax.numpy as jnp
import pytest

from lio_slam_tpu.config import Config, StaticConfig, RegistrationConfig
from lio_slam_tpu.io import formats, synthetic
from lio_slam_tpu.pipeline.runner import Runner
from lio_slam_tpu.utils import se3


def small_cfg(**kw):
    return Config(
        static=StaticConfig(max_raw_points=2048, max_scan_points=2048,
                            max_map_points=8192, max_keyframes=16,
                            max_keyframe_points=1024, max_loop_queue=2,
                            max_gps_queue=2, window_size=8, max_imu_window=32),
        registration=RegistrationConfig(degeneracy_eig_thresh=10.0),
        **kw)


@pytest.fixture(scope="module")
def seq():
    return synthetic.make_sequence(n_scans=8, n_points=2048, seed=0)


def scan_at(seq, i):
    m = seq.scan_masks[i]
    return formats.StandardScan(
        xyz=seq.scans[i][m], intensity=np.zeros(int(m.sum()), np.float32),
        ring=np.zeros(int(m.sum()), np.uint16),
        time=np.zeros(int(m.sum()), np.float32), stamp=float(seq.stamps[i]))


def imu_between(seq, i, g):
    inc = np.asarray(se3.pose6_between(jnp.asarray(seq.poses[i - 1]),
                                       jnp.asarray(seq.poses[i])))
    T = 10
    t0, t1 = float(seq.stamps[i - 1]), float(seq.stamps[i])
    # samples span (t0, t1] ending exactly at the scan stamp (like a real
    # stream bracketing the correction time)
    return {"acc": np.tile([0, 0, g], (T, 1)).astype(np.float32),
            "gyr": np.tile(inc[:3] / (t1 - t0), (T, 1)).astype(np.float32),
            "stamps": np.linspace(t0, t1, T + 1)[1:]}


def test_mission_with_imu(seq):
    cfg = small_cfg()
    runner = Runner(cfg, loop_every=100)
    out = None
    for i in range(8):
        imu = imu_between(seq, i, cfg.imu.gravity) if i else None
        out = runner.process_scan(scan_at(seq, i), imu=imu)
    rel = np.asarray(se3.pose6_between(jnp.asarray(seq.poses[0]),
                                       jnp.asarray(seq.poses[7])))
    assert np.abs(out.pose - rel).max() < 0.05
    assert out.imu_rate_poses is not None
    assert not runner.mapping_error
    assert len(runner.trajectory) == 8


def test_throttle_returns_none(seq):
    runner = Runner(small_cfg(mapping_process_interval=0.15), loop_every=100)
    results = [runner.process_scan(scan_at(seq, i)) is not None
               for i in range(6)]
    assert results == [True, False, True, False, True, False]


def test_products_and_checkpoint(tmp_path, seq):
    cfg = small_cfg()
    runner = Runner(cfg, loop_every=100)
    for i in range(5):
        runner.process_scan(scan_at(seq, i))
    pm = runner.local_planning_map()
    assert int(pm.count()) > 50
    hm = runner.height_map()
    assert np.isfinite(np.asarray(hm.elevation)).sum() > 20
    res = runner.save_map(str(tmp_path / "maps"), resolution=0.4)
    assert res.success and res.num_points > 50
    runner.save_checkpoint(str(tmp_path / "c.npz"))
    r2 = Runner(cfg, loop_every=100)
    meta = r2.load_checkpoint(str(tmp_path / "c.npz"))
    assert meta["scan_count"] == 5
    out = r2.process_scan(scan_at(seq, 5))
    assert np.isfinite(out.pose).all()


def test_imu_dropout_reanchor_no_runaway(seq):
    """Regression: an IMU dropout mid-mission must not inflate the
    front-end's velocity estimate.  Before the re-anchor fix, the first
    correction after the gap attributed the whole position innovation to
    velocity and the runaway guesses dragged registration off the map
    (~8 m/scan divergence on the hostile bag)."""
    cfg = small_cfg()
    runner = Runner(cfg, loop_every=100)
    for i in range(8):
        # scans 3-5: dropout (no IMU window at all)
        imu = (imu_between(seq, i, cfg.imu.gravity)
               if i and not 3 <= i <= 5 else None)
        out = runner.process_scan(scan_at(seq, i), imu=imu)
    rel = np.asarray(se3.pose6_between(jnp.asarray(seq.poses[0]),
                                       jnp.asarray(seq.poses[7])))
    # seq moves 0.2 m/scan: even navigating the gap on hold-pose guesses the
    # mission must recover to sub-0.2 m by the end, not run away
    assert np.abs(out.pose[3:] - rel[3:]).max() < 0.2, (out.pose, rel)
    assert not runner.mapping_error


def test_auto_checkpoint_crash_resume(tmp_path, seq):
    """Respawn-parity recovery (module_loam.launch:5-8 respawn="true"): a
    mission with periodic auto-checkpoints is killed mid-run; `Runner.resume`
    restores the latest checkpoint and the continued trajectory stays within
    a bounded discontinuity of an uninterrupted run."""
    cfg = small_cfg()
    ckpt = str(tmp_path / "auto.npz")

    # uninterrupted run = the yardstick
    ref = Runner(cfg, loop_every=100)
    for i in range(8):
        ref.process_scan(scan_at(seq, i),
                         imu=imu_between(seq, i, cfg.imu.gravity) if i else None)

    r1 = Runner(cfg, loop_every=100, auto_checkpoint=ckpt, checkpoint_every=3)
    for i in range(5):
        r1.process_scan(scan_at(seq, i),
                        imu=imu_between(seq, i, cfg.imu.gravity) if i else None)
    del r1                 # crash: no close(), no explicit save

    import os
    assert os.path.exists(ckpt)
    r2 = Runner.resume(ckpt, cfg, loop_every=100)
    # checkpoint landed after 3 processed scans (every 3); scans 3-4 are
    # lost — bounded by checkpoint_every.  Continue the mission from scan 3.
    assert r2.scan_count == 3
    out = None
    for i in range(3, 8):
        out = r2.process_scan(scan_at(seq, i),
                              imu=imu_between(seq, i, cfg.imu.gravity) if i else None)
    assert out is not None and np.isfinite(out.pose).all()
    # resumed final pose matches the uninterrupted mission's
    assert np.abs(out.pose - ref.trajectory[-1]).max() < 0.05


def test_fusion_output_without_gps(seq):
    """fusion_output works with the default (unset) datum at lat/lon 0."""
    runner = Runner(small_cfg(), loop_every=100)
    runner.process_scan(scan_at(seq, 0))
    fo = runner.fusion_output(stamp=0.0)
    assert np.isfinite([fo.latitude, fo.longitude, fo.heading]).all()


def test_record_output_bag(tmp_path, seq):
    """saveBagFlag parity: odometry written per step round-trips through the
    bag reader with the degenerate-flag covariance contract intact."""
    from lio_slam_tpu.io import rosbag as rb

    path = str(tmp_path / "out.bag")
    runner = Runner(small_cfg(), loop_every=100, record_bag=path)
    for i in range(5):
        runner.process_scan(scan_at(seq, i))
    runner.close_bag()

    reader = rb.BagReader(path)
    msgs = [m for m in reader.read_messages(["/liorf/mapping/odometry"])]
    assert len(msgs) == 5
    for i, m in enumerate(msgs):
        od = rb.decode_odometry(m.raw)
        assert np.allclose(od.position, runner.trajectory[i][3:6], atol=1e-6)
        assert od.pose_covariance[0] in (0.0, 1.0)
    # quaternion round-trips to the estimated rpy
    od = rb.decode_odometry(msgs[-1].raw)
    q = np.asarray(od.orientation)  # xyzw
    R = np.asarray(se3.quat_to_matrix(jnp.asarray([q[3], q[0], q[1], q[2]])))
    rpy = np.asarray(se3.matrix_to_rpy(jnp.asarray(R)))
    assert np.allclose(rpy, runner.trajectory[-1][:3], atol=1e-5)


def test_close_autosaves_when_save_pcd(tmp_path, seq):
    """savePCD parity: Runner.close() exports the global map at shutdown."""
    from dataclasses import replace
    from lio_slam_tpu.config import OutputConfig

    cfg = small_cfg(output=OutputConfig(save_pcd=True,
                                        save_directory=str(tmp_path / "auto")))
    with Runner(cfg, loop_every=100) as runner:
        for i in range(3):
            runner.process_scan(scan_at(seq, i))
    import os
    assert os.path.exists(str(tmp_path / "auto" / "GlobalMap.pcd"))


def test_no_recompilation_across_scans(seq):
    """Static-shape discipline: varying live point counts must all pad into
    the same compiled lio_step (recompiles would blow the 100 ms budget)."""
    runner = Runner(small_cfg(), loop_every=100)
    warm = None
    for i in range(6):
        scan = scan_at(seq, i)
        keep = max(50, len(scan.xyz) - i * 137)   # vary the live count
        runner.process_scan(formats.StandardScan(
            xyz=scan.xyz[:keep], intensity=scan.intensity[:keep],
            ring=scan.ring[:keep], time=scan.time[:keep], stamp=scan.stamp))
        if i == 1:
            # after the first scan the argument types stabilize (scan 0's
            # init-guess fallback is host numpy; from then on it is the
            # device-resident last pose — a pjit fastpath-cache entry each,
            # same compiled executable)
            warm = runner.step._cache_size()
    # PjitFunction exposes its variant count: growth after warmup would mean
    # point-count-dependent retraces
    assert runner.step._cache_size() == warm, \
        (warm, runner.step._cache_size())
    # and the warm count itself is bounded: 1 compiled executable reached via
    # at most 2 fastpath entries (host-numpy guess on scan 0, device-resident
    # guess thereafter) — a genuine extra compile of lio_step must fail here
    assert warm <= 2, warm


def test_transform_fusion_stream(seq):
    """The live `odometry/imu` equivalent (TransformFusion,
    imuPreintegration.cpp:107-129): fused high-rate poses exist, are finite,
    and the train is anchored at the previous mapping pose (the increment of
    the first sample relative to itself is identity)."""
    cfg = small_cfg()
    runner = Runner(cfg, loop_every=100)
    out = None
    for i in range(4):
        imu = imu_between(seq, i, cfg.imu.gravity) if i else None
        prev_pose = runner.trajectory[-1] if runner.trajectory else None
        out = runner.process_scan(scan_at(seq, i), imu=imu)
    assert out.fused_rate_poses is not None
    fr = out.fused_rate_poses
    assert np.isfinite(fr).all()
    # first sample's increment vs itself is identity -> fused[0] == prev pose
    np.testing.assert_allclose(fr[0], prev_pose, atol=1e-5)
    # the end of the fused train lands near the new mapping pose (IMU window
    # covers the inter-scan motion)
    assert np.linalg.norm(fr[-1][3:] - out.pose[3:]) < 0.25


def test_sensor_fusion_output_arbitration(seq):
    """sensor_fusion_output source switching (gpsDataHandler :707-724):
    normal mode publishes the raw vehicle record; once the FSM flags a jam,
    the SLAM-fused record takes over."""
    from lio_slam_tpu.config import GpsConfig
    from lio_slam_tpu.pipeline import gps_fusion as gf
    cfg = small_cfg(gps=GpsConfig(use_gps=True, gps_cov_threshold=5.0))
    runner = Runner(cfg, loop_every=100)
    lat0, lon0 = 39.9, 116.3
    for i in range(4):
        imu = imu_between(seq, i, cfg.imu.gravity) if i else None
        fix = (lat0 + 1e-6 * i, lon0, 50.0, 0, np.ones(3) * 0.5)
        runner.process_scan(scan_at(seq, i), imu=imu, gps_fix=fix)
        # raw vehicle stream carries the heading (gpsdata role); arriving
        # right after the corrected fix keeps the FSM in NORMAL
        runner.on_raw_gps(float(seq.stamps[i]), lat0 + 1e-6 * i, lon0, 50.0,
                          heading=90.0)
    # normal mode with switch_gps_data: the raw vehicle record is selected,
    # carrying the raw lat/heading verbatim
    assert runner.fsm.mode == gf.MODE_NORMAL
    rec, src = runner.sensor_fusion_output(float(seq.stamps[3]))
    assert src == "raw"
    assert rec.heading == 90.0
    assert abs(rec.latitude - (lat0 + 3e-6)) < 1e-9
    # a jam (FSM transitions covered in test_gps_fusion) flips the source to
    # the SLAM-fused record
    runner.fsm.mode = gf.MODE_JAMMED
    rec, src = runner.sensor_fusion_output(float(seq.stamps[3]))
    assert src == "fusion"
    assert rec.mode == gf.MODE_JAMMED
    assert abs(rec.latitude - lat0) < 1e-3   # fused geodetic output near datum


def test_mission_log(tmp_path, seq):
    import json
    log_path = str(tmp_path / "mission.jsonl")
    cfg = small_cfg()
    runner = Runner(cfg, loop_every=100, mission_log=log_path)
    for i in range(3):
        imu = imu_between(seq, i, cfg.imu.gravity) if i else None
        runner.process_scan(scan_at(seq, i), imu=imu)
    runner.close()
    recs = [json.loads(l) for l in open(log_path)]
    assert len(recs) == 3
    for r in recs:
        assert {"stamp", "t", "pose", "degenerate", "keyframe", "inliers",
                "mode", "keyframes", "loops", "mapping_error",
                "stage_ms"} <= set(r)
    assert recs[-1]["keyframes"] >= 1
    assert recs[-1]["stage_ms"]["mapping_step"] > 0


def test_inject_loop_constraint(seq):
    """External loop-constraint API (detectLoopClosureExternal parity,
    mapOptmization.cpp:1306-1358): accepted constraints land in the pending
    queue and are consumed into the loop-factor region."""
    from lio_slam_tpu.config import KeyframeConfig
    cfg = small_cfg(keyframe=KeyframeConfig(dist_threshold=0.15))
    runner = Runner(cfg, loop_every=100)
    for i in range(4):
        imu = imu_between(seq, i, cfg.imu.gravity) if i else None
        runner.process_scan(scan_at(seq, i), imu=imu)
    n_kf = int(runner.state.store.count)
    assert n_kf >= 2
    meas = np.asarray(se3.pose6_between(
        runner.state.store.poses[n_kf - 1], runner.state.store.poses[0]))
    # endpoints not live -> rejected
    assert not runner.inject_loop_constraint(n_kf - 1, n_kf + 5, meas)
    assert not runner.inject_loop_constraint(2, 2, meas)
    # valid injection -> queued
    assert runner.inject_loop_constraint(n_kf - 1, 0, meas)
    assert bool(np.asarray(runner.state.pend_mask).any())
    loops_before = int(runner.state.loop_count)
    # the constraint is consumed at the next keyframe save
    for i in range(4, 8):
        runner.process_scan(scan_at(seq, i),
                            imu=imu_between(seq, i, cfg.imu.gravity))
    assert int(runner.state.loop_count) == loops_before + 1
    assert not runner.mapping_error


def test_injected_loop_provenance_logged(tmp_path, seq):
    """Accepted loop constraints are recorded as mission-log events with
    (i, j, fitness, source) — the rviz loop-marker equivalent
    (mapOptmization.cpp:1385-1436; round-4 verdict missing #5)."""
    import json
    from lio_slam_tpu.config import KeyframeConfig
    log_path = str(tmp_path / "mission.jsonl")
    cfg = small_cfg(keyframe=KeyframeConfig(dist_threshold=0.15))
    runner = Runner(cfg, loop_every=100, mission_log=log_path)
    for i in range(4):
        imu = imu_between(seq, i, cfg.imu.gravity) if i else None
        runner.process_scan(scan_at(seq, i), imu=imu)
    n_kf = int(runner.state.store.count)
    meas = np.asarray(se3.pose6_between(
        runner.state.store.poses[n_kf - 1], runner.state.store.poses[0]))
    assert runner.inject_loop_constraint(n_kf - 1, 0, meas)
    runner.close()
    events = [json.loads(l) for l in open(log_path)
              if '"event"' in l]
    loops = [e for e in events if e.get("event") == "loop"]
    assert len(loops) == 1
    ev = loops[0]
    assert ev["source"] == "injected"
    assert ev["i"] == n_kf - 1 and ev["j"] == 0
    assert {"t", "fitness"} <= set(ev)
    # plot_mission's log parser must round-trip the events
    import importlib.util, os as _os
    spec = importlib.util.spec_from_file_location(
        "plot_mission", _os.path.join(_os.path.dirname(__file__), "..",
                                      "tools", "plot_mission.py"))
    pm = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(pm)
    poses, kf_xy, parsed = pm.collect_log(log_path)
    assert len(parsed) == 1 and parsed[0]["source"] == "injected"
    assert len(poses) == 4 and len(kf_xy) == n_kf


def test_health_drain_buffers_result(seq):
    """round-3 advisor: a monitor polling health() between scans must not
    swallow the pending batch's ScanResult."""
    runner = Runner(small_cfg(), loop_every=100, fetch_every=4)
    got = []
    for i in range(8):
        r = runner.process_scan(scan_at(seq, i))
        if r is not None:
            got.append(r)
        if i == 1:                       # mid-batch health poll drains early
            h = runner.health()
            assert "loop_memory_exhausted" in h
    # every scan's result is still surfaced exactly once overall: the early
    # drain's result arrives via the buffered hand-back
    runner.drain()
    assert len(runner.trajectory) == 8
    assert len(got) >= 2                 # batch results still flow


def test_resume_restores_staleness_gate(tmp_path, seq):
    """round-3 advisor (medium): a resume across real downtime must treat the
    first post-resume correction as stale (reinitialize), not correct()
    across the gap."""
    cfg = small_cfg()
    path = str(tmp_path / "ck.npz")
    runner = Runner(cfg, loop_every=100)
    for i in range(4):
        imu = imu_between(seq, i, cfg.imu.gravity) if i else None
        runner.process_scan(scan_at(seq, i), imu=imu)
    runner.save_checkpoint(path)
    assert runner._last_correct_t is not None

    r2 = Runner.resume(path, cfg)
    # persisted last-correction time restored
    assert r2._last_correct_t == pytest.approx(runner._last_correct_t)
    # a scan arriving after a long gap hits the staleness gate: the frontend
    # is re-anchored and the mission continues without velocity runaway
    gap = cfg.imu.max_correction_age + 5.0
    late = scan_at(seq, 5)
    late.stamp = float(late.stamp) + gap
    imu = imu_between(seq, 5, cfg.imu.gravity)
    imu = {**imu, "stamps": np.asarray(imu["stamps"]) + gap}
    out = r2.process_scan(late, imu=imu)
    assert out is not None
    assert np.isfinite(out.pose).all()
    assert not r2.mapping_error
