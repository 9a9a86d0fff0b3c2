import numpy as np
import jax.numpy as jnp
import pytest

from lio_slam_tpu.config import GpsConfig
from lio_slam_tpu.pipeline import gps_fusion as gf
from lio_slam_tpu.utils import enu


class TestEnu:
    def test_forward_reverse_roundtrip(self):
        lc = enu.LocalCartesian(39.90, 116.40, 50.0)
        for d_lat, d_lon, dh in [(0.001, 0.002, 10), (-0.005, 0.001, -5),
                                 (0.0, 0.0, 0.0)]:
            lat, lon, h = 39.90 + d_lat, 116.40 + d_lon, 50.0 + dh
            e = lc.forward(lat, lon, h)
            lat2, lon2, h2 = lc.reverse(e)
            assert abs(lat2 - lat) < 1e-9
            assert abs(lon2 - lon) < 1e-9
            assert abs(h2 - h) < 1e-6

    def test_forward_scale(self):
        """1e-5 deg of latitude ~= 1.11 m of northing."""
        lc = enu.LocalCartesian(45.0, 7.0, 0.0)
        e = lc.forward(45.00001, 7.0, 0.0)
        assert abs(e[1] - 1.11) < 0.01
        assert abs(e[0]) < 1e-6

    def test_heading_convention(self):
        assert enu.heading_from_yaw(np.pi / 2) == pytest.approx(0.0)   # facing north
        assert enu.heading_from_yaw(0.0) == pytest.approx(90.0)        # facing east


class TestIntake:
    def test_first_fix_averaging(self):
        cfg = GpsConfig(first_fix_average=5)
        intake = gf.GpsIntake(cfg)
        fixes = [(39.9 + i * 1e-6, 116.4, 50.0) for i in range(5)]
        for i, (la, lo, al) in enumerate(fixes):
            obs = intake.on_fix(float(i), la, lo, al)
            assert obs is not None
        assert intake._datum_fixed
        np.testing.assert_allclose(intake.datum[0], 39.9 + 2e-6, atol=1e-9)
        # a fix at the averaged datum now lands near the ENU origin
        obs = intake.on_fix(6.0, intake.datum[0], intake.datum[1], intake.datum[2])
        assert np.linalg.norm(obs.enu) < 1e-3

    def test_status_gate(self):
        intake = gf.GpsIntake(GpsConfig())
        assert intake.on_fix(0.0, 39.9, 116.4, 50.0, status=-1) is None

    def test_jump_gate(self):
        cfg = GpsConfig(gps_cov_threshold=2.0, first_fix_average=1)
        intake = gf.GpsIntake(cfg)
        intake.on_fix(0.0, 39.9, 116.4, 50.0)
        ok = intake.on_fix(1.0, 39.900001, 116.4, 50.0)   # ~0.1 m jump
        assert ok.accurate
        bad = intake.on_fix(2.0, 39.9001, 116.4, 50.0)    # ~11 m jump
        assert not bad.accurate


class TestFSM:
    def test_jam_recover_cycle(self):
        cfg = GpsConfig(gps_waiting_time=5.0, gps_data_waiting_time=2.0)
        fsm = gf.PositioningModeFSM(cfg)
        fsm.on_gps(0.0)
        assert fsm.step(0.1, now=0.1) == gf.MODE_NORMAL
        # corrected stream goes stale -> jam
        assert fsm.step(5.0, now=5.0) == gf.MODE_JAMMED
        # stream returns -> recovering with converge timer
        fsm.on_gps(6.0)
        assert fsm.step(6.1, now=6.1) == gf.MODE_RECOVERING
        assert fsm.converging
        # stays recovering until the timer passes gps_data_waiting_time
        fsm.on_gps(7.0)
        assert fsm.step(7.05, now=7.0) == gf.MODE_RECOVERING
        fsm.on_gps(8.5)
        assert fsm.step(8.55, now=8.5) == gf.MODE_NORMAL
        # converging clears only after gps_waiting_time
        assert fsm.converging
        fsm.mode = gf.MODE_RECOVERING
        fsm.on_gps(12.0)
        fsm.step(12.05, now=12.0)
        assert not fsm.converging

    def test_source_selection(self):
        fsm = gf.PositioningModeFSM(GpsConfig())
        fsm.mode = gf.MODE_NORMAL
        assert fsm.select_source(10.0, 10.5) == "raw"
        fsm.mode = gf.MODE_JAMMED
        assert fsm.select_source(10.0, 10.5) == "fusion"
        fsm.mode = gf.MODE_NORMAL
        assert fsm.select_source(10.0, 10.5, switch_gps_data=False) == "fusion"
        assert fsm.select_source(10.0, 50.0, switch_gps_data=False) == "raw"


def test_fusion_output_roundtrip():
    lc = enu.LocalCartesian(39.9, 116.4, 50.0)
    pose = np.array([0.01, -0.02, np.pi / 2, 100.0, 200.0, 5.0])
    out = gf.fusion_gps_output(pose, 1.5, lc)
    # reproject the reported lat/lon: must land back at (100, 200, 5)
    e = lc.forward(out.latitude, out.longitude, out.altitude)
    np.testing.assert_allclose(e, [100.0, 200.0, 5.0], atol=1e-4)
    assert out.heading == pytest.approx(0.0, abs=1e-6)
    assert out.roll == pytest.approx(np.rad2deg(0.01))


class TestGpsFactorsInPipeline:
    def test_gps_pulls_drifting_trajectory(self):
        """Run the mapping step with GPS enabled and a forced low covariance
        threshold; GPS factors must be added and pull the estimate."""
        from lio_slam_tpu.config import (Config, StaticConfig,
                                         RegistrationConfig)
        from lio_slam_tpu.io import synthetic
        from lio_slam_tpu.pipeline import lio
        from lio_slam_tpu.utils import pointcloud as pc, se3

        cfg = Config(
            static=StaticConfig(
                max_raw_points=4096, max_scan_points=4096, max_map_points=16384,
                max_keyframes=32, max_keyframe_points=2048,
                max_loop_queue=4, max_gps_queue=8, window_size=16),
            registration=RegistrationConfig(degeneracy_eig_thresh=10.0),
        )
        cfg = cfg.replace(gps=cfg.gps.__class__(
            use_gps=True, pose_cov_threshold=-1.0,   # always "uncertain"
            gps_distance_frequency=1.0, min_travel_before_gps=1.0))
        seq = synthetic.make_sequence(n_scans=14, n_points=4096, seed=0,
                                      speed=3.0)
        step = lio.make_lio_step(cfg)
        state = lio.init_state(cfg)
        prev = None
        for i in range(14):
            if i == 0:
                guess = np.zeros(6, np.float32); gvalid = False
            else:
                inc = se3.pose6_between(jnp.asarray(seq.poses[i - 1]),
                                        jnp.asarray(seq.poses[i]))
                guess = np.asarray(se3.pose6_compose(jnp.asarray(prev), inc))
                gvalid = True
            rel = np.asarray(se3.pose6_between(jnp.asarray(seq.poses[0]),
                                               jnp.asarray(seq.poses[i])))
            inp = lio.ScanInput(
                cloud=pc.Cloud(xyz=jnp.asarray(seq.scans[i]),
                               mask=jnp.asarray(seq.scan_masks[i])),
                stamp=jnp.float32(seq.stamps[i]),
                init_guess=jnp.asarray(guess), guess_valid=jnp.asarray(gvalid),
                imu_rpy=jnp.asarray(seq.imu_rpy[i]),
                imu_available=jnp.asarray(True),
                gps_pos=jnp.asarray(rel[3:]),        # GPS = anchored truth
                gps_info=jnp.full(3, 100.0),
                gps_valid=jnp.asarray(True),
            )
            state, out = step(state, inp)
            prev = np.asarray(out.pose)
        assert int(state.gps_count) >= 1
        assert bool(state.graph.gps_mask.any())
        assert np.isfinite(prev).all()
