"""Live sensor-feed front door (pipeline/live.py) — the production wiring of
the native SPSC sample queues (VERDICT round-1 item 9: 'wire the native
runtime into the live feed or cut the claim').

Covers: native queue vs pure-python twin window parity, 2-scan delay buffer
semantics, stale-pop, GPS pairing, and a full LiveFeed mission matching the
direct process_scan path."""

import numpy as np
import jax.numpy as jnp
import pytest

from lio_slam_tpu.io import formats, synthetic
from lio_slam_tpu.pipeline.live import LiveFeed, _PySampleQueue
from lio_slam_tpu.pipeline.runner import Runner
from lio_slam_tpu.utils import se3

from tests.test_runner import small_cfg, scan_at, imu_between


def native_available():
    try:
        from lio_slam_tpu.io import native
        return native.available()
    except Exception:
        return False


class TestQueueParity:
    def make_stream(self, n=200, seed=0):
        rs = np.random.RandomState(seed)
        ts = np.cumsum(rs.uniform(0.001, 0.005, n)) + 1.7e9
        vals = rs.randn(n, 10).astype(np.float32)
        return ts, vals

    @pytest.mark.skipif(not native_available(), reason="native lib not built")
    def test_native_matches_python_twin(self):
        from lio_slam_tpu.io import native
        ts, vals = self.make_stream()
        nq = native.SampleQueue(10, 4096)
        pq = _PySampleQueue(10, 4096)
        for t, v in zip(ts, vals):
            nq.push(t, v)
            pq.push(t, v)
        # overlapping sliding windows with stale-pop between them
        for (t0, t1) in [(ts[0], ts[50]), (ts[40], ts[120]),
                         (ts[100], ts[-1])]:
            nt, nv = nq.window(t0, t1, margin=0.0)
            pt, pv = pq.window(t0, t1, margin=0.0)
            np.testing.assert_allclose(nt, pt)
            np.testing.assert_allclose(nv, pv)
        assert len(nq) == len(pq)

    @pytest.mark.skipif(not native_available(), reason="native lib not built")
    def test_stale_pop_is_permanent(self):
        from lio_slam_tpu.io import native
        q = native.SampleQueue(10, 64)
        for i in range(10):
            q.push(float(i), np.full(10, i, np.float32))
        q.window(5.0, 9.0, margin=0.0)
        # samples < 5.0 are gone even for an earlier window
        ts, _ = q.window(0.0, 9.0, margin=0.0)
        assert ts.min() >= 5.0


class TestLiveFeed:
    def test_delay_buffer_and_flush(self, ):
        cfg = small_cfg()
        runner = Runner(cfg, loop_every=100)
        feed = LiveFeed(runner, use_native=False)
        seq = synthetic.make_sequence(n_scans=3, n_points=2048, seed=0)
        assert feed.push_scan(scan_at(seq, 0)) is None      # buffer fills
        r1 = feed.push_scan(scan_at(seq, 1))                # processes scan 0
        assert r1 is not None
        r2 = feed.flush()                                   # final scan
        assert r2 is not None
        assert feed.flush() is None
        assert len(runner.trajectory) == 2

    @pytest.mark.parametrize("use_native",
                             [False,
                              pytest.param(True, marks=pytest.mark.skipif(
                                  not native_available(),
                                  reason="native lib not built"))])
    def test_mission_matches_direct_path(self, use_native):
        """LiveFeed(scans+IMU) == direct process_scan with hand-built
        windows: the queue/delay plumbing must not change the estimate."""
        seq = synthetic.make_sequence(n_scans=6, n_points=2048, seed=0)
        cfg = small_cfg()

        # direct path (the test_runner-style harness)
        direct = Runner(cfg, loop_every=100)
        direct_poses = []
        for i in range(6):
            imu = imu_between(seq, i, cfg.imu.gravity) if i else None
            r = direct.process_scan(scan_at(seq, i), imu=imu)
            direct_poses.append(r.pose)

        # live path: same IMU samples pushed at sensor rate
        live = Runner(cfg, loop_every=100)
        feed = LiveFeed(live, use_native=use_native)
        assert feed.native_active == use_native
        results = []
        for i in range(6):
            if i:
                imu = imu_between(seq, i, cfg.imu.gravity)
                for k in range(len(imu["stamps"])):
                    feed.push_imu(imu["stamps"][k], imu["acc"][k],
                                  imu["gyr"][k])
            r = feed.push_scan(scan_at(seq, i))
            if r is not None:
                results.append(r.pose)
        r = feed.flush()
        results.append(r.pose)
        assert len(results) == 6
        np.testing.assert_allclose(np.stack(results),
                                   np.stack(direct_poses), atol=1e-4)

    def test_gps_pairing_window(self):
        cfg = small_cfg()
        from lio_slam_tpu.config import GpsConfig
        import dataclasses
        cfg = dataclasses.replace(cfg, gps=GpsConfig(use_gps=True))
        runner = Runner(cfg, loop_every=100)
        feed = LiveFeed(runner, use_native=False)
        seq = synthetic.make_sequence(n_scans=3, n_points=2048, seed=0)
        feed.push_gps(float(seq.stamps[0]), 39.9, 116.3, 50.0,
                      covariance=np.ones(3))
        feed.push_scan(scan_at(seq, 0))
        feed.push_scan(scan_at(seq, 1))     # processes scan 0 w/ paired fix
        assert runner.gps_intake.datum is not None
        # a stale fix (>0.5 s away) is not paired
        feed2 = LiveFeed(Runner(cfg, loop_every=100), use_native=False)
        feed2.push_gps(float(seq.stamps[0]) - 5.0, 39.9, 116.3, 50.0)
        feed2.push_scan(scan_at(seq, 0))
        feed2.push_scan(scan_at(seq, 1))
        assert feed2.runner.gps_intake.datum is None

    def test_gps_queue_scan_semantics_50hz(self):
        """addGPSFactor queue-scan parity (mapOptmization.cpp:1961-1976): at
        GPS rates above scan rate EVERY in-window fix reaches the intake as a
        candidate (round 2 kept only the newest — datum averaging and the
        jump gate saw a subset), stale fixes pop permanently, newer fixes
        stay queued for the next scan."""
        import dataclasses
        from lio_slam_tpu.config import GpsConfig
        cfg = dataclasses.replace(small_cfg(), gps=GpsConfig(use_gps=True))
        runner = Runner(cfg, loop_every=100)
        feed = LiveFeed(runner, use_native=False)
        seq = synthetic.make_sequence(n_scans=3, n_points=2048, seed=0)
        t0 = float(seq.stamps[0])

        seen = []
        orig = runner.gps_intake.on_fix
        runner.gps_intake.on_fix = \
            lambda s, *a, **k: (seen.append(s), orig(s, *a, **k))[1]

        # 50 Hz corrected stream spanning ~[t0-0.3, t0+0.3] (offsets chosen
        # off the exact +-0.2 window edges to avoid float-boundary wobble)
        for k in range(31):
            feed.push_gps(t0 - 0.299 + k * 0.02, 39.9 + k * 1e-7, 116.3, 50.0,
                          covariance=np.ones(3))
        feed.push_scan(scan_at(seq, 0))
        feed.push_scan(scan_at(seq, 1))     # processes scan 0
        # in-window candidates: |t - t0| <= 0.2 -> k = 5..24 -> 20 fixes
        assert len(seen) == 20
        # full-stream intake: the 5-fix datum averaging completes on ONE scan
        assert runner.gps_intake._datum_fixed
        # stale fixes (< t0-0.2) were popped permanently; newer fixes
        # (> t0+0.2) remain queued for the next scan
        assert all(ts > t0 + 0.2 for (ts, *_) in feed._gps_queue)
        assert len(feed._gps_queue) == 6
