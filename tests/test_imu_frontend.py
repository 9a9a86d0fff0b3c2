import jax
import jax.numpy as jnp
import numpy as np

from lio_slam_tpu.config import ImuConfig
from lio_slam_tpu.pipeline import imu_frontend as fe
from lio_slam_tpu.utils import se3

G = 9.80511
CFG = ImuConfig(gravity=G)
correct, predict_rate, transform_fusion = fe.make_frontend(CFG)


def imu_window(n, acc, gyr, dt=0.02):
    return (jnp.broadcast_to(jnp.asarray(acc, jnp.float32), (n, 3)),
            jnp.broadcast_to(jnp.asarray(gyr, jnp.float32), (n, 3)),
            jnp.full((n,), dt, jnp.float32),
            jnp.ones((n,), bool))


class TestCorrect:
    def test_first_correction_initializes(self):
        st = fe.init_state()
        acc, gyr, dt, mask = imu_window(10, [0, 0, G], [0, 0, 0])
        pose = jnp.array([0.0, 0.0, 0.5, 1.0, 2.0, 0.3])
        st = correct(st, acc, gyr, dt, mask, pose, jnp.asarray(False))
        assert bool(st.initialized)
        R, t = se3.pose6_to_Rt(pose)
        np.testing.assert_allclose(np.asarray(st.nav.p), np.asarray(t), atol=1e-5)

    def test_tracks_moving_target(self):
        """Constant-velocity motion: after a few corrections the fused
        velocity matches and the predicted pose tracks the lidar poses."""
        st = fe.init_state()
        v = np.array([1.0, 0.0, 0.0])
        for k in range(8):
            pose = jnp.asarray(np.array([0, 0, 0, *(v * 0.2 * k)], np.float32))
            acc, gyr, dt, mask = imu_window(10, [0, 0, G], [0, 0, 0])
            st = correct(st, acc, gyr, dt, mask, pose, jnp.asarray(False))
        np.testing.assert_allclose(np.asarray(st.nav.v), v, atol=0.1)
        assert not bool(st.failure)

    def test_bias_estimated(self):
        """Stationary platform with a constant gyro bias: repeated corrections
        at the fixed pose should absorb the bias."""
        st = fe.init_state()
        bias = np.array([0.02, -0.01, 0.03], np.float32)
        pose = jnp.zeros(6)
        for _ in range(40):
            acc, gyr, dt, mask = imu_window(25, [0, 0, G], bias)
            st = correct(st, acc, gyr, dt, mask, pose, jnp.asarray(False))
        bg = np.asarray(st.bias_gyr)
        # roll/pitch gyro bias is strongly observable; yaw bias converges
        # slower (weaker coupling through the pose measurement)
        np.testing.assert_allclose(bg[:2], bias[:2], atol=5e-3)
        assert 0.3 * bias[2] < bg[2] < 1.5 * bias[2]

    def test_degenerate_inflates_noise(self):
        """With a degenerate flag the lidar pose is trusted less: a jumpy
        measurement moves the state less than with full trust."""
        acc, gyr, dt, mask = imu_window(10, [0, 0, G], [0, 0, 0])
        base = fe.init_state()
        base = correct(base, acc, gyr, dt, mask, jnp.zeros(6), jnp.asarray(False))
        for _ in range(3):  # tighten covariance
            base = correct(base, acc, gyr, dt, mask, jnp.zeros(6), jnp.asarray(False))
        jump = jnp.array([0.0, 0.0, 0.0, 1.0, 0.0, 0.0])
        trusted = correct(base, acc, gyr, dt, mask, jump, jnp.asarray(False))
        distrusted = correct(base, acc, gyr, dt, mask, jump, jnp.asarray(True))
        assert float(trusted.nav.p[0]) > float(distrusted.nav.p[0])

    def test_failure_resets(self):
        st = fe.init_state()
        acc, gyr, dt, mask = imu_window(10, [0, 0, G], [0, 0, 0])
        st = correct(st, acc, gyr, dt, mask, jnp.zeros(6), jnp.asarray(False))
        # teleport 100 m in one 0.2 s window -> absurd velocity, must reset
        far = jnp.array([0.0, 0, 0, 1000.0, 0, 0])
        st2 = correct(st, acc, gyr, dt, mask, far, jnp.asarray(False))
        assert bool(st2.failure)
        assert np.linalg.norm(np.asarray(st2.nav.v)) < 1.0  # reset state


class TestPredictRate:
    def test_imu_rate_poses(self):
        st = fe.init_state()
        acc, gyr, dt, mask = imu_window(10, [0, 0, G], [0, 0, 0])
        st = correct(st, acc, gyr, dt, mask, jnp.zeros(6), jnp.asarray(False))
        # constant yaw rate 0.5 rad/s for 50 samples at 100 Hz
        acc, gyr, dt, mask = imu_window(50, [0, 0, G], [0, 0, 0.5], dt=0.01)
        poses = predict_rate(st, acc, gyr, dt, mask)
        assert poses.shape == (50, 6)
        np.testing.assert_allclose(float(poses[-1, 2]), 0.25, atol=0.01)
        np.testing.assert_allclose(np.asarray(poses[-1, 3:]), 0.0, atol=5e-3)

    def test_masked_tail_holds(self):
        st = fe.init_state()
        a0, g0, d0, m0 = imu_window(10, [0, 0, G], [0, 0, 0])
        st = correct(st, a0, g0, d0, m0, jnp.zeros(6), jnp.asarray(False))
        acc, gyr, dt, _ = imu_window(20, [0, 0, G], [0, 0, 1.0], dt=0.01)
        mask = jnp.arange(20) < 10
        poses = predict_rate(st, acc, gyr, dt, mask)
        np.testing.assert_allclose(np.asarray(poses[9]), np.asarray(poses[-1]),
                                   atol=1e-6)


def test_transform_fusion():
    lidar = jnp.array([0.0, 0.0, 0.3, 1.0, 2.0, 0.0])
    front = jnp.array([0.0, 0.0, 0.1, 0.5, 0.0, 0.0])
    back = jnp.array([0.0, 0.0, 0.1, 1.5, 0.0, 0.0])
    out = transform_fusion(lidar, front, back)
    # increment is 1 m along front's x; lidar yaw 0.3 rotates it
    expect = se3.pose6_compose(lidar, se3.pose6_between(front, back))
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect), atol=1e-5)


def test_high_rate_imu_stream_stays_stable():
    """Two production bugs found by the spinning-scanner benchmark, both
    specific to >=200 Hz IMU streams (round-5):

    1. the fork's fixed 10 ms anti-pileup gate (imuPreintegration.cpp:376)
       replaced EVERY genuine sample of a 500 Hz stream with the stationary
       placeholder — the front-end integrated near-zero rotation and whole
       missions drifted meters.  The gate threshold is now rate-derived.
    2. with 50 fine-dt samples per window the float32 covariance
       propagation lost symmetry/PSD and one Kalman update swung the
       velocity estimate by -5 m/s off a 3 cm innovation (poisoning the
       next guess by ~1 m).  Joseph-form + symmetrization fixed it.

    This replays the exact filter loop that exposed both: 500 Hz windows,
    perfect corrections, guess error must stay centimeters at every scan."""
    from lio_slam_tpu.config import ImuConfig
    from lio_slam_tpu.io import synthetic

    seq = synthetic.make_sweep_sequence(
        n_scans=16, n_points=512, seed=0,
        sensor=synthetic.RigSensor(), speed=2.0)
    cfg = ImuConfig(imu_rate=500.0)
    correct, predict_rate, _tf = fe.make_frontend(cfg)
    acc, gyr, dts, rel_t, imask = synthetic.make_imu_windows(
        seq, 64, samples_per_scan=50, gravity=cfg.gravity, sweep_cover=0.1)
    st = fe.init_state()
    errs = []
    for i in range(1, 16):
        corr = imask[i] & (rel_t[i] <= 1e-6)
        rp = predict_rate(st, jnp.asarray(acc[i]), jnp.asarray(gyr[i]),
                          jnp.asarray(dts[i]), jnp.asarray(corr))
        errs.append(float(np.linalg.norm(
            np.asarray(rp[-1])[3:] - seq.poses[i][3:])))
        st = correct(st, jnp.asarray(acc[i]), jnp.asarray(gyr[i]),
                     jnp.asarray(dts[i]), jnp.asarray(corr),
                     jnp.asarray(seq.poses[i]), jnp.asarray(False))
    # bug 2 produced a 1.02 m spike here; bug 1 made every guess a
    # placeholder integration.  Skip the filter's 2-scan initialization.
    assert max(errs[2:]) < 0.1, f"guess errors unstable: {errs}"
    assert not bool(st.failure)
