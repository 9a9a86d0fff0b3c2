"""The associative-scan preintegration must match the sequential reference."""

import jax
import jax.numpy as jnp
import numpy as np

from lio_slam_tpu.ops import preintegration as pre
from lio_slam_tpu.utils import se3

G = 9.80511


def random_window(n=200, seed=0, masked_tail=0):
    rs = np.random.RandomState(seed)
    acc = jnp.asarray(rs.randn(n, 3).astype(np.float32) * 0.5 + [0, 0, G])
    gyr = jnp.asarray(rs.randn(n, 3).astype(np.float32) * 0.3)
    dt = jnp.asarray(rs.uniform(0.004, 0.006, n).astype(np.float32))
    mask = jnp.asarray(np.arange(n) < (n - masked_tail))
    return acc, gyr, dt, mask


def both(acc, gyr, dt, mask, bg=None, ba=None):
    bg = jnp.zeros(3) if bg is None else jnp.asarray(bg, jnp.float32)
    ba = jnp.zeros(3) if ba is None else jnp.asarray(ba, jnp.float32)
    seq = pre.preintegrate(acc, gyr, dt, mask, bg, ba, 1e-2, 1e-3)
    par = pre.preintegrate_parallel(acc, gyr, dt, mask, bg, ba, 1e-2, 1e-3)
    return seq, par


class TestParallelMatchesSequential:
    def test_deltas(self):
        seq, par = both(*random_window())
        np.testing.assert_allclose(par.dR, seq.dR, atol=2e-5)
        np.testing.assert_allclose(par.dv, seq.dv, atol=2e-4)
        np.testing.assert_allclose(par.dp, seq.dp, atol=2e-4)
        np.testing.assert_allclose(par.dt, seq.dt, atol=1e-6)

    def test_bias_jacobians(self):
        seq, par = both(*random_window(seed=1))
        for name in ("dR_dbg", "dv_dbg", "dv_dba", "dp_dbg", "dp_dba"):
            np.testing.assert_allclose(getattr(par, name), getattr(seq, name),
                                       atol=5e-3, err_msg=name)

    def test_covariance(self):
        seq, par = both(*random_window(seed=2))
        sc, pc_ = np.asarray(seq.cov), np.asarray(par.cov)
        np.testing.assert_allclose(pc_, pc_.T, atol=1e-8)
        scale = np.abs(sc).max()
        np.testing.assert_allclose(pc_, sc, atol=scale * 2e-2 + 1e-10)

    def test_masked_tail(self):
        seq, par = both(*random_window(seed=3, masked_tail=60))
        np.testing.assert_allclose(par.dR, seq.dR, atol=2e-5)
        np.testing.assert_allclose(par.dv, seq.dv, atol=2e-4)
        np.testing.assert_allclose(par.cov, seq.cov,
                                   atol=np.abs(np.asarray(seq.cov)).max() * 2e-2)

    def test_with_bias(self):
        seq, par = both(*random_window(seed=4),
                        bg=[0.01, -0.02, 0.005], ba=[0.1, 0.05, -0.08])
        np.testing.assert_allclose(par.dv, seq.dv, atol=2e-4)
        np.testing.assert_allclose(par.dp, seq.dp, atol=2e-4)


class TestPoseTrain:
    def test_matches_sequential_frontend(self):
        """integrate_pose_train must reproduce the per-sample scan in
        imu_frontend.predict_rate."""
        from lio_slam_tpu.config import ImuConfig
        from lio_slam_tpu.pipeline import imu_frontend as fe
        cfg = ImuConfig(gravity=G)
        correct, predict_rate, _ = fe.make_frontend(cfg)
        st = fe.init_state()
        acc = jnp.tile(jnp.array([[0.1, 0, G]], jnp.float32), (40, 1))
        gyr = jnp.tile(jnp.array([[0, 0, 0.4]], jnp.float32), (40, 1))
        dt = jnp.full((40,), 0.02, jnp.float32)
        mask = jnp.ones(40, bool)
        st = correct(st, acc, gyr, dt, mask, jnp.zeros(6), jnp.asarray(False))
        seq_poses = predict_rate(st, acc, gyr, dt, mask)
        par_poses = pre.integrate_pose_train(
            st.nav.R, st.nav.p, st.nav.v,
            acc - st.bias_acc, gyr - st.bias_gyr, dt, mask, G)
        np.testing.assert_allclose(np.asarray(par_poses), np.asarray(seq_poses),
                                   atol=2e-4)

    def test_pure_rotation(self):
        poses = pre.integrate_pose_train(
            jnp.eye(3), jnp.zeros(3), jnp.zeros(3),
            jnp.tile(jnp.array([[0, 0, G]], jnp.float32), (100, 1)),
            jnp.tile(jnp.array([[0, 0, 0.5]], jnp.float32), (100, 1)),
            jnp.full(100, 0.01, jnp.float32), jnp.ones(100, bool), G)
        np.testing.assert_allclose(float(poses[-1, 2]), 0.5, atol=5e-3)
        np.testing.assert_allclose(np.asarray(poses[-1, 3:]), 0.0, atol=5e-3)
