import jax
import jax.numpy as jnp
import numpy as np

from lio_slam_tpu.ops import preintegration as pre
from lio_slam_tpu.utils import se3

G = 9.80511


def window(n, acc, gyr, dt):
    acc = jnp.broadcast_to(jnp.asarray(acc, jnp.float32), (n, 3))
    gyr = jnp.broadcast_to(jnp.asarray(gyr, jnp.float32), (n, 3))
    dts = jnp.full((n,), dt, jnp.float32)
    mask = jnp.ones((n,), bool)
    return acc, gyr, dts, mask


def integrate(acc, gyr, dts, mask, bg=None, ba=None):
    bg = jnp.zeros(3) if bg is None else jnp.asarray(bg, jnp.float32)
    ba = jnp.zeros(3) if ba is None else jnp.asarray(ba, jnp.float32)
    return pre.preintegrate(acc, gyr, dts, mask, bg, ba,
                            acc_noise=1e-2, gyr_noise=1e-3)


class TestPreintegrate:
    def test_stationary(self):
        """Stationary IMU measuring gravity reaction: dR=I, dv=g*t upward."""
        acc, gyr, dts, mask = window(100, [0, 0, G], [0, 0, 0], 0.01)
        out = integrate(acc, gyr, dts, mask)
        np.testing.assert_allclose(out.dR, np.eye(3), atol=1e-5)
        np.testing.assert_allclose(out.dt, 1.0, atol=1e-5)
        np.testing.assert_allclose(out.dv, [0, 0, G], atol=1e-3)
        np.testing.assert_allclose(out.dp, [0, 0, G / 2], atol=1e-3)

    def test_predict_stationary_cancels_gravity(self):
        acc, gyr, dts, mask = window(100, [0, 0, G], [0, 0, 0], 0.01)
        out = integrate(acc, gyr, dts, mask)
        s0 = pre.NavState(R=jnp.eye(3), p=jnp.zeros(3), v=jnp.zeros(3))
        s1 = pre.predict(s0, out, G)
        np.testing.assert_allclose(s1.p, np.zeros(3), atol=2e-3)
        np.testing.assert_allclose(s1.v, np.zeros(3), atol=2e-3)

    def test_constant_acceleration(self):
        """1 m/s^2 forward + gravity reaction for 1 s -> v=1, p=0.5."""
        acc, gyr, dts, mask = window(200, [1, 0, G], [0, 0, 0], 0.005)
        out = integrate(acc, gyr, dts, mask)
        s0 = pre.NavState(R=jnp.eye(3), p=jnp.zeros(3), v=jnp.zeros(3))
        s1 = pre.predict(s0, out, G)
        np.testing.assert_allclose(s1.v, [1.0, 0, 0], atol=5e-3)
        np.testing.assert_allclose(s1.p, [0.5, 0, 0], atol=5e-3)

    def test_pure_rotation(self):
        """Constant yaw rate 0.5 rad/s for 2 s -> dR = Rz(1.0)."""
        acc, gyr, dts, mask = window(400, [0, 0, 0], [0, 0, 0.5], 0.005)
        out = integrate(acc, gyr, dts, mask)
        expected = se3.so3_exp(jnp.array([0, 0, 1.0]))
        np.testing.assert_allclose(out.dR, expected, atol=1e-4)

    def test_masked_samples_are_noops(self):
        acc, gyr, dts, mask = window(100, [0.3, 0.1, G], [0.02, 0, 0.1], 0.01)
        full = integrate(acc, gyr, dts, mask)
        # same window zero-padded to 200 with masked tail
        acc2 = jnp.concatenate([acc, jnp.full((100, 3), 123.0)])
        gyr2 = jnp.concatenate([gyr, jnp.full((100, 3), 9.0)])
        dts2 = jnp.concatenate([dts, jnp.full((100,), 0.01)])
        mask2 = jnp.concatenate([mask, jnp.zeros(100, bool)])
        padded = integrate(acc2, gyr2, dts2, mask2)
        np.testing.assert_allclose(full.dR, padded.dR, atol=1e-6)
        np.testing.assert_allclose(full.dv, padded.dv, atol=1e-6)
        np.testing.assert_allclose(full.cov, padded.cov, atol=1e-9)

    def test_bias_jacobians_first_order(self):
        """Jacobian-corrected deltas track re-integration with shifted bias."""
        rs = np.random.RandomState(0)
        acc = jnp.asarray(rs.randn(150, 3) * 0.5 + [0, 0, G], jnp.float32)
        gyr = jnp.asarray(rs.randn(150, 3) * 0.2, jnp.float32)
        dts = jnp.full((150,), 0.005, jnp.float32)
        mask = jnp.ones(150, bool)
        out0 = integrate(acc, gyr, dts, mask)
        dbg = jnp.array([0.004, -0.003, 0.002])
        dba = jnp.array([0.01, 0.02, -0.015])
        corrected = pre.bias_corrected(out0, dbg, dba)
        exact = integrate(acc, gyr, dts, mask, bg=dbg, ba=dba)
        np.testing.assert_allclose(corrected.dv, exact.dv, atol=2e-3)
        np.testing.assert_allclose(corrected.dp, exact.dp, atol=2e-3)
        np.testing.assert_allclose(corrected.dR, exact.dR, atol=2e-3)

    def test_covariance_grows_and_spd(self):
        acc, gyr, dts, mask = window(200, [0, 0, G], [0.1, 0, 0.2], 0.005)
        out = integrate(acc, gyr, dts, mask)
        cov = np.asarray(out.cov)
        np.testing.assert_allclose(cov, cov.T, atol=1e-10)
        eigs = np.linalg.eigvalsh(cov)
        assert eigs.min() > 0
        # rotation block variance ~ sigma_g^2 * t = 1e-6 * 1
        assert 1e-7 < cov[0, 0] < 1e-4

    def test_pileup_gate(self):
        acc = jnp.asarray(np.tile([5.0, 5.0, 5.0], (10, 1)), jnp.float32)
        gyr = jnp.asarray(np.tile([3.0, 3.0, 3.0], (10, 1)), jnp.float32)
        dt = jnp.full((10,), 0.002, jnp.float32)       # piled up: < 10 ms
        a2, g2, d2 = pre.apply_pileup_gate(acc, gyr, dt, G)
        np.testing.assert_allclose(a2, np.tile([0, 0, G], (10, 1)), atol=1e-6)
        np.testing.assert_allclose(g2, np.zeros((10, 3)), atol=1e-6)
        np.testing.assert_allclose(d2, dt, atol=1e-9)
        # non-positive dt falls back to 1/50
        a3, g3, d3 = pre.apply_pileup_gate(acc, gyr, jnp.zeros(10), G)
        np.testing.assert_allclose(d3, np.full(10, 0.02), atol=1e-9)

    def test_failure_detection(self):
        ok = pre.NavState(R=jnp.eye(3), p=jnp.zeros(3), v=jnp.ones(3))
        bad_v = ok._replace(v=jnp.array([40.0, 0, 0]))
        z3 = jnp.zeros(3)
        assert not bool(pre.failure_detected(ok, z3, z3))
        assert bool(pre.failure_detected(bad_v, z3, z3))
        assert bool(pre.failure_detected(ok, jnp.array([1.5, 0, 0]), z3))

    def test_jit(self):
        acc, gyr, dts, mask = window(64, [0, 0, G], [0, 0, 0.1], 0.01)
        f = jax.jit(lambda a, g, d, m: pre.preintegrate(
            a, g, d, m, jnp.zeros(3), jnp.zeros(3), 1e-2, 1e-3))
        out = f(acc, gyr, dts, mask)
        assert np.isfinite(np.asarray(out.cov)).all()
