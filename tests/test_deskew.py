import jax
import jax.numpy as jnp
import numpy as np

from lio_slam_tpu.ops import deskew
from lio_slam_tpu.utils import se3


def make_table(rate_hz=200.0, duration=0.12, omega=(0.0, 0.0, 1.0), T=64):
    n = int(duration * rate_hz) + 1
    times = jnp.arange(T, dtype=jnp.float32) / rate_hz
    mask = jnp.arange(T) < n
    gyr = jnp.broadcast_to(jnp.asarray(omega, jnp.float32), (T, 3))
    return deskew.build_rotation_table(gyr, times, mask)


class TestRotationTable:
    def test_constant_rate_integration(self):
        table = make_table(omega=(0, 0, 2.0))
        # after 0.1 s at 2 rad/s -> 0.2 rad about z
        r = deskew.interpolate_rotation(table, jnp.float32(0.1))
        np.testing.assert_allclose(r, [0, 0, 0.2], atol=1e-3)

    def test_interpolation_between_samples(self):
        table = make_table(rate_hz=100.0, omega=(0, 0, 1.0))
        r = deskew.interpolate_rotation(table, jnp.float32(0.015))
        np.testing.assert_allclose(r[2], 0.015, atol=1e-4)

    def test_clamp_past_end(self):
        table = make_table(duration=0.1, omega=(0, 0, 1.0))
        r_end = deskew.interpolate_rotation(table, jnp.float32(10.0))
        r_last = deskew.interpolate_rotation(table, jnp.float32(0.1))
        np.testing.assert_allclose(r_end, r_last, atol=1e-4)


class TestDeskew:
    def test_rotating_scanner_sees_static_world(self):
        """A scanner yawing at constant rate observes a fixed landmark; after
        deskew all observations must coincide in the scan-start frame."""
        omega = 1.0  # rad/s yaw
        landmark = jnp.array([10.0, 0.0, 1.0])
        N = 50
        t = jnp.linspace(0.0, 0.1, N)
        # body frame at time t has rotation Rz(omega*t); observation = R^T landmark
        Rt = se3.so3_exp(jnp.stack([jnp.zeros(N), jnp.zeros(N), omega * t], axis=-1))
        obs = (jnp.swapaxes(Rt, -1, -2) @ landmark[None, :, None])[..., 0]
        table = make_table(rate_hz=500.0, duration=0.12, omega=(0, 0, omega))
        mask = jnp.ones(N, bool)
        out = deskew.deskew(obs, t, mask, table)
        spread = jnp.max(jnp.linalg.norm(out - landmark, axis=-1))
        assert float(spread) < 5e-3
        # without deskew the spread is large
        raw_spread = jnp.max(jnp.linalg.norm(obs - landmark, axis=-1))
        assert float(raw_spread) > 0.5

    def test_masked_points_unchanged(self):
        table = make_table()
        pts = jnp.ones((8, 3))
        t = jnp.full((8,), 0.05)
        mask = jnp.zeros(8, bool)
        out = deskew.deskew(pts, t, mask, table)
        np.testing.assert_allclose(out, pts, atol=0)

    def test_positional_deskew(self):
        """Forward motion of 1 m over the scan shifts late points back."""
        table = make_table(omega=(0.0, 0.0, 0.0))
        pts = jnp.array([[5.0, 0, 0], [5.0, 0, 0]])
        t = jnp.array([0.0, 0.1])
        mask = jnp.ones(2, bool)
        out = deskew.deskew(pts, t, mask, table,
                            pos_increment=jnp.array([1.0, 0, 0]),
                            scan_duration=jnp.float32(0.1))
        np.testing.assert_allclose(out[0], [5.0, 0, 0], atol=1e-5)
        np.testing.assert_allclose(out[1], [6.0, 0, 0], atol=1e-4)

    def test_jit_vmap_shapes(self):
        table = make_table()
        f = jax.jit(lambda p, t, m: deskew.deskew(p, t, m, table))
        pts = jnp.ones((1024, 3))
        t = jnp.linspace(0, 0.1, 1024)
        out = f(pts, t, jnp.ones(1024, bool))
        assert out.shape == (1024, 3)
        assert np.isfinite(np.asarray(out)).all()
