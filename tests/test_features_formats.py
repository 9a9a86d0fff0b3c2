import numpy as np
import jax.numpy as jnp

from lio_slam_tpu.io import formats
from lio_slam_tpu.ops import features


class TestFormats:
    def test_velodyne_nan_removal(self):
        xyz = np.array([[1, 0, 0], [np.nan, 0, 0], [0, 1, 0]], np.float32)
        s = formats.from_velodyne(xyz, np.ones(3), np.zeros(3), np.zeros(3), 0.0)
        assert s.xyz.shape[0] == 2

    def test_ouster_time_conversion(self):
        xyz = np.ones((4, 3), np.float32)
        t_ns = np.array([0, 25_000_000, 50_000_000, 99_000_000])
        s = formats.from_ouster(xyz, np.ones(4), np.zeros(4), t_ns, 10.0)
        np.testing.assert_allclose(s.time, [0, 0.025, 0.05, 0.099], atol=1e-6)

    def test_robosense_relative_time(self):
        xyz = np.ones((3, 3), np.float32)
        ts = np.array([1700000000.00, 1700000000.05, 1700000000.10])
        s = formats.from_robosense(xyz, np.ones(3), np.zeros(3), ts, 0.0)
        np.testing.assert_allclose(s.time, [0, 0.05, 0.10], atol=1e-6)
        assert s.stamp == 1700000000.00

    def test_rs16_remap(self):
        assert formats.remap_ring_rs16([0, 1, 15]).tolist() == [0, 2, 1]

    def test_rs128_remap_is_permutation(self):
        out = formats.remap_ring_rs128(np.arange(128))
        assert sorted(out.tolist()) == list(range(128))

    def test_ring_from_elevation(self):
        # point at +15 deg elevation -> top ring; -15 deg -> ring 0
        up = np.array([[1.0, 0, np.tan(np.deg2rad(15.0))]])
        dn = np.array([[1.0, 0, np.tan(np.deg2rad(-15.0))]])
        assert formats.ring_from_elevation(up)[0] == 15
        assert formats.ring_from_elevation(dn)[0] == 0

    def test_time_from_azimuth_monotone_in_angle(self):
        ang = np.linspace(-np.pi + 0.01, np.pi - 0.01, 50)
        xyz = np.stack([np.cos(ang), np.sin(ang), np.zeros(50)], 1)
        t = formats.synthesize_time_from_azimuth(xyz, 0.1)
        assert (np.diff(t) > 0).all()
        assert 0 <= t.min() and t.max() <= 0.1


class TestRangeImage:
    def test_projection_basic(self):
        # two points on ring 0 and 3 at known azimuths
        xyz = jnp.asarray(np.array([[1, 0, 0], [0, 2, 0]], np.float32))
        ring = jnp.asarray([0, 3])
        ranges, valid, idx = features.project_range_image(
            xyz, jnp.ones(2, bool), ring, n_scan=4, horizon=8)
        assert ranges.shape == (4, 8)
        assert int(valid.sum()) == 2
        # azimuth 0 -> col (0+pi)/2pi*8 = 4 ; azimuth pi/2 -> col 6
        assert bool(valid[0, 4]) and float(ranges[0, 4]) == 1.0
        assert bool(valid[3, 6]) and float(ranges[3, 6]) == 2.0
        assert int(idx[0, 4]) == 0 and int(idx[3, 6]) == 1

    def test_closest_point_wins(self):
        xyz = jnp.asarray(np.array([[1, 0, 0], [3, 0.0001, 0]], np.float32))
        ranges, valid, idx = features.project_range_image(
            xyz, jnp.ones(2, bool), jnp.zeros(2, jnp.int32), n_scan=1, horizon=4)
        assert float(ranges[0, 2]) == 1.0
        assert int(idx[0, 2]) == 0


class TestExtract:
    def make_scene(self):
        """One ring: flat wall with a sharp corner step at column 50."""
        H = 120
        r = np.full(H, 10.0, np.float32)
        r[50:] = 5.0
        ranges = jnp.asarray(r[None, :])
        valid = jnp.ones((1, H), bool)
        return ranges, valid

    def test_corner_detected_surfaces_flat(self):
        ranges, valid = self.make_scene()
        f = features.extract_features(ranges, valid, num_sectors=2,
                                      edge_threshold=1.0, surf_threshold=0.1)
        e = np.asarray(f.edge_mask[0])
        s = np.asarray(f.surf_mask[0])
        # the step region should be edge or masked (occlusion), flat regions surf
        assert s[10:40].sum() > 20
        assert s[70:110].sum() > 20
        # no surf points adjacent to the discontinuity
        assert not s[46:54].any()

    def test_wrap_around_masking(self):
        """Column 0 and H-1 are adjacent via roll; ensure finite outputs."""
        ranges, valid = self.make_scene()
        f = features.extract_features(ranges, valid)
        assert np.isfinite(np.asarray(f.curvature)).all()

    def test_edges_respect_threshold(self):
        H = 120
        r = np.full(H, 10.0, np.float32)   # perfectly flat -> no edges
        f = features.extract_features(jnp.asarray(r[None, :]),
                                      jnp.ones((1, H), bool))
        assert int(f.edge_mask.sum()) == 0
