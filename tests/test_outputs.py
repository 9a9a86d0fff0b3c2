import os

import numpy as np
import jax.numpy as jnp
import pytest

from lio_slam_tpu.config import Config, StaticConfig, OutputConfig
from lio_slam_tpu.io import pcd as pcd_io
from lio_slam_tpu.ops import heightmap as hm
from lio_slam_tpu.pipeline import keyframes as kfm, outputs
from lio_slam_tpu.utils import pointcloud as pc


class TestPcd:
    def test_binary_roundtrip(self, tmp_path):
        rs = np.random.RandomState(0)
        xyz = rs.randn(500, 3).astype(np.float32)
        inten = rs.rand(500).astype(np.float32)
        p = str(tmp_path / "a.pcd")
        pcd_io.save_pcd(p, xyz, intensity=inten)
        xyz2, attrs = pcd_io.load_pcd(p)
        np.testing.assert_allclose(xyz, xyz2, atol=0)
        np.testing.assert_allclose(inten, attrs["intensity"], atol=0)

    def test_ascii_roundtrip(self, tmp_path):
        xyz = np.array([[1.5, -2.0, 3.25], [0, 0, 0]], np.float32)
        p = str(tmp_path / "b.pcd")
        pcd_io.save_pcd(p, xyz, binary=False)
        xyz2, _ = pcd_io.load_pcd(p)
        np.testing.assert_allclose(xyz, xyz2, atol=1e-5)


class TestHeightMap:
    def test_rasterize_basic(self):
        # two cells: flat patch at z=1 and a pillar at z=5
        rs = np.random.RandomState(0)
        flat = np.stack([rs.uniform(0, 1, 200), rs.uniform(0, 1, 200),
                         np.full(200, 1.0)], 1).astype(np.float32)
        pillar = np.array([[3.05, 3.05, 5.0]], np.float32)
        xyz = jnp.asarray(np.concatenate([flat, pillar]))
        out = hm.rasterize(xyz, jnp.ones(201, bool), jnp.zeros(2),
                           resolution=0.5, shape=(32, 32))
        e = np.asarray(out.elevation)
        origin = np.asarray(out.origin)
        i, j = int((3.05 - origin[0]) / 0.5), int((3.05 - origin[1]) / 0.5)
        assert e[i, j] == pytest.approx(5.0)
        i0, j0 = int((0.5 - origin[0]) / 0.5), int((0.5 - origin[1]) / 0.5)
        assert e[i0, j0] == pytest.approx(1.0, abs=1e-5)
        assert np.isnan(e[0, 0])          # far corner empty

    def test_counts_and_minz(self):
        xyz = jnp.asarray([[0.1, 0.1, 1.0], [0.15, 0.12, 3.0]])
        out = hm.rasterize(xyz, jnp.ones(2, bool), jnp.zeros(2),
                           resolution=1.0, shape=(8, 8))
        c = np.asarray(out.count)
        assert c.sum() == 2
        ij = np.argwhere(c == 2)[0]
        assert np.asarray(out.min_z)[ij[0], ij[1]] == pytest.approx(1.0)
        assert np.asarray(out.elevation)[ij[0], ij[1]] == pytest.approx(3.0)

    def test_inpaint(self):
        xyz = jnp.asarray([[0.0, 0.0, 2.0]])
        out = hm.rasterize(xyz, jnp.ones(1, bool), jnp.zeros(2),
                           resolution=1.0, shape=(8, 8))
        filled = hm.inpaint_nearest(out)
        e = np.asarray(filled)
        assert np.isfinite(e).sum() > 1   # neighbours got filled
        assert np.nanmax(e) == pytest.approx(2.0)


class TestSOR:
    def test_outlier_removed(self):
        rs = np.random.RandomState(1)
        dense = rs.rand(300, 3).astype(np.float32) * 2
        outlier = np.array([[50.0, 50.0, 50.0]], np.float32)
        xyz = jnp.asarray(np.concatenate([dense, outlier]))
        mask = jnp.ones(301, bool)
        keep = outputs.statistical_outlier_mask(xyz, mask, mean_k=5,
                                                stddev_mul=1.0)
        assert not bool(keep[-1])
        assert int(keep.sum()) > 250


def make_store_with_ground(n_kf=4):
    cfg = Config(static=StaticConfig(max_keyframes=16, max_keyframe_points=512))
    store = kfm.empty_store(16, 512)
    rs = np.random.RandomState(0)
    for i in range(n_kf):
        pts = np.stack([rs.uniform(-5, 5, 400), rs.uniform(-5, 5, 400),
                        rs.randn(400) * 0.02], 1).astype(np.float32)
        cloud = pc.pad_cloud(pts, 512)
        pose = jnp.asarray(np.array([0, 0, 0, 2.0 * i, 0, 0], np.float32))
        store = kfm.add_keyframe(store, pose, jnp.float32(i * 0.5), cloud)
    return cfg, store


class TestLocalMapAndSave:
    def test_local_planning_map(self):
        cfg, store = make_store_with_ground()
        local_map_fn, height_fn = outputs.make_local_map_fn(cfg)
        pose = jnp.asarray(np.array([0, 0, 0.3, 4.0, 0, 0], np.float32))
        m = local_map_fn(store, pose)
        assert int(m.count()) > 100
        # all retained points inside the rotated box
        kept = np.asarray(m.xyz[np.asarray(m.mask)])
        rel = kept[:, :2] - np.array([4.0, 0])
        c, s = np.cos(-0.3), np.sin(-0.3)
        xr = rel[:, 0] * c - rel[:, 1] * s
        yr = rel[:, 0] * s + rel[:, 1] * c
        assert np.abs(xr).max() <= cfg.output.local_map_box[0] + 1e-3
        assert np.abs(yr).max() <= cfg.output.local_map_box[1] + 1e-3
        hmout = height_fn(m, pose)
        assert np.isfinite(np.asarray(hmout.elevation)).sum() > 50

    def test_save_map(self, tmp_path):
        cfg, store = make_store_with_ground()
        res = outputs.save_map(store, str(tmp_path / "maps"), resolution=0.4)
        assert res.success
        assert res.num_points > 100
        for f in res.files:
            assert os.path.exists(f)
        xyz, attrs = pcd_io.load_pcd(str(tmp_path / "maps" / "trajectory.pcd"))
        assert xyz.shape[0] == 4
        np.testing.assert_allclose(attrs["intensity"], np.arange(4))
        # transformations.pcd carries the full 6-DoF PointTypePose rows
        # (mapOptmization.cpp:928-932): rpy + time fields round-trip
        txyz, tattrs = pcd_io.load_pcd(
            str(tmp_path / "maps" / "transformations.pcd"))
        n = int(store.count)
        poses = np.asarray(store.poses[:n])
        np.testing.assert_allclose(txyz, poses[:, 3:6], atol=1e-6)
        for k, col in (("roll", 0), ("pitch", 1), ("yaw", 2)):
            np.testing.assert_allclose(tattrs[k], poses[:, col], atol=1e-6)
        np.testing.assert_allclose(tattrs["time"],
                                   np.asarray(store.stamps[:n]), atol=1e-6)
        # SurfMap.pcd exists and matches GlobalMap (surf-only pipeline)
        s_xyz, _ = pcd_io.load_pcd(str(tmp_path / "maps" / "SurfMap.pcd"))
        g_xyz, _ = pcd_io.load_pcd(str(tmp_path / "maps" / "GlobalMap.pcd"))
        np.testing.assert_allclose(s_xyz, g_xyz)

    def test_save_empty_store(self, tmp_path):
        store = kfm.empty_store(8, 64)
        res = outputs.save_map(store, str(tmp_path / "m2"))
        assert not res.success


class TestFilterLayers:
    """grid_map_filters / grid_map_sdf capability equivalents."""

    def _plane_hm(self, gx=0.1, gy=0.0, H=32, W=32, res=0.5):
        ii, jj = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
        elev = (gx * ii + gy * jj) * res
        return hm.HeightMap(
            elevation=jnp.asarray(elev, jnp.float32),
            min_z=jnp.asarray(elev, jnp.float32),
            count=jnp.ones((H, W), jnp.int32),
            origin=jnp.zeros(2), resolution=jnp.float32(res))

    def test_normals_slope_plane(self):
        # z = 0.1*x plane: slope = atan(0.1), normal ~ (-0.1, 0, 1)/|.|
        h = self._plane_hm(gx=0.1)
        n, slope = hm.normals_and_slope(h)
        n = np.asarray(n)[2:-2, 2:-2]
        slope = np.asarray(slope)[2:-2, 2:-2]
        np.testing.assert_allclose(slope, np.arctan(0.1), atol=1e-3)
        expect = np.array([-0.1, 0, 1.0]) / np.linalg.norm([0.1, 0, 1.0])
        np.testing.assert_allclose(n.reshape(-1, 3).mean(0), expect, atol=1e-3)

    def test_normals_nan_propagation(self):
        h = self._plane_hm()
        e = np.asarray(h.elevation).copy()
        e[5, 5] = np.nan
        h = h._replace(elevation=jnp.asarray(e))
        n, slope = hm.normals_and_slope(h)
        assert np.isnan(np.asarray(slope)[5, 5])
        assert np.isfinite(np.asarray(slope)[10, 10])

    def test_sdf_exact_vs_bruteforce(self):
        rng = np.random.default_rng(3)
        occ = rng.random((48, 48)) < 0.04
        occ[20:24, 20:24] = True
        d = np.asarray(hm.signed_distance_2d(jnp.asarray(occ), 1.0))
        ii, jj = np.nonzero(occ)
        fi, fj = np.nonzero(~occ)
        # brute-force unsigned distances
        pts = np.stack([ii, jj], 1).astype(np.float64)
        grid = np.stack(np.meshgrid(np.arange(48), np.arange(48),
                                    indexing="ij"), -1).reshape(-1, 2)
        d_occ = np.sqrt(((grid[:, None, :] - pts[None]) ** 2).sum(-1)).min(1)
        free = np.stack([fi, fj], 1).astype(np.float64)
        d_free = np.sqrt(((grid[:, None, :] - free[None]) ** 2).sum(-1)).min(1)
        ref = np.where(occ.reshape(-1), -d_free, d_occ).reshape(48, 48)
        # JFA is exact up to ~1 cell in rare configurations
        assert np.abs(d - ref).max() <= 1.0 + 1e-6
        assert (np.abs(d - ref) < 1e-5).mean() > 0.98

    def test_obstacle_sdf_sign(self):
        h = self._plane_hm(gx=0.0)
        e = np.asarray(h.elevation).copy()
        e[10:14, 10:14] = 2.0            # an obstacle block
        h = h._replace(elevation=jnp.asarray(e))
        d = np.asarray(hm.obstacle_sdf(h, reference_z=0.0, clearance=0.3))
        assert d[12, 12] < 0             # inside the obstacle
        assert d[0, 0] > 5 * 0.5 - 1e-3  # far away, meters scale = res

    def test_normals_no_border_wrap(self):
        # terrain that differs across opposite edges must not create border
        # slopes (jnp.roll wrap-around regression)
        h = self._plane_hm(gx=0.0)
        e = np.zeros((32, 32), np.float32)
        e[-1, :] = 10.0
        h = h._replace(elevation=jnp.asarray(e))
        _, slope = hm.normals_and_slope(h)
        s = np.asarray(slope)
        assert s[0, 5] < 1e-3        # first row must not see the 10 m last row
        assert s[-2, 5] > 1.0        # the interior step IS steep

    def test_inpaint_no_border_wrap(self):
        h = self._plane_hm(gx=0.0)
        e = np.full((32, 32), np.nan, np.float32)
        e[-1, :] = 10.0              # only the far edge is known
        h = h._replace(elevation=jnp.asarray(e))
        filled = np.asarray(hm.inpaint_nearest(h, iterations=1))
        assert np.isnan(filled[0, 5])   # row 0 must not be filled from row -1
        assert filled[-2, 5] == 10.0
