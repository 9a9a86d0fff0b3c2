"""rosbag reader/writer round-trip + bag replay through the Runner."""

import bz2
import struct

import numpy as np
import pytest

from lio_slam_tpu.io import rosbag as rb
from lio_slam_tpu.io.bag_replay import BagTopics, replay_bag


def _write_sample_bag(path, n_scans=3, imu_per_scan=10, with_gps=True):
    w = rb.BagWriter(str(path))
    t0 = 100.0
    rng = np.random.default_rng(0)
    for i in range(n_scans):
        ts = t0 + 0.1 * i
        for j in range(imu_per_scan):
            it = ts + 0.01 * j
            w.write("/imu/data", "sensor_msgs/Imu",
                    rb.encode_imu(it, [0, 0, 0, 1], [0.0, 0.0, 0.1],
                                  [0.0, 0.0, 9.81]), it)
        n = 64
        xyz = rng.uniform(-10, 10, (n, 3)).astype(np.float32)
        w.write("/velodyne_points", "sensor_msgs/PointCloud2",
                rb.encode_pointcloud2(
                    xyz, np.full(n, 7.0, np.float32),
                    np.arange(n, dtype=np.uint16) % 16,
                    np.linspace(0, 0.09, n).astype(np.float32), ts), ts)
        if with_gps:
            w.write("/gps/fix", "sensor_msgs/NavSatFix",
                    rb.encode_navsatfix(ts, 39.9 + i * 1e-5, 116.3, 50.0,
                                        cov=np.eye(3).ravel()), ts)
    w.close()
    return str(path)


def test_bag_roundtrip_pointcloud(tmp_path):
    path = _write_sample_bag(tmp_path / "a.bag")
    reader = rb.BagReader(path)
    scans = [m for m in reader.read_messages(["/velodyne_points"])]
    assert len(scans) == 3
    assert scans[0].msg_type == "sensor_msgs/PointCloud2"
    pc2 = scans[0].decode()
    assert pc2.points.shape == (64,)
    assert set(pc2.points.dtype.names) >= {"x", "y", "z", "intensity",
                                           "ring", "time"}
    xyz = pc2.xyz()
    assert xyz.shape == (64, 3) and np.isfinite(xyz).all()
    assert abs(pc2.stamp - 100.0) < 1e-6
    std = rb.scan_from_pointcloud2(pc2, "velodyne")
    assert std.xyz.shape == (64, 3)
    assert std.ring.dtype == np.uint16
    np.testing.assert_allclose(std.time[-1], 0.09, atol=1e-6)


def test_bag_roundtrip_imu_gps_odom(tmp_path):
    path = _write_sample_bag(tmp_path / "b.bag")
    reader = rb.BagReader(path)
    msgs = list(reader.read_messages(["/imu/data", "/gps/fix"]))
    imus = [m.decode() for m in msgs if m.topic == "/imu/data"]
    fixes = [m.decode() for m in msgs if m.topic == "/gps/fix"]
    assert len(imus) == 30 and len(fixes) == 3
    np.testing.assert_allclose(imus[0].linear_acceleration, [0, 0, 9.81])
    np.testing.assert_allclose(imus[0].angular_velocity, [0, 0, 0.1])
    assert abs(fixes[1].latitude - 39.90001) < 1e-9
    assert fixes[0].position_covariance[0] == 1.0

    # odometry encode/decode
    raw = rb.encode_odometry(5.0, [1, 2, 3], [0, 0, 0, 1],
                             pose_covariance=np.arange(36.0))
    od = rb.decode_odometry(raw)
    np.testing.assert_allclose(od.position, [1, 2, 3])
    assert od.pose_covariance[35] == 35.0
    assert od.child_frame_id == "base_link"

    # GpswithHeading encode/decode
    raw = rb.encode_gps_with_heading(6.0, 40.0, 117.0, 30.0, heading=92.5,
                                     pitch=1.0, roll=-0.5, mode=4)
    g = rb.decode_gps_with_heading(raw)
    assert abs(g.gps.latitude - 40.0) < 1e-12
    assert abs(g.heading - 92.5) < 1e-5
    assert g.mode == 4


def test_bag_bz2_chunk(tmp_path):
    """bz2-compressed chunks decompress transparently."""
    path = _write_sample_bag(tmp_path / "c.bag", n_scans=1, with_gps=False)
    data = open(path, "rb").read()
    # recompress: find the chunk record and bz2 it
    reader = rb.BagReader(path)
    plain = list(reader.read_messages())
    # build a new bag whose single chunk is bz2
    i = len(rb._BAG_MAGIC)
    out = [rb._BAG_MAGIC]
    for header, payload in rb._records(data, i):
        op = header.get(b"op", b"\x00")[0]
        if op == rb._OP_CHUNK:
            comp = bz2.compress(payload)
            h = rb._header_bytes({b"op": bytes([rb._OP_CHUNK]),
                                  b"compression": b"bz2",
                                  b"size": struct.pack("<I", len(payload))})
            out.append(struct.pack("<I", len(h)) + h
                       + struct.pack("<I", len(comp)) + comp)
        else:
            h = rb._header_bytes(header)
            out.append(struct.pack("<I", len(h)) + h
                       + struct.pack("<I", len(payload)) + payload)
    p2 = tmp_path / "c_bz2.bag"
    p2.write_bytes(b"".join(out))
    got = list(rb.BagReader(str(p2)).read_messages())
    assert len(got) == len(plain)
    assert got[0].raw == plain[0].raw


def test_bad_magic(tmp_path):
    p = tmp_path / "x.bag"
    p.write_bytes(b"not a bag")
    with pytest.raises(ValueError, match="not a ROS bag"):
        list(rb.BagReader(str(p)).read_messages())


def test_replay_bag_through_runner(tmp_path):
    from lio_slam_tpu.config import Config, StaticConfig, RegistrationConfig
    from lio_slam_tpu.pipeline.runner import Runner

    path = _write_sample_bag(tmp_path / "d.bag", n_scans=3)
    cfg = Config(
        static=StaticConfig(max_raw_points=2048, max_scan_points=2048,
                            max_map_points=8192, max_keyframes=16,
                            max_keyframe_points=1024, max_loop_queue=2,
                            max_gps_queue=2, window_size=8, max_imu_window=32),
        registration=RegistrationConfig(degeneracy_eig_thresh=10.0))
    runner = Runner(cfg, loop_every=100)
    topics = BagTopics(lidar="/velodyne_points", imu="/imu/data",
                       gps="/gps/fix", sensor="velodyne")
    results = list(replay_bag(runner, path, topics))
    assert len(results) >= 1
    for r in results:
        assert np.isfinite(r.pose).all()
