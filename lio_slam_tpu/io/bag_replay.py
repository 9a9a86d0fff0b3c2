"""Replay a ROS1 bag through the pipeline Runner.

Equivalent of the reference's validation workflow — `rosbag play *.bag` +
`roslaunch liorf run_lio_sam_*.launch` (src/liorf/README.md:137-158) — but in
process: messages stream from the bag in time order, IMU samples buffer into
the per-scan window the deskew/preintegration stages consume (the role of the
2000-deep subscriber queues, imageProjection.cpp:116-118), and the newest GPS
fix near each scan rides along.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator, Optional

import numpy as np

from lio_slam_tpu.io import rosbag as rb


@dataclass
class BagTopics:
    lidar: str = "/velodyne_points"
    imu: str = "/imu/data"
    gps: Optional[str] = None          # NavSatFix or GpswithHeading
    sensor: str = "velodyne"           # formats adapter key


def replay_bag(runner, bag_path: str, topics: Optional[BagTopics] = None,
               max_scans: Optional[int] = None) -> Iterator:
    """Stream a bag through `runner.process_scan`; yields each ScanResult
    (None results from the mappingProcessInterval throttle are skipped)."""
    topics = topics or BagTopics()
    reader = rb.BagReader(bag_path)
    want = [t for t in (topics.lidar, topics.imu, topics.gps) if t]

    imu_acc: list = []        # (stamp, acc, gyr) since the previous scan
    last_gps: Optional[tuple] = None
    last_gps_stamp = -1e18
    n_scans = 0

    for msg in reader.read_messages(want):
        if msg.topic == topics.imu:
            m = rb.decode_imu(msg.raw)
            imu_acc.append((m.stamp, m.linear_acceleration, m.angular_velocity))
            # bound like the reference's 2000-deep queues
            if len(imu_acc) > 4000:
                del imu_acc[:2000]
        elif topics.gps and msg.topic == topics.gps:
            if msg.msg_type == "sensor_driver_msgs/GpswithHeading":
                g = rb.decode_gps_with_heading(msg.raw)
                last_gps = (g.gps.latitude, g.gps.longitude, g.gps.altitude,
                            g.gps.status)
                last_gps_stamp = g.stamp
            else:
                g = rb.decode_navsatfix(msg.raw)
                last_gps = (g.latitude, g.longitude, g.altitude, g.status)
                last_gps_stamp = g.stamp
        elif msg.topic == topics.lidar:
            pc2 = rb.decode_pointcloud2(msg.raw)
            scan = rb.scan_from_pointcloud2(pc2, topics.sensor)
            scan_end = scan.stamp + float(scan.time.max()) if len(scan.time) else scan.stamp
            # window: samples from just before scan start through scan end
            # (imuDeskewInfo pops stale samples older than start-0.01,
            # imageProjection.cpp:364-368)
            window = [s for s in imu_acc if s[0] >= scan.stamp - 0.01]
            imu = None
            if window:
                imu = {"stamps": np.array([s[0] for s in window]),
                       "acc": np.stack([s[1] for s in window]),
                       "gyr": np.stack([s[2] for s in window])}
            # drop consumed samples, keep those past scan end for the next one
            imu_acc = [s for s in imu_acc if s[0] > scan_end]
            gps = None
            if last_gps is not None and abs(last_gps_stamp - scan.stamp) < 0.5:
                gps = last_gps
            res = runner.process_scan(scan, imu=imu, gps_fix=gps)
            if res is not None:
                n_scans += 1
                yield res
                if max_scans is not None and n_scans >= max_scans:
                    return
