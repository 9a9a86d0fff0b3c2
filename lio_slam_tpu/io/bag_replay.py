"""Replay a ROS1 bag through the pipeline Runner.

Equivalent of the reference's validation workflow — `rosbag play *.bag` +
`roslaunch liorf run_lio_sam_*.launch` (src/liorf/README.md:137-158) — but in
process: messages stream from the bag in time order, IMU samples buffer into
the per-scan window the deskew/preintegration stages consume (the role of the
2000-deep subscriber queues, imageProjection.cpp:116-118), and the newest GPS
fix near each scan rides along.

Input-side fidelity mirrored from ImageProjection:
- 2-scan delay buffer (cachePointCloud, imageProjection.cpp:214-219): a scan
  is only processed once the NEXT lidar message arrives, guaranteeing the IMU
  stream covers the full scan sweep (the rotation table must extend past the
  scan tail).  The final scan flushes at stream end.
- IMU orientation pass-through (imuDeskewInfo :381-385): 9-axis quaternions
  ride in the window dict for attitude initialization (extQRPY applied by the
  Runner, utility.h:333-366).
- NavSatFix covariance pass-through (gpsHandler/addGPSFactor :1984-1989):
  the position-covariance diagonal feeds the GPS factor information.
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

    imu_buf: list = []        # (stamp, acc, gyr, quat) samples
    last_gps: Optional[tuple] = None
    last_gps_stamp = -1e18
    pending = None            # the delayed scan (2-scan buffer)
    n_scans = 0

    def window_for(scan):
        """Extract the IMU window for this scan.  The window serves two
        consumers (the reference keeps two queues): deskew needs samples
        covering the sweep [scan start, scan end] (imuDeskewInfo), while the
        preintegration front-end needs everything since the LAST correction
        = the previous scan's stamp (odometryHandler drains imuQueOpt).  So
        the window is every buffered sample up to the sweep end; samples at
        or before this scan's stamp are then consumed, keeping the sweep-tail
        samples available for the next correction interval."""
        nonlocal imu_buf
        scan_end = scan.stamp + (float(scan.time.max())
                                 if len(scan.time) else 0.0)
        window = [s for s in imu_buf if s[0] <= scan_end + 1e-9]
        imu_buf = [s for s in imu_buf if s[0] > scan.stamp]
        if not window:
            return None
        return {"stamps": np.array([s[0] for s in window]),
                "acc": np.stack([s[1] for s in window]),
                "gyr": np.stack([s[2] for s in window]),
                "quat": np.stack([s[3] for s in window])}

    def process(scan):
        imu = window_for(scan)
        gps = None
        if last_gps is not None and abs(last_gps_stamp - scan.stamp) < 0.5:
            gps = last_gps
        return runner.process_scan(scan, imu=imu, gps_fix=gps)

    for msg in reader.read_messages(want):
        if msg.topic == topics.imu:
            m = rb.decode_imu(msg.raw)
            imu_buf.append((m.stamp, m.linear_acceleration,
                            m.angular_velocity, m.orientation))
            # bound like the reference's 2000-deep queues
            if len(imu_buf) > 4000:
                del imu_buf[:2000]
        elif topics.gps and msg.topic == topics.gps:
            if msg.msg_type == "sensor_driver_msgs/GpswithHeading":
                g = rb.decode_gps_with_heading(msg.raw)
                cov = np.asarray(g.gps.position_covariance,
                                 np.float64).reshape(3, 3).diagonal().copy()
                last_gps = (g.gps.latitude, g.gps.longitude, g.gps.altitude,
                            g.gps.status, cov)
                last_gps_stamp = g.stamp
            else:
                g = rb.decode_navsatfix(msg.raw)
                cov = np.asarray(g.position_covariance,
                                 np.float64).reshape(3, 3).diagonal().copy()
                last_gps = (g.latitude, g.longitude, g.altitude, g.status, cov)
                last_gps_stamp = g.stamp
        elif msg.topic == topics.lidar:
            pc2 = rb.decode_pointcloud2(msg.raw)
            scan = rb.scan_from_pointcloud2(pc2, topics.sensor)
            if pending is None:            # fill the delay buffer first
                pending = scan
                continue
            pending, scan = scan, pending  # process the older scan
            res = process(scan)
            if res is not None:
                n_scans += 1
                yield res
                if max_scans is not None and n_scans >= max_scans:
                    return
    # stream end: flush the delayed final scan
    if pending is not None and (max_scans is None or n_scans < max_scans):
        res = process(pending)
        if res is not None:
            yield res
